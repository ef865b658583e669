package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local session for unit specs. One session per JVM (sbt forks one
  * test JVM); specs must not mutate session conf. */
object SparkSpec {
  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).appName("graft-test").getOrCreate()
}

trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = SparkSpec.spark
}
