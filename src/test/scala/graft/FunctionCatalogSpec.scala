package graft

import org.apache.spark.sql.functions._

/** The V2 FunctionCatalog surface: `graft_fns.fns.hash60` resolves
  * through the catalog plugin (no session-registry registration), binds
  * with the magic invoke path, agrees with the expression-registry
  * `hash60` definition and the JVM twin, handles NULL, and rejects
  * wrong-typed arguments at bind time. */
class FunctionCatalogSpec extends SparkSpec {

  test("catalog route, expression route, and JVM twin compute the same hash60") {
    val viaCatalog = spark.sql(
      "SELECT graft_fns.fns.hash60('abc') AS h").head().getLong(0)
    viaCatalog shouldBe graft.operators.TextOps.hash60Jvm("abc")
    // same value the column-expression definition produces over data
    import spark.implicits._
    val df = Seq("", "abc", "Hello World", "cf:12345").toDF("s")
    val viaExpr = df.select(
      graft.operators.TextOps.hash60(col("s")).as("h")).collect().map(_.getLong(0))
    val viaCat = df.createOrReplaceTempView("fc_in")
    val cat = spark.sql(
      "SELECT graft_fns.fns.hash60(s) AS h FROM fc_in").collect().map(_.getLong(0))
    cat.toSeq shouldBe viaExpr.toSeq
  }

  test("null in, null out; wrong argument type fails at bind") {
    spark.sql("SELECT graft_fns.fns.hash60(CAST(NULL AS STRING)) AS h")
      .head().isNullAt(0) shouldBe true
    val e = intercept[Exception] {
      spark.sql("SELECT graft_fns.fns.hash60(array(1,2)) AS h").collect()
    }
    e.getMessage.toLowerCase should include("hash60")
  }

  test("the function is listed under the catalog's namespace") {
    val cat = spark.sessionState.catalogManager.catalog("graft_fns")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.FunctionCatalog]
    cat.listFunctions(Array("fns")).map(_.name()).toSeq shouldBe Seq("hash60")
  }
}
