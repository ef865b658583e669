package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` doorway the engine needs: wrap a custom
  * [[LogicalPlan]] node into a user-facing [[DataFrame]]
  * (`Dataset.ofRows`). Spark exposes every other extension point publicly
  * (`SparkSessionExtensions` injects functions, rules, and planner
  * strategies), but constructing a Dataset over a custom logical node has
  * no public constructor — the established idiom for Spark-native
  * libraries (Delta, Sedona, Iceberg all ship `org.apache.spark.sql.*`
  * shims) is a package-scoped accessor like this one. Kept to the single
  * method so the private-API surface stays auditable. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
