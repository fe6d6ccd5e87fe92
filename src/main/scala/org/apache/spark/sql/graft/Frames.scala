package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge to Spark's private[sql] `Dataset.ofRows` — the canonical way to
  * wrap an analyzer-produced LogicalPlan (a MERGE source subquery, a CTAS
  * query) back into the public DataFrame API so graft's SQL lowering can
  * hand it to the engine's table operations. Lives in the
  * org.apache.spark.sql package solely for access; no Spark internals are
  * modified. */
object Frames {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
