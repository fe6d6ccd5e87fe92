package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** Bridge to Spark's private[sql] `internalCreateDataFrame`, the canonical
  * way a DSv1 streaming Source marks its getBatch result `isStreaming =
  * true` (MicroBatchExecution asserts it; Spark's own v1 sources build
  * their batch frames exactly this way). Lives in the org.apache.spark.sql
  * package solely for access; no Spark internals are modified. */
object StreamingFrames {
  def asStreaming(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }
}
