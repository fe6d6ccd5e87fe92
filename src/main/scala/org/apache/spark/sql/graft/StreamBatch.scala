package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.LogicalRDD

/** The one `private[sql]` seam this library needs from Spark: re-wrapping
  * a V1 streaming [[org.apache.spark.sql.execution.streaming.Sink]]'s
  * micro-batch as a plain batch DataFrame.
  *
  * The frame handed to `Sink.addBatch` carries the streaming flag and an
  * incremental plan — calling `.write` on it is refused by the analyzer,
  * and re-planning it re-executes the micro-batch. `LogicalRDD.fromDataset`
  * over `queryExecution.toRdd` reuses the ALREADY-PLANNED physical rows
  * under a batch leaf; both are `private[sql]`, so this shim lives in the
  * `org.apache.spark.sql` namespace — the same approach Delta's DeltaSink
  * and Iceberg's Spark module take for the identical seam (a connector
  * jar shipping a handful of classes under the host's package). Nothing
  * else in this repository reaches into Spark internals this way. */
object StreamBatch {

  /** `data` (a streaming micro-batch) as a batch frame over its
    * already-computed rows — no re-execution, writable anywhere. */
  def asBatch(data: DataFrame): DataFrame = {
    val ds = data.asInstanceOf[classic.Dataset[Row]]
    classic.Dataset.ofRows(ds.sparkSession,
      LogicalRDD.fromDataset(data.queryExecution.toRdd, ds, isStreaming = false))
  }
}
