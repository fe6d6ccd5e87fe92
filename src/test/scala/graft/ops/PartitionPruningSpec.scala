package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Partition layout + pruning — the other half of the 100 TB story: writes
  * partitioned by a selective column, reads that touch only matching
  * directories (static pruning), and joins that prune fact partitions from a
  * filtered dim at runtime (dynamic partition pruning). */
class PartitionPruningSpec extends SparkSpec {

  private lazy val factPath: String = {
    val p = tmpDir() + "/orders_by_status"
    graft.Tables(spark, sf, "orders")
      .write.partitionBy("o_orderstatus").parquet(p)
    p
  }

  test("static partition pruning: filter reads only matching partitions") {
    val q = spark.read.parquet(factPath).filter(col("o_orderstatus") === "O")
    val scans = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    // the partition filter must be recognized as such (not a data filter)
    assert(scans.head.partitionFilters.nonEmpty,
      s"expected partition filters, got: ${scans.head}")
    val expect = graft.Tables(spark, sf, "orders")
      .filter(col("o_orderstatus") === "O").count()
    assert(q.count() == expect)
  }

  test("dynamic partition pruning: dim filter prunes fact partitions") {
    val statusDim = spark.range(1).select(lit("O").as("status"))
    val joined = spark.read.parquet(factPath)
      .join(statusDim, col("o_orderstatus") === col("status"))
    val planStr = joined.queryExecution.executedPlan.toString
    val expect = graft.Tables(spark, sf, "orders")
      .filter(col("o_orderstatus") === "O").count()
    assert(joined.count() == expect)
    assert(planStr.toLowerCase.contains("dynamicpruning") ||
      planStr.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"expected dynamic pruning in plan:\n$planStr")
  }
}
