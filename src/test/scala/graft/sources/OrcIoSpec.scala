package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** ORC seam contract: values (incl. nested arrays and timestamps)
  * round-trip exactly, and the scan keeps the parquet-grade contracts the
  * library's plans rely on — predicate pushdown, column pruning, and
  * partition-directory pruning. */
class OrcIoSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, "alpha", 1.5, Seq(1, 2, 3), "2024-01-01 00:00:00"),
    (2L, "beta", -0.5, Seq(4, 5), "2024-06-15 12:30:00"),
    (3L, "gamma", 2.25, Seq.empty[Int], "2025-02-28 23:59:59"))
    .toDF("id", "name", "score", "xs", "ts")
    .withColumn("ts", col("ts").cast("timestamp"))

  test("orc round-trip preserves schema and values, nested arrays included") {
    val dir = tmpDir()
    OrcIo.export(fixture, s"$dir/t.orc")
    val back = OrcIo.ingest(spark, s"$dir/t.orc")
    // file sinks write every field nullable — compare modulo nullability
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq
    assert(shape(back) == shape(fixture))
    assert(back.orderBy("id").collect().toSeq == fixture.orderBy("id").collect().toSeq)
  }

  test("orc scan pushes filters and prunes columns") {
    val dir = tmpDir()
    OrcIo.export(fixture, s"$dir/t.orc")
    val q = OrcIo.ingest(spark, s"$dir/t.orc")
      .filter(col("id") > 1L).select("name")
    q.collect()
    val scan = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.metadata("PushedFilters").contains("GreaterThan(id,1)"),
      scan.metadata("PushedFilters"))
    // pruned read schema: only the filter + projection columns reach the scan
    val read = scan.requiredSchema.fieldNames.toSet
    assert(read == Set("id", "name"), read.toString)
  }

  test("partitioned orc write prunes directories at read") {
    val dir = tmpDir()
    OrcIo.export(fixture.withColumn("bucket", col("id") % 2),
      s"$dir/p.orc", partitionBy = Seq("bucket"))
    val q = OrcIo.ingest(spark, s"$dir/p.orc").filter(col("bucket") === 1)
    q.collect()
    val scan = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    // only the bucket=1 directory's files are planned
    assert(scan.relation.location.inputFiles.length > 1) // table has 2 dirs
    assert(scan.metadata("PartitionFilters").contains("bucket"),
      scan.metadata("PartitionFilters"))
    assert(scan.metrics("numFiles").value <
      scan.relation.location.inputFiles.length)
    assert(q.select("id").as[Long].collect().toSet == Set(1L, 3L))
  }
}
