package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** ORC ingest/export — the third columnar seam next to parquet (the fixture
  * format) and the text seams ([[CsvIo]], [[JsonlIo]]). Warehouse
  * interchange reality: Hive-lineage lakes ship ORC, and a drop-in engine
  * must read them without a conversion pass. Spark's native vectorized ORC
  * reader gives the same scan-level contracts as parquet — column pruning,
  * predicate pushdown (min/max stripe skipping), partition-directory
  * pruning — so every downstream plan in this library runs unchanged over
  * an ORC lake; [[graft.ops.SnapshotTable]] stays parquet-backed by choice,
  * this seam is for reading/writing EXTERNAL lakes.
  */
object OrcIo {

  /** Ingest an ORC path/glob. ORC files carry their schema, so unlike the
    * text seams no schema argument is needed; partitioned directory trees
    * (`.../k=v/...`) surface their partition columns exactly as parquet. */
  def ingest(spark: SparkSession, glob: String): DataFrame =
    spark.read.orc(glob)

  /** Export a table as ORC. `partitionBy` lays out a pruning-friendly
    * directory tree; `compression` accepts orc codecs ("zstd", "snappy",
    * "zlib", "none") — zstd is the modern lake default. */
  def export(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
             compression: String = "zstd"): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).option("compression", compression)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }
}
