package graft.sources

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** CSV ingest/export (SURVEY.md §2.1 S5/S6; reference README.md:10-11,110-112
  * documents SFTP CSV ingest `Overall_stats_*_*.csv` and Sheets→CSV export;
  * the code for it is absent from the snapshot).
  *
  * Endpoints are modeled as paths (no SFTP connector jar offline); on a real
  * deployment the same calls take `sftp://`-mounted or object-store URIs.
  * Glob expansion, header handling, schema enforcement and partitioned writes
  * are Spark built-ins — nothing custom needed at 100 TB.
  */
object CsvIo {

  /** S5: ingest a CSV glob (e.g. `.../Overall_stats_live_manual_*.csv`).
    * Explicit schema ⇒ no inference scan (one pass, not two). */
  def ingest(spark: SparkSession, glob: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema match {
      case Some(sc) => r.schema(sc).csv(glob)
      case None => r.option("inferSchema", "true").csv(glob)
    }
  }

  /** S6: export a table as CSV. `singleFile=true` mirrors the reference's
    * one-file-per-export shape (coalesce(1) — only for small exports; large
    * exports keep their partitioning). */
  def export(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
  }
}
