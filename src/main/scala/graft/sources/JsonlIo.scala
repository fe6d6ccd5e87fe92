package graft.sources

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JSON-Lines ingest/export — the de-facto interchange format of LLM
  * training corpora (one JSON document per line; crawl drops, instruction
  * sets and eval suites all ship this way). The CSV seam's sibling
  * ([[CsvIo]]): endpoints are paths, and glob expansion, schema
  * enforcement, permissive/corrupt-record handling, compression and
  * partitioned writes are Spark built-ins that hold at 100 TB — a JSONL
  * shard directory reads with one task per file split exactly like any
  * other text-based source.
  *
  * Nested values (arrays, structs — e.g. an embedding column or per-doc
  * metadata) round-trip natively, which is the reason corpora standardize
  * on JSONL over CSV in the first place.
  */
object JsonlIo {

  /** Ingest a JSONL glob. Explicit schema ⇒ single pass (no inference
    * scan) AND a stable column order/type surface for downstream plans —
    * production ingest should always pass one. `permissive=true` keeps
    * malformed lines as nulls in a `_corrupt_record` column instead of
    * failing the job (the crawl-shard reality: a bad line must not kill a
    * 100 TB read); `permissive=false` fails fast for curated inputs. */
  def ingest(spark: SparkSession, glob: String,
             schema: Option[StructType] = None,
             permissive: Boolean = true): DataFrame = {
    val r = spark.read
      .option("mode", if (permissive) "PERMISSIVE" else "FAILFAST")
    schema match {
      case Some(sc) => r.schema(sc).json(glob)
      case None => r.json(glob)
    }
  }

  /** Export a table as JSONL. `compression` accepts Spark's codecs
    * ("gzip", "zstd", "none") — corpus drops ship compressed;
    * `singleFile` mirrors the small-export CSV shape (coalesce(1), small
    * exports only — large exports keep their partitioning so the write
    * stays parallel). */
  def export(df: DataFrame, path: String, singleFile: Boolean = false,
             compression: String = "none"): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite)
      .option("compression", compression).json(path)
  }
}
