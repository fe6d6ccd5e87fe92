package graft.ext

import graft.SparkSpec
import graft.ops.SnapshotTable
import org.apache.spark.sql.functions._

/** End-to-end contract of the continuous-ingest pipeline: the dedup probe
  * drops mirrored shard docs, the quality gates drop junk, survivors land
  * exactly once, and the WHOLE cycle is idempotent across reruns (the
  * production crash-recovery property). */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val words = (0 until 60).map(i => s"w$i")

  // Mirror of Ingest.ingestRoot's (dir, thresholds)-keyed tag (defaults).
  private def rootFor(dir: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      "graft-ingest-" + s"$dir-10-0.3".replaceAll("[^a-zA-Z0-9]", "_"))
      .getAbsolutePath

  private def writeDocs(dir: String): Unit = {
    val good = (0 until 40).map(i => s"fresh$i").mkString(" ")
    Seq(
      (2L, words.mkString(" "), "en", "s1"),          // corpus
      (4L, words.reverse.mkString(" "), "en", "s1"),  // corpus
      (1L, words.mkString(" "), "en", "s2"),          // shard: mirrors doc 2 -> deduped
      (3L, good, "en", "s2"),                         // shard: clean -> ingested
      (5L, "spam spam spam spam spam spam spam spam spam spam", "en", "s2"), // low TTR -> dropped
      (7L, "too short", "en", "s2"))                  // under token floor -> dropped
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
  }

  test("ingest cycle: dedup + curation gates decide the shard, append is exactly-once") {
    val dir = tmpDir()
    writeDocs(dir)
    val out = Ingest.incrementalCuration(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("ingested")).toMap
    // corpus docs present and not flagged; only the clean shard doc ingested
    assert(out == Map(2L -> false, 4L -> false, 3L -> true), s"got $out")

    // version history: bootstrap (0) + one ingest append (1), nothing more —
    // the in-query replay of batch 1 must have been swallowed by the stamp
    val root = rootFor(dir)
    assert(SnapshotTable.currentVersion(spark, root).contains(1L))

    // a FULL rerun of the cycle (operator retry, next scheduled run finding
    // no new data) changes nothing: same rows, same version
    val again = Ingest.incrementalCuration(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("ingested")).toMap
    assert(again == out, "rerun changed the table")
    assert(SnapshotTable.currentVersion(spark, root).contains(1L),
      "rerun committed a new version")
  }

  test("change feed drives the ingested flag: delta rows only, file-granular") {
    val dir = tmpDir()
    writeDocs(dir)
    Ingest.incrementalCuration(spark, dir).collect()
    val root = rootFor(dir)
    val delta = SnapshotTable.changes(spark, root, 0L)
    assert(delta.select("doc_id").as[Long].collect().toSet == Set(3L),
      "change feed should carry exactly the appended shard rows")
  }
}
