package graft.ext

import graft.Tables
import graft.ops.{Q, SnapshotTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Continuous-ingest curation (VERDICT r4 next-round #4): the end-to-end
  * "new crawl shard arrives → dedup against corpus → curate → exactly-once
  * append" pipeline a 100 TB corpus actually runs per crawl drop, composed
  * from the repo's already-verified primitives:
  *
  *   - [[SnapshotTable.appendOnce]] — the (appId, batchId)-stamped
  *     exactly-once append sink (a replayed batch is detected and skipped);
  *   - the exact-first incremental dedup probe (`x_dedup_incremental`'s
  *     shape): the shard is NEVER deduped by re-clustering the corpus — it
  *     probes the corpus content-hash index with a constant-width equi
  *     anti-join;
  *   - shard-local curation gates (token floor + type-token ratio), fixed
  *     thresholds so the decision needs no corpus-wide statistics;
  *   - [[SnapshotTable.changes]] — the per-commit change feed, from which
  *     the output's `ingested` flag is READ (file-granular delta), never
  *     re-derived from the data.
  *
  * The registered query performs the whole cycle including a deliberate
  * REPLAY of the append batch, so the CORRECTNESS hash gate itself proves
  * exactly-once: a double-applied append would double the ingested rows and
  * hash-mismatch the oracle. At 100 TB each box scales independently: the
  * probe joins shard×index on a constant-width key, curation is a per-doc
  * projection, and the append writes only shard files (the manifest carries
  * the corpus file list forward — nothing is rewritten).
  */
object Ingest {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Memoized table roots: one bootstrap per (corpus dir, thresholds) per
    * JVM; across JVMs the committed SnapshotTable is reused and every
    * appendOnce replays as a no-op (the idempotence stamps make re-entry
    * safe, not just cheap). Keyed by the FULL parameter tuple (ADVICE r5):
    * a dir-only key would make a later call with different thresholds
    * replay batch 1 as a no-op while its oracle interpolates the new
    * thresholds — a silent Spark/oracle divergence. */
  private val ingestRoots =
    new scala.collection.concurrent.TrieMap[(String, Int, Double), String]()

  private def ingestRoot(dir: String, minToks: Int, minTtr: Double): String =
    ingestRoots.getOrElseUpdate((dir, minToks, minTtr), {
      val tag = s"$dir-$minToks-$minTtr".replaceAll("[^a-zA-Z0-9]", "_")
      new java.io.File(
        sys.props("java.io.tmpdir"), s"graft-ingest-$tag").getAbsolutePath
    })

  /** One full ingest cycle over the fixture: corpus = even doc_ids
    * (bootstrapped as version 0), arriving shard = odd doc_ids. Returns the
    * final corpus inventory (doc_id, source, ingested), where `ingested`
    * comes from the change feed of the append commit. Deterministic and
    * idempotent: every step is exactly-once, so Verify, both Bench passes,
    * and any rerun see the identical table. */
  def incrementalCuration(s: SparkSession, dir: String,
                          minToks: Int = 10,
                          minTtr: Double = 0.3): DataFrame = {
    val root = ingestRoot(dir, minToks, minTtr)
    val all = docs(s, dir)
    // Bootstrap the standing corpus (exactly-once batch 0).
    val corpus0 = all.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text"), col("source"))
    SnapshotTable.appendOnce(s, root, corpus0, "graft-ingest", 0L)

    // The new shard probes the CURRENT corpus content-hash index — an
    // anti-join on the constant-width sha256 key (exact dedup; at scale this
    // index is its own persisted table maintained by this very job).
    val corpusIdx = SnapshotTable.read(s, root)
      .select(sha2(col("text"), 256).as("h")).distinct()
    val shard = all.filter(col("doc_id") % 2 === 1)
    val deduped = shard.withColumn("h", sha2(col("text"), 256))
      .join(corpusIdx, Seq("h"), "left_anti")

    // Curate: fixed-threshold quality gates (token floor, type-token ratio)
    // — per-doc projections, no corpus-wide state.
    val curated = deduped
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .filter(size(col("toks")) >= minToks &&
        size(array_distinct(col("toks"))) / size(col("toks")) > minTtr)
      .select(col("doc_id"), col("text"), col("source"))

    // Exactly-once append — and a deliberate REPLAY of the same batch (the
    // at-least-once crash window): the stamp must swallow it, or the output
    // doubles and the oracle hash catches it. appendOnce resolves the
    // version STAMPED with (appId, batchId) whether it committed fresh or
    // replayed as a no-op (SnapshotTable.txnVersion), so the change-feed
    // anchor below is rerun-stable even after later commits (another batch,
    // a compaction) land on this root — ADVICE r5: anchoring on the table's
    // current version would silently read the wrong version pair then.
    val vIngest = SnapshotTable.appendOnce(s, root, curated, "graft-ingest", 1L)
    SnapshotTable.appendOnce(s, root, curated, "graft-ingest", 1L)

    // `ingested` is read from the CHANGE FEED of the ingest commit (files
    // added in exactly that version) — the incremental-consumer contract:
    // downstream reads the delta, not the table.
    val ingested = SnapshotTable.changes(s, root, vIngest - 1, Some(vIngest))
      .select(col("doc_id"), lit(true).as("ingested"))
    SnapshotTable.read(s, root).select(col("doc_id"), col("source"))
      .join(ingested, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("ingested"), lit(false)).as("ingested"))
      .orderBy("doc_id")
  }

  // Dedup is NOT EXISTS, not NOT IN (ADVICE r5): a single NULL corpus text
  // would make NOT IN yield zero shard rows in DuckDB while the Spark
  // anti-join (null keys never match) keeps them — null-safe semantics
  // must agree across engines. No SQL comments in the string: the oracle
  // harness may collapse whitespace and a `--` would swallow the rest.
  private def curationOracle(minToks: Int, minTtr: Double): String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text, source FROM documents WHERE doc_id % 2 = 0),
       |shard AS (
       |  SELECT doc_id, text, source FROM documents WHERE doc_id % 2 = 1),
       |deduped AS (
       |  SELECT * FROM shard s WHERE NOT EXISTS (
       |    SELECT 1 FROM corpus c WHERE c.text = s.text)),
       |curated AS (
       |  SELECT doc_id, source FROM deduped
       |  WHERE len(string_split_regex(trim(text), '\\s+')) >= $minToks
       |    AND len(list_distinct(string_split_regex(trim(text), '\\s+')))
       |      / len(string_split_regex(trim(text), '\\s+')) > $minTtr)
       |SELECT doc_id, source, FALSE AS ingested FROM corpus
       |UNION ALL
       |SELECT doc_id, source, TRUE AS ingested FROM curated
       |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("x_pipeline_incremental",
      (s, dir) => incrementalCuration(s, dir),
      Some(curationOracle(10, 0.3))))
}
