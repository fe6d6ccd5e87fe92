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

  /** NEAR-DUP-AWARE ingest cycle (VERDICT r5 next-round #1): the exact
    * sha256 probe alone lets a recrawled mirror with one changed character
    * sail through — the most common real-world hit in a crawl drop. This
    * variant routes the exact-probe survivors through a bounded MinHash
    * probe against a PERSISTED corpus signature index before curation:
    *
    *   1. exact probe — sha256 anti-join against the content-hash index
    *      (unchanged from [[incrementalCuration]]);
    *   2. near probe — survivors' md5-60 MinHash signatures band-join the
    *      corpus signature index (its own SnapshotTable, maintained by this
    *      same job: bootstrap = batch 0, each ingest appends the signatures
    *      of what it ingested as the same batch id). Bucket-colliding
    *      candidates are exact-verified by shingle Jaccard ≥ 0.5 with the
    *      usual semi-join restriction — corpus TEXT is touched only for
    *      candidate ids, never scanned wholesale;
    *   3. curation gates + exactly-once append + deliberate replay + change
    *      feed, identical to the exact-only cycle.
    *
    * At 100 TB the signature index is ~32 longs/doc (vs the full text) and
    * the probe shuffles only (band_id, band_key) pairs of the NEW shard —
    * the corpus side is read from the compact index, so per-drop cost is
    * O(shard), not O(corpus). Signatures use the engine-portable md5-60
    * base hash ([[Dedup.md5Signatures]]) so the ENTIRE decision — banding,
    * bucket join, verify, curation, exactly-once flag — sits under the
    * DuckDB hash gate. */
  def incrementalCurationNear(s: SparkSession, dir: String,
                              minToks: Int = 10, minTtr: Double = 0.3,
                              bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    // "#near2": root bumped when the index schema gained the sha256 column
    // (round 7) — a stale-on-disk v1 index must bootstrap fresh, not fail.
    val root = ingestRoot(dir + "#near2", minToks, minTtr)
    val all = docs(s, dir)
    val corpus0 = all.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text"), col("source"))
    val shard = all.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"), col("source"))
    ingestCycleNear(s, corpus0, shard, root, "graft-ingest-near",
      minToks, minTtr, bands, rowsPerBand)
  }

  /** The SKINNY per-drop probe index: one row per doc with BOTH the exact
    * sha256 and the MinHash signature (sig is null for sub-3-token docs,
    * which cannot shingle but must still block exact recrawls) — so a
    * probe never re-reads corpus TEXT except for the few verify
    * candidates. Per-drop cost is O(shard) + O(skinny index scan): ~40
    * bytes/doc instead of multi-KB documents (the 50× rehearsal
    * quantifies this, SCALE.md). */
  def indexRows(df: DataFrame, perms: Int = 64): DataFrame =
    df.select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .join(Dedup.md5Signatures(df, perms), Seq("doc_id"), "left")

  /** The per-drop probe shared by the batch cycle and the streaming sink:
    * exact-hash anti-join against the index's h column, banded MinHash
    * probe + jaccard verify against its sig column, then the curation
    * gates. `corpusTbl` supplies text ONLY for the verify candidates
    * (broadcast-semi-join restricted). Returns the curated survivors
    * (doc_id, text, source). */
  def probeAndCurate(shard: DataFrame, corpusTbl: DataFrame, sigIdx: DataFrame,
                     minToks: Int = 10, minTtr: Double = 0.3,
                     bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    // Materialize the exact-probe survivors ONCE: they feed the shard-side
    // banding, the verify's shingle build and the final anti-join — without
    // the cut, each use replays the shard-vs-index anti-join (measured as a
    // 4× bench regression on the fixture cycle when the r7 index refactor
    // first landed without it). Shard-sized, never corpus-sized.
    val exactSurv = shard.withColumn("h", sha2(col("text"), 256))
      .join(sigIdx.select("h").distinct(), Seq("h"), "left_anti").drop("h")
      .localCheckpoint()

    // Near probe: band the shard signatures against the persisted index.
    // The shard side needs only sig (not h): md5Signatures directly, no
    // indexRows join. The sig-null guard (short docs carry h but no sig)
    // belongs ONLY on the index side, where sig is a STORED column: a
    // filter over the shard's derived sig would be predicate-pushed below
    // its projection and Catalyst re-inlines the whole signature pipeline
    // into the Filter — measured as the entire 3 s of a 3.6 s probe (the
    // shard's sig is non-null by construction: md5Signatures drops sub-3-
    // token docs before signing).
    val bandExpr = expr(
      s"transform(sequence(0, ${bands - 1}), b -> concat_ws(',', " +
        (1 to rowsPerBand).map(i => s"element_at(sig, b * $rowsPerBand + $i)")
          .mkString(", ") + "))")
    def banded(sigDf: DataFrame, idAs: String): DataFrame =
      sigDf.select(col("doc_id").as(idAs),
        posexplode(bandExpr).as(Seq("band_id", "band_key")))
    val cands = banded(Dedup.md5Signatures(exactSurv, bands * rowsPerBand), "b")
      .join(banded(sigIdx.filter(col("sig").isNotNull), "c"),
        Seq("band_id", "band_key"))
      .select(col("b"), col("c")).distinct()
      .localCheckpoint() // candidates are tiny; don't replay the sig pipeline per use
    // Exact verify on candidates only: shingle sets built for candidate ids
    // via broadcast-semi-join restriction, threshold on the RAW metric.
    def shinglesOf(df: DataFrame, ids: DataFrame, idAs: String, shAs: String) =
      df.join(broadcast(ids), Seq("doc_id"), "left_semi")
        .withColumn("toks", TextAnalysis.tokens(col("text")))
        .withColumn("shingles", expr(Dedup.shingleExpr))
        .select(col("doc_id").as(idAs),
          transform(col("shingles"), x => graft.functions.Md5Hash60(x)).as(shAs))
    val nearIds = cands
      .join(shinglesOf(exactSurv, cands.select(col("b").as("doc_id")).distinct(),
        "b", "sh_b"), "b")
      .join(shinglesOf(corpusTbl, cands.select(col("c").as("doc_id")).distinct(),
        "c", "sh_c"), "c")
      .filter(Dedup.jaccard(col("sh_b"), col("sh_c")) >= 0.5)
      .select(col("b").as("doc_id")).distinct()
    val deduped = exactSurv.join(nearIds, Seq("doc_id"), "left_anti")

    deduped
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .filter(size(col("toks")) >= minToks &&
        size(array_distinct(col("toks"))) / size(col("toks")) > minTtr)
      .select(col("doc_id"), col("text"), col("source"))
  }

  /** The GENERALIZED near-dup-aware ingest cycle — the API a production
    * pipeline calls once per crawl drop (the registered query above is this
    * cycle applied to the fixture's odd/even split). `corpus0` bootstraps
    * the standing corpus as exactly-once batch 0 (a no-op when the root
    * already exists); `shard` is the arriving drop. Returns the post-ingest
    * inventory (doc_id, source, ingested). */
  def ingestCycleNear(s: SparkSession, corpus0: DataFrame, shard: DataFrame,
                      root: String, appId: String,
                      minToks: Int = 10, minTtr: Double = 0.3,
                      bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val sigRoot = root + "-sig"
    SnapshotTable.appendOnce(s, root, corpus0, appId, 0L)
    // Index bootstrap, derived from the COMMITTED corpus table so index and
    // table can never drift (same exactly-once batch discipline).
    SnapshotTable.appendOnce(s, sigRoot,
      indexRows(SnapshotTable.read(s, root), bands * rowsPerBand),
      appId + "-sig", 0L)

    val corpusTbl = SnapshotTable.read(s, root)
    val sigIdx = SnapshotTable.read(s, sigRoot)
    val curated = probeAndCurate(shard, corpusTbl, sigIdx,
      minToks, minTtr, bands, rowsPerBand)

    // Exactly-once append + deliberate replay (see incrementalCuration), and
    // the signature index advances in lockstep: batch 1 appends the
    // signatures of exactly what batch 1 ingested.
    val vIngest = SnapshotTable.appendOnce(s, root, curated, appId, 1L)
    SnapshotTable.appendOnce(s, root, curated, appId, 1L)
    SnapshotTable.appendOnce(s, sigRoot,
      indexRows(curated, bands * rowsPerBand), appId + "-sig", 1L)

    val ingested = SnapshotTable.changes(s, root, vIngest - 1, Some(vIngest))
      .select(col("doc_id"), lit(true).as("ingested"))
    SnapshotTable.read(s, root).select(col("doc_id"), col("source"))
      .join(ingested, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("ingested"), lit(false)).as("ingested"))
      .orderBy("doc_id")
  }

  /** One [[probeAndCurate]] step as a reusable suffixed CTE block: probes
    * `shardSrc` against `corpusSrc`, leaving `curated_$tag` (doc_id, text,
    * source) in scope. The signature/banding math is recomputed from text
    * with the same interpolated seed literals as
    * [[Dedup.md5MinhashOracleSql]] — what the gate verifies is that the
    * PERSISTED index the Spark side probes holds exactly the values the
    * math demands. */
  private def nearProbeCtes(tag: String, corpusSrc: String, shardSrc: String,
                            minToks: Int, minTtr: Double,
                            bands: Int, rowsPerBand: Int): String = {
    val sigList = Dedup.md5SigSql(bands * rowsPerBand)
    val bandKey = Dedup.bandKeySql(rowsPerBand)
    val shgOf = (src: String) =>
      s"""SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
         |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM $src)
         |  WHERE len(t) >= 3""".stripMargin
    s"""ex_$tag AS (
       |  SELECT * FROM $shardSrc s WHERE NOT EXISTS (
       |    SELECT 1 FROM $corpusSrc c WHERE c.text = s.text)),
       |shg_s_$tag AS (${shgOf(s"ex_$tag")}),
       |hs_s_$tag AS (
       |  SELECT doc_id,
       |    list_transform(shingles, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS shash
       |  FROM shg_s_$tag),
       |sig_s_$tag AS (SELECT doc_id, $sigList AS sig FROM hs_s_$tag),
       |shg_c_$tag AS (${shgOf(corpusSrc)}),
       |hs_c_$tag AS (
       |  SELECT doc_id,
       |    list_transform(shingles, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS shash
       |  FROM shg_c_$tag),
       |sig_c_$tag AS (SELECT doc_id, $sigList AS sig FROM hs_c_$tag),
       |banded_s_$tag AS (
       |  SELECT doc_id, g.b AS band_id, $bandKey AS band_key
       |  FROM sig_s_$tag, generate_series(0, ${bands - 1}) AS g(b)),
       |banded_c_$tag AS (
       |  SELECT doc_id, g.b AS band_id, $bandKey AS band_key
       |  FROM sig_c_$tag, generate_series(0, ${bands - 1}) AS g(b)),
       |cand_$tag AS (
       |  SELECT DISTINCT s.doc_id AS b, c.doc_id AS c
       |  FROM banded_s_$tag s JOIN banded_c_$tag c
       |    ON s.band_id = c.band_id AND s.band_key = c.band_key),
       |near_$tag AS (
       |  SELECT DISTINCT cd.b FROM cand_$tag cd
       |  JOIN hs_s_$tag ha ON ha.doc_id = cd.b
       |  JOIN hs_c_$tag hb ON hb.doc_id = cd.c
       |  WHERE len(list_intersect(ha.shash, hb.shash))
       |      / (len(ha.shash) + len(hb.shash) - len(list_intersect(ha.shash, hb.shash))) >= 0.5),
       |deduped_$tag AS (
       |  SELECT * FROM ex_$tag e WHERE NOT EXISTS (
       |    SELECT 1 FROM near_$tag n WHERE n.b = e.doc_id)),
       |curated_$tag AS (
       |  SELECT doc_id, text, source FROM deduped_$tag
       |  WHERE len(string_split_regex(trim(text), '\\s+')) >= $minToks
       |    AND len(list_distinct(string_split_regex(trim(text), '\\s+')))
       |      / len(string_split_regex(trim(text), '\\s+')) > $minTtr)""".stripMargin
  }

  private def nearCurationOracle(minToks: Int, minTtr: Double,
                                 bands: Int, rowsPerBand: Int): String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text, source FROM documents WHERE doc_id % 2 = 0),
       |shard AS (
       |  SELECT doc_id, text, source FROM documents WHERE doc_id % 2 = 1),
       |${nearProbeCtes("1", "corpus", "shard", minToks, minTtr, bands, rowsPerBand)}
       |SELECT doc_id, source, FALSE AS ingested FROM corpus
       |UNION ALL
       |SELECT doc_id, source, TRUE AS ingested FROM curated_1
       |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  /** Chained two-micro-batch oracle for the streamed ingest's batch twin:
    * batch 2 probes corpus ∪ batch 1's survivors — the advanced index. */
  private def nearTwoBatchOracle(minToks: Int, minTtr: Double,
                                 bands: Int, rowsPerBand: Int): String =
    s"""WITH corpus0 AS (
       |  SELECT doc_id, text, source FROM documents WHERE doc_id % 3 = 0),
       |b1 AS (SELECT doc_id, text, source FROM documents WHERE doc_id % 3 = 1),
       |b2 AS (SELECT doc_id, text, source FROM documents WHERE doc_id % 3 = 2),
       |${nearProbeCtes("1", "corpus0", "b1", minToks, minTtr, bands, rowsPerBand)},
       |corpus1 AS (SELECT doc_id, text, source FROM corpus0
       |            UNION ALL SELECT doc_id, text, source FROM curated_1),
       |${nearProbeCtes("2", "corpus1", "b2", minToks, minTtr, bands, rowsPerBand)}
       |SELECT doc_id, source, CAST(0 AS BIGINT) AS ingest_batch FROM corpus0
       |UNION ALL
       |SELECT doc_id, source, CAST(1 AS BIGINT) AS ingest_batch FROM curated_1
       |UNION ALL
       |SELECT doc_id, source, CAST(2 AS BIGINT) AS ingest_batch FROM curated_2
       |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

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

  /** BATCH TWIN of the streamed near-dup ingest (VERDICT r6 #2): the
    * sequential two-micro-batch semantics as one deterministic DataFrame —
    * batch 1 probes the bootstrap corpus, batch 2 probes corpus ∪ batch 1's
    * survivors (the index ADVANCES between micro-batches, so a batch-2 doc
    * near-duplicating a batch-1 doc is dropped even though neither is in
    * the bootstrap corpus). [[graft.streaming.Streams.nearDupIngestSink]]
    * runs the identical probe per micro-batch against the PERSISTED
    * SnapshotTable index; IngestStreamSpec asserts inventory equality with
    * this twin and exactly-once behavior under a replayed batch. */
  def nearDupIngestTwoBatch(corpus0: DataFrame, b1: DataFrame, b2: DataFrame,
                            minToks: Int = 10, minTtr: Double = 0.3,
                            bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val perms = bands * rowsPerBand
    // The streaming path probes PERSISTED index tables (cheap re-reads);
    // this twin's indexes are derived DataFrames, so cut them once each —
    // probeAndCurate reads its sigIdx twice (exact h-probe + banding) and
    // an uncut index replays the whole corpus signature pipeline per use.
    val idx0 = indexRows(corpus0, perms).localCheckpoint()
    val cur1 = probeAndCurate(b1, corpus0, idx0,
      minToks, minTtr, bands, rowsPerBand).localCheckpoint()
    val corpus1 = corpus0.unionByName(cur1)
    // Advance the index INCREMENTALLY — idx0 plus the survivors' rows —
    // exactly the lockstep append the streaming sink commits (indexRows is
    // per-row, so this equals indexRows(corpus1) without re-signaturing
    // the whole corpus).
    val idx1 = idx0.unionByName(indexRows(cur1, perms)).localCheckpoint()
    val cur2 = probeAndCurate(b2, corpus1, idx1,
      minToks, minTtr, bands, rowsPerBand)
    corpus0.select(col("doc_id"), col("source"), lit(0L).as("ingest_batch"))
      .unionByName(cur1.select(col("doc_id"), col("source"),
        lit(1L).as("ingest_batch")))
      .unionByName(cur2.select(col("doc_id"), col("source"),
        lit(2L).as("ingest_batch")))
      .orderBy("doc_id")
  }

  val qs: Seq[Q] = Seq(
    Q("x_pipeline_incremental",
      (s, dir) => incrementalCuration(s, dir),
      Some(curationOracle(10, 0.3))),
    Q("x_pipeline_incremental_near",
      (s, dir) => incrementalCurationNear(s, dir),
      Some(nearCurationOracle(10, 0.3, 16, 4))),
    Q("st_ingest_neardup",
      (s, dir) => {
        val all = docs(s, dir)
        def part(r: Int) = all.filter(col("doc_id") % 3 === r)
          .select("doc_id", "text", "source")
        nearDupIngestTwoBatch(part(0), part(1), part(2))
      },
      Some(nearTwoBatchOracle(10, 0.3, 16, 4))))
}
