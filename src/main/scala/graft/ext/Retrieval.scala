package graft.ext

import graft.Tables
import graft.ops.Q
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ranked text retrieval over the document corpus: Okapi BM25 (Robertson &
  * Spärck Jones; the scoring function behind Lucene/Elasticsearch defaults)
  * as ONE declarative plan. Retrieval is the other half of the
  * training-data story — contamination checks, instruction-data mining and
  * RAG corpus construction all start from "score these queries against the
  * corpus" — and the reference pipeline's BigQuery SQL surface expresses
  * exactly this shape (grouped relevance scoring + top-k per key).
  *
  * Scale shape (the part that must survive 100 TB):
  *   - the corpus is touched by ONE scan; per-term postings are built by
  *     explode + semi-join against the (tiny, broadcast) query-term
  *     relation, so the shuffle carries only postings FOR QUERIED TERMS —
  *     never the full vocabulary;
  *   - document frequencies and corpus stats (N, avgdl) are constant-width
  *     aggregates crossJoin(broadcast(...))-ed back in, the repo's standard
  *     sufficient-statistics pattern;
  *   - the final top-k is a per-query window over (q_id, doc) partial
  *     scores — partitioned by query, no global sort.
  *
  * Engine-portable determinism: per-(q, doc, term) partial scores are
  * computed in double (ln/÷ are IEEE on both engines) then cast to
  * DECIMAL(28,12) BEFORE the per-document sum — the cast absorbs the
  * sub-1e-12 libm ulp differences and makes the sum order-independent, so
  * ranking on the decimal is bit-stable across Spark and DuckDB.
  */
object Retrieval {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** BM25 free parameters — the universal defaults. */
  private val K1 = 1.2
  private val B = 0.75

  /** The fixture query workload: three multi-term queries over the corpus
    * vocabulary (mirrored verbatim in the oracle's VALUES clause).
    * `private[graft]`: RetrievalStreamSpec probes the streamed index with
    * the same workload to compare against [[bm25IngestTwoDropTwin]]. */
  private[graft] val queryTerms: Seq[(Long, String)] = Seq(
    1L -> "spark", 1L -> "merge", 1L -> "window",
    2L -> "customer", 2L -> "batch", 2L -> "filter",
    3L -> "vector", 3L -> "stream", 3L -> "slow")

  /** The per-(term, doc) BM25 contribution — note it is QUERY-INDEPENDENT
    * (only corpus statistics appear), which is what makes the impact-
    * ordered index possible: w(t,d) can be materialized at build time.
    * One expression tree shared by the scan path and the index build, so
    * every path produces bit-identical DECIMAL(28,12) partials. */
  private def impactExpr: org.apache.spark.sql.Column = {
    val idf = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    (idf * (col("cnt") * lit(K1 + 1.0)) /
      (col("cnt") + lit(K1) * (lit(1.0 - B) + lit(B) * col("len_d") / col("avgdl"))))
      .cast("decimal(28,12)")
  }

  /** Sum per-(query, doc) partials and rank: window row_number with the
    * (score desc, doc_id asc) total order. `parts` is (q_id, doc_id, part). */
  private def rankTail(parts: DataFrame, k: Int): DataFrame = {
    val scored = parts.groupBy("q_id", "doc_id").agg(sum(col("part")).as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("doc_id"),
        round(col("score").cast("double"), 6).as("bm25"))
      .orderBy("q_id", "rank")
  }

  /** Shared scoring tail for the scan path: derive df from the restricted
    * tf (distinct per (doc, term)), compute partials, rank. */
  private def scoreAndRank(queries: DataFrame, tf: DataFrame, lens: DataFrame,
                           stats: DataFrame, k: Int): DataFrame = {
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val parts = broadcast(queries).join(tf, Seq("term"))
      .join(broadcast(dfq), Seq("term"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("part", impactExpr)
      .select("q_id", "doc_id", "part")
    rankTail(parts, k)
  }

  /** BM25 top-`k` documents per query, scored from the corpus scan.
    * `queries` is a (q_id, term) relation — tiny next to the corpus, hence
    * broadcast. Postings are restricted to queried terms by a semi-join
    * against the broadcast term set, so the shuffle carries O(matching
    * postings), never the full vocabulary. */
  def bm25TopK(s: SparkSession, corpus: DataFrame, queries: DataFrame,
               k: Int = 5): DataFrame = {
    val toks = corpus
      .select(col("doc_id"), TextAnalysis.tokens(lower(col("text"))).as("toks"))
    val lens = toks.select(col("doc_id"), size(col("toks")).cast("long").as("len_d"))
    // Corpus sufficient statistics: one row, broadcast back.
    val stats = lens.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("len_d")).cast("double") / count(lit(1))).as("avgdl"))
    val terms = queries.select(col("term")).distinct()
    val tf = toks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .join(broadcast(terms), Seq("term"), "left_semi")
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("cnt"))
    scoreAndRank(queries, tf, lens, stats, k)
  }

  // ---------------------------------------------------------------------
  // Indexed retrieval: build/probe split (the ANN tier's shape applied to
  // lexical search). BUILD tokenizes the corpus ONCE into a persisted
  // inverted index; every probe afterwards reads only the queried terms'
  // postings — at 100 TB a query touches files covering its terms' key
  // ranges, never the corpus text.
  // ---------------------------------------------------------------------

  /** Memoized index roots: one postings build per corpus version per JVM;
    * across JVMs the committed SnapshotTables are reused. */
  private val indexRoots = new scala.collection.concurrent.TrieMap[String, String]()

  /** BUILD step: full-vocabulary IMPACT-ordered inverted index persisted
    * once per corpus content version ([[Similarity.corpusVersion]] keying —
    * an in-place corpus regeneration can never serve stale postings). The
    * index stores the finished per-(term, doc) BM25 contribution w(t,d)
    * (query-independent — it folds tf, df, length normalization and the
    * corpus stats), the classic impact/frequency-index tradeoff: probes do
    * ZERO joins beyond queries ⋈ impacts, at the cost of a rebuild when
    * the corpus (hence df/avgdl) changes — which the version key forces
    * anyway. Table `impacts` (term, doc_id, part) is range-CLUSTERED by
    * term so each file owns a disjoint term range and a probe's pushed
    * term filter skips non-overlapping files/row-groups. */
  def bm25IndexBuild(s: SparkSession, dir: String): String = synchronized {
    val vdir = s"$dir@${Similarity.corpusVersion(dir, "documents")}#v3"
    indexRoots.getOrElseUpdate(vdir, {
      import graft.ops.SnapshotTable
      val tag = vdir.replaceAll("[^a-zA-Z0-9]", "_")
      val root = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft-bm25-$tag").getAbsolutePath
      if (SnapshotTable.currentVersion(s, s"$root/impacts").isEmpty ||
          SnapshotTable.currentVersion(s, s"$root/termstats").isEmpty) {
        val toks = docs(s, dir)
          .select(col("doc_id"), TextAnalysis.tokens(lower(col("text"))).as("toks"))
        val lens = toks.select(col("doc_id"), size(col("toks")).cast("long").as("len_d"))
        val stats = lens.agg(
          count(lit(1)).as("n_docs"),
          (sum(col("len_d")).cast("double") / count(lit(1))).as("avgdl"))
        val postings = toks
          .select(col("doc_id"), explode(col("toks")).as("term"))
          .groupBy("term", "doc_id")
          .agg(count(lit(1)).as("cnt"))
        val dfq = postings.groupBy("term").agg(count(lit(1)).as("df"))
        val impacts = postings
          // dfq is VOCABULARY-sized (full-corpus distinct tokens) — never
          // hint it broadcast; the term-keyed shuffle join is the shape
          // that survives a 100 TB vocabulary, and AQE still broadcasts it
          // at rig scale where it fits.
          .join(dfq, Seq("term"))
          .join(lens, Seq("doc_id"))
          .crossJoin(broadcast(stats))
          .withColumn("part", impactExpr)
          .select("term", "doc_id", "part")
        SnapshotTable.commitClustered(s, s"$root/impacts", impacts,
          clusterBy = Seq("term"), numFiles = 8)
        // Per-term pruning metadata (the WAND/max-score upper bounds): df
        // and the term's MAXIMUM impact over the corpus — one tiny
        // vocabulary-sized aggregate over the committed index, read back so
        // the bounds are derived from exactly the postings probes will see.
        SnapshotTable.commit(s, s"$root/termstats",
          SnapshotTable.read(s, s"$root/impacts")
            .groupBy("term")
            .agg(count(lit(1)).as("df"), max(col("part")).as("maxw")))
      }
      root
    })
  }

  // ---------------------------------------------------------------------
  // Incremental index maintenance — the ingest story applied to retrieval.
  // The impact transform needs corpus-wide statistics (df, avgdl) that
  // change with EVERY drop, so a naively-incremental impact index is
  // impossible — but the expensive, text-sized work (tokenization) is
  // per-document and never changes. Split accordingly:
  //
  //   - `postings` (term, doc_id, cnt) and `doclens` (doc_id, len_d) are
  //     INCREMENTAL: a crawl drop tokenizes only its own documents and
  //     appends exactly-once (batchId-stamped, replays dropped) — text is
  //     read once per document EVER;
  //   - `impacts` + `termstats` are DERIVED artifacts re-committed by
  //     [[bm25ImpactsRefresh]]: a postings-sized plan (no text, no regex
  //     tokenization) that re-folds the new statistics. Atomic snapshot
  //     commits mean probes reading the previous version stay consistent.
  //
  // At 100 TB the split is the difference between re-scanning the corpus
  // text per drop and re-aggregating the (order-of-magnitude smaller,
  // already-columnar) postings.
  // ---------------------------------------------------------------------

  /** INGEST step: tokenize ONLY `newDocs`, append their postings and doc
    * lengths exactly-once. Each table is independently idempotent on
    * (appId, batchId), so a replayed drop (or a crash between the two
    * appends followed by a retry) never double-counts. */
  def bm25PostingsAppend(s: SparkSession, indexRoot: String,
                         newDocs: DataFrame, batchId: Long): Unit = {
    import graft.ops.SnapshotTable
    val toks = newDocs
      .select(col("doc_id"), TextAnalysis.tokens(lower(col("text"))).as("toks"))
    val lens = toks.select(col("doc_id"), size(col("toks")).cast("long").as("len_d"))
    val postings = toks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("cnt"))
    SnapshotTable.appendOnce(s, s"$indexRoot/postings", postings, "bm25-postings", batchId)
    SnapshotTable.appendOnce(s, s"$indexRoot/doclens", lens, "bm25-doclens", batchId)
  }

  /** REFRESH step: re-derive `impacts` and `termstats` from the CURRENT
    * postings — the same expression tree as the cold build, so a refreshed
    * index is bit-identical to a from-scratch build over the same corpus.
    * The plan never touches text. */
  def bm25ImpactsRefresh(s: SparkSession, indexRoot: String): Unit = {
    import graft.ops.SnapshotTable
    val postings = SnapshotTable.read(s, s"$indexRoot/postings")
    val lens = SnapshotTable.read(s, s"$indexRoot/doclens")
    val stats = lens.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("len_d")).cast("double") / count(lit(1))).as("avgdl"))
    val dfq = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val impacts = postings
      .join(dfq, Seq("term")) // vocabulary-sized: no broadcast hint (see build)
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("part", impactExpr)
      .select("term", "doc_id", "part")
    SnapshotTable.commitClustered(s, s"$indexRoot/impacts", impacts,
      clusterBy = Seq("term"), numFiles = 8)
    SnapshotTable.commit(s, s"$indexRoot/termstats",
      SnapshotTable.read(s, s"$indexRoot/impacts")
        .groupBy("term")
        .agg(count(lit(1)).as("df"), max(col("part")).as("maxw")))
  }

  /** Literal-vs-relation threshold for probe term restriction — the
    * ProductQuant `maxLiteralLut` discipline applied to term sets
    * (VERDICT r8 #3). At or below, the restriction is an `isin` literal
    * filter: known at PLAN time, so the term-clustered index's manifest
    * bounds skip non-overlapping files before any task launches. Above it,
    * the literal list hits the same wall the dim-768 PQ LUT did (every task
    * deserializes a workload-sized Expression tree — measured OOM at 3,072
    * literals × 32 threads, SCALE.md): the restriction becomes a broadcast
    * semi-join against the term relation instead — one bounded broadcast,
    * nothing workload-sized in any task closure. Plan-time file skipping is
    * traded for the run-time broadcast hash filter, which is the correct
    * trade once the term set itself is large enough to touch most files. */
  private[graft] val MaxLiteralTerms = 1024

  /** Restrict `df` (any relation with a `term` column) to `terms`, picking
    * the literal or relation form by [[MaxLiteralTerms]] (overridable for
    * specs). Both forms are row-identical by construction. */
  private[graft] def restrictTerms(s: SparkSession, df: DataFrame,
                                   terms: Seq[String],
                                   maxLiteral: Int = MaxLiteralTerms): DataFrame = {
    val ts = terms.distinct
    if (ts.size <= maxLiteral) df.filter(col("term").isin(ts: _*))
    else {
      import s.implicits._
      df.join(broadcast(ts.toDF("term")), Seq("term"), "left_semi")
    }
  }

  /** Queried slice of the impact index: `terms` must cover `queries`' term
    * column; the restriction is [[restrictTerms]] (plan-time literal filter
    * with file skipping for bounded workloads, broadcast semi-join past the
    * threshold); the probe never touches corpus text or statistics. */
  private def partsFromRoot(s: SparkSession, root: String, queries: DataFrame,
                            terms: Seq[String]): DataFrame =
    restrictTerms(s, graft.ops.SnapshotTable.read(s, s"$root/impacts"), terms)
      .join(broadcast(queries), Seq("term"))
      .select("q_id", "doc_id", "part")

  private def partsFromIndex(s: SparkSession, dir: String, queries: DataFrame,
                             terms: Seq[String]): DataFrame =
    partsFromRoot(s, bm25IndexBuild(s, dir), queries, terms)

  /** PROBE against an explicit index root (the incremental-maintenance
    * path, where the index is an ingested artifact rather than a build
    * over a static corpus directory). */
  def bm25TopKIndexedAt(s: SparkSession, indexRoot: String, queries: DataFrame,
                        terms: Seq[String], k: Int = 5): DataFrame =
    rankTail(partsFromRoot(s, indexRoot, queries, terms), k)

  /** PROBE step: BM25 top-k from the persisted impact index. The partial
    * values and ranking tail are shared with [[bm25TopK]], so both paths
    * return identical rows. */
  def bm25TopKIndexed(s: SparkSession, dir: String, queries: DataFrame,
                      terms: Seq[String], k: Int = 5): DataFrame =
    rankTail(partsFromIndex(s, dir, queries, terms), k)

  /** BATCH probe: same scored set, ranked by a k-bounded heap Aggregator
    * instead of a window — for workloads of thousands of queries where the
    * scored relation is |q| × avg-df rows, sorting entire per-query
    * partitions is the bottleneck; the heap keeps O(k) per group per
    * partition and merges map-side. Ordering parity with [[rankTail]]:
    * (score desc, doc_id asc), compared on the double image of the
    * DECIMAL(28,12) score (granularity 1e-12 ≫ double ulp at these
    * magnitudes, so distinct decimals never collide). */
  def bm25TopKBatch(s: SparkSession, dir: String, queries: DataFrame,
                    terms: Seq[String], k: Int = 5): DataFrame =
    heapRank(s, partsFromIndex(s, dir, queries, terms), k)

  /** The heap ranking tail shared by every batch probe: sum partials per
    * (query, doc), rank with the k-bounded heap. */
  private def heapRank(s: SparkSession, parts: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    val scored = parts
      .groupBy("q_id", "doc_id").agg(sum(col("part")).as("score"))
      .select(col("q_id"), col("doc_id"), col("score").cast("double").as("score"))
      .as[(Long, Long, Double)]
    val agg = new graft.functions.TopKByScoreAggregator(k).toColumn
    scored.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("topk"))
      .flatMap { case (qId, top) =>
        top.zipWithIndex.map { case ((docId, score), i) =>
          (qId, (i + 1).toLong, docId, score)
        }
      }
      .toDF("q_id", "rank", "doc_id", "score")
      // same round-on-double projection as rankTail — bit-identical output
      .select(col("q_id"), col("rank"), col("doc_id"),
        round(col("score"), 6).as("bm25"))
      .orderBy("q_id", "rank")
  }

  // ---------------------------------------------------------------------
  // Max-score pruned batch probe — the Turtle & Flood (1995) max-score
  // bound re-expressed as a staged Spark plan. Exact BM25 cost is
  // Σ_q Σ_{t∈q} df(t) scored partials; for the workloads retrieval
  // actually serves (a stopword or two glued to rare discriminative
  // terms) almost all of that sum is stopword postings that can never
  // change the top-k. The pruned probe skips them:
  //
  //   1. SEED:   θ(q) = the k-th largest single-term impact of q's
  //              best-bounded term with df ≥ k. Each of those k docs has
  //              true score ≥ its seed partial (partials are nonnegative),
  //              so θ(q) is a LOWER bound on q's true k-th best score.
  //   2. PRUNE:  sort q's term instances by the indexed per-term maximum
  //              impact maxw(t) ascending; drop the maximal prefix whose
  //              Σ maxw stays strictly below θ. A doc containing ONLY
  //              dropped terms scores ≤ that Σ < θ ≤ true k-th score, so
  //              it cannot displace any top-k member — dropping it is
  //              EXACT, not approximate.
  //   3. CANDIDATES: docs with ≥1 essential (kept) term — read from the
  //              essential terms' postings only; the stopword posting
  //              lists are never scanned here (plan-time isin pushdown
  //              into the term-clustered index).
  //   4. RESCORE: full partials (all query terms, stopwords included) for
  //              candidate docs only — the big posting lists are cut to
  //              |candidates| by a broadcast doc_id join before any
  //              shuffle — then the same heap ranking tail.
  //
  // Driver-side state is O(workload), never O(corpus): the per-term
  // (df, maxw) metadata for queried terms, the query relation itself, and
  // one θ per query — same discipline as the ANN tier's centroid collects.
  // ---------------------------------------------------------------------

  /** PRUNE step (pure, unit-tested): keep the minimal suffix of `terms`
    * (instances sorted by maxw ascending) whose dropped-prefix Σ maxw
    * stays strictly below `theta`; the highest-maxw instance is never
    * dropped. Returns the set of term names with ≥1 kept instance. */
  private[graft] def essentialTerms(terms: Seq[(String, Double)],
                                  theta: Double): Set[String] = {
    val asc = terms.sortBy { case (t, w) => (w, t) }
    var cum = 0.0
    var i = 0
    while (i < asc.size - 1 && cum + asc(i)._2 < theta) { cum += asc(i)._2; i += 1 }
    asc.drop(i).map(_._1).toSet
  }

  /** The driver-planned pruning decision: per-query essential term sets
    * plus the metadata needed to size the candidate relations. */
  private[graft] case class PrunePlan(byQ: Map[Long, Seq[String]],
                                    statsMap: Map[String, (Long, Double)],
                                    essential: Map[Long, Set[String]]) {
    /** True iff some corpus-present term was dropped somewhere. */
    def prunesAnything: Boolean = byQ.exists { case (q, ts) =>
      ts.toSet.intersect(statsMap.keySet) != essential(q).intersect(statsMap.keySet)
    }
    /** Σ essential df over (query, term) pairs — a driver-known upper
      * bound on the |candidates| (q_id, doc_id) relation. */
    def candBound: Long = essential.valuesIterator.map(
      _.iterator.map(t => statsMap.get(t).map(_._1).getOrElse(0L)).sum).sum
    /** Σ df over DISTINCT essential terms — the (tighter) upper bound on
      * the distinct candidate doc_id set, which is what decides whether
      * the doc-side broadcast cut is safe. */
    def candDocsBound: Long = essential.valuesIterator.flatten.toSet
      .iterator.map((t: String) => statsMap.get(t).map(_._1).getOrElse(0L)).sum
  }

  /** SEED + PRUNE steps (driver-side planning; O(workload) collects only —
    * the per-term metadata, the query relation, one θ per query). */
  private[graft] def prunePlan(s: SparkSession, dir: String, queries: DataFrame,
                             terms: Seq[String], k: Int): PrunePlan = {
    import graft.ops.SnapshotTable
    import s.implicits._
    val root = bm25IndexBuild(s, dir)

    // Pruning metadata for the queried terms: O(|workload terms|) rows.
    val statsMap: Map[String, (Long, Double)] =
      restrictTerms(s, SnapshotTable.read(s, s"$root/termstats"), terms)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2).doubleValue))
        .toMap
    val byQ: Map[Long, Seq[String]] = queries
      .select(col("q_id").cast("long"), col("term"))
      .as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

    // (1) SEED: one high-bound, df>=k term per query; θ(q) = k-th largest
    // of that term's impacts (valid only when the full k exist).
    val seeds: Map[Long, String] = byQ.flatMap { case (q, ts) =>
      val eligible = ts.distinct
        .flatMap(t => statsMap.get(t).collect { case (df, mw) if df >= k => (t, mw) })
      if (eligible.isEmpty) None
      else Some(q -> eligible.maxBy { case (t, mw) => (mw, t) }._1)
    }
    val thetas: Map[Long, Double] =
      if (seeds.isEmpty) Map.empty
      else {
        val seedDf = seeds.toSeq.toDF("q_id", "term")
        val seedTerms = seeds.values.toSeq.distinct
        val agg = new graft.functions.TopKByScoreAggregator(k).toColumn
        restrictTerms(s, SnapshotTable.read(s, s"$root/impacts"), seedTerms)
          .join(broadcast(seedDf), Seq("term"))
          .select(col("q_id"), col("doc_id"), col("part").cast("double").as("w"))
          .as[(Long, Long, Double)]
          .groupByKey(_._1).mapValues(r => (r._2, r._3))
          .agg(agg.name("topk"))
          .collect()
          .collect { case (q, top) if top.size == k => q -> top.last._2 }
          .toMap
      }

    // (2) PRUNE. The 1e-9 margin absorbs the decimal→double image and the
    // driver-side double accumulation (both ≤1e-12 at these magnitudes) —
    // it can only WEAKEN pruning, never break exactness.
    val essential: Map[Long, Set[String]] = byQ.map { case (q, ts) =>
      val theta = thetas.getOrElse(q, 0.0) - 1e-9
      val withW = ts.map(t => t -> statsMap.get(t).map(_._2).getOrElse(0.0))
      q -> essentialTerms(withW, theta)
    }
    PrunePlan(byQ, statsMap, essential)
  }

  /** Exact BM25 top-k with max-score pruning (see block comment above).
    * Returns rows identical to [[bm25TopKBatch]] — pruning only removes
    * docs whose score is strictly below the k-th best. `queries` must be a
    * workload-sized relation: it is collected ONCE to plan the pruning, and
    * the rescore plan is rebuilt FROM those collected rows (never from the
    * incoming DataFrame), so a non-deterministic `queries` (a sample, an
    * unordered limit) cannot make the θ/essential planning and the executed
    * rescore see different workloads — the exactness guarantee binds to the
    * one snapshot the driver saw (ADVICE r8). */
  def bm25TopKPrunedBatch(s: SparkSession, dir: String, queries: DataFrame,
                          terms: Seq[String], k: Int = 5): DataFrame = {
    import graft.ops.SnapshotTable
    import s.implicits._
    val root = bm25IndexBuild(s, dir)
    def impacts = SnapshotTable.read(s, s"$root/impacts")

    val plan = prunePlan(s, dir, queries, terms, k)
    // The ONE workload snapshot: every downstream join uses this relation,
    // rebuilt from the rows prunePlan collected.
    val queriesExec = plan.byQ.toSeq
      .flatMap { case (q, ts) => ts.map(q -> _) }.toDF("q_id", "term")
    val essential = plan.essential
    if (!plan.prunesAnything)
      return heapRank(s, partsFromIndex(s, dir, queriesExec, terms), k)

    // (3) CANDIDATES from essential postings only.
    val essDf = essential.toSeq
      .flatMap { case (q, es) => es.map(q -> _) }.toDF("q_id", "term")
    val essTerms = essential.values.flatten.toSeq.distinct
    val cand = restrictTerms(s, impacts, essTerms)
      .join(broadcast(essDf), Seq("term"))
      .select("q_id", "doc_id").distinct()
    // Driver-known candidate bounds (from Σ essential df) decide the
    // broadcast hints BEFORE running anything — no size guessing at scale.
    val candDocs0 = cand.select("doc_id").distinct()
    val candDocs =
      if (plan.candDocsBound <= 4000000L) broadcast(candDocs0) else candDocs0
    val candForSemi = if (plan.candBound <= 2000000L) broadcast(cand) else cand

    // (4) RESCORE candidates over the FULL term set; the doc_id join cuts
    // the stopword postings before the (q,doc) shuffle.
    val rescoreParts = restrictTerms(s, impacts, terms)
      .join(candDocs, Seq("doc_id"))
      .join(broadcast(queriesExec), Seq("term"))
      .join(candForSemi, Seq("q_id", "doc_id"), "left_semi")
      .select("q_id", "doc_id", "part")
    heapRank(s, rescoreParts, k)
  }

  /** Fixture lineage for the registered incremental query: the corpus
    * ingested as two exactly-once drops (split on doc_id parity) with the
    * second drop deliberately REPLAYED — the final refreshed index must
    * equal a cold build over the whole corpus, which is what the shared
    * DuckDB oracle checks. Memoized per corpus content version. */
  private def incrementalRoot(s: SparkSession, dir: String): String = synchronized {
    val vdir = s"$dir@${Similarity.corpusVersion(dir, "documents")}#inc1"
    indexRoots.getOrElseUpdate(vdir, {
      import graft.ops.SnapshotTable
      val tag = vdir.replaceAll("[^a-zA-Z0-9]", "_")
      val root = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft-bm25-$tag").getAbsolutePath
      if (SnapshotTable.currentVersion(s, s"$root/impacts").isEmpty ||
          SnapshotTable.currentVersion(s, s"$root/termstats").isEmpty) {
        val d = docs(s, dir)
        bm25PostingsAppend(s, root, d.filter(pmod(col("doc_id"), lit(2)) === 0), 0L)
        bm25PostingsAppend(s, root, d.filter(pmod(col("doc_id"), lit(2)) === 1), 1L)
        // replayed drop: the batchId stamp must swallow it
        bm25PostingsAppend(s, root, d.filter(pmod(col("doc_id"), lit(2)) === 1), 1L)
        bm25ImpactsRefresh(s, root)
      }
      root
    })
  }

  private def queriesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    queryTerms.toDF("q_id", "term")
  }

  private val queryValues: String =
    queryTerms.map { case (q, t) => s"($q, '$t')" }.mkString(", ")

  val qs: Seq[Q] = Seq(

    // Okapi BM25 ranked retrieval: top-5 documents per query, scored over
    // the whole corpus with k1=1.2, b=0.75.
    Q("x_text_bm25",
      (s, dir) => bm25TopK(s, docs(s, dir), queriesDf(s), k = 5),
      Some(bm25OracleSql)),

    // Same workload through the persisted inverted index (build/probe
    // split) — identical rows by construction, so it shares the oracle.
    Q("x_text_bm25_indexed",
      (s, dir) => bm25TopKIndexed(s, dir, queriesDf(s),
        queryTerms.map(_._2).distinct, k = 5),
      Some(bm25OracleSql)),

    // Batch-probe shape: identical scored set, ranked by the k-bounded
    // heap Aggregator instead of a per-query window sort — the plan shape
    // for thousand-query workloads. Shares the oracle (rows are identical
    // by the ordering-parity argument on [[bm25TopKBatch]]).
    Q("x_text_bm25_batch",
      (s, dir) => bm25TopKBatch(s, dir, queriesDf(s),
        queryTerms.map(_._2).distinct, k = 5),
      Some(bm25OracleSql)),

    // Max-score pruned probe: exact top-k (pruning removes only docs
    // provably below the k-th best score), so it shares the oracle too.
    // On the stopword-dense fixture the bound rarely fires — the hash gate
    // here pins the θ/candidate/rescore plumbing; the Zipf-workload win is
    // measured in SCALE.md and the pruning itself is spec-pinned.
    Q("x_text_bm25_pruned",
      (s, dir) => bm25TopKPrunedBatch(s, dir, queriesDf(s),
        queryTerms.map(_._2).distinct, k = 5),
      Some(bm25OracleSql)),

    // Incrementally-maintained index: corpus ingested as two exactly-once
    // drops (one deliberately replayed), impacts re-derived from postings
    // with no text in the refresh plan. The refreshed index must be
    // bit-identical to a cold build, so it shares the oracle.
    Q("x_text_bm25_incremental",
      (s, dir) => bm25TopKIndexedAt(s, incrementalRoot(s, dir), queriesDf(s),
        queryTerms.map(_._2).distinct, k = 5),
      Some(bm25OracleSql)),

    // Streamed index maintenance, batch twin: probe-after-every-drop. The
    // per-stage results differ BECAUSE the corpus statistics (n_docs, df,
    // avgdl) shift with each drop — the oracle recomputes full BM25 over
    // each stage's corpus, so the gate pins exactly that statistics fold.
    // graft.streaming.Streams.bm25IndexIngestSink is the streaming form;
    // RetrievalStreamSpec pins streaming ≡ this twin per micro-batch.
    Q("st_text_bm25_ingest",
      (s, dir) => bm25IngestTwoDropTwin(s, dir, k = 5),
      Some(bm25StagedOracleSql))
  )

  /** BATCH TWIN of the streamed BM25 index maintenance
    * ([[graft.streaming.Streams.bm25IndexIngestSink]]): the corpus arrives
    * as two drops (doc_id parity split, drop 2 completing the corpus) and
    * the SAME query workload is probed after each refresh. Stage-1 rows are
    * scored against stage-1 statistics (n_docs, df, avgdl of the half
    * corpus) — the whole point of the per-drop refresh — so the two stages
    * rank differently and the oracle recomputes both corpora from scratch. */
  def bm25IngestTwoDropTwin(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val all = docs(s, dir)
    val drop1 = all.filter(pmod(col("doc_id"), lit(2)) === 0)
    bm25TopK(s, drop1, queriesDf(s), k).withColumn("stage", lit(1L))
      .unionByName(bm25TopK(s, all, queriesDf(s), k).withColumn("stage", lit(2L)))
      .select("stage", "q_id", "rank", "doc_id", "bm25")
      .orderBy("stage", "q_id", "rank")
  }

  private lazy val bm25OracleSql: String = bm25SqlOver("TRUE")

  /** The staged-ingest oracle: full BM25 recomputed over each stage's
    * corpus (stage 1 = even doc_ids, stage 2 = everything), unioned with a
    * stage tag — the SQL image of [[bm25IngestTwoDropTwin]]. */
  private lazy val bm25StagedOracleSql: String =
    s"""SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS stage, s1.* FROM (
       |${bm25SqlOver("doc_id % 2 = 0")}) s1
       |  UNION ALL
       |  SELECT CAST(2 AS BIGINT) AS stage, s2.* FROM (
       |${bm25SqlOver("TRUE")}) s2
       |) ORDER BY stage ASC, q_id ASC, rank ASC""".stripMargin

  /** The complete BM25 computation as self-contained SQL over
    * `documents WHERE pred` — one text shared by the plain oracle
    * (pred=TRUE, used by all five single-corpus queries), each stage of
    * the ingest oracle, and the hybrid-fusion oracle's lexical leg
    * (`k` widens the per-query rank cut for fusion legs), so every gate
    * checks the same math. */
  private[ext] def bm25SqlOver(pred: String, k: Int = 5): String =
    s"""WITH q(q_id, term) AS (VALUES $queryValues),
              d AS (SELECT doc_id,
                    string_split_regex(trim(lower(text)), '\\s+') AS toks
                    FROM documents WHERE $pred),
              lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS len_d FROM d),
              stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                        CAST(sum(len_d) AS DOUBLE) / count(*) AS avgdl FROM lens),
              tf AS (SELECT doc_id, t.term, CAST(count(*) AS BIGINT) AS cnt
                     FROM d, unnest(toks) AS t(term)
                     WHERE t.term IN (SELECT DISTINCT term FROM q)
                     GROUP BY 1, 2),
              dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
              scored AS (SELECT q.q_id, tf.doc_id,
                         CAST(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                              * (cnt * ${K1 + 1.0})
                              / (cnt + $K1 * (${1.0 - B} + $B * len_d / avgdl))
                              AS DECIMAL(28,12)) AS part
                         FROM q
                         JOIN tf ON tf.term = q.term
                         JOIN dfq ON dfq.term = q.term
                         JOIN lens ON lens.doc_id = tf.doc_id
                         CROSS JOIN stats),
              agg AS (SELECT q_id, doc_id, sum(part) AS score
                      FROM scored GROUP BY 1, 2),
              rk AS (SELECT q_id, doc_id, score,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY score DESC, doc_id ASC) AS rank
                     FROM agg)
              SELECT q_id, CAST(rank AS BIGINT) AS rank, doc_id,
                     round(CAST(score AS DOUBLE), 6) AS bm25
              FROM rk WHERE rank <= $k
              ORDER BY q_id ASC, rank ASC"""
}
