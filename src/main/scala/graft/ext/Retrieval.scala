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
    * vocabulary (mirrored verbatim in the oracle's VALUES clause). */
  private val queryTerms: Seq[(Long, String)] = Seq(
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
    val vdir = s"$dir@${Similarity.corpusVersion(dir, "documents")}#v2"
    indexRoots.getOrElseUpdate(vdir, {
      import graft.ops.SnapshotTable
      val tag = vdir.replaceAll("[^a-zA-Z0-9]", "_")
      val root = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft-bm25-$tag").getAbsolutePath
      if (SnapshotTable.currentVersion(s, s"$root/impacts").isEmpty) {
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
          .join(broadcast(dfq), Seq("term"))
          .join(lens, Seq("doc_id"))
          .crossJoin(broadcast(stats))
          .withColumn("part", impactExpr)
          .select("term", "doc_id", "part")
        SnapshotTable.commitClustered(s, s"$root/impacts", impacts,
          clusterBy = Seq("term"), numFiles = 8)
      }
      root
    })
  }

  /** Queried slice of the impact index: `terms` must cover `queries`' term
    * column and is known at plan time, so the restriction is an `isin`
    * FILTER (pushed into the clustered scan — file/row-group skipping),
    * not a join; the probe never touches corpus text or statistics. */
  private def partsFromIndex(s: SparkSession, dir: String, queries: DataFrame,
                             terms: Seq[String]): DataFrame = {
    import graft.ops.SnapshotTable
    val root = bm25IndexBuild(s, dir)
    SnapshotTable.read(s, s"$root/impacts")
      .filter(col("term").isin(terms: _*))
      .join(broadcast(queries), Seq("term"))
      .select("q_id", "doc_id", "part")
  }

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
                    terms: Seq[String], k: Int = 5): DataFrame = {
    import s.implicits._
    val scored = partsFromIndex(s, dir, queries, terms)
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
      Some(bm25OracleSql))
  )

  private lazy val bm25OracleSql: String =
    s"""WITH q(q_id, term) AS (VALUES $queryValues),
              d AS (SELECT doc_id,
                    string_split_regex(trim(lower(text)), '\\s+') AS toks
                    FROM documents),
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
              FROM rk WHERE rank <= 5
              ORDER BY q_id ASC, rank ASC"""
}
