package graft.ext

import graft.Tables
import graft.ops.Q
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hybrid retrieval: reciprocal-rank fusion (RRF — Cormack, Clarke &
  * Buettcher 2009, the fusion behind Elasticsearch/Vespa hybrid search) of
  * a LEXICAL leg (BM25 over the [[Retrieval]] impact index) and a DENSE leg
  * (embedding cosine over the [[Similarity]] tier). Modern training-data
  * mining runs exactly this shape — lexical recall catches keyword/entity
  * matches dense models miss, dense recall catches paraphrases lexical
  * scoring misses — and RRF needs only the two legs' RANKS:
  *
  *   rrf(d) = Σ_leg 1 / (K + rank_leg(d)),   K = 60 (the paper's constant)
  *
  * which makes it exactly engine-portable: ranks are integers (each leg's
  * ordering is already bit-stable across Spark and DuckDB — DECIMAL
  * partial-sum BM25, rounded cosine, doc_id tie-breaks), and the fused
  * score is a two-term double expression with no data-dependent fold order.
  *
  * Scale shape: each leg is an already-scale-shaped probe (the BM25 leg
  * reads term-clustered postings, never text; the dense leg here is the
  * brute-force baseline and swaps for [[Similarity.ivfTopKAll]] /
  * [[ProductQuant.ivfadcTopKAll]] unchanged — [[rrfFuse]] takes the legs
  * as relations and only ever touches 2 × |queries| × kLeg rank rows, so
  * the fusion itself is workload-sized, never corpus-sized).
  */
object HybridRetrieval {

  /** The paper's K: dampens the head so a #1 in one leg cannot drown a
    * consistent #3/#4 in both. */
  private val RrfK = 60

  /** Per-leg rank cut: fusion sees each leg's top `LegK`. */
  private val LegK = 20

  /** Fuse two (q_id, doc_id, rank) relations by reciprocal-rank fusion.
    * A document missing from a leg contributes 0 from that leg (the
    * standard convention). Deterministic total order: fused score desc,
    * doc_id asc. Output: (q_id, rank, doc_id, rrf round 6). */
  def rrfFuse(text: DataFrame, dense: DataFrame, k: Int,
              rrfK: Int = RrfK): DataFrame = {
    val t = text.select(col("q_id"), col("doc_id"), col("rank").as("trank"))
    val d = dense.select(col("q_id"), col("doc_id"), col("rank").as("drank"))
    val fused = t.join(d, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf_raw",
        coalesce(lit(1.0) / (lit(rrfK) + col("trank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(rrfK) + col("drank")), lit(0.0)))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf_raw").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"), col("doc_id"),
        round(col("rrf_raw"), 6).as("rrf"))
      .orderBy("q_id", "rank")
  }

  /** Fixture query workload: the [[Retrieval.queryTerms]] text queries
    * paired with a dense query vector each (embedding of vec_id = 10·q_id;
    * documents.doc_id and embeddings.vec_id are the parallel corpus ids).
    * Mirrored verbatim in the oracle's VALUES clause. */
  private val qVecMap: Seq[(Long, Long)] = Seq(1L -> 10L, 2L -> 20L, 3L -> 30L)

  /** Exact dense leg: per-query cosine rank over the embeddings corpus —
    * the brute-force baseline ([[Similarity.bruteTopK]]'s shape batched
    * over the workload). Rank on the ROUNDED sim (6 dp) with vec_id
    * tie-break, the tier's engine-portability idiom. */
  private def denseLeg(s: SparkSession, dir: String, kLeg: Int): DataFrame = {
    import s.implicits._
    val emb = Tables(s, dir, "embeddings")
    val qe = emb.join(broadcast(qVecMap.toDF("q_id", "qvec_id")),
        col("vec_id") === col("qvec_id"))
      .select(col("q_id"), col("embedding").as("qemb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    emb.crossJoin(broadcast(qe))
      .withColumn("sim", round(Similarity.cosine(col("embedding"), col("qemb")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kLeg)
      .select(col("q_id"), col("vec_id").as("doc_id"), col("rank"))
  }

  /** The registered lineage: BM25 index probe (top-[[LegK]]) ⊕ exact dense
    * cosine (top-[[LegK]]) → RRF top-`k`. */
  def hybridTopK(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import s.implicits._
    val text = Retrieval.bm25TopKIndexed(s, dir,
      Retrieval.queryTerms.toDF("q_id", "term"),
      Retrieval.queryTerms.map(_._2).distinct, k = LegK)
    rrfFuse(text, denseLeg(s, dir, LegK), k)
  }

  private val qVecValues: String =
    qVecMap.map { case (q, v) => s"($q, $v)" }.mkString(", ")

  /** DuckDB image: the BM25 SQL (shared text, rank ≤ LegK) as the lexical
    * leg, list-fold cosine (rounded 6 dp, vec_id tie-break) as the dense
    * leg, fused by the same two-term RRF expression. `1.0` literals are
    * cast to DOUBLE — DuckDB decimal-literal division would otherwise
    * compute in DECIMAL and drift from Spark's double. */
  private lazy val hybridOracleSql: String = {
    val cos =
      """(list_sum(list_transform(list_zip(e.embedding, qe.qemb),
        |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |  / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |   * sqrt(list_sum(list_transform(qe.qemb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))""".stripMargin
    s"""WITH bm AS (SELECT q_id, doc_id, rank AS trank FROM (
       |${Retrieval.bm25SqlOver("TRUE", k = LegK)}
       |  ) ),
       |  qmap(q_id, qvec_id) AS (VALUES $qVecValues),
       |  qe AS (SELECT qmap.q_id, e.embedding AS qemb
       |         FROM embeddings e JOIN qmap ON e.vec_id = qmap.qvec_id),
       |  dsim AS (SELECT qe.q_id, e.vec_id AS doc_id,
       |                  round($cos, 6) AS sim
       |           FROM embeddings e CROSS JOIN qe),
       |  dn AS (SELECT q_id, doc_id,
       |                row_number() OVER (PARTITION BY q_id
       |                                   ORDER BY sim DESC, doc_id ASC) AS drank
       |         FROM dsim QUALIFY drank <= $LegK),
       |  fused AS (SELECT coalesce(bm.q_id, dn.q_id) AS q_id,
       |                   coalesce(bm.doc_id, dn.doc_id) AS doc_id,
       |                   coalesce(CAST(1.0 AS DOUBLE) / ($RrfK + bm.trank), 0.0)
       |                 + coalesce(CAST(1.0 AS DOUBLE) / ($RrfK + dn.drank), 0.0)
       |                   AS rrf_raw
       |            FROM bm FULL OUTER JOIN dn
       |              ON bm.q_id = dn.q_id AND bm.doc_id = dn.doc_id),
       |  rk AS (SELECT q_id, doc_id, rrf_raw,
       |                row_number() OVER (PARTITION BY q_id
       |                                   ORDER BY rrf_raw DESC, doc_id ASC) AS rank
       |         FROM fused)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, doc_id,
       |       round(rrf_raw, 6) AS rrf
       |FROM rk WHERE rank <= 5
       |ORDER BY q_id ASC, rank ASC""".stripMargin
  }

  val qs: Seq[Q] = Seq(
    // Hybrid lexical ⊕ dense retrieval fused by RRF: the oracle recomputes
    // both legs from scratch and fuses with the identical expression, so
    // the hash gate pins leg ranks AND the fusion arithmetic.
    Q("x_retrieval_hybrid_rrf",
      (s, dir) => hybridTopK(s, dir, k = 5),
      Some(hybridOracleSql))
  )
}
