package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 contract on a planted corpus: scores equal an independent plain-Scala
  * re-derivation of the Okapi formula (to the 6-decimal projection), ranking
  * is score-desc with doc_id-asc tiebreak (pinned by a planted duplicate
  * document pair), and the postings build is term-restricted (semi join)
  * rather than a full-vocabulary aggregation. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpusRows = Seq(
    (1L, "alpha alpha alpha beta"),
    (2L, "alpha gamma delta epsilon zeta eta theta iota"),
    (3L, "beta beta gamma gamma"),
    (4L, "noise noise noise noise noise noise"),
    (5L, "alpha beta"),
    (6L, "alpha beta")) // exact duplicate of 5: same score, tiebreak on id

  private val query = Seq((1L, "alpha"), (1L, "beta"))

  /** Independent reference scorer: same formula, plain collections. */
  private def referenceBm25(k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val toks = corpusRows.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val n = toks.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val terms = query.map(_._2).distinct
    val df = terms.map(t => t -> toks.count(_._2.contains(t))).toMap
    toks.flatMap { case (id, ts) =>
      val score = terms.map { t =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0) BigDecimal(0)
        else {
          val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
          BigDecimal(idf * tf * (k1 + 1.0) /
            (tf + k1 * (1.0 - b + b * ts.size / avgdl)))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }
      }.sum
      if (score == 0) None
      else Some(id -> score.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("bm25 scores match an independent re-derivation; ties break on doc_id") {
    val corpus = corpusRows.toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(spark, corpus, query.toDF("q_id", "term"), k = 10)
      .collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"), r.getAs[Double]("bm25")))

    val ref = referenceBm25()
    // Expected order: score desc, doc_id asc. Docs 5 and 6 are identical
    // texts, so their scores are equal and id order must decide.
    val expected = ref.toSeq.sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, s), i) => (i + 1L, id, s) }
    assert(out.toSeq == expected, s"got ${out.toSeq}\nexpected $expected")
    val (_, d5, s5) = out.find(_._2 == 5L).get
    val (_, d6, s6) = out.find(_._2 == 6L).get
    assert(s5 == s6 && d5 < d6)
  }

  test("indexed probe equals the scan path; plan reads postings, never text") {
    val dir = tmpDir()
    corpusRows.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val q = query.toDF("q_id", "term")
    val viaScan = Retrieval.bm25TopK(
      spark, spark.read.parquet(s"$dir/documents.parquet"), q, k = 10)
    val viaIndex = Retrieval.bm25TopKIndexed(
      spark, dir, q, Seq("alpha", "beta"), k = 10)
    val got = viaIndex.collect().toSeq
    assert(got == viaScan.collect().toSeq)
    assert(got.nonEmpty)
    val plan = viaIndex.queryExecution.executedPlan.toString
    // term restriction is PUSHED into the clustered postings scan...
    assert(plan.contains("In(term"), s"expected a pushed term filter:\n$plan")
    // ...and the probe never re-tokenizes the corpus
    assert(!plan.toLowerCase.contains("explode"), s"probe tokenized text:\n$plan")

    // the heap-ranked batch probe returns the identical rows (incl. the
    // planted score tie, which must still break toward the smaller doc_id)
    val viaBatch = Retrieval.bm25TopKBatch(spark, dir, q, Seq("alpha", "beta"), k = 10)
    assert(viaBatch.collect().toSeq == got)
  }

  test("postings are restricted by a semi join before aggregation") {
    val corpus = corpusRows.toDF("doc_id", "text")
    val df = Retrieval.bm25TopK(spark, corpus, query.toDF("q_id", "term"), k = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected a semi-joined postings build:\n$plan")
  }
}
