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

  test("essentialTerms drops the maximal low-bound prefix, never the top term") {
    // theta=5: drop 'a'(1)+'b'(2) (cum 3 < 5), keep 'c'(4) because 3+4 >= 5.
    assert(Retrieval.essentialTerms(
      Seq("a" -> 1.0, "b" -> 2.0, "c" -> 4.0, "d" -> 9.0), 5.0) == Set("c", "d"))
    // theta <= 0 (no valid bound): everything essential.
    assert(Retrieval.essentialTerms(
      Seq("a" -> 1.0, "b" -> 2.0), -1e-9) == Set("a", "b"))
    // theta larger than every partial sum: only the top instance survives.
    assert(Retrieval.essentialTerms(
      Seq("a" -> 1.0, "b" -> 2.0, "c" -> 4.0), 100.0) == Set("c"))
    // multiplicity: 'b' appears twice; the prefix walk drops a(1) and the
    // first b(2) (cum 3 < 4) but keeps the second b (3+2 >= 4) — a name
    // with any kept instance stays essential.
    assert(Retrieval.essentialTerms(
      Seq("a" -> 1.0, "b" -> 2.0, "b" -> 2.0, "c" -> 9.0), 4.0) == Set("b", "c"))
  }

  test("max-score pruned probe is exact on a Zipf workload and actually prunes") {
    // A crawl-shaped corpus: every doc carries the stopword; only docs
    // 0..9 carry 'rare' (df=10 >= k). Queries glue the stopword to a rare
    // term — the regime where max-score pruning pays.
    val n = 400
    val rows = (0L until n).map { i =>
      val rare = if (i < 10) " rare" else ""
      val filler = s" filler${i % 7}" * 3
      (i, s"the the the common$filler$rare")
    }
    val dir = tmpDir()
    rows.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val q = Seq((1L, "the"), (1L, "rare"), (2L, "common"), (2L, "rare"))
      .toDF("q_id", "term")
    val terms = Seq("the", "rare", "common")

    val unpruned = Retrieval.bm25TopKBatch(spark, dir, q, terms, k = 5).collect().toSeq
    val pruned = Retrieval.bm25TopKPrunedBatch(spark, dir, q, terms, k = 5)
    val got = pruned.collect().toSeq
    assert(got == unpruned, s"pruned diverged:\n$got\nvs\n$unpruned")

    // The pruning must have FIRED: θ from 'rare' (idf ln(~40) ≈ 3.7 per
    // occurrence) dwarfs the stopwords' maxw (df≈n → idf ≈ ln(1+1/(2n))),
    // so 'the'/'common' must be non-essential and the candidate pass
    // touches only the 10 'rare' postings. Assert on the actual planning
    // decision, not a proxy.
    val plan = Retrieval.prunePlan(spark, dir, q, terms, k = 5)
    assert(plan.prunesAnything, "max-score bound never fired on the Zipf fixture")
    assert(plan.essential(1L) == Set("rare"),
      s"q1 essential set should be {rare}, got ${plan.essential(1L)}")
    assert(plan.essential(2L) == Set("rare"),
      s"q2 essential set should be {rare}, got ${plan.essential(2L)}")
    assert(plan.candBound == 20L, // df(rare)=10 summed over both queries
      s"candidate bound should be 20, got ${plan.candBound}")
    // and the executed rescore plan never re-tokenizes text
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(!planStr.contains("explode"), "pruned probe re-tokenized text")
  }

  test("incremental postings + impact refresh equals the scan path after every drop") {
    val idx = tmpDir()
    val q = query.toDF("q_id", "term")
    val terms = Seq("alpha", "beta")
    val (batchA, batchB) = corpusRows.partition(_._1 <= 4L)

    // Drop 0: first four docs. Refresh folds THEIR df/avgdl.
    Retrieval.bm25PostingsAppend(spark, idx, batchA.toDF("doc_id", "text"), 0L)
    Retrieval.bm25ImpactsRefresh(spark, idx)
    val afterA = Retrieval.bm25TopKIndexedAt(spark, idx, q, terms, k = 10).collect().toSeq
    val scanA = Retrieval.bm25TopK(spark, batchA.toDF("doc_id", "text"), q, k = 10).collect().toSeq
    assert(afterA == scanA, s"post-drop-0 index diverged:\n$afterA\nvs\n$scanA")

    // Drop 1 (+ a deliberate replay that the batchId stamp must swallow),
    // then refresh: statistics shift (n_docs 4→6, df/avgdl change), so
    // EVERY impact changes — the refreshed index must equal a cold scan
    // over the full corpus.
    Retrieval.bm25PostingsAppend(spark, idx, batchB.toDF("doc_id", "text"), 1L)
    Retrieval.bm25PostingsAppend(spark, idx, batchB.toDF("doc_id", "text"), 1L)
    Retrieval.bm25ImpactsRefresh(spark, idx)
    val afterB = Retrieval.bm25TopKIndexedAt(spark, idx, q, terms, k = 10).collect().toSeq
    val scanB = Retrieval.bm25TopK(spark, corpusRows.toDF("doc_id", "text"), q, k = 10).collect().toSeq
    assert(afterB == scanB, s"post-drop-1 index diverged:\n$afterB\nvs\n$scanB")
    assert(afterB != afterA, "drop 1 must shift the statistics and the ranking")

    // the replay appended nothing: postings carry exactly batches 0 and 1
    val lens = graft.ops.SnapshotTable.read(spark, s"$idx/doclens")
    assert(lens.count() == corpusRows.size.toLong,
      "replayed drop double-counted doc lengths")
  }

  test("term restriction: literal and broadcast-semi-join forms are row-identical") {
    val dir = tmpDir()
    corpusRows.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val q = query.toDF("q_id", "term")
    val root = Retrieval.bm25IndexBuild(spark, dir)
    val impacts = graft.ops.SnapshotTable.read(spark, s"$root/impacts")

    // Same term set through both forms of restrictTerms (the threshold is
    // the only difference): rows must be identical, and the large form must
    // plan a broadcast semi-join with NO workload-sized In() literal.
    val ts = Seq("alpha", "beta", "gamma")
    val lit = Retrieval.restrictTerms(spark, impacts, ts, maxLiteral = 1024)
    val viaJoin = Retrieval.restrictTerms(spark, impacts, ts, maxLiteral = 1)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[String]("term"), r.getAs[Long]("doc_id"))
    assert(viaJoin.collect().map(key).sortBy(identity).toSeq ==
      lit.collect().map(key).sortBy(identity).toSeq)
    val joinPlan = viaJoin.queryExecution.executedPlan.toString
    assert(joinPlan.contains("LeftSemi"), s"expected semi join:\n$joinPlan")
    assert(!joinPlan.contains("In(term"), s"literal leaked into join path:\n$joinPlan")

    // End to end: a probe handed a term list far past MaxLiteralTerms
    // (padded with absent terms — a wide-vocabulary batch workload) takes
    // the join path and returns the same rows as the bounded-literal probe.
    val wide = ts ++ (1 to 2000).map(i => s"zzz_absent_$i")
    assert(wide.size > Retrieval.MaxLiteralTerms)
    val narrow = Retrieval.bm25TopKIndexed(spark, dir, q, ts, k = 10)
    val broad = Retrieval.bm25TopKIndexed(spark, dir, q, wide, k = 10)
    assert(broad.collect().toSeq == narrow.collect().toSeq)
    val broadPlan = broad.queryExecution.executedPlan.toString
    assert(!broadPlan.contains("zzz_absent"),
      s"workload-sized literal list serialized into the probe plan")
  }

  test("postings are restricted by a semi join before aggregation") {
    val corpus = corpusRows.toDF("doc_id", "text")
    val df = Retrieval.bm25TopK(spark, corpus, query.toDF("q_id", "term"), k = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected a semi-joined postings build:\n$plan")
  }
}
