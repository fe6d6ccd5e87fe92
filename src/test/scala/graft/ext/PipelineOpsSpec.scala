package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases for the round-3 pipeline ops (the oracle gate covers the
  * corpus-level results; these pin the boundaries). */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("chunking: boundaries, overlap, and the empty/short-doc guard") {
    val docs = Seq(
      (1L, ""),                      // empty -> one empty chunk, no crash
      (2L, "x" * 100),               // shorter than one chunk
      (3L, "y" * 200),               // exactly one chunk
      (4L, "z" * 201),               // one char past -> second chunk
      (5L, "w" * 500)                // three chunks (stride 150)
    ).toDF("doc_id", "text")
    val out = PipelineOps.chunk(docs, size = 200, overlap = 50)
      .select("doc_id", "chunk_id", "chunk")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(out(1L) == Seq(""))
    assert(out(2L) == Seq("x" * 100))
    assert(out(3L) == Seq("y" * 200))
    assert(out(4L).size == 2 && out(4L)(0) == "z" * 200 && out(4L)(1) == "z" * 51)
    assert(out(5L).size == 3)
    // overlap: consecutive chunks share the 50-char tail/head
    assert(out(5L)(0).takeRight(50) == out(5L)(1).take(50))
    // full coverage: stitching chunks minus overlaps rebuilds the doc
    assert(out(5L).head + out(5L).tail.map(_.drop(50)).mkString == "w" * 500)
  }

  test("pii scrub redacts and counts without touching clean text") {
    val df = Seq(
      (1L, "mail me at a.b+c@ex-ample.org or call 415-555-1234 now"),
      (2L, "no pii here, just text @ home with 123 numbers")
    ).toDF("doc_id", "t")
    val out = PipelineOps.piiScrub(df, "t")
      .select("doc_id", "n_emails", "n_phones", "scrubbed")
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1 && out(1L)._3 == 1)
    assert(out(1L)._4 == "mail me at <EMAIL> or call <PHONE> now")
    assert(out(2L)._2 == 0 && out(2L)._3 == 0)
    assert(out(2L)._4 == "no pii here, just text @ home with 123 numbers")
  }

  test("repetition signals: hand-computed fractions on known shapes") {
    val df = Seq(
      (1L, "a b a b a b"),            // 2-grams: [a b, b a, a b, b a, a b] -> top 'a b' 3/5; 3-grams: [aba,bab,aba,bab] all dup -> 4/4
      (2L, "w x y z"),                // all 2-/3-grams unique -> 1/3, 0
      (3L, "solo"),                   // <2 tokens -> both 0
      (4L, "q q q q q"))              // single repeated token -> 4/4, 3/3
      .toDF("doc_id", "text")
    val dir = tmpDir()
    df.write.parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("x_text_repetition")(spark, dir)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (0.6, 1.0))
    assert(out(2L) == (math.BigDecimal(1.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, 0.0))
    assert(out(3L) == (0.0, 0.0))
    assert(out(4L) == (1.0, 1.0))
  }

  test("weighted sampling: deterministic, integer-exact, rate-ordered") {
    val out = graft.SparkEntry.queries("x_sample_weighted")(spark, sf)
      .as[(Long, String, Long)].collect()
    // every kept row satisfies its own source's threshold
    val rate = Map("src0" -> 1000000L, "src1" -> 750000L, "src2" -> 500000L)
      .withDefaultValue(250000L)
    out.foreach { case (id, src, u) => assert(u < rate(src), s"doc $id u=$u src=$src") }
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    // src0 keeps ALL its docs (rate 1.0); the 25% tail keeps fewer than src1
    val total = graft.Tables(spark, sf, "documents")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("src0") == total("src0"))
    assert(bySrc("src1") < total("src1") && bySrc("src1") > bySrc("src3"))
    // determinism: a re-run yields the identical sample
    val again = graft.SparkEntry.queries("x_sample_weighted")(spark, sf)
      .as[(Long, String, Long)].collect()
    assert(out.toSeq == again.toSeq)
  }

  test("split assignment: exhaustive, disjoint, stable, ~80/10/10") {
    val out = graft.SparkEntry.queries("x_split_assign")(spark, sf)
      .as[(Long, String)].collect()
    val total = graft.Tables(spark, sf, "documents").count()
    assert(out.length == total)                          // every doc assigned
    assert(out.map(_._1).distinct.length == out.length)  // exactly one split each
    val frac = out.groupBy(_._2).view.mapValues(_.length.toDouble / total).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, s"frac=$frac")
    assert(frac("val") > 0.04 && frac("val") < 0.16, s"frac=$frac")
    assert(frac("test") > 0.04 && frac("test") < 0.16, s"frac=$frac")
    // stability: pure function of doc_id — a re-run reproduces the assignment
    val again = graft.SparkEntry.queries("x_split_assign")(spark, sf)
      .as[(Long, String)].collect()
    assert(out.toSeq == again.toSeq)
  }

  test("adaptive mean filter keeps exactly the at-or-above-average docs") {
    val df = Seq(
      (1L, "one"),                       // 1 token
      (2L, "two words"),                 // 2
      (3L, "three tokens right here"),   // 4 -> mean (1+2+4+9)/4 = 4
      (4L, "a b c d e f g h i"))         // 9
      .toDF("doc_id", "text")
    val dir = tmpDir()
    df.write.parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("x_text_adaptive_filter")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(3L -> 4L, 4L -> 9L)) // 4*4 >= 16 keeps the boundary doc
  }

  test("sequence packing: bins respect the running-token capacity formula") {
    val out = graft.SparkEntry.queries("x_pack_greedy_bins")(spark, sf)
      .as[(Long, Long, Long)].collect()
    // bins are non-decreasing in doc order and derived from the prefix sum
    var cum = 0L
    out.foreach { case (_, tok, bin) =>
      assert(bin == cum / 512, s"bin mismatch at cum=$cum tok=$tok")
      cum += tok
    }
    assert(out.map(_._3).distinct.length > 1, "expected multiple bins")
  }

  test("fixed-k sample: exactly the bottom-100 hash keys, stable under re-run") {
    val r = graft.SparkEntry.queries("x_sample_fixed_k")(spark, sf)
      .select("doc_id", "k").as[(Long, Long)].collect()
    assert(r.length == 100)
    // Exactly the 100 smallest keys of the full corpus.
    val all = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"),
        graft.functions.Md5Hash60(
          concat(col("doc_id").cast("string"), lit(":res"))).as("k"))
      .as[(Long, Long)].collect()
    val expect = all.sortBy(x => (x._2, x._1)).take(100).map(_._1).toSet
    assert(r.map(_._1).toSet == expect)
    val again = graft.SparkEntry.queries("x_sample_fixed_k")(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    assert(again == expect)
  }

  test("minmax: range [0,1], extrema map to endpoints within every source") {
    val r = graft.SparkEntry.queries("x_feat_minmax")(spark, sf).cache()
    assert(r.filter(col("scaled") < 0 || col("scaled") > 1).count() == 0)
    val d = graft.Tables(spark, sf, "documents")
    val ex = d.groupBy("source")
      .agg(min("n_chars").as("lo"), max("n_chars").as("hi"))
    val joined = d.join(ex, "source").join(r, Seq("doc_id"))
    assert(joined.filter(col("n_chars") === col("lo") && col("scaled") =!= 0.0)
      .count() == 0, "per-source min must scale to 0")
    assert(joined.filter(col("n_chars") === col("hi") && col("lo") =!= col("hi") &&
      col("scaled") =!= 1.0).count() == 0, "per-source max must scale to 1")
    r.unpersist()
  }

  test("curriculum: quartile stages balanced, shard ranks dense, epoch order total") {
    val r = graft.SparkEntry.queries("x_pipeline_curriculum")(spark, sf).cache()
    val n = r.count()
    assert(n == graft.Tables(spark, sf, "documents").count())
    // Stage thresholds are <=-quartiles: each cumulative prefix {1},{1,2},
    // {1,2,3} must reach at least its quarter of the corpus.
    val byStage = r.groupBy("stage").count().collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(byStage.keySet.subsetOf(Set(1, 2, 3, 4)), s"stages: ${byStage.keySet}")
    (1 to 3).foreach { k =>
      val cumK = (1 to k).map(byStage.getOrElse(_, 0L)).sum
      assert(cumK * 4 >= n * k, s"stage prefix 1..$k covers $cumK of $n")
    }
    // rank_in_shard is dense 1..count within every (stage, shard).
    val bad = r.groupBy("stage", "shard")
      .agg(count(lit(1)).as("c"), max("rank_in_shard").as("m"),
        min("rank_in_shard").as("lo"))
      .filter(col("c") =!= col("m") || col("lo") =!= 1)
      .count()
    assert(bad == 0, "rank_in_shard not dense")
    // Deterministic: a second evaluation is identical.
    val again = graft.SparkEntry.queries("x_pipeline_curriculum")(spark, sf)
    assert(r.except(again).count() == 0 && again.except(r).count() == 0)
    r.unpersist()
  }
}
