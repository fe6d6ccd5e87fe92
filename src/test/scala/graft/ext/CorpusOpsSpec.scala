package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the corpus-curation tier (substring spans / novelty /
  * mixture). The DuckDB hash gate pins exact values; these pin the algebraic
  * properties on planted fixtures, where a regression is diagnosable. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s1"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  private def withDocs(rows: (Long, String)*)(f: String => Unit): Unit = {
    val dir = tmpDir()
    docsDf(rows: _*).write.parquet(s"$dir/documents.parquet")
    f(dir)
  }

  private val words = (0 until 200).map(i => s"w$i")

  test("substring spans: a planted shared 12-token block is one maximal span") {
    val block = (0 until 12).map(i => s"dup$i").mkString(" ")
    val a = (words.slice(0, 20) :+ block).mkString(" ") + " " + words.slice(40, 60).mkString(" ")
    val b = (words.slice(100, 120) :+ block).mkString(" ") + " " + words.slice(160, 180).mkString(" ")
    val c = words.slice(60, 99).mkString(" ") // no overlap with anything
    withDocs((1L, a), (2L, b), (3L, c)) { dir =>
      val out = CorpusOps.substringSpans(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_spans"), r.getAs[Long]("dup_toks"), r.getAs[Long]("max_span"))).toMap
      // 12 shared tokens, K=8: positions p..p+4 duplicated, one merged span
      // covering exactly the 12 planted tokens.
      assert(out(1L) == (1L, 12L, 12L), s"doc 1: ${out(1L)}")
      assert(out(2L) == (1L, 12L, 12L), s"doc 2: ${out(2L)}")
      assert(out(3L) == (0L, 0L, 0L), s"doc 3: ${out(3L)}")
    }
  }

  test("substring spans: two disjoint shared blocks stay two spans") {
    val b1 = (0 until 9).map(i => s"x$i").mkString(" ")
    val b2 = (0 until 9).map(i => s"y$i").mkString(" ")
    val a = s"$b1 ${words.slice(0, 15).mkString(" ")} $b2"
    val b = s"$b1 ${words.slice(50, 70).mkString(" ")} $b2"
    withDocs((1L, a), (2L, b)) { dir =>
      val r = CorpusOps.substringSpans(spark, dir)
        .filter(col("doc_id") === 1).head()
      assert(r.getAs[Long]("n_spans") == 2L)
      assert(r.getAs[Long]("dup_toks") == 18L)
      assert(r.getAs[Long]("max_span") == 9L)
    }
  }

  test("span removal: drops exactly the planted block, untouched docs keep their fingerprint") {
    val block = (0 until 12).map(i => s"dup$i").mkString(" ")
    val aPre = words.slice(0, 20)
    val aPost = words.slice(40, 60)
    val a = (aPre :+ block).mkString(" ") + " " + aPost.mkString(" ")
    val b = (words.slice(100, 120) :+ block).mkString(" ") + " " + words.slice(160, 180).mkString(" ")
    val clean = words.slice(60, 99).mkString(" ")
    withDocs((1L, a), (2L, b), (3L, clean)) { dir =>
      val out = CorpusOps.spanRemoval(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("kept_toks"), r.getAs[Long]("removed_toks"), r.getAs[Long]("cleaned_fp"))).toMap
      assert(out(1L)._2 == 12L && out(2L)._2 == 12L, s"removed: $out")
      assert(out(3L)._2 == 0L)
      // doc 1 cleaned == its tokens with the block cut out, exactly
      def fp(toks: Seq[String]): Long =
        toks.foldLeft(0L)((acc, t) => (acc * 31 + (t.length * 31 + t.head.toInt)) % 1000000007L)
      assert(out(1L)._3 == fp(aPre ++ aPost), "cleaned fingerprint mismatch")
      // untouched doc keeps its original content hash
      assert(out(3L)._3 == fp(words.slice(60, 99)))
    }
  }

  test("novelty: fully-unique doc scores 1e6 ppm; a mirrored doc scores 0") {
    val shared = words.slice(0, 30).mkString(" ")
    val unique = (0 until 30).map(i => s"u$i").mkString(" ")
    withDocs((1L, shared), (2L, shared), (3L, unique)) { dir =>
      val out = CorpusOps.noveltyScores(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("novelty_ppm")).toMap
      assert(out(1L) == 0L && out(2L) == 0L, s"mirrored docs: $out")
      assert(out(3L) == 1000000L, s"unique doc: $out")
    }
  }

  test("source overlap: a planted mirror source has full containment") {
    val dir = tmpDir()
    val shared = words.slice(0, 40).mkString(" ")
    Seq(
      (1L, shared, "en", "origin"),
      (2L, words.slice(60, 120).mkString(" "), "en", "origin"),
      (3L, shared, "en", "mirror"), // mirrors doc 1 verbatim
      (4L, (0 until 40).map(i => s"z$i").mkString(" "), "en", "other"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val out = CorpusOps.sourceOverlap(spark, dir).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        r.getAs[Long]("containment_ppm")).toMap
    // mirror's entire gram set sits inside origin's -> containment 1e6;
    // "other" shares nothing, so it never appears in the matrix.
    assert(out == Map(("mirror", "origin") -> 1000000L), s"got $out")
  }

  test("weighted sample: matches the serial systematic scan, heavy docs always in") {
    val dir = tmpDir()
    // Weights 5..104 over 100 docs, plus one whale doc with weight 5000
    // (heavier than any stride, so the PPS guarantee must include it).
    val rows = (1L to 100L).map(i => (i, (0 until (4 + i).toInt).map(j => s"t$j").mkString(" "))) :+
      (101L, (0 until 5000).map(j => s"t$j").mkString(" "))
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val n = 10L
    val got = CorpusOps.weightedSample(spark, dir, n).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    // serial reference: same integer systematic rule
    val ws = rows.map { case (id, t) => id -> t.split("\\s+").length.toLong }
    val tw = ws.map(_._2).sum
    var cum = 0L
    val expect = ws.flatMap { case (id, w) =>
      cum += w
      if (cum * n / tw > (cum - w) * n / tw) Some(id) else None
    }.toSet
    assert(got == expect, s"got $got expect $expect")
    assert(got.contains(101L), "whale doc must always be selected")
    // a doc spanning k strides is selected ONCE but consumes k slots, so
    // the sample size is n minus the extra strides swallowed by whales
    val whaleStrides = ws.find(_._1 == 101L).get._2 * n / tw
    assert(got.size <= n && got.size >= n - whaleStrides, s"size ${got.size}")
  }

  test("span index: built once as a SnapshotTable, consumers scan the artifact") {
    val block = (0 until 12).map(i => s"dup$i").mkString(" ")
    val a = (words.slice(0, 20) :+ block).mkString(" ")
    val b = (words.slice(100, 120) :+ block).mkString(" ")
    withDocs((1L, a), (2L, b)) { dir =>
      // First consumer triggers the build.
      CorpusOps.spanRemoval(spark, dir).collect()
      val root = CorpusOps.spanIndexBuild(spark, dir)
      val v0 = graft.ops.SnapshotTable.currentVersion(spark, root)
      assert(v0.contains(0L), s"index not committed: $v0")
      // Second consumer: no rebuild (version unchanged), and its PLAN reads
      // the artifact — a parquet scan under the index root, with no gram
      // re-aggregation (no count_distinct over gram hashes upstream of it).
      val inv = CorpusOps.substringSpans(spark, dir)
      inv.collect()
      assert(graft.ops.SnapshotTable.currentVersion(spark, root).contains(0L),
        "consumer rebuilt the span index")
      val planStr = inv.queryExecution.executedPlan.toString
      assert(planStr.contains("graft-spans"),
        s"inventory plan does not scan the span index:\n${planStr.take(1500)}")
      assert(!planStr.contains("count(distinct"),
        "consumer plan re-derives the gram doc-frequency aggregation")
      // Composed pipeline consumes the same artifact.
      val cur = CorpusOps.curationPipeline(spark, dir, minNoveltyPpm = 0L)
      val curPlan = cur.queryExecution.executedPlan.toString
      assert(curPlan.contains("graft-spans"),
        s"curation plan does not scan the span index:\n${curPlan.take(1500)}")
    }
  }

  test("KL drift: non-negative everywhere, divergent source scores highest") {
    val dir = tmpDir()
    val common = words.slice(0, 50).mkString(" ")
    val alien = (0 until 50).map(i => s"alien$i").mkString(" ")
    (Seq((1L, common, "en", "pool1"), (2L, common, "en", "pool2"),
      (3L, alien, "en", "weird")) ++
      (4L to 8L).map(i => (i, common, "en", s"pool$i")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val out = CorpusOps.klDrift(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("kl")).toMap
    assert(out.values.forall(_ >= 0.0), s"KL must be non-negative: $out")
    val maxSrc = out.maxBy(_._2)._1
    assert(maxSrc == "weird", s"divergent source should top the drift list: $out")
    assert(out("weird") > out("pool1") + 1.0)
  }

  test("mixture: shares sum to ~1e6 and sqrt-temperature flattens the skew") {
    val dir = tmpDir()
    // 9:1 token skew between two sources.
    val big = (1L to 90L).map(i => (i, words.mkString(" "), "en", "srcA"))
    val small = (91L to 100L).map(i => (i, words.mkString(" "), "en", "srcB"))
    (big ++ small).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    val out = CorpusOps.mixtureAllocation(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("raw_ppm"), r.getAs[Long]("share_ppm"), r.getAs[Long]("quota_docs"))).toMap
    val (rawA, shareA, quotaA) = out("srcA")
    val (rawB, shareB, quotaB) = out("srcB")
    // floor-division shares can undershoot 1e6 by at most #groups ppm
    assert(shareA + shareB <= 1000000L && shareA + shareB >= 1000000L - 2)
    assert(rawA >= 899999L && rawB <= 100001L, s"raw skew: $rawA/$rawB")
    // sqrt temperature: 9:1 tokens -> 3:1 weights (within floor rounding)
    assert(shareA < 760000L && shareB > 240000L, s"tempered: $shareA/$shareB")
    assert(quotaA + quotaB <= 100000L)
  }
}
