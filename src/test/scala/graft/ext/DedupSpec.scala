package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Recall/precision pinning for the near-dup tier: the LSH candidate set
  * must contain every strongly-similar pair (the fixture has planted
  * near-dups, jaccard ≥ 0.9) and nothing below the 0.5 verify threshold. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("minhash LSH finds all strongly-similar pairs (recall @ j>=0.9)") {
    // ground truth: exact all-pairs jaccard on the sf0.001 corpus (500 docs)
    val sh = graft.Tables(spark, sf, "documents")
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("shingles", expr(Dedup.shingleExpr))
      .select(col("doc_id"), col("shingles"))
    val a = sh.select(col("doc_id").as("a"), col("shingles").as("sh_a"))
    val b = sh.select(col("doc_id").as("b"), col("shingles").as("sh_b"))
    val strong = a.join(b, col("b") > col("a"))
      .withColumn("j", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("j") >= 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(strong.nonEmpty, "fixture should contain planted near-dups")

    val cands = Dedup.minhashCandidates(spark, sf)
      .as[(Long, Long)].collect().toSet
    val missed = strong -- cands
    assert(missed.isEmpty, s"LSH missed strong pairs: $missed")
  }

  test("verified minhash output has no below-threshold pairs (precision)") {
    val out = graft.SparkEntry.queries("x_dedup_minhash_lsh")(spark, sf)
    val bad = out.filter(col("jaccard") < 0.5).count()
    assert(bad == 0)
    assert(out.count() > 0)
  }

  test("md5 oracle twin and production xxhash pipeline agree on all strong pairs") {
    // The production LSH query is rows-only in the oracle gate (seeded
    // xxhash64 family); its _md5 twin is hash-compared against DuckDB. This
    // bridge pins them to each other where LSH makes a promise: at j ≥ 0.9
    // the 8×4 banding collides with probability 1-(1-0.9⁴)⁸ ≈ 0.9996, so
    // both hash families MUST surface every strong pair. Borderline pairs
    // (0.5 ≤ j < 0.9) sit mid-s-curve — the families legitimately differ
    // there (observed: 3 vs 1 extra borderline catches), and per-pair
    // correctness of those is already covered by the exact verify + the
    // precision test. Both pipelines are deterministic, so this cannot flake.
    def strongAndAll(name: String) = {
      val rows = graft.SparkEntry.queries(name)(spark, sf)
        .select("a", "b", "jaccard").as[(Long, Long, Double)].collect()
      (rows.filter(_._3 >= 0.9).map(r => (r._1, r._2)).toSet, rows.length)
    }
    val (prodStrong, prodN) = strongAndAll("x_dedup_minhash_lsh")
    val (twinStrong, twinN) = strongAndAll("x_dedup_minhash_md5")
    assert(prodStrong == twinStrong,
      s"prod-only=${prodStrong -- twinStrong} twin-only=${twinStrong -- prodStrong}")
    assert(prodStrong.nonEmpty && prodN > 0 && twinN > 0)
  }

  test("simhash md5 twin ranks similarity like the production kernel") {
    // Same vote math, different base hash: absolute bits differ, but the
    // near-dup ORDERING (small hamming distance for near-identical docs)
    // must hold for both — that is the property SimHash exists to provide.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (3L, "completely different content about spark engines and parquet files"))
      .toDF("doc_id", "text")
    val hashed = docs.withColumn("toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), expr(Dedup.simhashMd5Expr).as("sh"))
      .as[(Long, Long)].collect().toMap
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(hashed(1L), hashed(2L)) < hamming(hashed(1L), hashed(3L)))
    assert(hamming(hashed(1L), hashed(2L)) <= 16)
  }

  test("simhash: near-identical docs get small hamming distance") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (3L, "completely different content about spark engines and parquet files"))
      .toDF("doc_id", "text")
    val hashed = docs.withColumn("toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), expr(Dedup.simhashExpr).as("sh"))
      .as[(Long, Long)].collect().toMap
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(hashed(1L), hashed(2L)) < hamming(hashed(1L), hashed(3L)))
    assert(hamming(hashed(1L), hashed(2L)) <= 16)
  }

  test("shingleExpr yields empty set (not a crash) for docs with <3 tokens") {
    // Spark's sequence(1, 0) is the DESCENDING [1, 0]; an unguarded transform
    // would evaluate element_at(toks, 0) and throw. The guard must make
    // short/empty docs produce an empty shingle set, like DuckDB's
    // generate_series(1, 0).
    val docs = Seq((1L, ""), (2L, "one"), (3L, "two words"),
      (4L, "exactly three tokens"), (5L, "a b c d")).toDF("doc_id", "text")
    val sh = docs.withColumn("toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), expr(Dedup.shingleExpr).as("shingles"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L).isEmpty && sh(2L).isEmpty && sh(3L).isEmpty)
    assert(sh(4L) == Seq("exactly three tokens"))
    assert(sh(5L) == Seq("a b c", "b c d"))
  }

  test("connected components: chains, disjoint pairs, and tie shapes") {
    // a 10-node chain (diameter 9 — exercises pointer-jumping past maxIter
    // naive bounds), two disjoint pairs, and a triangle
    val edges = ((1L to 9L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (200L, 201L), (300L, 301L), (301L, 302L), (300L, 302L)))
      .toDF("a", "b")
    val labels = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    (1L to 10L).foreach(n => assert(labels(n) == 1L, s"chain node $n"))
    assert(labels(100L) == 100L && labels(101L) == 100L)
    assert(labels(200L) == 200L && labels(201L) == 200L)
    Seq(300L, 301L, 302L).foreach(n => assert(labels(n) == 300L))
    assert(labels.size == 17)
  }

  test("hot-bucket cap: 1k identical docs yield linear pairs that stay connected") {
    // 1000 byte-identical docs collide into one bucket per band; the
    // uncapped pipeline would explode ~499,500 pairs in one task. The cap
    // must keep output linear WITHOUT disconnecting the duplicate group.
    val dir = tmpDir()
    val boiler = "spark common boilerplate page content repeated verbatim across the mirror set"
    val docs = ((1L to 1000L).map(i => (i, boiler)) ++
      Seq((2001L, "a genuinely unique document about entirely different things and words")))
      .toDF("doc_id", "text")
    docs.write.parquet(s"$dir/documents.parquet")
    val pairs = Dedup.minhashCandidates(spark, dir).localCheckpoint()
    val n = pairs.count()
    assert(n < 5000, s"expected linear pair count from capped buckets, got $n")
    assert(n >= 999, s"the duplicate group must stay covered, got $n")
    val labels = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    (1L to 1000L).foreach(i => assert(labels(i) == 1L, s"doc $i not in cluster 1"))
    // the overflow is observable (what a production run would alert on)
    assert(Dedup.minhashHotBuckets(spark, dir).count() > 0)
  }

  test("dedupCorpus: exact-first routing collapses mirrors before LSH and clusters near-dups") {
    val base = "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill quietly"
    val docsDf = (
      Seq((1L, base), (2L, base), (3L, base),               // exact-dup group
        (4L, base + " tonight"), (5L, base + " tonight ok"), // near-dups of each other AND of base
        (6L, "completely different content about spark engines and columnar parquet file formats")) ++
      (100L to 199L).map(i => (i, "mirrored boilerplate footer appearing verbatim on every single page of the crawl")))
      .toDF("doc_id", "text")
    val out = Dedup.dedupCorpusFor(docsDf).as[(Long, Long, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.size == 106) // one row per input doc
    // mirrors collapse through the exact stage; near-dups cluster through LSH
    (1L to 5L).foreach(i => assert(out(i)._1 == 1L, s"doc $i -> ${out(i)}"))
    assert(out(6L)._1 == 6L && out(6L)._2)
    (100L to 199L).foreach(i => assert(out(i)._1 == 100L))
    val kept = out.filter(_._2._2).keys.toSet
    assert(kept == Set(1L, 6L, 100L), s"kept=$kept")
  }

  test("keep-best picks the longest doc per near-dup cluster, ties to min id") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"), // j=6/7 with doc 1, longer
      (3L, "totally different words about columnar storage engines and formats"),
      (10L, "mirror mirror on the wall identical boilerplate text here"),
      (11L, "mirror mirror on the wall identical boilerplate text here")) // j=1 with doc 10, same length
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = tmpDir()
    df.write.parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("x_dedup_keep_best")(spark, dir)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.size == 5)
    assert(out(1L) == (1L, false) && out(2L) == (1L, true)) // longer doc wins the cluster
    assert(out(3L) == (3L, true))                           // singleton keeps itself
    assert(out(10L) == (10L, true) && out(11L) == (10L, false)) // tie -> smallest doc_id
  }

  test("keep-best invariants on the corpus: one keep per cluster, labels are member ids") {
    val out = graft.SparkEntry.queries("x_dedup_keep_best")(spark, sf)
      .as[(Long, Long, Boolean)].collect()
    assert(out.length == graft.Tables(spark, sf, "documents").count())
    out.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.count(_._3) == 1, s"cluster $c must keep exactly one doc")
      assert(rows.exists(_._1 == c), s"cluster label $c must be a member id")
    }
  }

  test("incremental dedup probes batch docs against the corpus index") {
    val df = Seq(
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "the quick brown fox jumps over the lazy dog today"), // exact dup of 2 (and near) -> exact wins
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"), // j=8/9 with 4
      (7L, "entirely unrelated content discussing columnar execution engines"))
      .toDF("doc_id", "text")
    val dir = tmpDir()
    df.write.parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("x_dedup_incremental")(spark, dir)
      .as[(Long, Boolean, Option[Long], Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out.keySet == Set(3L, 5L, 7L)) // only batch (odd) docs are decided
    assert(out(3L) == (false, Some(2L), Some("exact")))
    assert(out(5L) == (false, Some(4L), Some("near")))
    assert(out(7L) == (true, None, None))
  }

  test("exact dedup collapses identical texts") {
    val dup = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    dup.createOrReplaceTempView("dup_docs")
    val out = dup.groupBy("text").agg(min("doc_id").as("keep"), count(lit(1)).as("n"))
    assert(out.count() == 2)
    assert(out.filter(col("n") === 2).select("keep").as[Long].head() == 1L)
  }

  test("containment detects a planted excerpt that symmetric jaccard skips") {
    // A 60-token document and its 12-token excerpt: containment = 1.0 but
    // jaccard ≈ 10/58 — far below the 0.5 near-dup bar. The synthetic pair
    // goes through the SAME expressions as the registered query.
    val big = (1 to 60).map(i => s"tok$i").mkString(" ")
    val excerpt = (20 until 32).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, big), (2L, excerpt)).toDF("doc_id", "text")
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("shash", graft.functions.ShingleHashes(col("toks"), 3))
    val a = df.select(col("doc_id").as("a"), col("shash").as("sh_a"),
      size(col("shash")).as("sa"))
    val b = df.select(col("doc_id").as("b"), col("shash").as("sh_b"),
      size(col("shash")).as("sb"))
    val pair = a.crossJoin(b).filter(col("a") < col("b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .select((col("inter") / least(col("sa"), col("sb"))).as("c"),
        Dedup.jaccard(col("sh_a"), col("sh_b")).as("j"))
      .as[(Double, Double)].head()
    assert(pair._1 == 1.0, s"excerpt containment should be 1.0, got ${pair._1}")
    assert(pair._2 < 0.5, s"jaccard should miss the excerpt, got ${pair._2}")
  }

  test("containment query: scores within [0.8, 1], always >= symmetric jaccard") {
    val r = graft.SparkEntry.queries("x_dedup_containment")(spark, sf).cache()
    assert(r.filter(col("containment") < 0.8 || col("containment") > 1.0).count() == 0)
    // c = |∩|/min >= |∩|/|∪| = j for every pair, so re-deriving jaccard on
    // the returned pairs can never exceed the reported containment.
    val docs = graft.Tables(spark, sf, "documents")
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("shash", graft.functions.ShingleHashes(col("toks"), 3))
      .select(col("doc_id"), col("shash"))
    val joined = r
      .join(docs.select(col("doc_id").as("a"), col("shash").as("sh_a")), "a")
      .join(docs.select(col("doc_id").as("b"), col("shash").as("sh_b")), "b")
      .withColumn("j", Dedup.jaccard(col("sh_a"), col("sh_b")))
    assert(joined.filter(col("j") > col("containment") + 1e-6).count() == 0)
    r.unpersist()
  }

  test("tf-idf all-pairs: corpus pairs are thresholded and within cosine bounds") {
    val pairs = Dedup.tfidfAllPairs(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.nonEmpty)
    pairs.values.foreach(c => assert(c >= 0.5 - 1e-9 && c <= 1.0 + 1e-9))
  }

  test("tf-idf all-pairs: planted global duplicates surface at cosine 1") {
    import spark.implicits._
    // An exact-duplicate pair 9000 ids apart (far past any bounded id
    // window — the GLOBAL reach this operator adds over ngramJaccardEdges),
    // a near-dup pair, and filler docs. Filler vocab is per-doc unique
    // (df=1), so only the planted overlaps can generate candidates.
    val filler = (1L to 40L).map(i =>
      (i + 100, (1 to 30).map(j => s"f${i}w$j").mkString(" ")))
    val dupText = "alpha beta gamma delta epsilon zeta eta theta " * 3
    val nearText = dupText + "iota kappa"
    val docs = (Seq((7L, dupText), (9007L, dupText), (500L, nearText)) ++ filler)
      .toDF("doc_id", "text")
    val got = Dedup.tfidfAllPairsOf(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.contains((7L, 9007L)), s"missing global duplicate pair: $got")
    assert(got((7L, 9007L)) >= 0.999999)
    assert(got.contains((7L, 500L)) && got.contains((500L, 9007L)),
      s"missing near-dup pairs: $got")
    assert(got((7L, 500L)) > 0.9 && got((7L, 500L)) < 1.0)
    // No spurious filler pairs: candidates need a shared indexed term.
    got.keys.foreach { case (a, b) =>
      assert(Set(7L, 9007L, 500L).contains(a) && Set(7L, 9007L, 500L).contains(b),
        s"unexpected pair ($a,$b)")
    }
  }

  /** Pure-Scala exact all-pairs ground truth: same md5-60 convention, same
    * tf-idf formula, every C(n,2) pair scored. */
  private def bruteAllPairs(corpus: Seq[(Long, String)],
                            threshold: Double): Map[(Long, Long), Double] = {
    def md560(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    val nDocs = corpus.size.toDouble
    val vecs = corpus.flatMap { case (id, text) =>
      val toks = text.trim.split("\\s+")
      if (toks.length < 3) None
      else {
        val lenD = (toks.length - 2).toDouble
        val tf = toks.sliding(3).map(_.mkString(" ")).toSeq
          .groupBy(identity).map { case (g, o) => md560(g) -> o.size }
        Some(id -> (lenD, tf))
      }
    }.toMap
    val dfreq = vecs.values.flatMap(_._2.keys).groupBy(identity)
      .map { case (wd, o) => wd -> o.size }
    val weights = vecs.map { case (id, (lenD, tf)) =>
      id -> tf.map { case (wd, c) =>
        wd -> (c / lenD) * math.log(nDocs / dfreq(wd)) }
    }
    val ids = weights.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      (a, b) = (ids(i), ids(j))
      wa = weights(a); wb = weights(b)
      dot = wa.keysIterator.filter(wb.contains).map(k => wa(k) * wb(k)).sum
      na = math.sqrt(wa.values.map(x => x * x).sum)
      nb = math.sqrt(wb.values.map(x => x * x).sum)
      cos = dot / (na * nb) if cos >= threshold
    } yield (a, b) -> cos).toMap
  }

  test("tf-idf all-pairs: randomized corpora match brute force at several thresholds") {
    import spark.implicits._
    // Template-mutation corpora produce cosines straddling every threshold;
    // short docs exercise the unfiltered-n_docs idf base. Pairs within 1e-6
    // of the cutoff are excluded from the strict set comparison (decimal vs
    // double accumulation may legitimately split exact boundary cases).
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 4; threshold <- Seq(0.3, 0.7)) {
      val common = (1 to 12).map(i => s"c$i")
      val templates = (1 to 6).map { k =>
        (1 to (8 + rnd.nextInt(10))).map { _ =>
          if (rnd.nextBoolean()) common(rnd.nextInt(common.size))
          else s"t${k}r${rnd.nextInt(25)}"
        }
      }
      val corpus: Seq[(Long, String)] = (1 to 36).map { d =>
        val base = templates(rnd.nextInt(templates.size))
        val mutated = base.map(t =>
          if (rnd.nextInt(10) == 0) s"m${d}x${rnd.nextInt(9)}" else t)
        (d.toLong, mutated.mkString(" "))
      } ++ Seq((90L, "hi"), (91L, "two toks"))
      val expected = bruteAllPairs(corpus, threshold)
      val got = Dedup.tfidfAllPairsOf(corpus.toDF("doc_id", "text"), threshold)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val boundary = bruteAllPairs(corpus, threshold - 1e-6).collect {
        case (k, c) if math.abs(c - threshold) <= 1e-6 => k
      }.toSet
      val missing = (expected.keySet -- got.keySet) -- boundary
      val extra = (got.keySet -- expected.keySet) -- boundary
      assert(missing.isEmpty && extra.isEmpty,
        s"trial=$trial t=$threshold missing=$missing extra=$extra")
      (expected.keySet & got.keySet).foreach { k =>
        assert(math.abs(got(k) - expected(k)) < 1e-5,
          s"trial=$trial t=$threshold cosine mismatch at $k")
      }
    }
  }

  test("tf-idf all-pairs: Bayardo prefix output equals brute force exactly") {
    import spark.implicits._
    // Adversarial corpus for the prefix filter's soundness proof:
    //  - a 10-doc cluster whose similarity lives ONLY in HIGH-df shared
    //    grams (a common stem, df = 10, plus a tiny unique tail) — the
    //    case round 6's df-cap heuristic could drop, and the first thing
    //    the df-descending budget tries to leave unindexed;
    //  - a classic near-dup pair (mostly-shared rare grams);
    //  - SHORT docs (< 3 tokens, no shingles) that still count in n_docs
    //    (the ADVICE r6 idf-base fix — brute force counts them too);
    //  - df=1 filler that must never pair.
    // 30-token stem → 28 shared shingles (df = 10) vs 2 unique per doc:
    // within-cluster cosine ≈ 0.63 (hand-checked), comfortably past 0.5,
    // with similarity carried ENTIRELY by the high-df grams.
    val stem = (1 to 30).map(i => s"common$i").mkString(" ")
    val cluster = (1L to 10L).map(i => (i, s"$stem tail${i}a tail${i}b"))
    val near = Seq((21L, "rare alpha beta gamma delta epsilon zeta"),
                   (22L, "rare alpha beta gamma delta epsilon eta"))
    val shorts = Seq((31L, "hi there"), (32L, "x"))
    val filler = (41L to 60L).map(i =>
      (i, (1 to 8).map(j => s"f${i}w$j").mkString(" ")))
    val corpus = (cluster ++ near ++ shorts ++ filler).toSeq
    val docsDf = corpus.toDF("doc_id", "text")

    // ONE ground-truth implementation for every all-pairs test (a second
    // inline copy of the formula could drift into a false gate).
    val expected = bruteAllPairs(corpus, 0.5)

    val got = Dedup.tfidfAllPairsOf(docsDf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet,
      s"pair sets differ: missing=${expected.keySet -- got.keySet} " +
        s"extra=${got.keySet -- expected.keySet}")
    expected.foreach { case (k, c) =>
      assert(math.abs(got(k) - c) < 1e-5, s"cosine mismatch at $k: ${got(k)} vs $c")
    }
    // The high-df cluster must be fully paired — C(10,2) pairs among ids
    // 1..10 — proving no long-posting candidate loss.
    val clusterPairs = expected.keySet.count { case (a, b) => a <= 10 && b <= 10 }
    assert(clusterPairs == 45, s"expected full C(10,2) cluster, got $clusterPairs")
  }
}
