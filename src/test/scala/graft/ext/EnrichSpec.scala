package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic pins for the Enrich tier — the oracle gate hash-checks the
  * corpus-level results; these assert the properties that make each
  * operator correct by construction. */
class EnrichSpec extends SparkSpec {
  import spark.implicits._

  private def byName(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("boilerplate removal strips exactly the planted head segment") {
    val out = byName("x_text_boilerplate")
      .select("doc_id", "n_segments", "n_removed")
      .as[(Long, Long, Long)].collect()
    val (planted, clean) = out.partition(_._1 % 5 == 0)
    assert(planted.nonEmpty && planted.forall(_._3 == 1),
      "every 5th doc loses exactly its planted first segment")
    assert(clean.forall(_._3 == 0), "unplanted docs keep all segments")
  }

  test("boilerplate removal reassembles the untouched tail verbatim") {
    // For a planted doc, the cleaned text must equal the whitespace-
    // normalized ORIGINAL text (the boiler head occupied exactly segment 0).
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"),
        sha2(array_join(TextAnalysis.tokens(col("text")), " "), 256).as("orig_sha"))
    val joined = byName("x_text_boilerplate")
      .join(docs, "doc_id")
      .filter(pmod(col("doc_id"), lit(5)) === 0)
      .filter(col("clean_sha") =!= col("orig_sha"))
    assert(joined.count() == 0)
  }

  test("knn join matches a driver-side brute-force reference") {
    val vecs = graft.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (0L until 5L).flatMap { q =>
      vecs.filter(_._1 >= 5)
        .map { case (id, v) =>
          (q, id, BigDecimal(cos(vecs(q), v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .toSeq.sortBy { case (_, id, s) => (-s, id) }.take(5)
        .map { case (_, id, _) => (q, id) }
    }.toSet
    val got = byName("x_sim_knn_join")
      .select("q_id", "neighbor").as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("fuzzy match: every pair shares the block key and has dist in [1,2]") {
    val p = graft.Tables(spark, sf, "part")
      .select(col("p_partkey"), col("p_name"), col("p_size")).as[(Long, String, Int)]
      .collect().map { case (k, n, s) => k -> ((n, s)) }.toMap
    val pairs = byName("x_match_fuzzy")
      .select("a_key", "b_key", "dist").as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, d) =>
      val ((an, as_), (bn, bs)) = (p(a), p(b))
      assert(a < b && as_ == bs && an.split(" ")(1) == bn.split(" ")(1))
      assert(d >= 1 && d <= 2)
    }
  }

  test("scd2: versions are dense and intervals chain without overlap") {
    val rows = byName("x_scd2_history")
      .select(col("user_id"), col("version"),
        col("valid_from").cast("long"), col("valid_to").cast("long"))
      .as[(Long, Long, Long, Option[Long])].collect()
      .groupBy(_._1)
    rows.foreach { case (_, hist) =>
      val sorted = hist.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, "dense versions")
      sorted.sliding(2).foreach {
        case Array(prev, next) =>
          assert(prev._4.contains(next._3), "valid_to chains to next valid_from")
        case _ => ()
      }
      assert(sorted.last._4.isEmpty, "open current version")
    }
  }

  test("quantile bins are equi-depth within each segment") {
    val bins = byName("x_feat_quantile_bins")
      .select("c_mktsegment", "bin", "n").as[(String, Long, Long)].collect()
      .groupBy(_._1)
    bins.foreach { case (_, bs) =>
      assert(bs.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
      val sizes = bs.map(_._3)
      assert(sizes.max - sizes.min <= 1, "ntile sizes differ by at most 1")
    }
  }

  test("feature hashing conserves token mass per doc") {
    val hashed = byName("x_feat_hashing_trick")
      .groupBy("doc_id").agg(sum("cnt").as("total"))
    val toks = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_toks"))
    assert(hashed.join(toks, "doc_id")
      .filter(col("total") =!= col("n_toks")).count() == 0)
    // buckets stay within the declared width
    assert(byName("x_feat_hashing_trick")
      .filter(col("bucket") < 0 || col("bucket") >= 256).count() == 0)
  }

  test("stats profile reports zero nulls and exact row counts on the fixture") {
    val n = graft.Tables(spark, sf, "lineitem").count()
    val prof = byName("x_stats_profile")
      .select("col_name", "n_rows", "n_nulls", "n_distinct")
      .as[(String, Long, Long, Long)].collect()
    assert(prof.length == 4)
    prof.foreach { case (_, rows, nulls, distinct) =>
      assert(rows == n && nulls == 0 && distinct > 0 && distinct <= n)
    }
  }

  test("gapfill: grid is dense hourly and forward fill carries last value") {
    val rows = byName("x_ts_gapfill")
      .select(col("user_id"), col("h").cast("long"), col("filled"), col("is_gap"))
      .as[(Long, Long, Double, Boolean)].collect()
      .groupBy(_._1)
    rows.foreach { case (_, series) =>
      val sorted = series.sortBy(_._2)
      // dense hourly grid
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._2 - a._2 == 3600L)
        case _ => ()
      }
      // first slot observed; gaps repeat the previous filled value
      assert(!sorted.head._4)
      sorted.sliding(2).foreach {
        case Array(a, b) if b._4 => assert(b._3 == a._3)
        case _ => ()
      }
    }
  }

  test("target encoding: LOO mean matches a direct per-row recomputation") {
    val r = graft.SparkEntry.queries("x_feat_target_encode")(spark, sf).cache()
    val o = graft.Tables(spark, sf, "orders")
    assert(r.count() == o.count(), "one encoded row per order")
    // Direct recomputation for a handful of rows: mean of the category's
    // OTHER rows.
    val sample = r.limit(5).collect()
    sample.foreach { row =>
      val (okey, cat, loo) = (row.getLong(0), row.getString(1), row.getDouble(2))
      val others = o.filter(col("o_orderpriority") === cat && col("o_orderkey") =!= okey)
        .select(col("o_totalprice").cast("decimal(18,2)"))
        .collect().map(_.getDecimal(0))
      val expect = others.map(BigDecimal(_)).sum / others.length
      assert(math.abs(loo - expect.toDouble) < 1e-4,
        s"order $okey: loo=$loo direct=$expect")
    }
    // Smoothing shrinks toward the global mean: smoothed lies between the
    // LOO mean and the global mean for every row.
    val gmean = o.agg(avg("o_totalprice")).head.getDouble(0)
    val outside = r.filter(col("loo_mean").isNotNull)
      .filter(!((col("smoothed_mean") >= least(col("loo_mean"), lit(gmean)) - 1e-4) &&
        (col("smoothed_mean") <= greatest(col("loo_mean"), lit(gmean)) + 1e-4)))
      .count()
    assert(outside == 0, "smoothed mean escaped the [loo, global] interval")
    r.unpersist()
  }
}
