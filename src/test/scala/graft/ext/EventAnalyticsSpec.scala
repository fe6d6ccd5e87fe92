package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpec {

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("transitions: total steps = events - users, row probabilities sum to ~1e6 ppm") {
    val r = q("w9_transition_counts").cache()
    val e = graft.Tables(spark, sf, "events")
    val expectedSteps = e.count() - e.select("user_id").distinct().count()
    val steps = r.agg(sum("n")).head.getLong(0)
    assert(steps == expectedSteps, s"steps=$steps expected=$expectedSteps")
    // Floor division loses at most (row cardinality - 1) ppm per row.
    val rows = r.groupBy("from_t")
      .agg(sum("p_ppm").as("p"), count(lit(1)).as("k"))
      .collect()
    rows.foreach { row =>
      val (p, k) = (row.getLong(1), row.getLong(2))
      assert(p <= 1000000L && p > 1000000L - k, s"row ppm sum $p with $k cells")
    }
    r.unpersist()
  }

  test("cohort retention: offset-0 cell covers every cohort user exactly once") {
    val r = q("x_cohort_retention").cache()
    // Every user is active in their own first week, so the offset-0 diagonal
    // must count ALL users of the cohort — and summing it over cohorts gives
    // the total distinct-user count.
    val diag = r.filter(col("week_offset") === 0).agg(sum("n_users")).head.getLong(0)
    val users = graft.Tables(spark, sf, "events").select("user_id").distinct().count()
    assert(diag == users, s"diagonal=$diag users=$users")
    assert(r.filter(col("week_offset") < 0).count() == 0, "negative offset")
    // Retention can only shrink relative to the cohort size.
    val over = r.as("a")
      .join(r.filter(col("week_offset") === 0).as("c"), Seq("cw"))
      .filter(col("a.n_users") > col("c.n_users")).count()
    assert(over == 0, "a later week retained more users than the cohort has")
    r.unpersist()
  }

  test("interpolation: observed rows pass through, gaps strictly between neighbours") {
    val r = q("x_ts_interpolate").cache()
    val gapfill = q("x_ts_gapfill")
    assert(r.count() == gapfill.count(), "same grid as gapfill")
    // Observed rows carry the hourly value itself: joining back to the LOCF
    // twin, non-gap rows must agree exactly (both are round-6 of the same hv).
    val joined = r.select(col("user_id"), col("h"), col("interp"), col("is_gap"))
      .join(gapfill.select(col("user_id"), col("h"), round(col("filled"), 6).as("locf")),
        Seq("user_id", "h"))
    // Tolerance 1.1e-6: interp uses floor(x·1e6+0.5)/1e6 while the LOCF twin
    // uses round(x, 6) — they may differ by one micro-unit on half-ulp ties.
    val observedMismatch = joined
      .filter(!col("is_gap") && abs(col("interp") - col("locf")) > 1.1e-6).count()
    assert(observedMismatch == 0)
    // Interpolated gap values lie within [min(prev,next), max(prev,next)]:
    // monotone blend, frac in (0,1). Verified via window recomputation.
    import org.apache.spark.sql.expressions.Window
    val wb = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val base = r.withColumn("obs", when(!col("is_gap"), col("interp")))
      .withColumn("pv", last(col("obs"), ignoreNulls = true).over(wb))
      .withColumn("nv", first(col("obs"), ignoreNulls = true).over(wf))
    val outOfRange = base.filter(col("is_gap") && col("nv").isNotNull)
      .filter(col("interp") < least(col("pv"), col("nv")) - lit(1e-6) ||
        col("interp") > greatest(col("pv"), col("nv")) + lit(1e-6))
      .count()
    assert(outOfRange == 0, "interpolated value escaped its bracketing observations")
    r.unpersist()
  }

  test("rfm: totals reconcile with raw purchases, segment rules hold row-wise") {
    val r = q("x_events_rfm").cache()
    val p = graft.Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase")
    assert(r.count() == p.select("user_id").distinct().count())
    assert(r.agg(sum("frequency")).head.getLong(0) == p.count())
    assert(r.filter(col("recency_days") < 0).count() == 0)
    // Segment is a pure function of (recency, frequency).
    val bad = r.filter(
      (col("segment") === "champion") =!=
        (col("recency_days") <= 7 && col("frequency") >= 10) ||
      (col("segment") === "loyal") =!=
        (col("recency_days") > 7 && col("frequency") >= 10) ||
      (col("segment") === "recent") =!=
        (col("recency_days") <= 7 && col("frequency") < 10)).count()
    assert(bad == 0, "segment rule violated")
    r.unpersist()
  }

  test("session paths: counts bounded by session totals, order deterministic") {
    val r = q("x_session_paths").cache()
    assert(r.count() > 0 && r.count() <= 20)
    // Path mass cannot exceed the total session count from the
    // sessionization twin (same 30-min gap rule).
    val totalSessions = q("st_sessions")
      .agg(sum("n_sessions")).head.getLong(0)
    val pathMass = r.agg(sum("n_sessions")).head.getLong(0)
    assert(pathMass <= totalSessions,
      s"top-20 path mass $pathMass exceeds total sessions $totalSessions")
    // Descending count order with path tiebreak; every path is a chain of
    // known event types.
    val rows = r.collect().map(x => (x.getString(0), x.getLong(1)))
    rows.sliding(2).foreach {
      case Array(p, n) =>
        assert(p._2 > n._2 || (p._2 == n._2 && p._1 < n._1), s"order: $p then $n")
      case _ => ()
    }
    val types = graft.Tables(spark, sf, "events")
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    rows.foreach { case (path, _) =>
      assert(path.split(">").forall(types.contains), s"unknown type in $path")
    }
    r.unpersist()
  }

  test("contingency: observed sums match marginals, chi contributions non-negative") {
    val r = q("a15_contingency_chi").cache()
    val n = graft.Tables(spark, sf, "events").count()
    assert(r.agg(sum("o")).head.getLong(0) == n)
    assert(r.filter(col("chi_contrib") < 0).count() == 0)
    // Σ expected over PRESENT cells is ≤ n (equality only for a complete
    // table — absent (type, bucket) combos carry the missing expected mass)
    // and must cover most of n on this near-complete fixture.
    val expSum = r.agg(sum("expected")).head.getDouble(0)
    assert(expSum <= n + 1e-3 * r.count(), s"expected-sum exceeds n: $expSum vs $n")
    assert(expSum > 0.9 * n, s"expected-sum implausibly low: $expSum vs $n")
    r.unpersist()
  }
}
