package graft.ops

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fourth relational tier: statistical moments, argmin/argmax aggregates,
  * bool/bit aggregates, an AS-OF join in the scalable union-merge shape, and
  * the LATERAL correlated-subquery SQL surface.
  *
  * The float-determinism contract matches the rest of the engine: any value
  * the DuckDB hash gate compares is either integer/decimal-exact, or a
  * DOUBLE produced by the IDENTICAL IEEE expression tree over decimal-exact
  * inputs in both engines (the x_feat_zscore / label-centroid idiom), so the
  * hashes cannot move with partitioning, parallelism, or corpus size.
  */
object Relational4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Exact-sum moment kernel shared VERBATIM by the Spark side and the
    * oracle text: per-group n, Σx, Σy, Σx², Σxy, Σy² — exact at any row
    * count — surfaced as DOUBLE for the final closed-form expressions. One
    * partial→final aggregation pass; no second scan, no
    * variance-of-differences numerical trap.
    *
    * The sums run on SCALED LONGS, not wide decimals: the monetary inputs
    * carry ≤2 decimals, so ×100 makes them exact BIGINTs, and each wide
    * product sum is carried as TWO long sums (quotient/remainder by 10⁶ —
    * the split keeps every accumulator within int64 up to ~8×10¹⁰ rows per
    * group, far past any 100 TB group). The previous DECIMAL(19,6) ×
    * DECIMAL(18,6) formulation was value-identical but 5× slower end-to-end
    * (1.62 s vs 0.30 s warm at sf0.1): precision-38 products knock Spark's
    * sum off the long-backed fast path onto Int128/BigDecimal state. The
    * split-sum text stays engine-portable (no div/`//` divergence) because
    * the quotient is an EXACTLY-divisible true division — both engines
    * compute it as an exact integer-valued double, cast back to BIGINT
    * before summing. */
  private val momentScaled = Seq(
    "CAST(round(l_quantity * 100) AS BIGINT) AS qs",
    "CAST(round(l_extendedprice * 100) AS BIGINT) AS ps")

  private val momentAggs = Seq(
    "count(*) AS n",
    "sum(qs) AS sxi",
    "sum(ps) AS syi",
    "sum(CAST((qs * qs - (qs * qs) % 1000000) / 1000000 AS BIGINT)) AS xxh",
    "sum((qs * qs) % 1000000) AS xxl",
    "sum(CAST((qs * ps - (qs * ps) % 1000000) / 1000000 AS BIGINT)) AS xyh",
    "sum((qs * ps) % 1000000) AS xyl",
    "sum(CAST((ps * ps - (ps * ps) % 1000000) / 1000000 AS BIGINT)) AS yyh",
    "sum((ps * ps) % 1000000) AS yyl")

  /** Reassemble the exact integer sums into the DOUBLE moments the finals
    * consume: Σx = sxi/10², Σx² = (xxh·10⁶ + xxl)/10⁴. The double rounding
    * happens HERE, once, identically in both engines — the accumulators
    * themselves are exact. */
  private val momentDoubles = Seq(
    "CAST(sxi AS DOUBLE) / 100.0 AS sx",
    "CAST(syi AS DOUBLE) / 100.0 AS sy",
    "(CAST(xxh AS DOUBLE) * 1000000.0 + CAST(xxl AS DOUBLE)) / 10000.0 AS sxx",
    "(CAST(xyh AS DOUBLE) * 1000000.0 + CAST(xyl AS DOUBLE)) / 10000.0 AS sxy",
    "(CAST(yyh AS DOUBLE) * 1000000.0 + CAST(yyl AS DOUBLE)) / 10000.0 AS syy")

  // Degenerate groups guarded IDENTICALLY in both engines: Spark (non-ANSI)
  // yields NULL on x/0 while DuckDB yields IEEE inf/NaN, so an unguarded
  // single-row or zero-variance group would hash-diverge. CASE + nullif are
  // spelled once and shared, keeping both sides on the same NULL.
  private val momentFinal = Seq(
    "CASE WHEN n > 1 THEN round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) END AS stddev_qty",
    "CASE WHEN n > 1 THEN round(sqrt((syy - sy * sy / n) / (n - 1)), 6) END AS stddev_price",
    "round((n * sxy - sx * sy) / nullif(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy), 0), 6) AS corr_qty_price")

  /** Daily-revenue series overlap-partitioned for bounded rolling windows:
    * fixed 128-row BLOCKS from the bucketed global rank (GlobalWindows —
    * no SinglePartition exchange), with each block's last `carry` rows
    * replicated into the NEXT block as frame-feed helpers (helper = true
    * rows are dropped on output). Count-based blocks — unlike calendar
    * buckets — make the carry precondition unconditional: every non-first
    * block's predecessor has exactly 128 ≥ carry rows, no matter how
    * sparse the series (a month-bucketed first cut broke at sf0.001, where
    * months routinely observe fewer than 19 days). A window over
    * (partitionBy "blk", orderBy "rn") with a ≤ carry-row preceding frame
    * then equals the global-window formulation exactly. */
  private val RollBlock = 128

  private def overlapPartitionedDaily(s: SparkSession, dir: String,
                                      carry: Int): DataFrame = {
    require(carry < RollBlock, s"carry must be < block size $RollBlock")
    val daily = t(s, dir, "orders")
      .groupBy(date_trunc("day", col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
    val ranked = GlobalWindows.withBucketedGlobalRank(daily,
      date_trunc("month", col("d")).cast("timestamp").cast("long"), "rn", col("d"))
      .withColumn("blk", expr(s"(rn - 1) div $RollBlock"))
    val helpers = ranked
      .filter(expr(s"(rn - 1) % $RollBlock >= ${RollBlock - carry}"))
      .withColumn("blk", col("blk") + 1)
      .withColumn("helper", lit(true))
    ranked.withColumn("helper", lit(false)).unionByName(helpers)
  }

  val qs: Seq[Q] = Seq(

    // Per-group standard deviation and Pearson correlation from ONE
    // aggregation pass of exact decimal sums (n, Σx, Σy, Σx², Σxy, Σy²).
    // The partial aggregates are map-side combinable constant-width state —
    // the shape that scales to any corpus — and the closed-form finals run
    // on exact inputs, so there is no catastrophic cancellation drift and
    // no summation-order dependence for the gate to trip on.
    Q("a12_stats_moments",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_returnflag") +: momentScaled.map(expr): _*)
        .groupBy("l_returnflag")
        .agg(expr(momentAggs.head), momentAggs.tail.map(expr): _*)
        .select(col("l_returnflag") +: col("n") +: momentDoubles.map(expr): _*)
        .select(col("l_returnflag") +: col("n") +: momentFinal.map(expr): _*)
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag, n, ${momentFinal.mkString(", ")}
              FROM (SELECT l_returnflag, n, ${momentDoubles.mkString(", ")}
                    FROM (SELECT l_returnflag, ${momentAggs.mkString(", ")}
                          FROM (SELECT l_returnflag, ${momentScaled.mkString(", ")}
                                FROM lineitem)
                          GROUP BY l_returnflag))
              ORDER BY l_returnflag ASC NULLS FIRST""")),

    // Argmin/argmax (max_by/min_by) + deterministic mode. The struct-valued
    // ordering key (value, unique id) removes tie nondeterminism — the same
    // trick makes the mode deterministic: mode = max_by over (count, value).
    // Both are single partial→final aggregations (constant state per group);
    // the oracle spells the identical semantics with rank windows.
    Q("a13_argminmax",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val mm = o.groupBy("o_orderpriority").agg(
          expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))").as("top_okey"),
          expr("min_by(o_orderkey, struct(o_totalprice, o_orderkey))").as("bottom_okey"))
        val md = o.groupBy("o_orderpriority", "o_orderstatus")
          .agg(count(lit(1)).as("cnt"))
          .groupBy("o_orderpriority")
          .agg(expr("max_by(o_orderstatus, struct(cnt, o_orderstatus))").as("mode_status"))
        mm.join(md, "o_orderpriority").orderBy("o_orderpriority")
      },
      Some("""WITH ranked AS (
                SELECT o_orderpriority, o_orderkey,
                  row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey DESC) AS rt,
                  row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice ASC, o_orderkey ASC) AS rb
                FROM orders),
              mm AS (SELECT o_orderpriority,
                       max(CASE WHEN rt = 1 THEN o_orderkey END) AS top_okey,
                       max(CASE WHEN rb = 1 THEN o_orderkey END) AS bottom_okey
                     FROM ranked GROUP BY o_orderpriority),
              c AS (SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
                    FROM orders GROUP BY o_orderpriority, o_orderstatus),
              m AS (SELECT o_orderpriority, o_orderstatus AS mode_status,
                      row_number() OVER (PARTITION BY o_orderpriority
                        ORDER BY cnt DESC, o_orderstatus DESC) AS r
                    FROM c)
              SELECT mm.o_orderpriority, top_okey, bottom_okey, mode_status
              FROM mm JOIN m ON mm.o_orderpriority = m.o_orderpriority AND m.r = 1
              ORDER BY mm.o_orderpriority ASC NULLS FIRST""")),

    // bool_and / bool_or / bit_and / bit_or / bit_xor — integer- and
    // boolean-exact grouped aggregates, all partial→final combinable.
    Q("a14_bool_bit_aggs",
      (s, dir) => t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          expr("bool_and(value > 50)").as("all_gt50"),
          expr("bool_or(value > 900)").as("any_gt900"),
          expr("bit_and(event_id)").as("band"),
          expr("bit_or(event_id)").as("bor"),
          expr("bit_xor(event_id)").as("bxor"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
                bool_and(value > 50) AS all_gt50,
                bool_or(value > 900) AS any_gt900,
                bit_and(event_id) AS band,
                bit_or(event_id) AS bor,
                bit_xor(event_id) AS bxor
              FROM events GROUP BY event_type
              ORDER BY event_type ASC NULLS FIRST""")),

    // AS-OF join (each event matched to the latest order of the same
    // customer at or before the event time) in the union-merge shape: tag
    // both streams, ONE shuffle on the key, one ordered window pass carrying
    // the last order id forward — never a per-event range probe. At 100 TB
    // this is a sort-merge over (key, ts): O(n log n) with no pair blowup,
    // while the oracle spells the same semantics as a declarative
    // inequality join + rank. Ties resolve deterministically: orders sort
    // before events at equal ts (<= semantics) and the max orderkey wins
    // among same-timestamp orders.
    Q("j10_asof_join",
      (s, dir) => {
        val ord = t(s, dir, "orders").select(
          col("o_custkey").as("k"), col("o_orderdate").as("ts"),
          col("o_orderkey").as("okey"), lit(0).as("side"),
          lit(null).cast("bigint").as("event_id"))
        val ev = t(s, dir, "events").select(
          col("user_id").as("k"), col("ts"),
          lit(null).cast("bigint").as("okey"), lit(1).as("side"),
          col("event_id"))
        val w = Window.partitionBy("k")
          .orderBy(col("ts"), col("side"), col("okey"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ord.unionByName(ev)
          .withColumn("asof_okey", last("okey", ignoreNulls = true).over(w))
          .filter(col("side") === 1 && col("asof_okey").isNotNull)
          .select(col("event_id"), col("k").as("user_id"), col("asof_okey"))
          .orderBy("event_id")
      },
      Some("""WITH m AS (
                SELECT e.event_id, e.user_id, o.o_orderkey,
                  row_number() OVER (PARTITION BY e.event_id
                    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS r
                FROM events e JOIN orders o
                  ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
              SELECT event_id, user_id, o_orderkey AS asof_okey
              FROM m WHERE r = 1
              ORDER BY event_id ASC NULLS FIRST""")),

    // Rolling 7-row median of daily revenue — the robust moving statistic
    // built-in window aggregates don't give you (Spark has no median-over-
    // frame). Spelled as the IDENTICAL element selection in both engines —
    // sort the frame's list, take element (n+1) div 2 — rather than a
    // native median() whose even-count averaging differs; the picked
    // element is a decimal-exact daily sum, so the result is hash-exact.
    // NO global window: the series is OVERLAP-PARTITIONED into fixed-size
    // blocks — each block's last 6 rows are replicated into the next block
    // as frame-feed helpers, the 7-row frame runs inside each bounded
    // partition, and helper rows are dropped on output
    // (see overlapPartitionedDaily; the first rows' short frames are the
    // series' own warm-up, identical in both engines).
    Q("w10_rolling_median",
      (s, dir) => {
        val w = Window.partitionBy("blk").orderBy("rn")
          .rowsBetween(-6, Window.currentRow)
        overlapPartitionedDaily(s, dir, carry = 6)
          .withColumn("meds", array_sort(collect_list(col("total")).over(w)))
          .filter(!col("helper"))
          .select(col("d"),
            col("total").cast("double").as("daily_total"),
            element_at(col("meds"), ((size(col("meds")) + 1) / 2).cast("int"))
              .cast("double").as("rolling_median_7"))
          .orderBy("d")
      },
      Some("""WITH daily AS (SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d,
                     sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
                   FROM orders GROUP BY 1),
              m AS (SELECT d, total,
                      list_sort(list(total) OVER (ORDER BY d ASC NULLS FIRST
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS meds
                    FROM daily)
              SELECT d, CAST(total AS DOUBLE) AS daily_total,
                     CAST(meds[(CAST(len(meds) AS INT) + 1) // 2] AS DOUBLE)
                       AS rolling_median_7
              FROM m ORDER BY d ASC NULLS FIRST""")),

    // Truncated EWMA (decay 0.75, 20-row horizon) of daily revenue over the
    // SAME overlap-partitioned substrate as the rolling median (carry = 19
    // helper rows). The smoothing weight α cancels between numerator and
    // denominator of the normalized form, so ewma = Σ xᵢ·λ^eᵢ / Σ λ^eᵢ with
    // λ = 0.75 and eᵢ = rows-from-current — both engines build the weighted
    // lists with an INDEXED lambda over the identical frame list and fold
    // left-to-right, then the floor(x·1e6+0.5)/1e6 surface kills any
    // half-ulp rounding divergence. Bounded per-row state (20 values); no
    // global window anywhere.
    Q("w11_ewma",
      (s, dir) => {
        val w = Window.partitionBy("blk").orderBy("rn")
          .rowsBetween(-19, Window.currentRow)
        overlapPartitionedDaily(s, dir, carry = 19)
          .withColumn("lst", collect_list(col("total").cast("double")).over(w))
          .filter(!col("helper"))
          .withColumn("num", expr(
            """aggregate(transform(lst,
              |  (x, i) -> x * pow(0.75D, CAST(size(lst) - 1 - i AS DOUBLE))),
              |  0D, (acc, v) -> acc + v)""".stripMargin))
          .withColumn("den", expr(
            """aggregate(transform(lst,
              |  (x, i) -> pow(0.75D, CAST(size(lst) - 1 - i AS DOUBLE))),
              |  0D, (acc, v) -> acc + v)""".stripMargin))
          .select(col("d"),
            col("total").cast("double").as("daily_total"),
            (floor(col("num") / col("den") * 1000000.0 + 0.5) / 1000000.0)
              .as("ewma_20"))
          .orderBy("d")
      },
      Some("""WITH daily AS (SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d,
                     sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
                   FROM orders GROUP BY 1),
              l AS (SELECT d, total,
                      list(CAST(total AS DOUBLE)) OVER (ORDER BY d ASC NULLS FIRST
                        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lst
                    FROM daily)
              SELECT d, CAST(total AS DOUBLE) AS daily_total,
                     floor(
                       list_sum(list_transform(lst,
                         (x, i) -> x * pow(0.75, CAST(len(lst) - i AS DOUBLE))))
                       / list_sum(list_transform(lst,
                         (x, i) -> pow(0.75, CAST(len(lst) - i AS DOUBLE))))
                       * 1000000.0 + 0.5) / 1000000.0 AS ewma_20
              FROM l ORDER BY d ASC NULLS FIRST""")),

    // LATERAL correlated subquery through the SQL front door: per-nation
    // top-2 customers by balance. Catalyst decorrelates the LIMIT'd lateral
    // into a rank-filter window (WindowGroupLimit — partial per-partition
    // top-k before the full sort), i.e. the same plan the DataFrame
    // formulation would produce: no per-row re-execution anywhere.
    Q("j11_lateral_topn",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT n.n_name, t.c_custkey, t.c_acctbal
                 FROM nation n JOIN LATERAL (
                   SELECT c_custkey, c_acctbal FROM customer
                   WHERE c_nationkey = n.n_nationkey
                   ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2) t
                 ORDER BY n.n_name ASC NULLS FIRST, t.c_acctbal DESC,
                          t.c_custkey ASC""")
      },
      Some("""SELECT n.n_name, t.c_custkey, t.c_acctbal
              FROM nation n JOIN LATERAL (
                SELECT c_custkey, c_acctbal FROM customer
                WHERE c_nationkey = n.n_nationkey
                ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2) t ON true
              ORDER BY n.n_name ASC NULLS FIRST, t.c_acctbal DESC,
                       t.c_custkey ASC"""))
  )
}
