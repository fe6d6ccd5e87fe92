package graft.ops

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Third relational batch (round 2): outer/cross/interval joins, EXISTS /
  * NOT EXISTS subqueries, unpivot, explode-with-position, distribution and
  * value window functions, filtered aggregation, array/regexp/bitwise scalar
  * families, systematic sampling, sliding windows.
  *
  * Same determinism contract as Relational/Relational2: total-order sort with
  * a unique tiebreak, NULLS FIRST/LAST spelled in the oracle, doubles through
  * DECIMAL where summed, computed ints cast BIGINT on both sides.
  */
object Relational3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val qs: Seq[Q] = Seq(

    // J: FULL OUTER join — per-customer F-order counts vs high-balance
    // customers; unmatched rows survive on BOTH sides (the MERGE J4 shape
    // before the coalesce step). Join key is unique per side, so the output
    // order is total.
    Q("j7_full_outer",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
        val c = t(s, dir, "customer")
          .filter(col("c_acctbal") > 5000)
          .select(col("c_custkey"), col("c_acctbal").as("acctbal"))
        o.join(c, o("o_custkey") === c("c_custkey"), "full_outer")
          .select(coalesce(o("o_custkey"), c("c_custkey")).as("custkey"),
            col("n_orders"), col("acctbal"))
          .orderBy("custkey")
      },
      Some("""WITH o AS (SELECT o_custkey, count(*) AS n_orders FROM orders
                         WHERE o_orderstatus = 'F' GROUP BY o_custkey),
                   c AS (SELECT c_custkey, c_acctbal AS acctbal FROM customer
                         WHERE c_acctbal > 5000)
              SELECT coalesce(o.o_custkey, c.c_custkey) AS custkey,
                     o.n_orders, c.acctbal
              FROM o FULL OUTER JOIN c ON o.o_custkey = c.c_custkey
              ORDER BY custkey ASC NULLS FIRST""")),

    // J: CROSS join — small dims only (5 regions × suppliers). At scale this
    // shape is only ever legal when one side broadcasts; Spark plans
    // BroadcastNestedLoopJoin here.
    Q("j8_cross_join",
      (s, dir) => t(s, dir, "region")
        .crossJoin(t(s, dir, "supplier").select("s_suppkey", "s_name"))
        .select("r_regionkey", "r_name", "s_suppkey")
        .orderBy("r_regionkey", "s_suppkey"),
      Some("""SELECT r_regionkey, r_name, s_suppkey
              FROM region CROSS JOIN supplier
              ORDER BY r_regionkey ASC NULLS FIRST, s_suppkey ASC NULLS FIRST""")),

    // J: interval (range) join with an equi key — signup→click attribution
    // within 1 hour. The user_id equi key makes this a shuffled sort-merge
    // join with the range as a residual predicate: the scalable form of a
    // range join (pure theta would be an O(n²) nested loop). LEFT join keeps
    // zero-click signups.
    Q("j9_interval_join",
      (s, dir) => {
        val e = t(s, dir, "events")
        val signups = e.filter(col("event_type") === "signup")
          .select(col("user_id").as("s_uid"), col("event_id").as("signup_id"),
            col("ts").as("s_ts"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id").as("c_uid"), col("ts").as("c_ts"))
        signups.join(clicks,
            col("s_uid") === col("c_uid") && col("c_ts") > col("s_ts") &&
              col("c_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"), "left")
          .groupBy("signup_id")
          .agg(count(col("c_ts")).as("n_clicks"))
          .orderBy("signup_id")
      },
      Some("""SELECT s.event_id AS signup_id, count(c.ts) AS n_clicks
              FROM events s LEFT JOIN events c
                ON c.user_id = s.user_id AND c.event_type = 'click'
                AND c.ts > s.ts AND c.ts <= s.ts + INTERVAL '1 hour'
              WHERE s.event_type = 'signup'
              GROUP BY s.event_id
              ORDER BY signup_id ASC NULLS FIRST""")),

    // R: correlated EXISTS — Catalyst decorrelates to a left-semi join
    // (RewritePredicateSubquery); SQL surface through the same session the
    // oracle sees.
    Q("r3_exists_subquery",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT c_custkey, c_name FROM customer c
                 WHERE EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_custkey = c.c_custkey
                                 AND o.o_orderpriority = '1-URGENT')
                 ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey, c_name FROM customer c
              WHERE EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderpriority = '1-URGENT')
              ORDER BY c_custkey ASC NULLS FIRST""")),

    // R: correlated NOT EXISTS — decorrelates to a left-anti join (the
    // null-safe way to spell NOT IN).
    Q("r3_not_exists_subquery",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT c_custkey, c_acctbal FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_custkey = c.c_custkey
                                     AND o.o_totalprice > 300000)
                 ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_custkey = c.c_custkey
                                  AND o.o_totalprice > 300000)
              ORDER BY c_custkey ASC NULLS FIRST""")),

    // U: UNPIVOT (wide→long melt) — Dataset.unpivot; value columns unify to
    // DOUBLE. Oracle spelled as the equivalent UNION ALL (dialect-portable).
    Q("u4_unpivot",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
          col("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")), "metric", "val")
        .orderBy("p_partkey", "metric"),
      Some("""SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val
              FROM part
              UNION ALL
              SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val
              FROM part
              ORDER BY p_partkey ASC NULLS FIRST, metric ASC NULLS FIRST""")),

    // E: posexplode (generator with ordinal) — one row per token with its
    // position; the Generate operator fans out inside the same stage (no
    // shuffle).
    Q("e1_posexplode",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"), posexplode(split(col("p_name"), " ")))
        .select(col("p_partkey"), col("pos").cast("long").as("pos"), col("col").as("word"))
        .orderBy("p_partkey", "pos"),
      Some("""SELECT p_partkey, CAST(i - 1 AS BIGINT) AS pos,
                string_split(p_name, ' ')[i] AS word
              FROM part, LATERAL (SELECT unnest(generate_series(1,
                     len(string_split(p_name, ' ')))) AS i) u
              ORDER BY p_partkey ASC NULLS FIRST, pos ASC NULLS FIRST""")),

    // W: distribution window functions — ntile / percent_rank / cume_dist.
    // The ORDER BY key (acctbal, custkey) is unique, so ranks are total on
    // both engines AND the distribution functions decompose exactly over a
    // global row number: rank = rn, percent_rank = (rn-1)/(n-1),
    // cume_dist = rn/n (no peers), ntile from the standard bucket formula.
    // The rn comes from GlobalWindows' value-bucketed two-pass rank — NO
    // SinglePartition window exchange anywhere in the plan (gated by
    // PlanAuditSpec), so the same plan ranks 100 TB across however many
    // W-wide value buckets the domain spans.
    Q("w5_distribution",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val ranked = GlobalWindows.withBucketedGlobalRank(
          cust.select("c_custkey", "c_acctbal"),
          floor(col("c_acctbal") / 500).cast("long"), "rn",
          col("c_acctbal"), col("c_custkey"))
        val total = cust.agg(count(lit(1)).as("__n"))
        ranked.crossJoin(broadcast(total))
          .select(col("c_custkey"), col("c_acctbal"),
            GlobalWindows.ntileFromRank(col("rn"), col("__n"), 4).as("quartile"),
            round((col("rn") - 1).cast("double") / (col("__n") - 1).cast("double"), 6).as("pr"),
            round(col("rn").cast("double") / col("__n").cast("double"), 6).as("cd"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal,
                CAST(ntile(4) OVER w AS BIGINT) AS quartile,
                round(percent_rank() OVER w, 6) AS pr,
                round(cume_dist() OVER w, 6) AS cd
              FROM customer
              WINDOW w AS (ORDER BY c_acctbal, c_custkey)
              ORDER BY c_custkey ASC NULLS FIRST""")),

    // W: value window functions — first/last/nth over an explicit full-frame
    // (the default frame stops at CURRENT ROW, which would make last_value a
    // running value on both engines).
    Q("w6_value_windows",
      (s, dir) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(desc("c_acctbal"), asc("c_custkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"),
            first(col("c_acctbal")).over(w).as("top_bal"),
            last(col("c_acctbal")).over(w).as("bottom_bal"),
            nth_value(col("c_acctbal"), 2).over(w).as("second_bal"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment,
                first_value(c_acctbal) OVER w AS top_bal,
                last_value(c_acctbal) OVER w AS bottom_bal,
                nth_value(c_acctbal, 2) OVER w AS second_bal
              FROM customer
              WINDOW w AS (PARTITION BY c_mktsegment
                           ORDER BY c_acctbal DESC, c_custkey ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              ORDER BY c_custkey ASC NULLS FIRST""")),

    // A: conditional / filtered aggregation — CASE-gated counts and sums in
    // one grouped pass (no per-condition scans).
    Q("a8_filtered_agg",
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          count(when(col("o_orderstatus") === "O", lit(1))).as("n_o"),
          sum(when(col("o_totalprice") > 200000,
            col("o_totalprice").cast("decimal(18,2)"))).cast("double").as("big_total"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
                CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
                count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
                CAST(sum(CASE WHEN o_totalprice > 200000
                          THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS big_total
              FROM orders GROUP BY o_orderpriority
              ORDER BY o_orderpriority ASC NULLS FIRST""")),

    // F: array function family over the embedding column — size / index /
    // min / max / slice+fold, all codegen'd higher-order expressions.
    Q("f_array_funcs",
      (s, dir) => t(s, dir, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("first_v"),
          round(array_max(col("embedding")).cast("double"), 6).as("max_v"),
          round(array_min(col("embedding")).cast("double"), 6).as("min_v"),
          round(aggregate(slice(col("embedding"), 1, 8), lit(0.0),
            (a, x) => a + x.cast("double")), 6).as("head_sum"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
                round(CAST(embedding[1] AS DOUBLE), 6) AS first_v,
                round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_v,
                round(CAST(list_min(embedding) AS DOUBLE), 6) AS min_v,
                round(list_sum(list_transform(embedding[1:8],
                  x -> CAST(x AS DOUBLE))), 6) AS head_sum
              FROM embeddings ORDER BY vec_id ASC NULLS FIRST""")),

    // F: regexp family — extract / replace-all / match predicate. (DuckDB
    // needs the 'g' flag to match Spark's replace-ALL semantics.)
    Q("f_regexp",
      (s, dir) => t(s, dir, "part")
        .filter(col("p_name").rlike("widget|bolt"))
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
                regexp_extract(p_name, '^(\w+)', 1) AS first_word,
                regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels
              FROM part WHERE regexp_matches(p_name, 'widget|bolt')
              ORDER BY p_partkey ASC NULLS FIRST""")),

    // F: bitwise family on BIGINT keys.
    Q("f_bitwise",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          col("o_orderkey").bitwiseAND(lit(255L)).as("and_lo"),
          col("o_orderkey").bitwiseOR(lit(4096L)).as("or_hi"),
          col("o_orderkey").bitwiseXOR(lit(1L)).as("xor1"),
          shiftleft(col("o_orderkey"), 2).as("shl2"),
          shiftright(col("o_orderkey"), 1).as("shr1"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                o_orderkey & 255 AS and_lo,
                o_orderkey | 4096 AS or_hi,
                xor(o_orderkey, 1) AS xor1,
                o_orderkey << 2 AS shl2,
                o_orderkey >> 1 AS shr1
              FROM orders WHERE o_orderkey < 1000
              ORDER BY o_orderkey ASC NULLS FIRST""")),

    // W: RANGE frame — the frame boundary is a VALUE offset (acctbal − 500),
    // not a row count; peer rows (ties) enter the frame together on both
    // engines, so a bare value ordering stays deterministic.
    //
    // De-globalized (VERDICT r2 #1): instead of one SinglePartition window,
    // bucket rows by the DETERMINISTIC value expression floor(v / W) with
    // W (2000) ≥ frame width (500) — a row's frame [v−500, v] then spans at
    // most its own bucket and the one below, so replicating each row within
    // 500 of its upper bucket boundary as a "ghost" into bucket+1 makes
    // every frame computable bucket-locally (ghosts feed sums, originals
    // produce output; a bucket's frames can never reach past the adjacent
    // bucket because W > frame width). Pure expressions end to end: one
    // hash shuffle on the bucket id, no range-boundary sampling, no
    // partition-id capture, no materialization barrier. Ghost traffic is
    // the frame/W fraction of rows (25% here). Equal values share a bucket
    // by construction, so peers never split, and the frame sum stays in
    // exact DECIMAL, so re-bucketing cannot change it.
    // Round-6 refinement (2.05 → 1.2 s warm at sf0.1): two compounding
    // rewrites over the r2 ghost-bucket form.
    //
    // 1. PER-VALUE, not per-row: the frame answer depends only on the VALUE
    //    (RANGE peers share their frame by definition), so all computation
    //    runs over the DISTINCT value inventory with per-value weight sums,
    //    and rows take their answer by a broadcast join back. D is bounded
    //    by the value DOMAIN (~1.1M for 2-decimal acctbal), not the corpus:
    //    at 1000× the rows the window stage does not grow at all.
    // 2. PREFIX DIFFERENCE, not a sliding frame: Spark re-aggregates a
    //    bounded RANGE frame from scratch for every row (no retraction) —
    //    O(D·frame_values) even after (1). frame_sum(v) = P(v) − P(<v−500)
    //    needs only running sums, which ARE incremental (O(D)): anchors
    //    (value, weight) and probes (key = v−500) interleave into one
    //    stream ordered by (key, tag), and a single bucketed global prefix
    //    sum (GlobalWindows — no SinglePartition) reads P(v) at each anchor
    //    and P(<v−500) at each probe. WEIGHTS are integer cents (prefix
    //    offsets add exactly; the one double division at the end equals the
    //    old decimal→double cast for any corpus whose total cents stay
    //    under 2^53, ~9×10¹³ dollars), but the BOUNDARY key is the IEEE
    //    double fl(v) − 500, NOT a decimal-grid cutoff: both Spark's RANGE
    //    frame and DuckDB's evaluate `w ≥ v − 500` in doubles, so a value
    //    exactly 500.00 below v is in or out of the frame depending on the
    //    SIGN of the two values' representation errors (εw ≥ εv) — a clean
    //    cents cutoff diverged on 11 of 15,000 rows at sf0.1. Probes tag
    //    BEFORE anchors at an equal key so a boundary-equal anchor
    //    (fl(w) = fl(v) − 500, in-frame under ≥) stays out of P(<v−500).
    Q("w7_range_frame",
      (s, dir) => {
        val cents = expr("CAST(round(c_acctbal * 100) AS BIGINT)")
        val dv = t(s, dir, "customer")
          .groupBy("c_acctbal").agg(sum(cents).as("w"))
          .withColumn("vc", cents)
        val anchors = dv.select(col("vc"), col("c_acctbal").as("key"),
          lit(1).as("tag"), col("w"))
        val probes = dv.select(col("vc"), (col("c_acctbal") - 500.0d).as("key"),
          lit(0).as("tag"), lit(0L).as("w"))
        val ps = GlobalWindows.withBucketedPrefixSum(
          anchors.unionByName(probes), floor(col("key") / 2000.0d),
          col("w"), "ps", col("key"), col("tag"))
        // Both prefix reads for a value re-meet by a PIVOT on vc (one
        // constant-width agg) — no ps self-join, ps evaluated once.
        val perValue = ps.groupBy("vc").agg(
            max(when(col("tag") === 1, col("ps"))).as("p_hi"),
            max(when(col("tag") === 0, col("ps"))).as("p_lo"))
          .select(col("vc").as("__vc"),
            ((col("p_hi") - col("p_lo")).cast("double") / 100.0).as("nearby_sum"))
        t(s, dir, "customer").select("c_custkey", "c_acctbal")
          .join(broadcast(perValue),
            expr("CAST(round(c_acctbal * 100) AS BIGINT)") <=> col("__vc"))
          .select(col("c_custkey"), col("c_acctbal"), col("nearby_sum"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal,
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) OVER
                  (ORDER BY c_acctbal RANGE BETWEEN 500 PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS nearby_sum
              FROM customer ORDER BY c_custkey ASC NULLS FIRST""")),

    // A: median (interpolated) per group.
    Q("a9_median",
      (s, dir) => t(s, dir, "customer")
        .groupBy("c_mktsegment")
        .agg(round(median(col("c_acctbal")), 6).as("med"),
          count(lit(1)).as("n"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, round(median(c_acctbal), 6) AS med, count(*) AS n
              FROM customer GROUP BY c_mktsegment
              ORDER BY c_mktsegment ASC NULLS FIRST""")),

    // A: ordered string aggregation (LISTAGG / string_agg) — spelled as
    // sorted-distinct + join so the element order is total on both engines.
    Q("a10_listagg",
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
          .as("statuses"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
                string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
              FROM orders GROUP BY o_orderpriority
              ORDER BY o_orderpriority ASC NULLS FIRST""")),

    // W: top-k per group via the typed Aggregator UDAF — single pass,
    // k-bounded heap per partition, heap-union merge: no per-group sort, no
    // shuffle of anything but k rows per partition. The oracle is the
    // window row_number formulation (identical semantics incl. the
    // (price DESC, orderkey DESC) tiebreak the heap ordering implies), so
    // the custom Aggregator is hash-checked against DuckDB, not just spec'd.
    Q("w8_topk_udaf",
      (s, dir) => {
        val topk = udaf(new graft.functions.TopKAggregator(3))
        t(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(topk(col("o_orderkey"), col("o_totalprice")).as("top"))
          .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("i", "p")))
          .select(col("o_orderpriority"), (col("i") + 1).cast("long").as("rank"),
            col("p._1").as("o_orderkey"), col("p._2").as("o_totalprice"))
          .orderBy("o_orderpriority", "rank")
      },
      Some("""SELECT o_orderpriority, CAST(rn AS BIGINT) AS rank,
                     o_orderkey, o_totalprice
              FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                      row_number() OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
                    FROM orders)
              WHERE rn <= 3
              ORDER BY o_orderpriority ASC NULLS FIRST, rank ASC NULLS FIRST""")),

    // O: keyset (seek) pagination — the scale-correct page loop: WHERE
    // key > last-seen ORDER BY key LIMIT n. OFFSET pagination (o2) scans
    // and discards `offset` rows per page (O(pages²) total work); keyset
    // resumes from the index point, O(page) per page, and the predicate
    // pushes into the scan.
    Q("o3_keyset_pagination",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderkey") > 5000)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(100),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_orderkey > 5000
              ORDER BY o_orderkey ASC NULLS FIRST LIMIT 100""")),

    // A: approximate percentiles (quantile sketch — the partial-aggregable
    // companion to a6's exact interpolation, like HLL is to count distinct).
    // The sketch estimate is engine-specific, so it never reaches the
    // output: the query emits the EXACT interpolated quantiles plus pass
    // flags asserting the sketch landed within 5% relative — the oracle
    // pins the exact values and expects the flags TRUE, so estimator drift
    // fails the hash gate instead of hiding behind `no_oracle` (VERDICT r9
    // #7). The md5 bottom-k sibling below stays the hash-anchored
    // estimator.
    Q("a11_approx_percentile",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"),
            array(lit(0.5), lit(0.95)), lit(10000)).as("p"),
          // ONE exact-percentile buffer per group (the array form), not
          // one per quantile — the two-call form doubled the agg cost.
          expr("percentile(l_extendedprice, array(0.5, 0.95))").as("pe"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"),
          round(element_at(col("pe"), 1), 6).as("p50"),
          round(element_at(col("pe"), 2), 6).as("p95"), col("n"),
          (abs(element_at(col("p"), 1) - element_at(col("pe"), 1))
            <= element_at(col("pe"), 1) * 0.05).as("p50_ok"),
          (abs(element_at(col("p"), 2) - element_at(col("pe"), 2))
            <= element_at(col("pe"), 2) * 0.05).as("p95_ok"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
                round(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
                count(*) AS n, TRUE AS p50_ok, TRUE AS p95_ok
              FROM lineitem GROUP BY l_returnflag
              ORDER BY l_returnflag ASC NULLS FIRST""")),

    // A: the approximate-percentile tier's HASH-GATED member (VERDICT r7
    // #7, the x_sketch_hll_md5 move): a deterministic bottom-k sample
    // estimator — per group, the 200 rows with the smallest md5-60 row-key
    // hash are a uniform pseudo-random sample (the KMV/bottom-k sketch
    // property: membership is a pure function of row identity, so both
    // engines draw the IDENTICAL sample), and the exact interpolated
    // percentile OVER THE SAMPLE estimates the population quantile.
    // Spark-side the per-group bottom-k is two-phase so no window ever
    // sorts a group-sized partition: bucket-local rank (32 hash buckets)
    // keeps ≤200 per bucket, then the global per-group rank runs over
    // ≤ 32×200 bounded rows. Ties on the 60-bit hash break by the full
    // row key, so the sample is deterministic across engines and retries.
    Q("a11_approx_percentile_md5",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val li = t(s, dir, "lineitem")
        val hashed = li.select(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"),
          graft.functions.Md5Hash60(concat(col("l_orderkey").cast("string"),
            lit("-"), col("l_linenumber").cast("string"), lit(":pct"))).as("hk"))
        val local = hashed
          .withColumn("bkt", pmod(col("hk"), lit(32L)))
          .withColumn("rn", row_number().over(
            Window.partitionBy("l_returnflag", "bkt")
              .orderBy("hk", "l_orderkey", "l_linenumber")))
          .filter(col("rn") <= 200).drop("rn")
        val sample = local
          .withColumn("rn", row_number().over(
            Window.partitionBy("l_returnflag")
              .orderBy("hk", "l_orderkey", "l_linenumber")))
          .filter(col("rn") <= 200)
        val est = sample.groupBy("l_returnflag")
          .agg(round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50"),
            round(expr("percentile(l_extendedprice, 0.95)"), 6).as("p95"))
        val n = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        est.join(n, "l_returnflag").orderBy("l_returnflag")
      },
      Some("""WITH h AS (
                SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
                  ('0x' || substr(md5(l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR || ':pct'), 1, 15))::BIGINT AS hk
                FROM lineitem),
              s AS (SELECT * FROM (
                  SELECT *, row_number() OVER (PARTITION BY l_returnflag
                    ORDER BY hk ASC NULLS FIRST, l_orderkey ASC NULLS FIRST,
                      l_linenumber ASC NULLS FIRST) AS rn
                  FROM h) WHERE rn <= 200),
              est AS (SELECT l_returnflag,
                  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
                  round(quantile_cont(l_extendedprice, 0.95), 6) AS p95
                FROM s GROUP BY l_returnflag),
              n AS (SELECT l_returnflag, count(*) AS n
                FROM lineitem GROUP BY l_returnflag)
              SELECT l_returnflag, p50, p95, n
              FROM est JOIN n USING (l_returnflag)
              ORDER BY l_returnflag ASC NULLS FIRST""")),

    // R: conversion funnel — per-user first-touch (min click ts) joined to
    // subsequent purchases. Two grouped passes + one equi join with a
    // residual time predicate; the funnel summary (step counts, conversion)
    // is then a trivial rollup of this per-user table.
    Q("r4_funnel",
      (s, dir) => {
        val e = t(s, dir, "events")
        val firstClick = e.filter(col("event_type") === "click")
          .groupBy("user_id").agg(min("ts").as("first_click"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_uid"), col("ts").as("p_ts"))
        firstClick.join(purchases,
            col("user_id") === col("p_uid") && col("p_ts") > col("first_click"), "left")
          .groupBy("user_id", "first_click")
          .agg(count(col("p_ts")).as("n_purchases_after"))
          .orderBy("user_id")
      },
      Some("""WITH c AS (SELECT user_id, min(ts) AS first_click FROM events
                         WHERE event_type = 'click' GROUP BY user_id)
              SELECT c.user_id, c.first_click, count(e.ts) AS n_purchases_after
              FROM c LEFT JOIN events e
                ON e.user_id = c.user_id AND e.event_type = 'purchase'
                AND e.ts > c.first_click
              GROUP BY c.user_id, c.first_click
              ORDER BY c.user_id ASC NULLS FIRST""")),

    // X: systematic (deterministic) sampling — key-mod selection, the
    // reproducible cluster-safe sample (seeded Bernoulli sampling is
    // engine-RNG-specific, so it has no cross-engine oracle).
    Q("x_sample_systematic",
      (s, dir) => t(s, dir, "orders")
        .filter(pmod(col("o_orderkey"), lit(20)) === 3)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_orderkey % 20 = 3
              ORDER BY o_orderkey ASC NULLS FIRST"""))
  )
}
