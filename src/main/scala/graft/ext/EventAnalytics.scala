package graft.ext

import graft.Tables
import graft.ops.Q
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Event-stream product analytics (SURVEY.md §2.11 extension tier): the
  * queries a training-data/product pipeline runs over a clickstream table —
  * Markov transition matrices, cohort retention, linear interpolation over a
  * regular grid, and a contingency table with per-cell chi-square
  * contributions.
  *
  * Determinism contract (the engine-wide idiom): every hash-compared value is
  * either integer-exact (counts, ppm fixed-point via floor division on
  * positive BIGINTs — Spark `div` ≡ DuckDB `//`) or a DOUBLE produced by the
  * identical IEEE expression tree over exact inputs in both engines, rounded
  * at the surface. No global double sums — summation-order dependence is what
  * trips a hash gate when partitioning changes.
  */
object EventAnalytics {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  val qs: Seq[Q] = Seq(

    // First-order Markov transition matrix over per-user event sequences:
    // (from_type → to_type) counts plus an integer-ppm row-normalized
    // probability. One shuffle keys the sequence window by user_id (the
    // sessionization partitioning — bounded per-user state, any corpus
    // size), one constant-width groupBy produces the |types|² matrix.
    Q("w9_transition_counts",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val steps = ev(s, dir)
          .select(col("user_id"), col("event_type").as("from_t"),
            col("ts"), col("event_id"))
          .withColumn("to_t", lead("from_t", 1).over(w))
          .filter(col("to_t").isNotNull)
        val n = steps.groupBy("from_t", "to_t").agg(count(lit(1)).as("n"))
        val tot = n.groupBy("from_t").agg(sum("n").as("row_n"))
        n.join(broadcast(tot), "from_t")
          .select(col("from_t"), col("to_t"), col("n"),
            expr("n * 1000000L div row_n").as("p_ppm"))
          .orderBy("from_t", "to_t")
      },
      Some("""WITH s AS (SELECT user_id, event_type AS from_t,
                     lead(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST) AS to_t
                   FROM events),
              n AS (SELECT from_t, to_t, count(*) AS n FROM s
                    WHERE to_t IS NOT NULL GROUP BY from_t, to_t),
              tot AS (SELECT from_t, sum(n) AS row_n FROM n GROUP BY from_t)
              -- DuckDB sum(n) is HUGEINT, so the ppm quotient inherits HUGEINT
              -- and the harness renders it float64 against Spark's BIGINT;
              -- the terminal CAST restores the shared integer type.
              SELECT n.from_t, to_t, n, CAST(n * 1000000 // row_n AS BIGINT) AS p_ppm
              FROM n JOIN tot ON n.from_t = tot.from_t
              ORDER BY n.from_t ASC NULLS FIRST, to_t ASC NULLS FIRST""")),

    // Weekly cohort retention: users bucketed by the week of their first
    // event; each later active week counts into (cohort_week, week_offset).
    // Two aggregations (per-user min, per-user-week distinct) and one final
    // grouped count-distinct — all shuffle-keyed by user/cohort, nothing
    // data-squared. Offsets are exact integer day-diffs / 7.
    Q("x_cohort_retention",
      (s, dir) => {
        // Explicit TIMESTAMP on both sides: Spark date_trunc yields
        // TIMESTAMP, DuckDB yields DATE at week granularity — and DATE
        // round-trips differently through the comparison harness, so the
        // cast to the common TIMESTAMP type is the contract.
        val e = ev(s, dir)
        val cohort = e.groupBy("user_id")
          .agg(date_trunc("week", min("ts")).as("cw"))
        val weekly = e
          .select(col("user_id"), date_trunc("week", col("ts")).as("aw"))
          .distinct()
        weekly.join(cohort, "user_id")
          .groupBy(col("cw"),
            (datediff(col("aw"), col("cw")) / 7).cast("int").as("week_offset"))
          .agg(countDistinct("user_id").as("n_users"))
          .orderBy("cw", "week_offset")
      },
      Some("""WITH cohort AS (SELECT user_id,
                     CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cw
                   FROM events GROUP BY user_id),
              weekly AS (SELECT DISTINCT user_id,
                     CAST(date_trunc('week', ts) AS TIMESTAMP) AS aw
                   FROM events)
              SELECT cw, CAST(date_diff('day', cw, aw) // 7 AS INT) AS week_offset,
                     count(DISTINCT w.user_id) AS n_users
              FROM weekly w JOIN cohort c ON w.user_id = c.user_id
              GROUP BY cw, week_offset
              ORDER BY cw ASC NULLS FIRST, week_offset ASC NULLS FIRST""")),

    // Linear interpolation over the hourly grid (x_ts_gapfill's numeric
    // sibling — LOCF answers "what was the state", interpolation answers
    // "what was the trend"). prev/next observations come from two ignore-
    // nulls window passes over the SAME per-entity partitioning as gapfill
    // (one shuffle, reused by both windows); the blend
    // prev + (next-prev) · frac runs on doubles from decimal-exact hourly
    // sums with integer hour positions, the same IEEE tree in both engines,
    // rounded at the surface. Observed rows pass hv through untouched; a
    // tail with no next observation falls back to LOCF.
    Q("x_ts_interpolate",
      (s, dir) => {
        val wb = Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wf = Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        Enrich.hourlyGridJoined(s, dir)
          .withColumn("eh", unix_timestamp(col("h")))
          .withColumn("pv", last(col("hv"), ignoreNulls = true).over(wb))
          .withColumn("ph", last(when(col("hv").isNotNull, col("eh")),
            ignoreNulls = true).over(wb))
          .withColumn("nv", first(col("hv"), ignoreNulls = true).over(wf))
          .withColumn("nh", first(when(col("hv").isNotNull, col("eh")),
            ignoreNulls = true).over(wf))
          // floor(x·1e6 + 0.5)/1e6 instead of round(x, 6): the blend can
          // land exactly on a half-ulp boundary where the engines' round()
          // tie-breaking differs; floor(+0.5) is a pure function of the
          // (identical) double — the int8-quantization idiom.
          .withColumn("interp",
            floor((when(col("hv").isNotNull, col("hv"))
              .when(col("nv").isNull, col("pv"))
              .otherwise(col("pv") + (col("nv") - col("pv")) *
                ((col("eh") - col("ph")).cast("double") /
                  (col("nh") - col("ph")).cast("double")))) * 1000000.0 + 0.5)
              / 1000000.0)
          .select(col("user_id"), col("h"), col("interp"),
            col("hv").isNull.as("is_gap"))
          .orderBy("user_id", "h")
      },
      Some("""WITH hourly AS (SELECT user_id, date_trunc('hour', ts) AS h,
                     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hv
                   FROM events WHERE user_id < 50 GROUP BY 1, 2),
              b AS (SELECT user_id, min(h) AS h0, max(h) AS h1
                    FROM hourly GROUP BY 1),
              g AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
                    FROM b),
              j AS (SELECT g.user_id, g.h, epoch(g.h) AS eh, hourly.hv
                    FROM g LEFT JOIN hourly
                      ON g.user_id = hourly.user_id AND g.h = hourly.h),
              w AS (SELECT user_id, h, hv,
                      last_value(hv IGNORE NULLS) OVER (PARTITION BY user_id
                        ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                      last_value(CASE WHEN hv IS NOT NULL THEN eh END IGNORE NULLS)
                        OVER (PARTITION BY user_id
                        ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
                      first_value(hv IGNORE NULLS) OVER (PARTITION BY user_id
                        ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                      first_value(CASE WHEN hv IS NOT NULL THEN eh END IGNORE NULLS)
                        OVER (PARTITION BY user_id
                        ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh,
                      eh
                    FROM j)
              SELECT user_id, h,
                     floor((CASE WHEN hv IS NOT NULL THEN hv
                                WHEN nv IS NULL THEN pv
                                ELSE pv + (nv - pv) *
                                  (CAST(eh - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE))
                           END) * 1000000.0 + 0.5) / 1000000.0 AS interp,
                     hv IS NULL AS is_gap
              FROM w
              ORDER BY user_id ASC NULLS FIRST, h ASC NULLS FIRST""")),

    // RFM (recency / frequency / monetary) customer scoring over purchase
    // events — the classic segmentation every commerce pipeline computes.
    // One grouped aggregation per user (constant-width combinable state)
    // plus a broadcast 1-row reference timestamp; recency is an exact
    // integer day-diff against the corpus max, monetary a decimal-exact sum
    // surfaced as DOUBLE, and the segment rule is a fixed integer CASE —
    // every output hash-stable.
    Q("x_events_rfm",
      (s, dir) => {
        val p = ev(s, dir).filter(col("event_type") === "purchase")
        val ref = p.agg(max("ts").as("ref_ts"))
        p.groupBy("user_id")
          .agg(max("ts").as("last_ts"), count(lit(1)).as("frequency"),
            sum(col("value").cast("decimal(18,2)")).as("mon"))
          .crossJoin(broadcast(ref))
          .select(col("user_id"),
            datediff(col("ref_ts"), col("last_ts")).cast("long").as("recency_days"),
            col("frequency"),
            col("mon").cast("double").as("monetary"),
            when(datediff(col("ref_ts"), col("last_ts")) <= 7 &&
              col("frequency") >= 10, "champion")
              .when(col("frequency") >= 10, "loyal")
              .when(datediff(col("ref_ts"), col("last_ts")) <= 7, "recent")
              .otherwise("at_risk").as("segment"))
          .orderBy("user_id")
      },
      Some("""WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
              ref AS (SELECT max(ts) AS ref_ts FROM p),
              g AS (SELECT user_id, max(ts) AS last_ts, count(*) AS frequency,
                      sum(CAST(value AS DECIMAL(18,2))) AS mon
                    FROM p GROUP BY user_id)
              SELECT user_id,
                     date_diff('day', CAST(last_ts AS DATE), CAST(ref_ts AS DATE))
                       AS recency_days,
                     frequency,
                     CAST(mon AS DOUBLE) AS monetary,
                     CASE WHEN date_diff('day', CAST(last_ts AS DATE), CAST(ref_ts AS DATE)) <= 7
                            AND frequency >= 10 THEN 'champion'
                          WHEN frequency >= 10 THEN 'loyal'
                          WHEN date_diff('day', CAST(last_ts AS DATE), CAST(ref_ts AS DATE)) <= 7
                            THEN 'recent'
                          ELSE 'at_risk' END AS segment
              FROM g CROSS JOIN ref
              ORDER BY user_id ASC NULLS FIRST""")),

    // Session path mining: sessionize (same 30-min gaps-and-islands as
    // st_sessions), concatenate each session's ordered event types into a
    // path string, count sessions per path, keep the top 20. The
    // session-id window and the path aggregation share ONE user-keyed
    // shuffle; path counts are |distinct paths|-sized; the final top-k is
    // TakeOrderedAndProject. Path assembly is order-deterministic on both
    // sides: Spark sorts (ts, event_id, type) structs before joining,
    // DuckDB orders string_agg the same way.
    Q("x_session_paths",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sess = ev(s, dir)
          .withColumn("prev_ts", lag("ts", 1).over(w))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        sess.groupBy("user_id", "session_id")
          .agg(array_join(expr(
            "transform(array_sort(collect_list(struct(ts, event_id, event_type)))," +
              " x -> x.event_type)"), ">").as("path"))
          .groupBy("path").agg(count(lit(1)).as("n_sessions"))
          .orderBy(desc("n_sessions"), asc("path"))
          .limit(20)
      },
      Some("""WITH marked AS (
                SELECT user_id, ts, event_id, event_type,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                       THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST)),
              sessions AS (
                SELECT user_id, ts, event_id, event_type,
                  sum(new_session) OVER (PARTITION BY user_id
                    ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
                FROM marked),
              paths AS (
                SELECT user_id, session_id,
                  string_agg(event_type, '>'
                    ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST) AS path
                FROM sessions GROUP BY user_id, session_id)
              SELECT path, count(*) AS n_sessions
              FROM paths GROUP BY path
              ORDER BY n_sessions DESC, path ASC
              LIMIT 20""")),

    // Contingency table event_type × value-quartile-bucket with expected
    // counts and per-cell chi-square contributions — the independence
    // diagnostic, emitted PER CELL (each cell is an independent double
    // expression over four integers) rather than as one global double sum,
    // which would be summation-order-dependent and break hash stability.
    // Observed/row/col/grand totals are one groupBy plus two broadcast-sized
    // marginal joins; nothing here grows beyond |types|·|buckets| rows.
    Q("a15_contingency_chi",
      (s, dir) => {
        val cells = ev(s, dir)
          .select(col("event_type"),
            least(floor(col("value") / 250.0), lit(3.0)).cast("int").as("vbucket"))
          .groupBy("event_type", "vbucket").agg(count(lit(1)).as("o"))
        val rowT = cells.groupBy("event_type").agg(sum("o").as("rt"))
        val colT = cells.groupBy("vbucket").agg(sum("o").as("ct"))
        val grand = cells.agg(sum("o").as("n"))
        // e = rt·ct/n via a DECIMAL(38,0) product (exact at any corpus size —
        // a raw BIGINT rt·ct overflows past n ≈ 3e9 rows) surfaced as DOUBLE;
        // contribution (o-e)²/e is then the identical IEEE tree both sides.
        val e = (col("rt").cast("decimal(19,0)") * col("ct").cast("decimal(19,0)"))
          .cast("double") / col("n").cast("double")
        val d = col("o").cast("double") - e
        cells.join(broadcast(rowT), "event_type")
          .join(broadcast(colT), "vbucket")
          .crossJoin(broadcast(grand))
          .select(col("event_type"), col("vbucket"), col("o"),
            round(e, 6).as("expected"),
            round(d * d / e, 6).as("chi_contrib"))
          .orderBy("event_type", "vbucket")
      },
      Some("""WITH cells AS (SELECT event_type,
                     CAST(least(floor(value / 250.0), 3.0) AS INT) AS vbucket,
                     count(*) AS o
                   FROM events GROUP BY event_type, vbucket),
              rt AS (SELECT event_type, sum(o) AS rt FROM cells GROUP BY event_type),
              ct AS (SELECT vbucket, sum(o) AS ct FROM cells GROUP BY vbucket),
              g AS (SELECT sum(o) AS n FROM cells)
              SELECT cells.event_type, cells.vbucket, o,
                     round(CAST(CAST(rt AS DECIMAL(19,0)) * CAST(ct AS DECIMAL(19,0)) AS DOUBLE)
                           / CAST(n AS DOUBLE), 6) AS expected,
                     round((CAST(o AS DOUBLE)
                            - CAST(CAST(rt AS DECIMAL(19,0)) * CAST(ct AS DECIMAL(19,0)) AS DOUBLE)
                              / CAST(n AS DOUBLE))
                           * (CAST(o AS DOUBLE)
                            - CAST(CAST(rt AS DECIMAL(19,0)) * CAST(ct AS DECIMAL(19,0)) AS DOUBLE)
                              / CAST(n AS DOUBLE))
                           / (CAST(CAST(rt AS DECIMAL(19,0)) * CAST(ct AS DECIMAL(19,0)) AS DOUBLE)
                              / CAST(n AS DOUBLE)), 6) AS chi_contrib
              FROM cells JOIN rt USING (event_type) JOIN ct USING (vbucket)
              CROSS JOIN g
              ORDER BY event_type ASC NULLS FIRST, vbucket ASC NULLS FIRST""")),

    // Daily cumulative distinct users — the growth-curve query. The naive
    // form (count(DISTINCT user) over an expanding window) rescans all
    // history per day and is O(days × users); the scalable rewrite is
    // first-seen day per user (one user-keyed shuffle) → daily new-user
    // counts (calendar-bounded frame) → running sum via the bucketed
    // prefix-sum decomposition (no SinglePartition window even over the
    // tiny daily frame).
    Q("x_cum_distinct_users",
      (s, dir) => {
        val daily = ev(s, dir)
          .groupBy("user_id").agg(min(to_date(col("ts"))).as("first_day"))
          .groupBy("first_day").agg(count(lit(1)).as("new_users"))
        graft.ops.GlobalWindows.withBucketedPrefixSum(daily,
            (year(col("first_day")) * 12 + month(col("first_day"))).cast("long"),
            col("new_users"), "cum_users", col("first_day"))
          // TIMESTAMP, not DATE: the harness renders DuckDB DATE as a
          // datetime string and the hash diverges (the cohort-query trap)
          .select(col("first_day").cast("timestamp").as("first_day"),
            col("new_users"), col("cum_users"))
          .orderBy("first_day")
      },
      Some("""WITH f AS (
                SELECT user_id, min(CAST(ts AS DATE)) AS first_day
                FROM events GROUP BY user_id),
              d AS (SELECT first_day, count(*) AS new_users FROM f GROUP BY first_day)
              SELECT CAST(first_day AS TIMESTAMP) AS first_day, new_users,
                CAST(sum(new_users) OVER (ORDER BY first_day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
              FROM d ORDER BY first_day ASC NULLS FIRST"""))
  )
}
