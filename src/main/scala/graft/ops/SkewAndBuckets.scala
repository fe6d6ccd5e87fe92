package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Skew- and layout-aware join utilities (SURVEY.md §4 scale notes).
  *
  * `saltedJoin` is the manual skew-buster for when AQE's skew-join split
  * cannot help (e.g. a shuffled hash join against a small-but-not-broadcast
  * dim with a few hot keys): the probe side gets a random-but-deterministic
  * salt in [0, n), the build side is replicated n ways, and the join key
  * becomes (key, salt) — hot keys spread over n tasks. Result is exactly the
  * plain join, so the oracle can check it with ordinary SQL.
  */
object SkewAndBuckets {

  /** Inner equi-join with an n-way salt on `key`. `left` is the skewed probe
    * side; `right` is replicated n ways (keep it small). The salt is
    * deterministic (hash of the whole left row's key + a per-row uniform from
    * xxhash — no rand(), so retries/replays stay stable). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, n: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(n)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1)))) // already int; cast would nest the generator
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  val qs: Seq[Q] = Seq(

    // Salted join over the events fan-in (user_id is the hot key: ~10 users
    // per 1k events). Result == plain join — oracle-checkable.
    Q("j6_salted_join",
      (s, dir) => {
        val events = Tables(s, dir, "events")
        val users = events.groupBy("user_id")
          .agg(count(lit(1)).as("user_events"))
        saltedJoin(events, users, "user_id", n = 8)
          .select(col("event_id"), col("user_id"), col("user_events"))
          .orderBy("event_id")
      },
      Some("""WITH users AS (SELECT user_id, count(*) AS user_events
                             FROM events GROUP BY user_id)
              SELECT event_id, e.user_id, user_events
              FROM events e JOIN users USING (user_id)
              ORDER BY event_id ASC NULLS FIRST""")),

    // Grouped array aggregation (BigQuery ARRAY_AGG shape) — joined to a
    // string so the compare is engine-portable.
    Q("a5_collect_set",
      (s, dir) => Tables(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(concat_ws(",", array_sort(collect_set(col("o_orderstatus"))))
          .as("statuses"),
          count(lit(1)).as("n"))
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey,
                array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
                count(*) AS n
              FROM orders GROUP BY o_custkey
              ORDER BY o_custkey ASC NULLS FIRST""")),

    // As-of semantics, Spark-first: for every purchase, the most recent
    // prior signup time of the same user — last(ignoreNulls) over an ordered
    // window instead of a custom as-of join operator (compose built-ins
    // before building physical operators, SURVEY.md §4.3).
    Q("w4_asof_prior_signup",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, dir, "events")
          .withColumn("last_signup_ts",
            last(when(col("event_type") === "signup", col("ts")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            date_trunc("second", col("ts")).as("ts_s"),
            date_trunc("second", col("last_signup_ts")).as("signup_ts_s"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
                date_trunc('second', ts) AS ts_s,
                date_trunc('second', last_signup_ts) AS signup_ts_s
              FROM (
                SELECT event_id, user_id, ts, event_type,
                  last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
                    OVER (PARTITION BY user_id
                          ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts
                FROM events)
              WHERE event_type = 'purchase'
              ORDER BY event_id ASC NULLS FIRST""")),

    // GROUPING SETS through the SQL front door (spark.sql over registered
    // views — the engine's second query surface next to the DataFrame API).
    Q("g3_grouping_sets",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql("""SELECT o_orderstatus, o_orderpriority,
                   count(*) AS n
                 FROM orders
                 GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
                 ORDER BY o_orderstatus ASC NULLS FIRST,
                          o_orderpriority ASC NULLS FIRST, n""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
              FROM orders
              GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
              ORDER BY o_orderstatus ASC NULLS FIRST,
                       o_orderpriority ASC NULLS FIRST, n ASC NULLS FIRST""")),

    // PIVOT (status columns per priority) — oracle via FILTERed counts.
    Q("a7_pivot",
      (s, dir) => Tables(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
                count(*) FILTER (o_orderstatus = 'F') AS "F",
                count(*) FILTER (o_orderstatus = 'O') AS "O",
                count(*) FILTER (o_orderstatus = 'P') AS "P"
              FROM orders GROUP BY o_orderpriority
              ORDER BY o_orderpriority ASC NULLS FIRST""")),

    // Percentiles (exact interpolated; rounded to absorb sub-ulp divergence).
    Q("a6_percentiles",
      (s, dir) => Tables(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 6).as("p90"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
                round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
                round(quantile_cont(o_totalprice, 0.9), 6) AS p90
              FROM orders GROUP BY o_orderpriority
              ORDER BY o_orderpriority ASC NULLS FIRST"""))
  )
}
