package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Second relational batch: subqueries, HAVING, distinct-count tiers,
  * UNION ALL, date arithmetic, LIKE/regexp predicates — each a §2 surface the
  * BigQuery SQL dialect the reference ships would accept, expressed as
  * DataFrame programs with DuckDB oracle pairs. */
object Relational2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val qs: Seq[Q] = Seq(

    // Scalar subquery: orders above the global average price
    // (Catalyst rewrites the subquery to a cross-joined scalar agg).
    Q("r2_scalar_subquery",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val avgPrice = o.agg((sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double") / count(col("o_totalprice"))).as("avg_price"))
        o.join(broadcast(avgPrice))
          .filter(col("o_totalprice") > col("avg_price") * 1.8)
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                          / count(o_totalprice) FROM orders) * 1.8
              ORDER BY o_orderkey ASC NULLS FIRST""")),

    // HAVING: segments with enough high-value customers.
    Q("r2_having",
      (s, dir) => t(s, dir, "customer")
        .filter(col("c_acctbal") > 1000)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("bal"))
        .filter(col("n") >= 50)
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n,
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
              FROM customer WHERE c_acctbal > 1000
              GROUP BY c_mktsegment HAVING count(*) >= 50
              ORDER BY c_mktsegment ASC NULLS FIRST""")),

    // Exact + approximate distinct counting (A1's generalization; the HLL
    // estimate column is engine-specific, so the oracle checks the exact one
    // and the estimate's sanity bounds instead of its value).
    Q("r2_count_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
                count(*) AS n_rows
              FROM lineitem GROUP BY l_returnflag
              ORDER BY l_returnflag ASC NULLS FIRST""")),

    // HLL approx_count_distinct — the scale path for A1-style existence
    // counting (no shuffle of the full key set). The raw estimate is
    // engine-specific, so it never reaches the output: the query emits the
    // EXACT distinct count plus a pass flag asserting the estimate landed
    // within 3× the sketch's configured rsd (0.05 → 15%) — the oracle pins
    // the exact value and expects the flag TRUE, so an estimator drift
    // flips the flag and fails the hash gate instead of hiding behind
    // `no_oracle` (VERDICT r9 #7). The md5-anchored sibling
    // (x_sketch_hll_md5) remains the deterministic hash anchor.
    Q("r2_approx_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("n_parts"))
        .select(col("l_returnflag"), col("n_parts"),
          (abs(col("approx_parts") - col("n_parts"))
            <= col("n_parts") * 0.15).as("approx_ok"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
                TRUE AS approx_ok
              FROM lineitem GROUP BY l_returnflag
              ORDER BY l_returnflag ASC NULLS FIRST""")),

    // UNION ALL (bag semantics, no dedup shuffle — vs U3's UNION).
    Q("r2_union_all",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderstatus") === "O").select("o_orderkey", "o_custkey")
          .unionAll(o.filter(col("o_orderstatus") === "F").select("o_orderkey", "o_custkey"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'O'
              UNION ALL
              SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'F'
              ORDER BY o_orderkey ASC NULLS FIRST""")),

    // Date arithmetic: shipping delay in days + a date-shifted filter.
    Q("r2_date_arith",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .withColumn("ship_delay_days",
            datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
              .cast("long"))
          .filter(col("ship_delay_days") > 100)
          .select("l_orderkey", "l_linenumber", "ship_delay_days")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
                CAST(datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT)
                  AS ship_delay_days
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 100
              ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST""")),

    // LIKE / regexp predicates (pushed into the scan where possible).
    Q("r2_like_filters",
      (s, dir) => t(s, dir, "part")
        .filter(col("p_type").like("%ECON%") ||
          col("p_name").rlike("^(red|blue).*(bolt|gear)$"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name, p_type FROM part
              WHERE p_type LIKE '%ECON%' OR regexp_matches(p_name, '^(red|blue).*(bolt|gear)$')
              ORDER BY p_partkey ASC NULLS FIRST""")),

    // IN-list + BETWEEN predicate shapes.
    Q("r2_in_between",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_totalprice").between(100000, 200000))
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
              WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
                AND o_totalprice BETWEEN 100000 AND 200000
              ORDER BY o_orderkey ASC NULLS FIRST"""))
  )
}
