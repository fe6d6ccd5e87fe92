package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A named query + its DuckDB-oracle SQL (None → rows-only check). */
case class Q(name: String, fn: (SparkSession, String) => DataFrame, sql: Option[String])

/** Relational operator inventory (SURVEY.md §2.1-§2.7) as DataFrame programs.
  *
  * Determinism rules shared with the oracle SQL:
  *  - every query ends in a total-order sort (unique tiebreak column);
  *  - oracle ORDER BY always spells NULLS FIRST/LAST (DuckDB's default null
  *    order differs from Spark's);
  *  - double aggregates go through exact DECIMAL casts; averages are
  *    cast(sum_decimal as double)/count — bit-identical IEEE on both engines;
  *  - computed integer columns are cast to BIGINT on both sides.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val qs: Seq[Q] = Seq(

    // S1/P1/P2/A1 — the reference's existing-IDs query (main.py:85-89):
    // scan → not-null filter → project → DISTINCT. Filter+projection reach the
    // parquet scan; distinct is a two-phase hash aggregate.
    Q("s1_scan_distinct",
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_custkey").isNotNull)
        .select("o_custkey").distinct()
        .orderBy("o_custkey"),
      Some("""SELECT DISTINCT o_custkey FROM orders WHERE o_custkey IS NOT NULL
              ORDER BY o_custkey ASC NULLS FIRST""")),

    // P2/P3 — predicate + narrow projection; both push to the scan.
    Q("p2_filter_project",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
              FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
              ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST""")),

    // A-series — TPC-H Q1-shaped grouped aggregation (sum/avg/count) with
    // map-side partial aggregation; decimal casts keep sums order-insensitive.
    Q("a1_pricing_summary",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(28,6)")).cast("double").as("sum_disc_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).cast("decimal(28,6)")).cast("double").as("sum_charge"),
          (sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            / count(col("l_quantity"))).as("avg_qty"),
          (sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / count(col("l_extendedprice"))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
              CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
              CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
              count(*) AS count_order
              FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
              GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // A3 — grouped counts (sync-report tallies, main.py:323-329).
    Q("a3_grouped_counts",
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(*) AS n FROM orders
              GROUP BY o_orderstatus ORDER BY o_orderstatus ASC NULLS FIRST""")),

    // A4 — min/max/count per group (exact double passthrough).
    Q("a4_minmax",
      (s, dir) => t(s, dir, "customer")
        .groupBy("c_nationkey")
        .agg(min("c_acctbal").as("min_bal"), max("c_acctbal").as("max_bal"),
          count(lit(1)).as("n"))
        .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey, min(c_acctbal) AS min_bal,
              max(c_acctbal) AS max_bal, count(*) AS n
              FROM customer GROUP BY c_nationkey
              ORDER BY c_nationkey ASC NULLS FIRST""")),

    // J1 — equi inner join (MERGE match side, main.py:350-354).
    Q("j1_join_inner",
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .filter(col("o_totalprice") > 400000)
        .select("o_orderkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, c_name, o_totalprice
              FROM orders JOIN customer ON o_custkey = c_custkey
              WHERE o_totalprice > 400000
              ORDER BY o_orderkey ASC NULLS FIRST""")),

    // J2/U1 — anti join: customers that never ordered (MERGE not-matched arm,
    // main.py:355-357 / client-side set difference main.py:409).
    Q("j2_join_anti",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders
                                WHERE o_custkey = c_custkey AND o_totalprice > 300000)
              ORDER BY c_custkey ASC NULLS FIRST""")),

    // J3/U2 — semi join: customers with at least one open order
    // (client-side set intersection main.py:410).
    Q("j3_join_semi",
      (s, dir) => {
        val openOrders = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
        t(s, dir, "customer")
          .join(openOrders, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
              ORDER BY c_custkey ASC NULLS FIRST""")),

    // J5 — star join through broadcast dims (TPC-H Q5 shape): revenue per
    // nation for one region. nation/region are broadcast; lineitem⋈orders is
    // the only real shuffle.
    Q("j5_star_join",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val n = broadcast(t(s, dir, "nation"))
        val r = broadcast(t(s, dir, "region"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy("n_name")
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(28,6)")).cast("double").as("revenue"))
          .orderBy(desc("revenue"), asc("n_name"))
      },
      Some("""SELECT n_name,
              CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA'
              GROUP BY n_name
              ORDER BY revenue DESC NULLS LAST, n_name ASC NULLS FIRST""")),

    // J4 — the MERGE upsert itself (main.py:349-384): source wins on match,
    // target survives elsewhere, source-only inserts. Anti-join + union.
    Q("j4_merge_upsert",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val target = orders.filter(col("o_orderkey") % 3 =!= 0)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val source = orders.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
            (col("o_totalprice") + 1.0).as("o_totalprice"))
        Upsert.merge(target, source, Seq("o_orderkey"))
          .orderBy("o_orderkey")
      },
      Some("""WITH target AS (
                SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
                WHERE o_orderkey % 3 <> 0),
              source AS (
                SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 1.0 AS o_totalprice
                FROM orders WHERE o_orderkey % 2 = 0)
              SELECT * FROM source
              UNION ALL
              SELECT t.* FROM target t
              WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
              ORDER BY o_orderkey ASC NULLS FIRST""")),

    // U1 — EXCEPT: customers with open orders but no finished orders.
    Q("u1_except",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
          .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
              EXCEPT
              SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
              ORDER BY o_custkey ASC NULLS FIRST""")),

    // U2 — INTERSECT.
    Q("u2_intersect",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
          .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
              INTERSECT
              SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
              ORDER BY o_custkey ASC NULLS FIRST""")),

    // U3 — UNION (distinct) across slices.
    Q("u3_union",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_totalprice") > 450000).select(col("o_custkey"))
          .union(o.filter(col("o_orderstatus") === "P").select(col("o_custkey")))
          .distinct()
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_totalprice > 450000
              UNION
              SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
              ORDER BY o_custkey ASC NULLS FIRST""")),

    // O1 — global sort + top-k ⇒ TakeOrderedAndProject (no full sort at scale).
    Q("o1_topk",
      (s, dir) => t(s, dir, "orders")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(25),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST
              LIMIT 25""")),

    // O2/S2 — pagination: the reference's page loop (main.py:124-177) as
    // ORDER BY + LIMIT/OFFSET ("page 3", 100/page).
    Q("o2_pagination",
      (s, dir) => t(s, dir, "orders")
        .orderBy(desc("o_orderdate"), asc("o_orderkey"))
        .select("o_orderkey", "o_orderdate")
        .offset(200).limit(100),
      Some("""SELECT o_orderkey, o_orderdate FROM orders
              ORDER BY o_orderdate DESC NULLS LAST, o_orderkey ASC NULLS FIRST
              LIMIT 100 OFFSET 200""")),

    // §2.5 — ranking window: top-3 orders per customer.
    Q("w1_rank_topn",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            col("rn").cast("long").as("rn"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
              FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST) AS rn
                    FROM orders)
              WHERE rn <= 3
              ORDER BY o_custkey ASC NULLS FIRST, rn ASC NULLS FIRST""")),

    // §2.5 — running frame aggregate (decimal keeps it order-exact).
    Q("w2_running_sum",
      (s, dir) => {
        val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "lineitem")
          .withColumn("running_qty",
            sum(col("l_quantity").cast("decimal(18,2)")).over(w).cast("double"))
          .filter(col("l_orderkey") < 1000)
          .select("l_orderkey", "l_linenumber", "running_qty")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
                PARTITION BY l_orderkey ORDER BY l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
              FROM lineitem WHERE l_orderkey < 1000
              ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST""")),

    // §2.5 — lag/lead analytics over a deterministic per-customer order.
    Q("w3_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        t(s, dir, "orders")
          .withColumn("prev_price", lag("o_totalprice", 1).over(w))
          .withColumn("next_price", lead("o_totalprice", 1).over(w))
          .filter(col("o_custkey") < 50)
          .select("o_custkey", "o_orderkey", "o_totalprice", "prev_price", "next_price")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
              lag(o_totalprice, 1) OVER w AS prev_price,
              lead(o_totalprice, 1) OVER w AS next_price
              FROM orders WHERE o_custkey < 50
              WINDOW w AS (PARTITION BY o_custkey
                           ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST)
              ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""")),

    // §2.4 extension — ROLLUP with grouping flags.
    Q("g1_rollup",
      (s, dir) => t(s, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(grouping("o_orderstatus").cast("long").as("g_status"),
          grouping("o_orderpriority").cast("long").as("g_prio"),
          count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
        .select(col("o_orderstatus"), col("o_orderpriority"),
          col("g_status"), col("g_prio"), col("n"), col("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
      Some("""SELECT o_orderstatus, o_orderpriority,
              CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
              CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
              count(*) AS n,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
              ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // §2.4 extension — CUBE.
    Q("g2_cube",
      (s, dir) => t(s, dir, "customer")
        .cube("c_mktsegment", "c_nationkey")
        .agg(grouping("c_mktsegment").cast("long").as("g_seg"),
          grouping("c_nationkey").cast("long").as("g_nat"),
          count(lit(1)).as("n"))
        .select(col("c_mktsegment"), col("c_nationkey"),
          col("g_seg"), col("g_nat"), col("n"))
        .orderBy(asc_nulls_first("c_mktsegment"), asc_nulls_first("c_nationkey")),
      Some("""SELECT c_mktsegment, c_nationkey,
              CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
              CAST(GROUPING(c_nationkey) AS BIGINT) AS g_nat,
              count(*) AS n
              FROM customer GROUP BY CUBE (c_mktsegment, c_nationkey)
              ORDER BY c_mktsegment ASC NULLS FIRST, c_nationkey ASC NULLS FIRST"""))
  )
}
