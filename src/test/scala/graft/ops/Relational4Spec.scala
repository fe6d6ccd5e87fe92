package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class Relational4Spec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("a12 moment stats agree with Spark's built-in stddev_samp/corr") {
    val ours = q("a12_stats_moments")
      .select("l_returnflag", "stddev_qty", "corr_qty_price")
      .as[(String, Double, Double)].collect()
      .map { case (k, sd, c) => k -> ((sd, c)) }.toMap
    val builtin = graft.Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(stddev_samp(col("l_quantity")).as("sd"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .as[(String, Double, Double)].collect()
    assert(builtin.nonEmpty)
    builtin.foreach { case (flag, sd, c) =>
      val (osd, oc) = ours(flag)
      assert(math.abs(osd - sd) < 1e-5, s"stddev mismatch for $flag: $osd vs $sd")
      assert(math.abs(oc - c) < 1e-5, s"corr mismatch for $flag: $oc vs $c")
    }
  }

  test("a13 argmin/argmax picks the true extreme rows deterministically") {
    val r1 = q("a13_argminmax").collect()
    val r2 = q("a13_argminmax").collect()
    assert(r1.sameElements(r2))
    // Independent check via window ranking.
    val o = graft.Tables(spark, sf, "orders")
    val top = o.withColumn("rn", row_number().over(
        Window.partitionBy("o_orderpriority")
          .orderBy(desc("o_totalprice"), desc("o_orderkey"))))
      .filter(col("rn") === 1)
      .select("o_orderpriority", "o_orderkey")
      .as[(String, Long)].collect().toMap
    r1.foreach { row =>
      assert(row.getAs[Long]("top_okey") == top(row.getAs[String]("o_orderpriority")))
    }
  }

  test("j10 as-of join matches the naive range-join formulation") {
    val merged = q("j10_asof_join")
      .select("event_id", "asof_okey").as[(Long, Long)].collect().toMap
    val ev = graft.Tables(spark, sf, "events")
    val o = graft.Tables(spark, sf, "orders")
    val naive = ev.join(o, col("user_id") === col("o_custkey") &&
        col("o_orderdate") <= col("ts"))
      .groupBy("event_id")
      .agg(expr("max_by(o_orderkey, struct(o_orderdate, o_orderkey))").as("k"))
      .as[(Long, Long)].collect().toMap
    assert(naive.nonEmpty && merged == naive)
  }

  test("j11 lateral top-n matches the window formulation") {
    val lat = q("j11_lateral_topn")
      .select("n_name", "c_custkey").as[(String, Long)].collect().toSet
    val win = graft.Tables(spark, sf, "customer")
      .join(graft.Tables(spark, sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("n_nationkey")
          .orderBy(desc("c_acctbal"), asc("c_custkey"))))
      .filter(col("rn") <= 2)
      .select("n_name", "c_custkey").as[(String, Long)].collect().toSet
    assert(lat.nonEmpty && lat == win)
  }

  test("rolling median: overlap-partitioned result equals the naive global window") {
    val fast = graft.SparkEntry.queries("w10_rolling_median")(spark, sf)
      .select("d", "rolling_median_7")
      .as[(java.sql.Timestamp, Double)].collect().toMap
    // Naive single-partition recompute (fine at test scale, the thing the
    // production plan avoids): same frame, same element selection.
    val daily = graft.Tables(spark, sf, "orders")
      .groupBy(date_trunc("day", col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
    val w = Window.orderBy("d").rowsBetween(-6, Window.currentRow)
    val naive = daily
      .withColumn("meds", array_sort(collect_list(col("total")).over(w)))
      .select(col("d"),
        element_at(col("meds"), ((size(col("meds")) + 1) / 2).cast("int"))
          .cast("double").as("m"))
      .as[(java.sql.Timestamp, Double)].collect().toMap
    assert(fast.size == naive.size && fast.nonEmpty)
    naive.foreach { case (d, m) =>
      assert(fast(d) == m, s"divergence at $d: fast=${fast(d)} naive=$m")
    }
  }

  test("ewma: overlap-partitioned result equals the naive global window") {
    val fast = graft.SparkEntry.queries("w11_ewma")(spark, sf)
      .select("d", "ewma_20")
      .as[(java.sql.Timestamp, Double)].collect().toMap
    val daily = graft.Tables(spark, sf, "orders")
      .groupBy(date_trunc("day", col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
    val w = Window.orderBy("d").rowsBetween(-19, Window.currentRow)
    val naive = daily
      .withColumn("lst", collect_list(col("total").cast("double")).over(w))
      .withColumn("num", expr(
        """aggregate(transform(lst,
          |  (x, i) -> x * pow(0.75D, CAST(size(lst) - 1 - i AS DOUBLE))),
          |  0D, (acc, v) -> acc + v)""".stripMargin))
      .withColumn("den", expr(
        """aggregate(transform(lst,
          |  (x, i) -> pow(0.75D, CAST(size(lst) - 1 - i AS DOUBLE))),
          |  0D, (acc, v) -> acc + v)""".stripMargin))
      .select(col("d"),
        (floor(col("num") / col("den") * 1000000.0 + 0.5) / 1000000.0).as("e"))
      .as[(java.sql.Timestamp, Double)].collect().toMap
    assert(fast.size == naive.size && fast.nonEmpty)
    naive.foreach { case (d, e) =>
      assert(fast(d) == e, s"divergence at $d: fast=${fast(d)} naive=$e")
    }
    // EWMA stays within the frame's value envelope (convex combination).
    val vals = daily.select(col("total").cast("double")).as[Double].collect()
    assert(fast.values.forall(v => v >= vals.min - 1e-6 && v <= vals.max + 1e-6))
  }
}
