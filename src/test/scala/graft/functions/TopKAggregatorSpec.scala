package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("single-pass top-k per group equals window row_number top-k") {
    val orders = graft.Tables(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))

    // Aggregator path: top-3 orders by price per customer, one pass
    val topk = udaf(new TopKAggregator(3))
    val viaAgg = orders
      .groupBy("o_custkey")
      .agg(topk(col("o_orderkey"), col("o_totalprice")).as("top"))
      .select(col("o_custkey"), explode(col("top")).as("p"))
      .select(col("o_custkey"), col("p._1").as("o_orderkey"))
      .as[(Long, Long)].collect().toSet

    // window path (the w1_rank_topn formulation)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"))
      .as[(Long, Long)].collect().toSet

    // prices are continuous -> ties are vanishingly unlikely; sets must agree
    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("frame sampling fans out one row per sampled frame") {
    val frames = graft.ext.Multimodal.sampleFrames(spark, sf)
    val vids = graft.ext.Multimodal.decodeAll(spark, sf)
      .filter(_.kind == "video").collect()
    val expected = vids.map(v => (v.n_frames - 1) / 5 + 1).sum
    assert(frames.count() == expected)
    assert(frames.select("frame_sha").distinct().count() == frames.count())
  }
}
