package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffled layout for repeated co-located joins: both
  * sides bucketed on the join key join with NO shuffle exchange. This is the
  * 100 TB answer to "this join runs every hour on the same key". */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val wh = tmpDir() // external table paths; warehouse dir itself is static
    val o = graft.Tables(spark, sf, "orders")
    val c = graft.Tables(spark, sf, "customer")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_b").saveAsTable("customer_b")

    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name")
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      s"expected exchange-free bucketed join, got:\n${joined.queryExecution.executedPlan}")
    // same result as the unbucketed join
    val expect = o.join(c, col("o_custkey") === col("c_custkey")).count()
    assert(joined.count() == expect)
  }
}
