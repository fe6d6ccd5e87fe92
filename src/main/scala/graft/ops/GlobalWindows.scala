package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Scale-safe GLOBAL window primitives (VERDICT r2 "What's wrong" #1).
  *
  * A bare `Window.orderBy(...)` plans an `Exchange SinglePartition`: one task
  * sorts the whole table — fine at sf0.1, fatal at 100 TB. The primitives
  * here decompose global order over a DETERMINISTIC VALUE BUCKETING:
  * `bucket = floor(v / W)` is a pure expression of the row, monotone in the
  * ordering value, so
  *
  *   - rows can be hash-shuffled by bucket and ranked partition-locally
  *     (an ordinary partitioned window, never SinglePartition);
  *   - per-bucket counts (a tiny aggregate, broadcast back) turn local
  *     ranks into global ones: rank = local + Σ counts(lower buckets);
  *   - nothing depends on physical partition ids, sampled range boundaries,
  *     or evaluation order — every branch can recompute independently and
  *     agree, so no materialization barrier is needed (the earlier
  *     repartitionByRange + monotonically_increasing_id formulation needed a
  *     localCheckpoint exactly because range boundaries are rdd.id-seeded).
  *
  * Bucket width W is a domain choice (from table stats or an `approxQuantile`
  * build step at scale); value-density skew makes buckets uneven, which the
  * usual salting/AQE answers handle — the point is the SHAPE: no single-task
  * global sort anywhere.
  */
object GlobalWindows {

  /** Append `rnCol` = 1-based GLOBAL row number in `keys` order.
    * `bucket` must be monotone non-decreasing in the `keys` order (e.g.
    * `floor(orderValue / W)`), and `keys` must be a unique ordering. */
  def withBucketedGlobalRank(df: DataFrame, bucket: Column, rnCol: String,
                             keys: Column*): DataFrame = {
    val b = df.withColumn("__bkt", bucket)
    val w = Window.partitionBy("__bkt").orderBy(keys: _*)
    val local = b.withColumn("__lrn", row_number().over(w).cast("long"))
    // Per-bucket counts: map-side partial agg → rows = #buckets (bounded by
    // domain/W, thousands at most). The cumulative offset is a tiny
    // broadcast self-join — a window over it would itself plan
    // SinglePartition.
    val counts = b.groupBy("__bkt").agg(count(lit(1)).as("__cnt"))
    val offsets = counts.as("x")
      .join(broadcast(counts.as("y")), col("y.__bkt") < col("x.__bkt"), "left")
      .groupBy(col("x.__bkt").as("__bkt"))
      .agg(coalesce(sum(col("y.__cnt")), lit(0L)).as("__off"))
    local.join(broadcast(offsets), "__bkt")
      .withColumn(rnCol, col("__lrn") + col("__off"))
      .drop("__bkt", "__lrn", "__off")
  }

  /** Append `outCol` = GLOBAL running sum of `value` in `keys` order
    * (ROWS UNBOUNDED PRECEDING .. CURRENT ROW), same decomposition as
    * [[withBucketedGlobalRank]]: bucket-local prefix sums + broadcast
    * lower-bucket totals. `value` must be integral (the offset addition is
    * exact); `bucket` monotone in `keys`; `keys` unique. */
  def withBucketedPrefixSum(df: DataFrame, bucket: Column, value: Column,
                            outCol: String, keys: Column*): DataFrame = {
    val b = df.withColumn("__bkt", bucket).withColumn("__v", value)
    val w = Window.partitionBy("__bkt").orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = b.withColumn("__lsum", sum(col("__v")).over(w))
    val totals = b.groupBy("__bkt").agg(sum(col("__v")).as("__tot"))
    val offsets = totals.as("x")
      .join(broadcast(totals.as("y")), col("y.__bkt") < col("x.__bkt"), "left")
      .groupBy(col("x.__bkt").as("__bkt"))
      .agg(coalesce(sum(col("y.__tot")), lit(0L)).as("__off"))
    local.join(broadcast(offsets), "__bkt")
      .withColumn(outCol, col("__lsum") + col("__off"))
      .drop("__bkt", "__v", "__lsum", "__off")
  }

  /** Standard-SQL NTILE(k) from a global row number `rn` over `n` rows:
    * the first (n mod k) buckets get ceil(n/k) rows, the rest floor(n/k).
    * Integer-exact for any table under 2^53 rows (double division of
    * integers with an integral true quotient is exact). */
  def ntileFromRank(rn: Column, n: Column, k: Int): Column = {
    val qf = floor(n.cast("long") / lit(k.toLong)).cast("long")
    val rem = n.cast("long") % lit(k.toLong)
    val bigRows = (qf + 1L) * rem // rows living in the (q+1)-sized buckets
    when(rn <= bigRows, ceil(rn.cast("double") / (qf + 1L).cast("double")))
      .otherwise(rem + ceil((rn - bigRows).cast("double") / qf.cast("double")))
      .cast("long")
  }
}
