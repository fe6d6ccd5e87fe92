package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The mergeable-sketch tier: Count-Min and md5-portable HyperLogLog. */
class SketchesSpec extends SparkSpec {

  test("Count-Min: estimate is never below the true count (defining guarantee)") {
    val rows = Sketches.countMinTopTokens(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_est") >= r.getAs[Long]("n_true"),
        s"CMS underestimated '${r.getString(0)}': ${r.getAs[Long]("n_est")} < ${r.getAs[Long]("n_true")}")
    }
  }

  test("Count-Min: heavy hitters estimate tightly (1024 cells vs small fixture)") {
    val rows = Sketches.countMinTopTokens(spark, sf).collect()
    // With w=256 per row and a fixture vocabulary ~O(1k), min-over-4-rows
    // keeps collision inflation small for the top tokens; the check is a
    // loose envelope, not exact — collisions are the sketch's price.
    rows.foreach { r =>
      val (t, e) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_est"))
      assert(e <= t * 3 + 50, s"CMS estimate for '${r.getString(0)}' off: $e vs $t")
    }
  }

  test("HLL: estimate lands within the m=64 error envelope of the truth") {
    val r = Sketches.hllDistinctTokens(spark, sf).collect()(0)
    val (truth, est) = (r.getAs[Long]("n_true"), r.getAs[Double]("hll_est"))
    // Standard error at m=64 is 1.04/sqrt(64) = 13%; allow 4 sigma.
    assert(math.abs(est - truth) <= 0.52 * truth + 8,
      s"HLL estimate $est vs true $truth")
  }

  test("histogram quantiles: estimates land within one bin width of exact") {
    val rows = Sketches.histQuantiles(spark, sf).collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(0.5, 0.9, 0.99))
    val x = graft.Tables(spark, sf, "lineitem")
      .agg(min("l_extendedprice"), max("l_extendedprice")).head()
    val binWidth = (x.getDouble(1) - x.getDouble(0)) / 256.0
    rows.foreach { r =>
      val (est, exact) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(est - exact) <= binWidth,
        s"q=${r.getDouble(0)}: |$est - $exact| > bin width $binWidth")
    }
  }

  test("HLL: registers merge — sketch of the union equals max of the halves") {
    import spark.implicits._
    val d = graft.Tables(spark, sf, "documents")
    def regs(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .select(graft.functions.Md5Hash60(concat(col("tok"), lit(":hll"))).as("h"))
      .select(pmod(col("h"), lit(64L)).as("j"), expr("h div 64").as("v"))
      .select(col("j"), when(col("v") === 0L, 55L)
        .otherwise(lit(55L) - length(bin(col("v")))).as("rank"))
      .groupBy("j").agg(max("rank").as("m"))
      .as[(Long, Long)].collect().toMap
    val a = regs(d.filter(col("doc_id") % 2 === 0))
    val b = regs(d.filter(col("doc_id") % 2 === 1))
    val u = regs(d)
    (0L until 64L).foreach { j =>
      val merged = math.max(a.getOrElse(j, 0L), b.getOrElse(j, 0L))
      assert(u.getOrElse(j, 0L) == merged, s"register $j: union ${u.get(j)} vs merged $merged")
    }
  }
}
