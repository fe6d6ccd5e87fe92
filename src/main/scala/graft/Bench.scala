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

    // A query that throws is recorded as -1 (sentinel) and listed in
    // "failed" — a broken inventory must not pass as a near-zero timing.
    val results = SparkEntry.registry.map { q =>
      val t0 = System.nanoTime()
      val ok = try { runOne(q.fn); true } catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}"); false
      }
      (q.name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
