package graft

object PlanScan {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.registry.foreach { q =>
      try {
        val p = q.fn(spark, dir).queryExecution.executedPlan.toString
        val scans = "Scan parquet".r.findAllIn(p).size
        val reused = "ReusedExchange".r.findAllIn(p).size
        val gens = "Generate".r.findAllIn(p).size
        if (scans + gens >= 5)
          println(s"PLANSCAN ${q.name} scans=$scans generates=$gens reused=$reused")
      } catch { case e: Throwable => println(s"PLANSCAN ${q.name} ERR ${e.getMessage}") }
    }
    spark.stop()
  }
}
