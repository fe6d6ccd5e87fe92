package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary profiling scratchpad — NOT part of the library (deleted before
  * round end). Prints the PageRank delta sequence at sf0.01/sf0.001. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_suppkey").as("sn"), (col("l_partkey") + lit(1000000L)).as("pn"))
        .distinct()
      val edges = li.select(col("sn").as("src"), col("pn").as("dst"))
        .unionByName(li.select(col("pn").as("src"), col("sn").as("dst")))
      val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val edgesDeg = edges.join(outdeg, Seq("src")).cache()
      val nodes = outdeg.select(col("src").as("node"))
      var rank = nodes.withColumn("r", lit(1000000L)).localCheckpoint()
      val deltas = scala.collection.mutable.ArrayBuffer[Long]()
      for (i <- 1 to 25) {
        val contrib = edgesDeg
          .join(rank.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst").as("node"), expr("r div outdeg").as("c"))
        val sums = contrib.groupBy("node").agg(sum("c").as("sc"))
        val next = nodes.join(sums, Seq("node"), "left")
          .select(col("node"),
            expr("""CAST(150000
                    + 850000 * (coalesce(sc, CAST(0 AS BIGINT)) div 1000000)
                    + (850000 * (coalesce(sc, CAST(0 AS BIGINT)) % 1000000)) div 1000000
                    AS BIGINT)""").as("r"))
          .localCheckpoint()
        val d = next.join(rank.select(col("node"), col("r").as("rp")), Seq("node"))
          .agg(max(abs(col("r") - col("rp")))).head().getLong(0)
        deltas += d
        rank = next
      }
      println(s"SCRATCH $dir deltas=${deltas.mkString(",")}")
    }
    spark.stop()
  }
}
