package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary profiling scratchpad — NOT part of the library (deleted before
  * round end). Times the L2AP-lite all-pairs at 21×. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val reps = spark.read.parquet("/tmp/graft-scale/documents.parquet")
      .groupBy("text").agg(min("doc_id").as("doc_id")).select("doc_id", "text")

    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val pairs = ext.Dedup.tfidfAllPairsOf(reps).count()
      println(f"SCRATCH run$i tfidf_allpairs ${(System.nanoTime() - t0) / 1e9}%.1f s pairs=$pairs")
    }
    spark.stop()
  }
}
