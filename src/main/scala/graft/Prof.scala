package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    import graft.ext.{Dedup, TextAnalysis}
    val docs = Tables(spark, dir, "documents")
    time("warmup")(docs.write.format("noop").mode("overwrite").save())
    if (args.nonEmpty) { // time the named inventory queries and exit
      args.foreach { name =>
        time(name)(SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save())
      }
      spark.stop(); return
    }
    val toks = docs.withColumn("toks", TextAnalysis.tokens(col("text")))
    time("tokens")(toks.write.format("noop").mode("overwrite").save())
    val sh = toks.filter(size(col("toks")) >= 3).withColumn("shingles", expr(Dedup.shingleExpr))
    time("shingles")(sh.write.format("noop").mode("overwrite").save())
    val shash = sh.withColumn("shash", expr(Dedup.shingleHashExpr)).select("doc_id","shash")
    time("shash")(shash.write.format("noop").mode("overwrite").save())
    val sig = shash.withColumn("sig", expr(Dedup.minhashSig(32))).select("doc_id","sig")
    time("sig32")(sig.write.format("noop").mode("overwrite").save())
time("full_query")(SparkEntry.queries("x_dedup_minhash_lsh")(spark, dir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
