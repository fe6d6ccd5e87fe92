package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("paginated source: pages x pageSize rows, one partition per page") {
    val df = spark.read.format("ticket-pages")
      .option("pages", "4").option("pageSize", "50").load()
    assert(df.count() == 200)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.select("_id").distinct().count() == 200)
  }

  test("limit pushdown plans only the pages the limit needs (page-cap)") {
    val b = new PagesScanBuilder(20, 100)
    assert(b.pushLimit(150))
    assert(b.build().toBatch.planInputPartitions().length == 2)
    val b2 = new PagesScanBuilder(20, 100)
    assert(b2.pushLimit(5000)) // larger than source: keeps all 20
    assert(b2.build().toBatch.planInputPartitions().length == 20)
  }

  test("item-level fetch failures drop rows, never poison the batch") {
    // failEvery=5: items with global index 4,9,14,19 "error" their detail
    // fetch (main.py:186-194) -> dropped at the reader, everything else
    // arrives intact
    val df = spark.read.format("ticket-pages")
      .option("pages", "2").option("pageSize", "10").option("failEvery", "5")
      .load()
    val ids = df.select("_id").as[String].collect().toSet
    assert(ids.size == 16)
    Seq(4, 9, 14, 19).foreach(g => assert(!ids.contains(f"T$g%06d"), s"item $g"))
    Seq(0, 5, 13, 18).foreach(g => assert(ids.contains(f"T$g%06d"), s"item $g"))
    // the drop is tallied as a DSv2 custom metric on the scan
    val scan = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(scan.scan.supportedCustomMetrics().map(_.name).contains("fetchFailed"))
  }

  test("filter pushdown prunes pages (partitions) and reader rows (P5)") {
    // page predicate → partition pruning: pages outside the bound are never
    // planned, i.e. never "fetched"
    val df = spark.read.format("ticket-pages")
      .option("pages", "10").option("pageSize", "100").load()
      .filter(col("page") >= 2 && col("page") < 5)
    val scan = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(scan.inputRDD.getNumPartitions == 3, "pages 2,3,4 only")
    assert(df.count() == 300)
    assert(df.select("page").distinct().as[Int].collect().sorted.toSeq == Seq(2, 3, 4))

    // createdTimestamp predicate → rows skipped at the reader, and Spark
    // still re-applies the filter (correctness independent of pushdown)
    val cut = 1700000000L - 250 * 60L // rows with global id <= 250
    val recent = spark.read.format("ticket-pages")
      .option("pages", "10").option("pageSize", "100").load()
      .filter(col("createdTimestamp") >= cut)
    assert(recent.count() == 251)
    assert(recent.agg(min("createdTimestamp")).head().getLong(0) >= cut)
  }

  test("pushFilters page-bound arithmetic plans exactly the surviving pages") {
    import org.apache.spark.sql.sources.{EqualTo, GreaterThan, LessThanOrEqual}
    val b = new PagesScanBuilder(20, 100)
    val residual = b.pushFilters(Array(GreaterThan("page", 2), LessThanOrEqual("page", 6)))
    assert(residual.length == 2) // all filters come back as residual (re-applied by Spark)
    assert(b.pushedFilters().length == 2)
    assert(b.build().toBatch.planInputPartitions().length == 4) // pages 3,4,5,6

    val b2 = new PagesScanBuilder(20, 100)
    b2.pushFilters(Array(EqualTo("page", 7)))
    assert(b2.build().toBatch.planInputPartitions().length == 1)

    val b3 = new PagesScanBuilder(20, 100) // contradictory bounds -> zero pages
    b3.pushFilters(Array(EqualTo("page", 7), EqualTo("page", 9)))
    assert(b3.build().toBatch.planInputPartitions().isEmpty)
  }

  test("csv export/ingest round-trip (S5/S6)") {
    val out = tmpDir() + "/csv"
    val src = graft.Tables(spark, sf, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
    CsvIo.export(src, out, singleFile = true)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_acctbal", DoubleType)))
    val back = CsvIo.ingest(spark, out + "/*.csv", Some(schema))
    assert(back.count() == src.count())
    val a = src.orderBy("c_custkey").as[(Long, String, Double)].collect().toSeq
    val b = back.orderBy("c_custkey").as[(Long, String, Double)].collect().toSeq
    assert(a == b)
  }

  test("jsonl export/ingest round-trip incl. nested arrays and nulls") {
    val out = tmpDir() + "/jsonl"
    // embeddings carries a float-array column — the nested shape CSV can't
    // round-trip and the reason corpora ship as JSONL.
    val src = graft.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding", "label")
    JsonlIo.export(src, out, singleFile = true)
    val back = JsonlIo.ingest(spark, out + "/*.json", Some(src.schema))
    assert(back.count() == src.count())
    val a = src.orderBy("vec_id").collect().map(_.toSeq).toSeq
    val b = back.orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("jsonl permissive ingest survives corrupt lines; failfast rejects them") {
    val dir = tmpDir() + "/jsonl-bad"
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/shard.json"),
      ("""{"doc_id": 1, "text": "ok one"}""" + "\n" +
        """{not json at all""" + "\n" +
        """{"doc_id": 2, "text": "ok two"}""" + "\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    // Spark disallows querying only the corrupt-record column straight off
    // the raw source (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache first, as
    // its own error message prescribes.
    val ok = JsonlIo.ingest(spark, s"$dir/*.json", Some(schema)).cache()
    try {
      assert(ok.filter(col("_corrupt_record").isNull).count() == 2)
      assert(ok.filter(col("_corrupt_record").isNotNull).count() == 1)
    } finally ok.unpersist()
    intercept[Exception] {
      JsonlIo.ingest(spark, s"$dir/*.json",
        Some(StructType(schema.fields.take(2))), permissive = false)
        .collect()
    }
  }

  test("point lookup: distributed keyed fetch with null-on-error (S3)") {
    val keys = Seq("T000001", "T000002", "garbage", "T000005").toDS()
    val got = PointLookup.fetchAll(keys, PointLookup.stubFetch)
      .collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq("T000001", "T000002", "T000005")) // error dropped
    assert(got.head._3 == "Ticket 1 detail")
  }

  test("csv glob ingest: Overall_stats_*_*.csv pattern (README.md:110)") {
    val dir = tmpDir()
    val c = graft.Tables(spark, sf, "customer").select("c_custkey", "c_name")
    // two dated drops, as the SFTP job would leave them, plus a decoy
    CsvIo.export(c.limit(40), s"$dir/drop1", singleFile = true)
    CsvIo.export(c.offset(40).limit(30), s"$dir/drop2", singleFile = true)
    def place(src: String, name: String): Unit = {
      val f = new java.io.File(src).listFiles().filter(_.getName.endsWith(".csv")).head
      java.nio.file.Files.move(f.toPath, new java.io.File(s"$dir/$name").toPath)
    }
    place(s"$dir/drop1", "Overall_stats_live_manual_20240101.csv")
    place(s"$dir/drop2", "Overall_stats_live_manual_20240102.csv")
    CsvIo.export(c.limit(5), s"$dir/decoy", singleFile = true)
    place(s"$dir/decoy", "Other_stats_20240101.csv")

    val schema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType)))
    val got = CsvIo.ingest(spark, s"$dir/Overall_stats_live_manual_*.csv", Some(schema))
    assert(got.count() == 70) // decoy excluded by the glob
    assert(got.select("c_custkey").distinct().count() == 70)
  }

  test("multimodal: stub decode preserves cardinality and derives features") {
    val feats = graft.ext.Multimodal.decodeAll(spark, sf)
    val n = graft.Tables(spark, sf, "documents").count()
    assert(feats.count() == n)
    assert(feats.filter(col("byte_len") <= 0).count() == 0)
    assert(feats.filter(col("kind") === "video").filter(col("n_frames") < 1).count() == 0)
  }
}
