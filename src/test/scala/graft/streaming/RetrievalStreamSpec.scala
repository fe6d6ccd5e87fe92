package graft.streaming

import graft.SparkSpec
import graft.ext.Retrieval
import graft.ops.SnapshotTable
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** VERDICT r8 #1: the streamed BM25 index maintenance
  * ([[Streams.bm25IndexIngestSink]]) must (a) equal its oracle-paired batch
  * twin [[Retrieval.bm25IngestTwoDropTwin]] micro-batch for micro-batch —
  * the per-stage rankings DIFFER because the corpus statistics (n_docs, df,
  * avgdl) shift with each drop, so per-stage equality pins exactly that
  * statistics re-fold — and (b) stay exactly-once when the whole stream is
  * replayed from a fresh checkpoint (sink-write/checkpoint-advance crash
  * window: the (appId, batchId) ledger stamps swallow the replay and the
  * deterministic refresh re-commits the identical index). */
class RetrievalStreamSpec extends SparkSpec {
  import spark.implicits._

  private def queries: DataFrame = Retrieval.queryTerms.toDF("q_id", "term")
  private val terms: Seq[String] = Retrieval.queryTerms.map(_._2).distinct

  private def probe(root: String): Seq[(Long, Long, Long, Double)] =
    Retrieval.bm25TopKIndexedAt(spark, root, queries, terms, k = 5)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("bm25"))).toSeq

  /** Land one corpus drop as a single parquet file in the watched dir. */
  private def writeShard(shardDir: String, name: String, rows: DataFrame): Unit = {
    val tmp = new java.io.File(tmpDir(), "w")
    rows.coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(shardDir)
    dst.mkdirs()
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(dst, s"$name.parquet").toPath)
  }

  test("streamed BM25 index == batch twin per stage; replay exactly-once") {
    val base = tmpDir()
    val indexRoot = s"$base/bm25"
    val shardDir = s"$base/shard"
    val ckpt = s"$base/ckpt"

    val docs = graft.Tables(spark, sf, "documents").select("doc_id", "text")
    val drop1 = docs.filter(pmod(col("doc_id"), lit(2)) === 0) // twin stage 1
    val drop2 = docs.filter(pmod(col("doc_id"), lit(2)) === 1) // completes corpus

    // Per-micro-batch probe results, keyed by ledger stage = batchId + 1.
    val staged = scala.collection.mutable.Map[Long, Seq[(Long, Long, Long, Double)]]()
    def runStream(checkpoint: String): Unit = {
      val src = spark.readStream.schema("doc_id LONG, text STRING")
        .parquet(s"$shardDir/*.parquet")
      val q = Streams.bm25IndexIngestSink(src, indexRoot, checkpoint,
        onBatch = (_, root, batchId) => staged.synchronized {
          staged(batchId + 1) = probe(root)
        }).start()
      q.awaitTermination()
    }

    // Micro-batch 0: only drop1 exists → stage-1 index (half-corpus stats).
    writeShard(shardDir, "drop1", drop1)
    runStream(ckpt)
    // Micro-batch 1: drop2 arrives; same checkpoint → only the new file.
    writeShard(shardDir, "drop2", drop2)
    runStream(ckpt)

    val twin = Retrieval.bm25IngestTwoDropTwin(spark, sf, k = 5).collect()
      .groupBy(_.getAs[Long]("stage"))
      .view.mapValues(_.map((r: Row) => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("bm25"))).toSeq).toMap

    assert(staged.keySet == Set(1L, 2L), s"expected two stages, got ${staged.keySet}")
    for (stage <- Seq(1L, 2L))
      assert(staged(stage) == twin(stage),
        s"stage $stage: streamed ${staged(stage)}\n != twin ${twin(stage)}")
    // The stages must genuinely differ (the statistics fold is observable),
    // else per-stage equality would be vacuous.
    assert(staged(1L) != staged(2L),
      "stage 1 and 2 rankings should differ (corpus statistics shifted)")

    // Replay: a fresh checkpoint re-reads BOTH files as micro-batch 0. The
    // postings/doclens ledgers already carry batch 0 (and 1), so the append
    // is swallowed; the refresh recommits the same index and the probe
    // still equals stage 2.
    val postingsBefore = SnapshotTable.read(spark, s"$indexRoot/postings").count()
    staged.clear()
    runStream(s"$base/ckpt2")
    assert(SnapshotTable.read(spark, s"$indexRoot/postings").count() == postingsBefore,
      "replayed drop must be swallowed by the (appId, batchId) ledger")
    assert(probe(indexRoot) == twin(2L),
      "post-replay probe must still equal the full-corpus stage")
  }
}
