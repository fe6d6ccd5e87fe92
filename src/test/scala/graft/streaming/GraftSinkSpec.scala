package graft.streaming

import graft.SparkSpec
import graft.ops.SnapshotTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** `writeStream.format("graft")` (round 12): the V1 sink provider that
  * lands micro-batches through the table format's exactly-once commit
  * stamps. Pins: streamed content == batch content; a REPLAYED batch is
  * swallowed by the (appId, batchId) ledger; complete mode re-materializes
  * a standing aggregate per batch; the written table serves the full
  * engine surface (time travel, SQL) immediately. */
class GraftSinkSpec extends SparkSpec {
  import spark.implicits._

  test("append mode: streamed rows land once; the table serves time travel + SQL") {
    val base = tmpDir()
    val root = s"$base/t"
    val ckpt = s"$base/ckpt"
    val q = Streams.eventsStream(spark, sf)
      .select("event_id", "user_id", "event_type")
      .writeStream.format("graft")
      .option("root", root)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = SnapshotTable.read(spark, root)
    val batch = Streams.eventsStream(spark, sf) // file source, batch twin
    val expected = graft.Tables(spark, sf, "events").count()
    assert(streamed.count() == expected, "every fixture row lands exactly once")
    assert(batch.isStreaming) // sanity: the source really was a stream

    // A second run over the SAME checkpoint replays nothing (no new files).
    val q2 = Streams.eventsStream(spark, sf)
      .select("event_id", "user_id", "event_type")
      .writeStream.format("graft")
      .option("root", root)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(SnapshotTable.read(spark, root).count() == expected,
      "restart over a drained checkpoint must not duplicate")

    // The worst case — a FRESH checkpoint replaying the same batch ids
    // with the same txnAppId — is swallowed by the manifest ledger.
    val q3 = Streams.eventsStream(spark, sf)
      .select("event_id", "user_id", "event_type")
      .writeStream.format("graft")
      .option("root", root)
      .option("txnAppId", ckpt) // SAME ledger key as run 1
      .option("checkpointLocation", s"$base/ckpt2")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination()
    assert(SnapshotTable.read(spark, root).count() == expected,
      "replayed (appId, batchId) stamps must be detected and skipped")

    // Format-surface dividend: the streamed table time-travels and reads
    // from SQL like any other.
    assert(SnapshotTable.history(spark, root).count() >= 1)
    SnapshotTable.read(spark, root, Some(0L)) // retained, readable
  }

  test("complete mode re-materializes a standing aggregate per batch") {
    val base = tmpDir()
    val root = s"$base/agg"
    val q = Streams.eventsStream(spark, sf)
      .groupBy("event_type").count()
      .writeStream.format("graft")
      .option("root", root)
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = SnapshotTable.read(spark, root)
      .as[(String, Long)].collect().toMap
    val want = graft.Tables(spark, sf, "events")
      .groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    assert(got == want, s"complete-mode snapshot must equal the batch aggregate")
  }

  test("update mode: mergeKeys upserts post-images per batch, replay converges") {
    val base = tmpDir()
    val root = s"$base/agg"
    def drain(ckpt: String): Unit = {
      val q = Streams.eventsStream(spark, sf)
        .groupBy("user_id").count()
        .writeStream.format("graft")
        .option("root", root)
        .option("mergeKeys", "user_id")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain(s"$base/ckpt1")
    val want = graft.Tables(spark, sf, "events")
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    def got(): Map[Long, Long] = SnapshotTable.read(spark, root)
      .as[(Long, Long)].collect().toMap
    assert(got() == want, "update-mode sink must land the keyed aggregate")
    // A FULL REPLAY (fresh checkpoint) re-merges the same post-images —
    // idempotent by key, no duplicates, same state.
    drain(s"$base/ckpt2")
    assert(got() == want, "replay must converge, not duplicate")
  }

  test("catalog addressing and the refusal modes") {
    val s = spark
    graft.sql.GraftSql.ensureCatalog(s)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.snk")
    s.sql("DROP TABLE IF EXISTS graft.snk.ev")
    s.sql("CREATE TABLE graft.snk.ev AS SELECT CAST(0 AS BIGINT) AS event_id, CAST(0 AS BIGINT) AS user_id LIMIT 0")
    val base = tmpDir()
    val q = Streams.eventsStream(spark, sf)
      .select("event_id", "user_id")
      .writeStream.format("graft")
      .option("table", "graft.snk.ev")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(s.sql("SELECT count(*) FROM graft.snk.ev").head().getLong(0) ==
      graft.Tables(spark, sf, "events").count())

    // Update mode without mergeKeys is refused at sink construction.
    intercept[Exception] {
      Streams.eventsStream(spark, sf)
        .groupBy("user_id").count()
        .writeStream.format("graft")
        .option("root", s"$base/nope")
        .option("checkpointLocation", s"$base/ckpt3")
        .outputMode("update")
        .trigger(Trigger.AvailableNow()).start()
    }
    s.sql("DROP TABLE graft.snk.ev")
    s.sessionState.catalogManager.catalog("graft") match {
      case g: graft.sql.GraftCatalog => g.purgeDropped(Array("snk"), 0L, force = true)
      case _ => ()
    }
  }
}
