package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming tier: AvailableNow over the events fixture must agree
  * with the batch formulation, and the foreachBatch upsert sink must land a
  * key-unique target (the reference's idempotent MERGE, main.py:349-358). */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  test("availableNow tumbling windows == batch tumbling windows") {
    val stream = Streams.eventsStream(spark, sf)
    val q = Streams.tumblingCounts(stream).writeStream
      .format("memory").queryName("tumbling_out").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("tumbling_out")
      .orderBy("window_start", "event_type")
      .select("window_start", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSeq
    val batch = graft.SparkEntry.queries("st_tumbling_window")(spark, sf)
      .select("window_start", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("session windows produce per-user sessions") {
    val q = Streams.sessionCounts(Streams.eventsStream(spark, sf)).writeStream
      .format("memory").queryName("sessions_out").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val n = spark.table("sessions_out").count()
    assert(n > 0)
  }

  test("streaming dedup drops duplicate event ids") {
    val q = Streams.dedupedStream(Streams.eventsStream(spark, sf)).writeStream
      .format("memory").queryName("dedup_out").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("dedup_out")
    assert(out.count() == out.select("event_id").distinct().count())
  }

  test("flatMapGroupsWithState: last-write-wins state equals batch max(ts)") {
    val q = Streams.latestPerUser(Streams.eventsStream(spark, sf)).writeStream
      .format("memory").queryName("latest_out").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // latest state row per user (the memory sink appends one row per update)
    import org.apache.spark.sql.functions.{count, lit, max}
    val streamed = spark.table("latest_out")
      .groupBy("user_id")
      .agg(max("last_ts").as("last_ts"), max("n_events").as("n_events"))
      .as[(Long, java.sql.Timestamp, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val batch = graft.Tables(spark, sf, "events")
      .groupBy("user_id")
      .agg(max("ts").as("last_ts"), count(lit(1)).as("n_events"))
      .as[(Long, java.sql.Timestamp, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("foreachBatch upsert sink lands a key-unique merged target") {
    val dir = tmpDir()
    val q = Streams.upsertSink(Streams.eventsStream(spark, sf),
      s"$dir/target", s"$dir/ckpt").start()
    q.awaitTermination()
    val target = spark.read.parquet(s"$dir/target")
    val n = target.count()
    assert(n > 0)
    assert(n == target.select("event_id").distinct().count())
    // re-running the stream from a fresh checkpoint is idempotent (MERGE);
    // note: `target` itself resolved the pre-swap snapshot — count first
    val q2 = Streams.upsertSink(Streams.eventsStream(spark, sf),
      s"$dir/target", s"$dir/ckpt2").start()
    q2.awaitTermination()
    assert(spark.read.parquet(s"$dir/target").count() == n)
  }
}
