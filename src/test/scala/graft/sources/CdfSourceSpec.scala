package graft.sources

import graft.SparkSpec
import graft.ops.SnapshotTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

/** Streaming CDF source contract (VERDICT r9 #2): stream-consumed deltas
  * equal [[SnapshotTable.changesDelta]] over the SAME version pairs across
  * appends, upserts, and a delete; the version bound makes micro-batches;
  * a restart from the checkpoint replays nothing and picks up only new
  * commits. */
class CdfSourceSpec extends SparkSpec {
  import spark.implicits._

  private def drain(root: String, ckpt: String, startVersion: Long,
                    maxPerTrigger: Long): (Seq[Row], Int) = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    var batches = 0
    val q = spark.readStream.format("graft-cdf")
      .option("root", root)
      .option("startVersion", startVersion.toString)
      .option("maxVersionsPerTrigger", maxPerTrigger.toString)
      .load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.collect()
        if (rows.nonEmpty) { buf.synchronized { buf ++= rows; batches += 1 } }
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    q.stop()
    (buf.toSeq, batches)
  }

  private def canon(rows: Seq[Row]): Set[String] = rows.map(_.toString).toSet

  test("streamed deltas ≡ changesDelta per version pair; bounded batches; restart picks up only new commits") {
    val root = s"${tmpDir()}/t"
    val ckpt = s"${tmpDir()}/ckpt"
    // v0 bootstrap upsert (CDC: all inserts), v1 append (file-diff feed),
    // v2 upsert moving a key's group (CDC pair), v3 predicate delete.
    val v0 = SnapshotTable.upsert(spark, root,
      Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0)).toDF("k", "g", "v"),
      Seq("k"))
    val v1 = SnapshotTable.appendOnce(spark, root,
      Seq((4L, "b", 40.0)).toDF("k", "g", "v"), "cdf-spec", 0L)
    val v2 = SnapshotTable.upsert(spark, root,
      Seq((2L, "z", 99.0)).toDF("k", "g", "v"), Seq("k"))
    val v3 = SnapshotTable.delete(spark, root, col("k") === 3L)

    val (rows, batches) = drain(root, ckpt, startVersion = -1L, maxPerTrigger = 1L)
    assert(batches >= 3,
      s"maxVersionsPerTrigger=1 must split versions into micro-batches (got $batches)")

    // Per version pair: stream rows filtered to _commit_version == v must
    // equal the batch change feed over (v-1, v].
    for (v <- 0L to v3) {
      val got = rows.filter(_.getAs[Long]("_commit_version") == v)
      val want = SnapshotTable.changesFeed(spark, root, v - 1, v,
        SnapshotTable.read(spark, root, Some(v0)).schema).collect().toSeq
      assert(canon(got) == canon(want), s"version $v: $got != $want")
      // and the insert/delete split matches changesDelta's (adds, removes)
      val Some((adds, removes)) = SnapshotTable.changesDelta(spark, root, v - 1, Some(v))
      assert(got.count(_.getAs[String]("_change_type") == "insert") == adds.count())
      assert(got.count(_.getAs[String]("_change_type") == "delete") == removes.count())
    }
    // the upsert surfaced as a retraction pair, the delete as pure retraction
    assert(rows.exists(r => r.getAs[Long]("_commit_version") == v2 &&
      r.getAs[String]("_change_type") == "delete" && r.getAs[Long]("k") == 2L))
    assert(rows.exists(r => r.getAs[Long]("_commit_version") == v2 &&
      r.getAs[String]("_change_type") == "insert" && r.getAs[String]("g") == "z"))
    assert(rows.filter(_.getAs[Long]("_commit_version") == v3)
      .forall(_.getAs[String]("_change_type") == "delete"))

    // RESTART from the same checkpoint: processed versions replay nothing;
    // two new commits (an append replay attempt + a real update) emit alone.
    SnapshotTable.appendOnce(spark, root,
      Seq((4L, "b", 40.0)).toDF("k", "g", "v"), "cdf-spec", 0L) // swallowed replay: no commit
    val v4 = SnapshotTable.update(spark, root, col("k") === 1L,
      Map("v" -> lit(11.0)))
    val (rows2, _) = drain(root, ckpt, startVersion = -1L, maxPerTrigger = 1L)
    assert(rows2.nonEmpty &&
      rows2.forall(_.getAs[Long]("_commit_version") == v4),
      s"restart must emit ONLY the new commit: ${canon(rows2)}")
    assert(canon(rows2) == canon(SnapshotTable.changesFeed(spark, root, v4 - 1, v4,
      SnapshotTable.read(spark, root, Some(v0)).schema).collect().toSeq))

    // Scale shape: a CDC-backed batch reads ONLY the commit's side-car
    // files — disjoint from the table's data files, so a feed consumer
    // never rescans the table no matter how big it grows.
    val feed = SnapshotTable.changesFeed(spark, root, v4 - 1, v4,
      SnapshotTable.read(spark, root, Some(v0)).schema)
    val tableFiles = SnapshotTable.read(spark, root, Some(v4)).inputFiles.toSet
    assert(feed.inputFiles.nonEmpty &&
      feed.inputFiles.toSet.intersect(tableFiles).isEmpty,
      "the change feed must read CDC side-cars, never table data files")
  }

  test("a subscriber crossing a RESTORE fails loudly (table-sized delta has no CDC)") {
    val root = s"${tmpDir()}/t"
    val v0 = SnapshotTable.upsert(spark, root,
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), Seq("k"))
    SnapshotTable.upsert(spark, root, Seq((3L, 3.0)).toDF("k", "v"), Seq("k"))
    SnapshotTable.restore(spark, root, v0)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(root, s"${tmpDir()}/ckpt", startVersion = v0, maxPerTrigger = 0L)
    }
    assert(e.getMessage.contains("rewrite without CDC") ||
      Option(e.getCause).exists(_.getMessage.contains("rewrite without CDC")),
      s"restore must fail the stream, not misread: ${e.getMessage}")
  }

  test("AvailableNow + maxVersionsPerTrigger drains ALL pending versions across bounded batches, then stops") {
    // The r10 quirk (VERDICT r10 #2): without SupportsTriggerAvailableNow the
    // engine snapshotted the FIRST bounded offset as the run's target, so an
    // AvailableNow drain under a version cap consumed exactly one batch. Now
    // prepareForTriggerAvailableNow snapshots the TABLE version and the
    // engine issues bounded batches until the stream reaches it.
    val root = s"${tmpDir()}/t"
    val ckpt = s"${tmpDir()}/ckpt"
    (0 to 4).foreach(i => SnapshotTable.appendOnce(spark, root,
      Seq((i.toLong, i.toDouble)).toDF("k", "v"), "cdf-an", i.toLong))
    val target = SnapshotTable.currentVersion(spark, root).get
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    var batches = 0
    val q = spark.readStream.format("graft-cdf")
      .option("root", root)
      .option("startVersion", "-1")
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.collect()
        if (rows.nonEmpty) { buf.synchronized { buf ++= rows; batches += 1 } }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // AvailableNow terminates on its own once drained to the prepared target.
    assert(q.awaitTermination(120000L), "AvailableNow query must self-terminate")
    assert(batches == target + 1,
      s"version cap 1 must yield one batch per version 0..$target (got $batches)")
    assert(buf.map(_.getAs[Long]("_commit_version")).toSet == (0L to target).toSet,
      "the drain must consume EVERY pending version, not just the first bound")
    assert(buf.map(_.getAs[Long]("k")).toSet == (0L to 4L).toSet)

    // A second AvailableNow run with nothing pending terminates empty; one
    // new commit then surfaces in exactly one more bounded batch.
    buf.clear(); batches = 0
    val q2 = spark.readStream.format("graft-cdf")
      .option("root", root).option("startVersion", "-1")
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.collect()
        if (rows.nonEmpty) { buf.synchronized { buf ++= rows; batches += 1 } }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q2.awaitTermination(120000L))
    assert(buf.isEmpty, s"drained stream must emit nothing: ${canon(buf.toSeq)}")
    SnapshotTable.appendOnce(spark, root,
      Seq((9L, 9.0)).toDF("k", "v"), "cdf-an", 9L)
    val q3 = spark.readStream.format("graft-cdf")
      .option("root", root).option("startVersion", "-1")
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.collect()
        if (rows.nonEmpty) { buf.synchronized { buf ++= rows; batches += 1 } }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q3.awaitTermination(120000L))
    assert(batches == 1 && buf.map(_.getAs[Long]("k")).toSet == Set(9L),
      s"restart drains ONLY the new commit: ${canon(buf.toSeq)}")
  }

  test("compaction emits an empty delta, not a reprocess; vacuumed history fails loudly") {
    val root = s"${tmpDir()}/t"
    (0 to 5).foreach(i => SnapshotTable.appendOnce(spark, root,
      Seq((i.toLong, i.toDouble)).toDF("k", "v"), "cdf-spec2", i.toLong))
    val before = SnapshotTable.currentVersion(spark, root).get
    val compacted = SnapshotTable.compact(spark, root, maxFiles = 2)
    assert(compacted.isDefined)
    val (rows, _) = drain(root, s"${tmpDir()}/ckpt", startVersion = before,
      maxPerTrigger = 0L)
    assert(rows.isEmpty, s"compaction must stream an EMPTY delta: ${canon(rows)}")
  }
}
