package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Selective compaction (round 11): OPTIMIZE folds only the SMALL files —
  * files near target size carry by manifest entry, never re-read — so the
  * routine small-file sweep costs O(accreted delta), not a table rewrite.
  * `targetBytes` is dialed down so real tiny fixtures split into "large"
  * (carried) and "small" (packed) classes. */
class SelectiveCompactSpec extends SparkSpec {
  import spark.implicits._

  test("compact packs small files only; near-target files carry by entry; rows and delta semantics intact") {
    val root = s"${tmpDir()}/t"
    // 3 "large" files (~thousands of bytes: 400 rows each, one file per
    // commit via coalesce(1)) + 12 tiny single-row appends.
    (0 until 3).foreach(i => SnapshotTable.appendOnce(spark, root,
      (0L until 400L).map(j => (i * 10000L + j, s"payload-$i-$j" * 4))
        .toDF("k", "txt").coalesce(1), "big", i.toLong))
    (0 until 12).foreach(i => SnapshotTable.appendOnce(spark, root,
      Seq((90000L + i, s"tiny-$i")).toDF("k", "txt"), "tiny", i.toLong))
    val v = SnapshotTable.currentVersion(spark, root).get
    val before = SnapshotTable.read(spark, root)
    val rowsBefore = before.count()
    val filesBefore = before.inputFiles.toSet
    val bigFiles = filesBefore.filter(f => new java.io.File(
      new java.net.URI(f).getPath).length() >= 2048)
    assert(bigFiles.size >= 3 && filesBefore.size >= 15, "setup premise")

    // targetBytes = 4096: the 3 big files sit above targetBytes/2 = 2048
    // and must CARRY; the tiny ones pack.
    val vc = SnapshotTable.compact(spark, root, maxFiles = 8, targetBytes = 4096L)
    assert(vc.isDefined)
    val after = SnapshotTable.read(spark, root)
    assert(after.count() == rowsBefore, "compaction must move zero rows")
    assert(after.collect().map(_.toString).toSet ==
      before.collect().map(_.toString).toSet)
    val filesAfter = after.inputFiles.toSet
    assert(bigFiles.subsetOf(filesAfter),
      "near-target files must carry by manifest entry (identical paths)")
    assert(filesAfter.size < filesBefore.size, "small files must fold")
    // delta consumers skip the compaction (empty change set)
    val Some((adds, removes)) = SnapshotTable.changesDelta(spark, root, v, vc)
    assert(adds.isEmpty && removes.isEmpty,
      "a compaction streams an EMPTY delta, never a reprocess")

    // A table of MANY healthy files is NOT the small-file problem: with
    // everything above the packing threshold, compact declines.
    assert(SnapshotTable.compact(spark, root, maxFiles = 1,
      targetBytes = 64L).isEmpty,
      "nothing under targetBytes/2 to pack => no-op, never a table rewrite")
  }
}
