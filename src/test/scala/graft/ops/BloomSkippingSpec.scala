package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-file bloom-filter skipping ([[SnapshotTable.setBloomColumns]]): the
  * point-lookup complement of min/max bounds. Fixture shape: append batches
  * whose key RANGES fully overlap, so bounds alone cannot prune — only the
  * blooms can. Bloom hashing is deterministic, so these assertions are
  * stable across runs (a specific probe value either collides or it
  * doesn't, forever). */
class BloomSkippingSpec extends SparkSpec {
  import spark.implicits._

  test("equality probes prune on blooms where overlapping ranges cannot") {
    val root = s"${tmpDir()}/t"
    // Seed commit predates the config: its file must stay bloom-less and
    // degrade to keep whenever bounds cannot exclude it.
    SnapshotTable.appendOnce(spark, root,
      Seq((0L, "seed")).toDF("k", "grp").coalesce(1), "bloom-spec", 0L)
    SnapshotTable.setBloomColumns(spark, root, Seq("k", "grp"))
    // Two appends with FULLY OVERLAPPING k-ranges and grp-ranges.
    SnapshotTable.appendOnce(spark, root,
      Seq((10L, "a1"), (9000L, "z9")).toDF("k", "grp").coalesce(1), "bloom-spec", 1L)
    SnapshotTable.appendOnce(spark, root,
      Seq((20L, "b2"), (8000L, "y8")).toDF("k", "grp").coalesce(1), "bloom-spec", 2L)

    def planned(filter: org.apache.spark.sql.Column): (Long, Int) = {
      val (df, idx) = SnapshotTable.readTracked(spark, root)
      val n = df.filter(filter).count()
      (n, idx.map(_.lastSelected).getOrElse(-1))
    }

    // k = 8000 is inside BOTH appended files' [min, max] (and outside the
    // seed's), so bounds keep 2 files; the bloom excludes the batch-1 file.
    assert(planned(col("k") === 8000L) == ((1L, 1)),
      "bloom must prune the range-overlapping file that cannot hold the key")
    // Same on the string column.
    assert(planned(col("grp") === "b2") == ((1L, 1)))
    // The seed file predates the config: a probe inside ITS range but
    // absent from it keeps the bloom-less file (degrade-to-keep), and the
    // bloom'd files prune — correctness never depends on the bloom.
    assert(planned(col("k") === 0L) == ((1L, 1)))
    // IN-lists go through the same per-value equality analysis: 8000 keeps
    // its one true file, 5555 is inside both files' ranges but in neither
    // bloom — one file planned for the whole list.
    assert(planned(col("k").isin(8000L, 5555L)) == ((1L, 1)))
  }

  test("rewrites backfill blooms; carried entries keep theirs") {
    val root = s"${tmpDir()}/t"
    SnapshotTable.upsert(spark, root,
      (0L until 400L).map(i => (i, s"g${i % 97}", i * 1.0)).toDF("k", "grp", "price"),
      Seq("k"))
    SnapshotTable.setBloomColumns(spark, root, Seq("k"))
    // Interleave key ranges across 4 appended files: every file spans
    // ~[400, 800), bounds alone cannot tell them apart.
    (0 until 4).foreach { b =>
      SnapshotTable.appendOnce(spark, root,
        (0L until 100L).map(i => (400L + i * 4 + b, "x", 0.0))
          .toDF("k", "grp", "price").coalesce(1), "bloom-spec", b.toLong)
    }
    val (df, idx) = SnapshotTable.readTracked(spark, root)
    assert(df.filter(col("k") === 402L).count() == 1)
    val afterAppends = idx.get.lastSelected
    // 402 lives in exactly one appended file; the pre-config upsert files
    // cover [0, 400) so bounds drop them; blooms drop 3 of 4 appends.
    assert(afterAppends == 1, s"expected 1 planned file, got $afterAppends")

    // Re-cluster rewrites EVERYTHING (including the pre-config upsert
    // rows): the rewrite inherits the config and backfills blooms, so an
    // unclustered-column... k IS the cluster key here; probe a key that
    // all bounds could hold post-recluster is impossible — instead verify
    // the rewrite produced bloom entries for its new files.
    SnapshotTable.recluster(spark, root, Seq("grp"), numFiles = 4)
    val (df2, idx2) = SnapshotTable.readTracked(spark, root)
    assert(df2.filter(col("k") === 402L).count() == 1)
    val afterRecluster = idx2.get.lastSelected
    // grp-clustered files each span most of the k range: without backfilled
    // blooms this probe would plan all 4 files.
    assert(afterRecluster < idx2.get.totalFiles,
      s"backfilled blooms must prune: planned $afterRecluster of ${idx2.get.totalFiles}")
  }

  test("bloom side-cars live and die with their snapshot dirs across vacuum") {
    val root = s"${tmpDir()}/t"
    SnapshotTable.appendOnce(spark, root,
      Seq((1L, "a")).toDF("k", "grp").coalesce(1), "bloom-spec", 0L)
    SnapshotTable.setBloomColumns(spark, root, Seq("k"))
    SnapshotTable.appendOnce(spark, root,
      Seq((10L, "b"), (9000L, "c")).toDF("k", "grp").coalesce(1), "bloom-spec", 1L)
    SnapshotTable.appendOnce(spark, root,
      Seq((20L, "d"), (8000L, "e")).toDF("k", "grp").coalesce(1), "bloom-spec", 2L)
    SnapshotTable.vacuum(spark, root, keep = 1)

    def sidecars(): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(root)).filter(_.getName.startsWith("_bloom-"))
    }
    // Append manifests SHARE dirs, so after keep=1 all three data dirs are
    // still referenced by the current manifest — side-cars survive with
    // them, and the probe still prunes off them.
    assert(sidecars().size == 2, s"expected 2 surviving side-cars: ${sidecars()}")
    val (df, idx) = SnapshotTable.readTracked(spark, root)
    assert(df.filter(col("k") === 8000L).count() == 1)
    assert(idx.get.lastSelected == 1)

    // A full rewrite (upsert) supersedes the old dirs: vacuum now sweeps
    // them INCLUDING their side-cars, and the rewrite's own backfilled
    // blooms are the only ones left.
    SnapshotTable.upsert(spark, root,
      Seq((8000L, "E2")).toDF("k", "grp"), Seq("k"))
    SnapshotTable.vacuum(spark, root, keep = 1)
    assert(SnapshotTable.read(spark, root).count() == 5)
    val left = sidecars()
    assert(left.nonEmpty, "the rewrite must backfill blooms")
    assert(left.forall(_.getPath.contains("snap-00000004")) ||
           left.forall(f => !f.getPath.contains("snap-00000001")),
      s"swept dirs must not leak side-cars: $left")
  }

  test("config refuses unsupported types and absent columns; drop removes it") {
    val root = s"${tmpDir()}/t"
    SnapshotTable.appendOnce(spark, root,
      Seq((1L, "a", 1.5)).toDF("k", "grp", "price"), "bloom-spec", 0L)
    intercept[IllegalArgumentException] {
      SnapshotTable.setBloomColumns(spark, root, Seq("price")) // double
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.setBloomColumns(spark, root, Seq("absent"))
    }
    SnapshotTable.setBloomColumns(spark, root, Seq("grp"))
    SnapshotTable.dropColumn(spark, root, "grp")
    // The config must not survive pointing at a dropped column: the next
    // append would otherwise try to bloom a column its files cannot hold.
    SnapshotTable.appendOnce(spark, root,
      Seq((2L, 2.5)).toDF("k", "price"), "bloom-spec", 1L)
    assert(SnapshotTable.read(spark, root).count() == 2)
  }
}
