package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SHALLOW CLONE (round 12): a zero-copy table born from a source version's
  * manifest. Pins: (1) the clone reads the source's rows without copying a
  * data byte; (2) DML on the clone diverges without touching the source;
  * (3) the clone's retention pin clamps source vacuum so carried files
  * survive, and detach releases it after divergence; (4) vacuum on the
  * CLONE never reclaims source-owned dirs it merely references. */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def versionsOn(root: String): Seq[Long] = {
    val dir = new java.io.File(root, "_manifests")
    if (!dir.isDirectory) Nil
    else dir.listFiles().toSeq.map(_.getName)
      .collect { case s if s.startsWith("manifest-") =>
        s.stripPrefix("manifest-").stripSuffix(".json").toLong }.sorted
  }

  private def dataDirs(root: String): Set[String] = {
    val d = new java.io.File(root)
    if (!d.isDirectory) Set.empty
    else d.listFiles().toSeq.map(_.getName).filter(_.startsWith("snap-")).toSet
  }

  test("clone reads the source zero-copy, diverges on DML, source unchanged") {
    val base = tmpDir()
    val src = s"$base/src"
    val dst = s"$base/dst"
    SnapshotTable.commit(spark, src,
      (1L to 100L).map(k => (k, k * 2.0)).toDF("k", "v"))
    SnapshotTable.append(spark, src,
      (101L to 200L).map(k => (k, k * 2.0)).toDF("k", "v"))

    assert(SnapshotTable.cloneShallow(spark, src, dst) == 0L)
    // Zero-copy: the clone root holds no data dirs of its own yet.
    assert(dataDirs(dst).isEmpty, "shallow clone must not copy data files")
    assert(SnapshotTable.read(spark, dst).count() == 200L)
    assert(SnapshotTable.cloneSource(spark, dst).exists(_._2 == 1L))

    // Divergence: delete on the clone rewrites touched files INTO the
    // clone's root; the source keeps every row.
    SnapshotTable.delete(spark, dst, col("k") <= 50L)
    assert(SnapshotTable.read(spark, dst).count() == 150L)
    assert(SnapshotTable.read(spark, src).count() == 200L)
    assert(dataDirs(dst).nonEmpty, "the clone's rewrite lands locally")

    // And writes to the SOURCE stay invisible to the pinned clone.
    SnapshotTable.append(spark, src, Seq((999L, 0.0)).toDF("k", "v"))
    assert(SnapshotTable.read(spark, dst).count() == 150L)
  }

  test("clone pins source retention; detach after full divergence releases") {
    val base = tmpDir()
    val src = s"$base/src"
    val dst = s"$base/dst"
    SnapshotTable.commit(spark, src, (1L to 40L).map(k => (k, s"r$k")).toDF("k", "s"))
    SnapshotTable.append(spark, src, (41L to 80L).map(k => (k, s"r$k")).toDF("k", "s"))
    SnapshotTable.cloneShallow(spark, src, dst, asOf = Some(0L))

    // Source moves on; an unclamped vacuum would drop v0 and its files.
    SnapshotTable.append(spark, src, Seq((81L, "x")).toDF("k", "s"))
    SnapshotTable.vacuum(spark, src, keep = 1)
    assert(versionsOn(src).min == 0L,
      "the clone's subscriber watermark must hold the cloned version")
    assert(SnapshotTable.read(spark, dst).count() == 40L, "clone still readable")

    // Detach is refused while the clone still references source files...
    intercept[IllegalArgumentException] {
      SnapshotTable.detachClone(spark, dst)
    }
    // ... full divergence (recluster rewrites every file clone-locally)
    // makes it legal, and the next source vacuum reclaims.
    SnapshotTable.recluster(spark, dst, Seq("k"), numFiles = 2)
    assert(SnapshotTable.detachClone(spark, dst))
    assert(SnapshotTable.cloneSource(spark, dst).isEmpty)
    SnapshotTable.vacuum(spark, src, keep = 1)
    assert(versionsOn(src) == Seq(versionsOn(src).max))
    assert(SnapshotTable.read(spark, dst).count() == 40L,
      "detached clone owns every byte it reads")
    assert(!SnapshotTable.detachClone(spark, dst), "second detach is a no-op")
  }

  test("vacuum on the clone never deletes source-owned dirs") {
    val base = tmpDir()
    val src = s"$base/src"
    val dst = s"$base/dst"
    SnapshotTable.commit(spark, src, (1L to 60L).map(k => (k, k % 7)).toDF("k", "m"))
    SnapshotTable.cloneShallow(spark, src, dst)
    // Rewrite the clone fully (v1 references only clone-local files), then
    // vacuum the clone down to v1: v0's entries point at SOURCE dirs — the
    // under-root guard must leave them alone.
    SnapshotTable.recluster(spark, dst, Seq("k"), numFiles = 2)
    SnapshotTable.vacuum(spark, dst, keep = 1, force = true)
    assert(versionsOn(dst) == Seq(1L))
    assert(SnapshotTable.read(spark, src).count() == 60L,
      "source data must survive the clone's vacuum")
  }

  test("clone carries schema metadata: constraints gate, skipping prunes") {
    val base = tmpDir()
    val src = s"$base/src"
    val dst = s"$base/dst"
    SnapshotTable.commitClustered(spark, src,
      (1L to 100L).map(k => (k, k * 1.5)).toDF("k", "v"), Seq("k"), numFiles = 4)
    SnapshotTable.setCheckConstraint(spark, src, "pos", "v >= 0")
    SnapshotTable.cloneShallow(spark, src, dst)

    // Constraint travels: a violating append on the CLONE is refused.
    intercept[IllegalArgumentException] {
      SnapshotTable.append(spark, dst, Seq((0L, -1.0)).toDF("k", "v"))
    }
    // Per-file stats travel: a point probe on the clone plans a strict
    // subset of the carried files.
    val (df, idx) = SnapshotTable.readTracked(spark, dst)
    df.filter(col("k") === 3L).collect()
    assert(idx.isDefined && idx.get.lastSelected < idx.get.totalFiles,
      s"clone scan must file-skip off carried stats " +
        s"(${idx.map(i => s"${i.lastSelected}/${i.totalFiles}")})")
  }

  test("clone-of-a-clone pins the whole ancestry: middle detach can't expose it") {
    val base = tmpDir()
    val a = s"$base/a"
    val b = s"$base/b"
    val c = s"$base/c"
    SnapshotTable.commit(spark, a, (1L to 30L).map(k => (k, s"r$k")).toDF("k", "s"))
    SnapshotTable.cloneShallow(spark, a, b)
    // C clones B while B still references A's files — C must pin BOTH.
    SnapshotTable.cloneShallow(spark, b, c)
    // B diverges fully and detaches from A...
    SnapshotTable.recluster(spark, b, Seq("k"), numFiles = 1)
    assert(SnapshotTable.detachClone(spark, b))
    // ... and A's vacuum STILL cannot drop the version C reads through.
    SnapshotTable.append(spark, a, Seq((99L, "x")).toDF("k", "s"))
    SnapshotTable.vacuum(spark, a, keep = 1)
    assert(SnapshotTable.read(spark, c).count() == 30L,
      "grandparent vacuum must not break the transitive clone")
    // C's detach releases A and B; then A reclaims.
    SnapshotTable.recluster(spark, c, Seq("k"), numFiles = 1)
    assert(SnapshotTable.detachClone(spark, c))
    SnapshotTable.vacuum(spark, a, keep = 1)
    assert(versionsOn(a) == Seq(versionsOn(a).max))
    assert(SnapshotTable.read(spark, c).count() == 30L)
  }

  test("SQL surface: CREATE TABLE ... SHALLOW CLONE / DETACH CLONE") {
    val s = spark
    graft.sql.GraftSql.ensureCatalog(s)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.clsp")
    s.sql("DROP TABLE IF EXISTS graft.clsp.src_t")
    s.sql("DROP TABLE IF EXISTS graft.clsp.dst_t")
    s.sql("""CREATE TABLE graft.clsp.src_t AS
             SELECT id AS k, id * 2 AS v FROM range(100)""")
    s.sql("UPDATE graft.clsp.src_t SET v = v + 1 WHERE k < 10")
    // Clone the PRE-update version...
    s.sql("CREATE TABLE graft.clsp.dst_t SHALLOW CLONE graft.clsp.src_t VERSION AS OF 0")
    assert(s.sql("SELECT sum(v) FROM graft.clsp.dst_t").head().getLong(0) == 9900L)
    // ... provenance is visible, detach refuses while attached+shared,
    // FORCE overrides.
    val props = s.sql("SHOW TBLPROPERTIES graft.clsp.dst_t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.clone.sourceVersion").contains("0"))
    // TIMESTAMP AS OF clones resolve like RESTORE: v0's commit stamp pins
    // the pre-update state, hash-equal to the VERSION AS OF 0 clone.
    val ts0 = SnapshotTable.history(s,
        s"${graft.sql.GraftSql.defaultWarehouse}/clsp/src_t")
      .filter(org.apache.spark.sql.functions.col("version") === 0)
      .select("committed_at").head().getTimestamp(0)
    s.sql("DROP TABLE IF EXISTS graft.clsp.dst_ts")
    s.sql(s"CREATE TABLE graft.clsp.dst_ts SHALLOW CLONE graft.clsp.src_t TIMESTAMP AS OF '$ts0'")
    assert(s.sql("SELECT sum(v) FROM graft.clsp.dst_ts").head().getLong(0) == 9900L)
    s.sql("DETACH CLONE graft.clsp.dst_ts FORCE")
    s.sql("DROP TABLE graft.clsp.dst_ts")
    intercept[Exception] { s.sql("DETACH CLONE graft.clsp.dst_t") }
    s.sql("DETACH CLONE graft.clsp.dst_t FORCE")
    intercept[Exception] { s.sql("DETACH CLONE graft.clsp.dst_t") }
    s.sql("DROP TABLE graft.clsp.src_t")
    s.sql("DROP TABLE graft.clsp.dst_t")
    s.sessionState.catalogManager.catalog("graft") match {
      case g: graft.sql.GraftCatalog => g.purgeDropped(Array("clsp"), 0L, force = true)
      case _ => ()
    }
  }
}
