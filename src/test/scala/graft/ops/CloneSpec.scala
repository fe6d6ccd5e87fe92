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
  test("DROP TABLE of a clone's source refuses while attached (ADVICE r12)") {
    val s = spark
    graft.sql.GraftSql.ensureCatalog(s)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.cldrop")
    s.sql("DROP TABLE IF EXISTS graft.cldrop.src_g")
    s.sql("DROP TABLE IF EXISTS graft.cldrop.dst_g")
    s.sql("CREATE TABLE graft.cldrop.src_g AS SELECT id AS k FROM range(50)")
    s.sql("CREATE TABLE graft.cldrop.dst_g SHALLOW CLONE graft.cldrop.src_g")
    // The tombstone RENAME alone would dangle the clone's absolute paths.
    val e = intercept[Exception] { s.sql("DROP TABLE graft.cldrop.src_g") }
    assert(e.getMessage.contains("clone"), e.getMessage)
    assert(s.sql("SELECT count(*) FROM graft.cldrop.dst_g").head().getLong(0) == 50L)
    // Detach releases the guard; the drop then proceeds.
    s.sql("DETACH CLONE graft.cldrop.dst_g FORCE")
    s.sql("DROP TABLE graft.cldrop.src_g")
    s.sql("DROP TABLE graft.cldrop.dst_g")
    s.sessionState.catalogManager.catalog("graft") match {
      case g: graft.sql.GraftCatalog => g.purgeDropped(Array("cldrop"), 0L, force = true)
      case _ => ()
    }
  }

  test("purge skips a tombstone that attached clones still reference (ADVICE r12)") {
    val s = spark
    graft.sql.GraftSql.ensureCatalog(s)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.clpg")
    s.sql("DROP TABLE IF EXISTS graft.clpg.src_p")
    // Hermetic: the warehouse persists across sbt runs — a stale pinned
    // tombstone from an earlier aborted run would shadow this lineage.
    s.sessionState.catalogManager.catalog("graft") match {
      case g: graft.sql.GraftCatalog =>
        g.purgeDropped(Array("clpg"), 0L, force = true)
      case _ => ()
    }
    s.sql("CREATE TABLE graft.clpg.src_p AS SELECT id AS k FROM range(30)")
    val wh = graft.sql.GraftSql.defaultWarehouse
    s.sql("DROP TABLE graft.clpg.src_p") // tombstoned, no clones yet
    // Attach a clone DIRECTLY to the tombstone root (the pre-r13-guard
    // state: bytes dropped first, pinned after — e.g. an UNDROP race).
    val tomb = new java.io.File(s"$wh/clpg/_dropped").listFiles()
      .filter(_.getName.startsWith("src_p@")).head.getAbsolutePath
    val cloneRoot = tmpDir() + "/pinned_clone"
    SnapshotTable.cloneShallow(s, tomb, cloneRoot)
    s.sessionState.catalogManager.catalog("graft") match {
      case g: graft.sql.GraftCatalog =>
        // Unforced purge must SKIP the pinned tombstone...
        assert(g.purgeDropped(Array("clpg"), 0L) == 0,
          "purge must skip a clone-pinned tombstone")
        // The guarded invariant is BYTE PRESERVATION: the tombstone's dirs
        // survive (the clone's manifest carries pre-rename absolute paths,
        // so only UNDROP — not a tombstone read — revives them).
        assert(new java.io.File(tomb).isDirectory,
          "pinned tombstone bytes must survive an unforced purge")
        // ... detaching releases it; the next purge reclaims.
        assert(SnapshotTable.detachClone(s, cloneRoot, force = true))
        assert(g.purgeDropped(Array("clpg"), 0L) == 1)
      case _ => fail("graft catalog not registered")
    }
  }

  test("a failed clone never leaks its retention pins (ADVICE r12)") {
    val s = spark
    val srcRoot = tmpDir() + "/src_leak"
    SnapshotTable.commit(s, srcRoot, (1 to 20).map(i => (i.toLong, s"v$i")).toSeq
      .toDF("k", "v"))
    // Sabotage the target: a plain FILE where the clone root must be a
    // dir — the marker write throws AFTER pins were registered.
    val target = tmpDir() + "/broken_target"
    assert(new java.io.File(target).createNewFile())
    intercept[Exception] { SnapshotTable.cloneShallow(s, srcRoot, target) }
    assert(SnapshotTable.subscriberWatermark(s, srcRoot).isEmpty,
      "failed clone must unregister its pins")
  }
}
