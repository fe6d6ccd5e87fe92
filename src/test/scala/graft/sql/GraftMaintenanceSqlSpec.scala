package graft.sql

import graft.SparkSpec
import graft.ops.SnapshotTable
import org.apache.spark.sql.functions._

/** The maintenance-statement grammar (round 11 parser extension): VACUUM /
  * OPTIMIZE [ZORDER BY] / RESTORE TABLE ... TO VERSION AS OF [WITH CDC] /
  * DESCRIBE HISTORY, each lowering onto the Scala API's entry point —
  * plus proof the wrapper delegates everything else untouched. */
class GraftMaintenanceSqlSpec extends SparkSpec {
  import spark.implicits._

  GraftSql.ensureCatalog(spark)

  private def fresh(ns: String): String = {
    spark.sql(s"DROP NAMESPACE IF EXISTS graft.$ns CASCADE")
    spark.sql(s"CREATE NAMESPACE graft.$ns")
    ns
  }

  test("OPTIMIZE ... DV ONLY consolidates side-cars through the SQL surface (r14)") {
    val ns = fresh("mntdv")
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"
    val oldFloor = SnapshotTable.dvMinTouchedBytes
    SnapshotTable.dvMinTouchedBytes = 0L // KB fixture: exercise the DV path
    try {
      spark.sql(s"""CREATE TABLE graft.$ns.t CLUSTER BY (k) AS
                    SELECT id AS k, CAST(id AS DOUBLE) AS v FROM range(10000)""")
      (1 to 3).foreach(i =>
        spark.sql(s"DELETE FROM graft.$ns.t WHERE k = ${i * 17}"))
      val st = spark.sql(s"DESCRIBE STATUS graft.$ns.t").head()
      assert(st.getAs[Long]("dv_sidecars") >= 2L)
      assert(Option(st.getAs[String]("maintenance_hint"))
        .exists(_.contains("DV ONLY")), st.toString)
      // inputFiles includes the DV side-cars the masked scan opens —
      // compare DATA files only (consolidation replaces side-cars by design).
      def dataFiles(): Set[String] = SnapshotTable.read(spark, root)
        .inputFiles.filterNot(_.contains("/dv-")).toSet
      val before = dataFiles()
      val v = spark.sql(s"OPTIMIZE graft.$ns.t DV ONLY").head().getLong(0)
      assert(v > 0, "consolidation must commit a version")
      assert(dataFiles() == before, "DV ONLY must rewrite no data files")
      val st2 = spark.sql(s"DESCRIBE STATUS graft.$ns.t").head()
      assert(st2.getAs[Long]("dv_sidecars") == 1L)
      assert(st2.getAs[String]("maintenance_hint") == null)
      assert(spark.sql(s"SELECT count(*) FROM graft.$ns.t").head().getLong(0)
        == 9997L)
      // Idempotent through SQL too: nothing left to merge → -1.
      assert(spark.sql(s"OPTIMIZE graft.$ns.t DV ONLY").head().getLong(0) == -1L)
    } finally SnapshotTable.dvMinTouchedBytes = oldFloor
  }

  test("OPTIMIZE compacts; DESCRIBE HISTORY audits; VACUUM retains by count and respects FORCE") {
    val ns = fresh("mnt1")
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"
    Seq((0L, 0.0)).toDF("k", "v").createOrReplaceTempView("mnt1_seed")
    spark.sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM mnt1_seed")
    (1 to 4).foreach(i =>
      spark.sql(s"INSERT INTO graft.$ns.t SELECT ${i}L AS k, $i.0 AS v"))
    // within the 64-file compaction bound: OPTIMIZE is a no-op (-1)
    assert(spark.sql(s"OPTIMIZE graft.$ns.t").head().getLong(0) == -1L)
    // ... a wide append pushes past it and OPTIMIZE bin-packs
    spark.sql(s"INSERT INTO graft.$ns.t " +
      s"SELECT /*+ REPARTITION(80) */ id + 10 AS k, CAST(id AS DOUBLE) AS v " +
      s"FROM range(200)")
    val filesBefore = SnapshotTable.read(spark, root).inputFiles.length
    assert(filesBefore > 64, s"setup must exceed the bound (got $filesBefore)")
    val vOpt = spark.sql(s"OPTIMIZE graft.$ns.t").head().getLong(0)
    assert(vOpt > 0)
    assert(SnapshotTable.read(spark, root).inputFiles.length <= 64)

    // DESCRIBE HISTORY: every commit audited with kinds; SQL rows == API rows
    val hist = spark.sql(s"DESCRIBE HISTORY graft.$ns.t").collect()
    val api = SnapshotTable.history(spark, root).collect()
    assert(hist.length == api.length && hist.length >= 7)
    assert(hist.map(_.getString(1)).count(_ == "append") == 5)

    // VACUUM RETAIN 2 VERSIONS
    spark.sql(s"VACUUM graft.$ns.t RETAIN 2 VERSIONS")
    assert(spark.sql(s"DESCRIBE HISTORY graft.$ns.t").count() == 2)

    // a lagging subscriber clamps SQL VACUUM too; FORCE overrides
    val cur = SnapshotTable.currentVersion(spark, root).get
    SnapshotTable.appendOnce(spark, root, Seq((999L, 9.0)).toDF("k", "v"), "m1", 0L)
    SnapshotTable.registerSubscriber(spark, root, "lagger", cur)
    spark.sql(s"VACUUM graft.$ns.t RETAIN 1 VERSIONS")
    assert(spark.sql(s"DESCRIBE HISTORY graft.$ns.t").count() == 2,
      "watermark must retain the lagging subscriber's anchor")
    spark.sql(s"VACUUM graft.$ns.t RETAIN 1 VERSIONS FORCE")
    assert(spark.sql(s"DESCRIBE HISTORY graft.$ns.t").count() == 1)
    assert(spark.sql(s"SELECT count(*) FROM graft.$ns.t").head().getLong(0) == 206L)
  }

  test("OPTIMIZE ZORDER BY re-clusters (file skipping restored); RESTORE TO VERSION AS OF rewinds") {
    val ns = fresh("mnt2")
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"
    // interleaved appends: every file spans the whole key range
    (0 until 4).foreach { i =>
      SnapshotTable.append(spark, root,
        (0L until 4000L).filter(_ % 4 == i).map(k => (k, k % 97, k * 1.0))
          .toDF("k", "b", "v").repartition(4))
    }
    val (pre, preIdx) = SnapshotTable.readTracked(spark, root)
    pre.filter(col("k") === 7L && col("b") === 7L).collect()
    val preRatio = preIdx.map(i => i.lastSelected.toDouble / i.totalFiles).get

    val vz = spark.sql(s"OPTIMIZE graft.$ns.t ZORDER BY (k, b)").head().getLong(0)
    assert(vz > 0)
    val (post, postIdx) = SnapshotTable.readTracked(spark, root)
    post.filter(col("k") === 7L && col("b") === 7L).collect()
    val postRatio = postIdx.map(i => i.lastSelected.toDouble / i.totalFiles).get
    assert(postRatio < preRatio && postRatio < 0.5,
      s"z-order must TIGHTEN two-dimension skipping: pre=$preRatio post=$postRatio")

    // RESTORE: rows rewind, history survives, WITH CDC refused on schema drift
    val before = SnapshotTable.rowCount(spark, root)
    SnapshotTable.delete(spark, root, col("k") < 2000L)
    spark.sql(s"RESTORE TABLE graft.$ns.t TO VERSION AS OF $vz")
    assert(SnapshotTable.rowCount(spark, root) == before)
    // the WITH CDC form flows through to restore(withCdc = true)
    SnapshotTable.delete(spark, root, col("k") === 0L)
    val target = SnapshotTable.currentVersion(spark, root).get - 1
    spark.sql(s"RESTORE TABLE graft.$ns.t TO VERSION AS OF $target WITH CDC")
    val v = SnapshotTable.currentVersion(spark, root).get
    assert(SnapshotTable.changesDelta(spark, root, v - 1, Some(v)).isDefined,
      "WITH CDC must record the synthetic retraction+reinsert delta")
  }

  test("graft-cdf readStream addresses a table by CATALOG NAME") {
    val ns = fresh("mnt3")
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").createOrReplaceTempView("mnt3_seed")
    spark.sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM mnt3_seed")
    spark.sql(s"INSERT INTO graft.$ns.t VALUES (3L, 3.0)")
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val q = spark.readStream.format("graft-cdf")
      .option("table", s"graft.$ns.t")
      .option("startVersion", "0")
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        buf.synchronized { buf ++= b.collect() }; ()
      }
      .option("checkpointLocation", s"${tmpDir()}/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000L))
    assert(buf.map(_.getAs[Long]("k")).toSet == Set(3L),
      s"the catalog-named feed must carry the INSERT's delta: ${buf.toSeq}")
  }

  test("TIMESTAMP AS OF resolves the greatest version at-or-before; too-early fails loudly") {
    val ns = fresh("mnt4")
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"
    Seq((1L, 1.0)).toDF("k", "v").createOrReplaceTempView("mnt4_seed")
    spark.sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM mnt4_seed")          // v0
    spark.sql(s"INSERT INTO graft.$ns.t VALUES (2L, 2.0)")                     // v1
    spark.sql(s"UPDATE graft.$ns.t SET v = 9.0 WHERE k = 1")                   // v2
    val ts = SnapshotTable.history(spark, root)
      .select("version", "committed_at").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    assert(ts.values.toSet.size == 3, "commit stamps must be distinct (monotonic)")
    def countAt(t: java.sql.Timestamp): Long =
      spark.sql(s"SELECT count(*) AS n FROM graft.$ns.t TIMESTAMP AS OF '$t'")
        .head().getLong(0)
    assert(countAt(ts(0L)) == 1L, "v0's own stamp pins v0")
    assert(countAt(ts(1L)) == 2L)
    // between v1 and v2 resolves v1; v2's stamp (and later) resolves v2
    assert(spark.sql(s"SELECT v FROM graft.$ns.t TIMESTAMP AS OF '${ts(2L)}' WHERE k = 1")
      .head().getDouble(0) == 9.0)
    assert(spark.sql(s"SELECT v FROM graft.$ns.t TIMESTAMP AS OF '${ts(1L)}' WHERE k = 1")
      .head().getDouble(0) == 1.0)
    // a timestamp before every retained commit fails loudly
    val early = new java.sql.Timestamp(ts(0L).getTime - 5000)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.$ns.t TIMESTAMP AS OF '$early'").collect()
    }
    assert(e.getMessage.contains("committed at or before"), e.getMessage)

    // RESTORE TO TIMESTAMP AS OF rewinds to the resolved version
    spark.sql(s"RESTORE TABLE graft.$ns.t TO TIMESTAMP AS OF '${ts(1L)}'")
    assert(spark.sql(s"SELECT v FROM graft.$ns.t WHERE k = 1").head().getDouble(0) == 1.0,
      "restore-by-timestamp must rewind the v2 update")
    assert(spark.sql(s"SELECT count(*) AS n FROM graft.$ns.t").head().getLong(0) == 2L)
  }

  test("maintenance grammar accepts backtick-quoted identifiers; bare VACUUM is refused") {
    val ns = fresh("mnt5")
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").createOrReplaceTempView("mnt5_seed")
    spark.sql(s"CREATE TABLE graft.$ns.`my-table` AS SELECT * FROM mnt5_seed")
    spark.sql(s"INSERT INTO graft.$ns.`my-table` VALUES (3L, 3.0)")
    // OPTIMIZE / DESCRIBE HISTORY / VACUUM through the quoted name
    assert(spark.sql(s"OPTIMIZE graft.$ns.`my-table`").head().getLong(0) == -1L)
    assert(spark.sql(s"DESCRIBE HISTORY graft.$ns.`my-table`").count() == 2)
    spark.sql(s"VACUUM graft.$ns.`my-table` RETAIN 1 VERSIONS FORCE")
    assert(spark.sql(s"DESCRIBE HISTORY graft.$ns.`my-table`").count() == 1)
    // bare VACUUM (no RETAIN) refuses instead of silently dropping history
    val e = intercept[Exception] { spark.sql(s"VACUUM graft.$ns.`my-table`") }
    assert(e.getMessage.contains("explicit retention"), e.getMessage)
  }

  test("DESCRIBE STATUS surfaces the vacuum clamp decision, subscribers, CAS losses") {
    val ns = fresh("mnt6")
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"
    Seq((1L, 1.0)).toDF("k", "v").createOrReplaceTempView("mnt6_seed")
    spark.sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM mnt6_seed")      // v0
    spark.sql(s"INSERT INTO graft.$ns.t VALUES (2L, 2.0)")                 // v1
    spark.sql(s"INSERT INTO graft.$ns.t VALUES (3L, 3.0)")                 // v2
    SnapshotTable.registerSubscriber(spark, root, "lagger", 1L)

    spark.sql(s"VACUUM graft.$ns.t RETAIN 1 VERSIONS") // clamped to keep v1, v2
    val st = spark.sql(s"DESCRIBE STATUS graft.$ns.t").head()
    assert(st.getAs[Long]("version") == 2L)
    assert(st.getAs[Long]("retained_versions") == 2L, "watermark keeps v1 up")
    assert(st.getAs[scala.collection.Seq[String]]("subscribers").toSeq == Seq("lagger:1"))
    assert(st.getAs[Long]("last_vacuum_requested_keep") == 1L)
    assert(st.getAs[Long]("last_vacuum_effective_keep") == 2L)
    assert(st.getAs[Long]("last_vacuum_clamped_by_watermark") == 1L,
      "the clamping watermark must be visible, not silent")
    assert(st.getAs[Long]("cas_losses") >= 0L)

    spark.sql(s"VACUUM graft.$ns.t RETAIN 1 VERSIONS FORCE")
    val st2 = spark.sql(s"DESCRIBE STATUS graft.$ns.t").head()
    assert(st2.getAs[Long]("retained_versions") == 1L)
    assert(st2.getAs[Long]("last_vacuum_clamped_by_watermark") == -1L,
      "a forced vacuum records an unclamped decision")
  }

  test("VACUUM ... DRY RUN previews the reclaim without touching anything") {
    val ns = fresh("mntdr")
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"
    spark.sql(s"CREATE TABLE graft.$ns.t AS " +
      "SELECT CAST(0 AS BIGINT) AS k, CAST(0 AS DOUBLE) AS v")
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO graft.$ns.t SELECT ${i}L AS k, CAST($i AS DOUBLE) AS v"))
    val before = SnapshotTable.history(spark, root).count()
    assert(before == 4L)
    val plan = spark.sql(s"VACUUM graft.$ns.t RETAIN 1 VERSIONS DRY RUN").collect()
    // 3 dropped manifests; v0 is a files-less CTAS... no — CTAS writes
    // rows, so each of v0..v2's own dirs is dead only if no kept manifest
    // references it; append commits SHARE dirs, so only the manifests and
    // zero data dirs are doomed here (v3 carries every earlier file).
    val kinds = plan.map(_.getString(0)).groupBy(identity).view.mapValues(_.length).toMap
    assert(kinds.getOrElse("manifest", 0) == 3, s"plan: ${plan.mkString(", ")}")
    assert(kinds.getOrElse("data-dir", 0) == 0,
      "append commits share dirs; nothing is reclaimable while v3 references them")
    assert(plan.forall(_.getLong(2) > 0L))
    // NOTHING was touched.
    assert(SnapshotTable.history(spark, root).count() == 4L)
    assert(SnapshotTable.read(spark, root, Some(0L)).count() == 1L)

    // A REWRITE (OPTIMIZE) makes old dirs genuinely dead: the dry run now
    // prices them, and the real vacuum reclaims exactly what it listed.
    spark.sql(s"INSERT INTO graft.$ns.t " +
      "SELECT /*+ REPARTITION(80) */ id + 10 AS k, CAST(id AS DOUBLE) AS v FROM range(200)")
    spark.sql(s"OPTIMIZE graft.$ns.t")
    val plan2 = spark.sql(s"VACUUM graft.$ns.t RETAIN 1 VERSIONS DRY RUN").collect()
    assert(plan2.exists(_.getString(0) == "data-dir"),
      s"the folded small-file dirs must be priced: ${plan2.length} rows")
    val doomedDirs = plan2.filter(_.getString(0) == "data-dir").map(_.getString(1)).toSet
    spark.sql(s"VACUUM graft.$ns.t RETAIN 1 VERSIONS")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(doomedDirs.forall(d => !fs.exists(new org.apache.hadoop.fs.Path(d))),
      "the real vacuum must reclaim exactly the dry run's data dirs")
    assert(SnapshotTable.read(spark, root).count() == 204L)

    // The clamp is visible in the preview too: a lagging subscriber makes
    // the same DRY RUN list nothing.
    (1 to 2).foreach(i =>
      spark.sql(s"INSERT INTO graft.$ns.t SELECT ${100 + i}L AS k, CAST(0 AS DOUBLE) AS v"))
    SnapshotTable.registerSubscriber(spark, root,
      "dr-lagger", SnapshotTable.currentVersion(spark, root).get - 2)
    val clamped = spark.sql(s"VACUUM graft.$ns.t RETAIN 1 VERSIONS DRY RUN").collect()
    assert(clamped.isEmpty, s"watermark must clamp the preview: ${clamped.length} rows")
    SnapshotTable.unregisterSubscriber(spark, root, "dr-lagger")
  }

  test("non-maintenance SQL delegates untouched (including parse errors)") {
    assert(spark.sql("SELECT 1 AS x").head().getInt(0) == 1)
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql("SELEC 1")
    }
    // VACUUM over a non-graft catalog name fails loudly at run, not parse
    val e = intercept[Exception] {
      spark.sql("VACUUM spark_catalog.default.x RETAIN 2 VERSIONS")
    }
    assert(e.getMessage.contains("not a graft catalog"), e.getMessage)
  }
}
