package graft.sql

import graft.SparkSpec
import graft.ops.{SnapshotStats, SnapshotTable}
import org.apache.spark.sql.functions._

/** Round-13 operability DDL (VERDICT r12 #7 + #3): SHOW CREATE TABLE
  * round-trips the manifest's declarations (schema, clustering, bloom
  * config, CHECK constraints, clone provenance); DESCRIBE DETAIL surfaces
  * table-level metadata including deletion-vector debt; and the DECLARED
  * clustering is preserved by DML rewrites — N merge waves must not decay
  * file-skipping selectivity. */
class TableDdlSpec extends SparkSpec {
  import spark.implicits._

  // Fixture tables sit under the DV economic floor — drop it so the
  // DESCRIBE DETAIL debt surface has something to show.
  SnapshotTable.dvMinTouchedBytes = 0L

  private def cat(): GraftCatalog = {
    GraftSql.ensureCatalog(spark)
    spark.sessionState.catalogManager.catalog("graft") match {
      case g: GraftCatalog => g
      case other => fail(s"graft catalog is $other")
    }
  }

  test("SHOW CREATE TABLE: re-executing the script reproduces the table") {
    val s = spark
    cat()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.ddl")
    s.sql("DROP TABLE IF EXISTS graft.ddl.sc_src")
    s.sql("DROP TABLE IF EXISTS graft.ddl.sc_dup")
    s.sql("""CREATE TABLE graft.ddl.sc_src (
               `k` BIGINT NOT NULL, `v` STRING, `price` DECIMAL(18,2))
             CLUSTER BY (`k`)
             TBLPROPERTIES ('graft.bloom.columns' = 'v')""")
    s.sql("ALTER TABLE graft.ddl.sc_src ADD CONSTRAINT pos CHECK (price >= 0)")
    val script = s.sql("SHOW CREATE TABLE graft.ddl.sc_src")
      .collect().map(_.getString(0)).toSeq
    assert(script.head.contains("CREATE TABLE"), script.head)
    assert(script.head.contains("CLUSTER BY (`k`)"), script.head)
    assert(script.head.contains("graft.bloom.columns"), script.head)
    assert(script.exists(_.contains("ADD CONSTRAINT pos")), script)
    // Round-trip: run the non-comment statements against a fresh name.
    script.filterNot(_.startsWith("--"))
      .map(_.replace("`graft`.`ddl`.`sc_src`", "graft.ddl.sc_dup"))
      .foreach(s.sql(_))
    val a = s.sql("DESCRIBE DETAIL graft.ddl.sc_src").collect().head
    val b = s.sql("DESCRIBE DETAIL graft.ddl.sc_dup").collect().head
    for (f <- Seq("num_columns", "clustering_columns", "bloom_columns",
                  "constraints"))
      assert(a.getAs[Any](f) == b.getAs[Any](f), s"$f differs")
    // The duplicate enforces the constraint and keeps the schema exactly.
    intercept[Exception] {
      s.sql("INSERT INTO graft.ddl.sc_dup VALUES (1, 'x', -5.00)")
    }
    s.sql("DROP TABLE graft.ddl.sc_src"); s.sql("DROP TABLE graft.ddl.sc_dup")
    cat().purgeDropped(Array("ddl"), 0L, force = true)
  }

  test("SHOW CREATE TABLE on a non-graft dotted name falls through to Spark (ADVICE r13)") {
    val s = spark
    cat() // graft extensions active: the parser claims every dotted name
    val loc = java.nio.file.Files.createTempDirectory("graft-test-sc").toString
    s.sql("CREATE DATABASE IF NOT EXISTS scdb")
    s.sql("DROP TABLE IF EXISTS scdb.plain")
    s.sql(s"CREATE TABLE scdb.plain (k BIGINT, v STRING) USING parquet " +
      s"LOCATION '$loc/plain'")
    // Pre-fix this failed at execution with "scdb is not a graft catalog";
    // the command must fall back to Spark's native SHOW CREATE TABLE.
    val script = s.sql("SHOW CREATE TABLE scdb.plain")
      .collect().map(_.getString(0)).toSeq
    assert(script.head.contains("plain") && script.head.contains("CREATE TABLE"),
      script)
    // The 3-part session-catalog spelling falls through too.
    val script3 = s.sql("SHOW CREATE TABLE spark_catalog.scdb.plain")
      .collect().map(_.getString(0)).toSeq
    assert(script3.head.contains("plain"), script3)
    s.sql("DROP TABLE scdb.plain")
    s.sql("DROP DATABASE scdb")
  }

  test("SHOW CREATE TABLE carries clone provenance as a comment row") {
    val s = spark
    cat()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.ddl")
    s.sql("DROP TABLE IF EXISTS graft.ddl.prov_src")
    s.sql("DROP TABLE IF EXISTS graft.ddl.prov_cl")
    s.sql("CREATE TABLE graft.ddl.prov_src AS SELECT id AS k FROM range(10)")
    s.sql("CREATE TABLE graft.ddl.prov_cl SHALLOW CLONE graft.ddl.prov_src")
    val script = s.sql("SHOW CREATE TABLE graft.ddl.prov_cl")
      .collect().map(_.getString(0)).toSeq
    assert(script.exists(r => r.startsWith("--") && r.contains("SHALLOW CLONE")),
      script)
    val d = s.sql("DESCRIBE DETAIL graft.ddl.prov_cl").collect().head
    assert(d.getAs[String]("clone_source").endsWith("/ddl/prov_src"))
    assert(d.getAs[Long]("clone_version") == 0L)
    s.sql("DETACH CLONE graft.ddl.prov_cl FORCE")
    s.sql("DROP TABLE graft.ddl.prov_cl"); s.sql("DROP TABLE graft.ddl.prov_src")
    cat().purgeDropped(Array("ddl"), 0L, force = true)
  }

  test("DESCRIBE DETAIL surfaces deletion-vector debt; OPTIMIZE clears it") {
    val s = spark
    cat()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.ddl")
    s.sql("DROP TABLE IF EXISTS graft.ddl.dv_det")
    s.sql("""CREATE TABLE graft.ddl.dv_det CLUSTER BY (k) AS
             SELECT id AS k, CAST(id * 2 AS STRING) AS v FROM range(20000)""")
    s.sql("DELETE FROM graft.ddl.dv_det WHERE k IN (3, 7777, 15555)")
    val d1 = s.sql("DESCRIBE DETAIL graft.ddl.dv_det").collect().head
    assert(d1.getAs[Long]("dv_files") >= 1L, d1)
    assert(d1.getAs[Long]("dv_rows") == 3L, d1)
    assert(d1.getAs[Long]("total_rows") == 19997L, d1)
    s.sql("OPTIMIZE graft.ddl.dv_det")
    val d2 = s.sql("DESCRIBE DETAIL graft.ddl.dv_det").collect().head
    assert(d2.getAs[Long]("dv_files") == 0L, d2)
    assert(d2.getAs[Long]("total_rows") == 19997L, d2)
    s.sql("DROP TABLE graft.ddl.dv_det")
    cat().purgeDropped(Array("ddl"), 0L, force = true)
  }

  test("declared clustering survives merge waves: skipping stays file-granular") {
    val root = tmpDir() + "/clus"
    SnapshotTable.commitClustered(spark, root,
      (0 until 20000).map(i => (i.toLong, s"v$i")).toDF("k", "v"),
      Seq("k"), numFiles = 10)
    // The declaration rides the manifest.
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(SnapshotStats.clusterByFromManifest(
      SnapshotTable.manifestBodyAt(fs, root, 0L)) == Seq("k"))
    // 8 merge waves, each updating a scattered key slice — every wave
    // rewrites files; without write-side re-sort the rewritten files mix
    // key ranges and a point predicate stops pruning.
    val rnd = new scala.util.Random(7)
    (1 to 8).foreach { w =>
      val keys = Seq.fill(40)(rnd.nextInt(20000).toLong).distinct
      SnapshotTable.mergeInto(spark, root,
        keys.map(k => (k, s"w$w-$k")).toDF("k", "v"), Seq("k"),
        matchedUpdate = Some(None), notMatchedInsert = Some(None))
    }
    val v = SnapshotTable.currentVersion(spark, root).get
    val entries = SnapshotStats.statsFromManifest(
      SnapshotTable.manifestBodyAt(fs, root, v))
    assert(SnapshotStats.clusterByFromManifest(
      SnapshotTable.manifestBodyAt(fs, root, v)) == Seq("k"),
      "declaration must inherit through DML commits")
    // Plan-level gate: a point predicate plans a small fraction of files.
    val (df, idxOpt) = SnapshotTable.readTracked(spark, root)
    val got = df.filter(col("k") === 12345L).collect()
    assert(got.length == 1)
    val idx = idxOpt.get
    assert(idx.totalFiles >= 10, s"table should hold many files: ${idx.totalFiles}")
    assert(idx.lastSelected <= math.max(2, idx.totalFiles / 4),
      s"skipping decayed: planned ${idx.lastSelected} of ${idx.totalFiles} files")
  }
}
