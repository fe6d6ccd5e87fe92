package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** COPY INTO (round 12): idempotent file-level ingest whose loaded-file
  * ledger rides in the manifest. Pins: exactly-once across blind re-runs;
  * ledger survival under OPTIMIZE + VACUUM (the manifests that recorded
  * the loads are gone, the ledger is not); RESTORE rewinding the ledger
  * with the rows; format alignment and the constraint gate on ingested
  * batches; and the SQL statement shape. */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  /** Write `rows` as ONE deterministic csv file `<dir>/<name>.csv`. */
  private def csvFile(dir: String, name: String, header: String,
                      rows: Seq[String]): Unit = {
    val d = new java.io.File(dir); d.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(d, s"$name.csv"), "UTF-8")
    try { w.println(header); rows.foreach(w.println) } finally w.close()
  }

  test("each file loads exactly once across blind re-runs; new files load") {
    val base = tmpDir()
    val root = s"$base/t"
    val land = s"$base/landing"
    SnapshotTable.commitEmpty(spark, root,
      Seq.empty[(Long, String)].toDF("k", "s").schema)
    csvFile(land, "b1", "k,s", (1L to 10L).map(k => s"$k,r$k"))
    csvFile(land, "b2", "k,s", (11L to 20L).map(k => s"$k,r$k"))

    val (v1, f1, r1) = SnapshotTable.copyInto(spark, root, land, "csv")
    assert((f1, r1) == (2L, 20L), s"first run loads both files: $f1/$r1")
    assert(SnapshotTable.read(spark, root).count() == 20L)

    // Blind re-run: nothing new, version unchanged, zero I/O committed.
    val (v2, f2, r2) = SnapshotTable.copyInto(spark, root, land, "csv")
    assert((v2, f2, r2) == (v1, 0L, 0L), "re-run must be a committed no-op")

    // A file landing later loads alone.
    csvFile(land, "b3", "k,s", (21L to 25L).map(k => s"$k,r$k"))
    val (v3, f3, r3) = SnapshotTable.copyInto(spark, root, land, "csv")
    assert(v3 == v1 + 1 && (f3, r3) == (1L, 5L))
    assert(SnapshotTable.read(spark, root).count() == 25L)

    // Hidden/underscore files and non-matching patterns are ignored.
    csvFile(land, "_meta", "k,s", Seq("99,x"))
    csvFile(land, "skipme", "k,s", Seq("98,y"))
    val (_, f4, _) = SnapshotTable.copyInto(spark, root, land, "csv",
      pattern = Some("b*.csv"))
    assert(f4 == 0L, "pattern must exclude skipme.csv; _meta is hidden")
  }

  test("ledger survives OPTIMIZE + VACUUM and rewinds with RESTORE") {
    val base = tmpDir()
    val root = s"$base/t"
    val land = s"$base/landing"
    SnapshotTable.commitEmpty(spark, root,
      Seq.empty[(Long, String)].toDF("k", "s").schema)
    csvFile(land, "b1", "k,s", (1L to 50L).map(k => s"$k,r$k"))
    val (v1, _, _) = SnapshotTable.copyInto(spark, root, land, "csv")

    // Compact + vacuum away every pre-compaction manifest: the versions
    // that RECORDED the load are gone, but the current manifest carries
    // the accumulated ledger — the re-run stays a no-op.
    SnapshotTable.recluster(spark, root, Seq("k"), numFiles = 1)
    SnapshotTable.vacuum(spark, root, keep = 1, force = true)
    val (_, f2, _) = SnapshotTable.copyInto(spark, root, land, "csv")
    assert(f2 == 0L, "ledger must survive compaction + vacuum")

    // RESTORE to the empty bootstrap rewinds rows AND ledger: the re-run
    // re-loads, converging the table back to the landing dir's content.
    csvFile(land, "b2", "k,s", (51L to 60L).map(k => s"$k,r$k"))
    SnapshotTable.copyInto(spark, root, land, "csv")
    // v0's manifest was vacuumed above — restore to the oldest RETAINED
    // version (pre-b2): its manifest carries only b1's ledger entry.
    val oldest = new java.io.File(root, "_manifests").listFiles()
      .map(_.getName).filter(_.startsWith("manifest-"))
      .map(_.stripPrefix("manifest-").stripSuffix(".json").toLong)
      .min
    SnapshotTable.restore(spark, root, oldest)
    val before = SnapshotTable.read(spark, root).count()
    val (_, f3, r3) = SnapshotTable.copyInto(spark, root, land, "csv")
    assert(f3 == 1L && r3 == 10L,
      s"restore rewound the ledger past b2; re-run re-loads it ($f3/$r3)")
    assert(SnapshotTable.read(spark, root).count() == before + 10L)
  }

  test("a SHALLOW CLONE carries the ledger: re-COPY on the clone is a no-op") {
    val base = tmpDir()
    val root = s"$base/t"
    val clone = s"$base/c"
    val land = s"$base/landing"
    SnapshotTable.commitEmpty(spark, root,
      Seq.empty[(Long, String)].toDF("k", "s").schema)
    csvFile(land, "b1", "k,s", (1L to 10L).map(k => s"$k,r$k"))
    SnapshotTable.copyInto(spark, root, land, "csv")
    SnapshotTable.cloneShallow(spark, root, clone)
    // The clone HAS b1's rows (via the cloned manifest), so re-loading
    // them would duplicate — the carried ledger prevents exactly that.
    val (_, f, _) = SnapshotTable.copyInto(spark, clone, land, "csv")
    assert(f == 0L, "the clone inherits the source's loaded-file ledger")
    // A file landing after the clone loads into each side independently.
    csvFile(land, "b2", "k,s", (11L to 12L).map(k => s"$k,r$k"))
    val (_, fc, _) = SnapshotTable.copyInto(spark, clone, land, "csv")
    val (_, fs2, _) = SnapshotTable.copyInto(spark, root, land, "csv")
    assert(fc == 1L && fs2 == 1L)
    assert(SnapshotTable.read(spark, clone).count() == 12L)
    assert(SnapshotTable.read(spark, root).count() == 12L)
  }

  test("parquet aligns by name with lossless casts; constraint gates the batch") {
    val base = tmpDir()
    val root = s"$base/t"
    val land = s"$base/landing"
    SnapshotTable.commit(spark, root, Seq((1L, 10.0)).toDF("k", "v"))
    SnapshotTable.setCheckConstraint(spark, root, "vpos", "v >= 0")
    // Source speaks (v, k) in a different order and INT k — upcast, align.
    Seq((2, 5.0), (3, 6.0)).toDF("k", "v").select(col("v"), col("k"))
      .coalesce(1).write.mode("overwrite").parquet(land)
    val (_, f1, r1) = SnapshotTable.copyInto(spark, root, land, "parquet")
    assert(f1 >= 1L && r1 == 2L)
    assert(SnapshotTable.read(spark, root).agg(sum("k")).head().getLong(0) == 6L)

    // A violating batch is refused atomically — ledger unchanged, so a
    // fixed re-land with a DIFFERENT size loads cleanly later.
    val land2 = s"$base/landing2"
    Seq((4, -1.0)).toDF("k", "v").coalesce(1).write.parquet(land2)
    intercept[IllegalArgumentException] {
      SnapshotTable.copyInto(spark, root, land2, "parquet")
    }
    assert(SnapshotTable.read(spark, root).count() == 3L)
    val (_, fAgain, _) = SnapshotTable.copyInto(spark, root, land, "parquet")
    assert(fAgain == 0L, "the good landing dir is still fully ledgered")
  }

  test("COPY_OPTIONS mergeSchema: additive evolution; strict mode still refuses") {
    val base = tmpDir()
    val root = s"$base/t"
    val land = s"$base/landing"
    SnapshotTable.commit(spark, root, Seq((1L, "a")).toDF("k", "s"))
    // The landing batch ADDS column v and LACKS declared column s.
    Seq((2L, 3.5)).toDF("k", "v").coalesce(1).write.parquet(land)
    intercept[IllegalArgumentException] {
      SnapshotTable.copyInto(spark, root, land, "parquet")
    }
    // The refused attempt must not have ledgered the file...
    val (_, f, r) = SnapshotTable.copyInto(spark, root, land, "parquet",
      mergeSchema = true)
    assert(f >= 1L && r == 1L)
    // ... and the schema widened additively: old rows NULL for v, the
    // batch NULL for s.
    val got = SnapshotTable.read(spark, root)
      .select("k", "s", "v").collect()
      .map(rr => (rr.getLong(0), Option(rr.get(1)), Option(rr.get(2)))).toSet
    assert(got == Set((1L, Some("a"), None), (2L, None, Some(3.5))), s"got $got")

    // SQL form: COPY_OPTIONS parses and routes.
    val s2 = spark
    graft.sql.GraftSql.ensureCatalog(s2)
    s2.sql("CREATE NAMESPACE IF NOT EXISTS graft.cpms")
    s2.sql("DROP TABLE IF EXISTS graft.cpms.t")
    s2.sql("CREATE TABLE graft.cpms.t AS SELECT CAST(1 AS BIGINT) AS k, 'a' AS s")
    val row = s2.sql(
      s"""COPY INTO graft.cpms.t FROM '$land' FILEFORMAT = PARQUET
          COPY_OPTIONS ('mergeSchema' = 'true')""").head()
    assert(row.getLong(2) == 1L)
    assert(s2.table("graft.cpms.t").columns.toSeq == Seq("k", "s", "v"))
    s2.sql("DROP TABLE graft.cpms.t")
    s2.sessionState.catalogManager.catalog("graft") match {
      case g: graft.sql.GraftCatalog => g.purgeDropped(Array("cpms"), 0L, force = true)
      case _ => ()
    }
  }

  test("SQL surface: COPY INTO ... FILEFORMAT = CSV with options and pattern") {
    val s = spark
    graft.sql.GraftSql.ensureCatalog(s)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.cpsp")
    s.sql("DROP TABLE IF EXISTS graft.cpsp.ing")
    s.sql("CREATE TABLE graft.cpsp.ing AS SELECT CAST(0 AS BIGINT) AS k, 'x' AS s LIMIT 0")
    val land = tmpDir()
    csvFile(land, "a1", "k|s", Seq("1|one", "2|two"))
    csvFile(land, "a2", "k|s", Seq("3|three"))
    val r = s.sql(
      s"""COPY INTO graft.cpsp.ing FROM '$land' FILEFORMAT = CSV
          PATTERN = 'a*.csv'
          FORMAT_OPTIONS ('delimiter' = '|', 'header' = 'true')""").head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 3L, s"loaded: $r")
    val r2 = s.sql(
      s"""COPY INTO graft.cpsp.ing FROM '$land' FILEFORMAT = CSV
          PATTERN = 'a*.csv'
          FORMAT_OPTIONS ('delimiter' = '|', 'header' = 'true')""").head()
    assert(r2.getLong(1) == 0L && r2.getLong(2) == 0L, "SQL re-run is a no-op")
    assert(s.sql("SELECT count(*) FROM graft.cpsp.ing").head().getLong(0) == 3L)
    s.sql("DROP TABLE graft.cpsp.ing")
    s.sessionState.catalogManager.catalog("graft") match {
      case g: graft.sql.GraftCatalog => g.purgeDropped(Array("cpsp"), 0L, force = true)
      case _ => ()
    }
  }
  test("an in-place overwrite (same length, new mtime) re-loads (ADVICE r12)") {
    val base = tmpDir()
    val root = s"$base/t"
    val land = s"$base/landing"
    SnapshotTable.commitEmpty(spark, root,
      Seq.empty[(Long, String)].toDF("k", "s").schema)
    csvFile(land, "b1", "k,s", Seq("1,aa"))
    val (_, f1, _) = SnapshotTable.copyInto(spark, root, land, "csv")
    assert(f1 == 1L)
    // Overwrite IN PLACE with different content of the SAME byte length —
    // the length-only identity would silently treat it as already loaded
    // and drop the new rows; path@len@mtime catches it.
    val f = new java.io.File(land, "b1.csv")
    val before = f.length()
    csvFile(land, "b1", "k,s", Seq("2,bb"))
    assert(f.length() == before, "fixture must keep the byte length")
    java.nio.file.Files.setLastModifiedTime(f.toPath,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 2000))
    val (_, f2, r2) = SnapshotTable.copyInto(spark, root, land, "csv")
    assert((f2, r2) == (1L, 1L), s"overwritten file must re-load: $f2/$r2")
    assert(SnapshotTable.read(spark, root).count() == 2L)
  }
  test("CDC: a standing delta consumer over COPY INTO feeds stays exact (r13)") {
    val base = tmpDir()
    val root = s"$base/t"
    val land = s"$base/landing"
    SnapshotTable.commitEmpty(spark, root,
      Seq.empty[(Long, String)].toDF("k", "s").schema)
    csvFile(land, "b1", "k,s", Seq("1,a", "2,b"))
    SnapshotTable.copyInto(spark, root, land, "csv")
    csvFile(land, "b2", "k,s", Seq("3,c"))
    SnapshotTable.copyInto(spark, root, land, "csv")
    // COPY INTO commits are appends: the file diff IS the add set, so a
    // row-level consumer anchored before the first load sees exactly the
    // ingested rows, and the idempotent re-run contributes NOTHING.
    SnapshotTable.copyInto(spark, root, land, "csv") // blind re-run: no-op
    val to = SnapshotTable.currentVersion(spark, root).get
    val Some((adds, removes)) = SnapshotTable.changesDelta(spark, root, 0L, Some(to))
    assert(removes.isEmpty)
    assert(adds.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // And the versioned feed shape (what the graft-cdf source serves).
    val feed = SnapshotTable.changesFeed(spark, root, 0L, to,
      SnapshotTable.read(spark, root).schema)
    assert(feed.filter(feed("_change_type") === "insert").count() == 3)
  }

  test("CDC: DML on a SHALLOW CLONE records exact change sets (r13)") {
    val src = tmpDir() + "/src"
    val cl = tmpDir() + "/cl"
    SnapshotTable.commitClustered(spark, src,
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "s"), Seq("k"), 4)
    SnapshotTable.cloneShallow(spark, src, cl)
    SnapshotTable.delete(spark, cl, org.apache.spark.sql.functions.col("k") === 42L)
    SnapshotTable.update(spark, cl, org.apache.spark.sql.functions.col("k") === 7L,
      Map("s" -> org.apache.spark.sql.functions.lit("updated")))
    val to = SnapshotTable.currentVersion(spark, cl).get
    val Some((adds, removes)) = SnapshotTable.changesDelta(spark, cl, 0L, Some(to))
    assert(adds.as[(Long, String)].collect().toSet == Set((7L, "updated")))
    assert(removes.as[(Long, String)].collect().toSet ==
      Set((42L, "v42"), (7L, "v7")))
    // The source saw none of it.
    assert(SnapshotTable.currentVersion(spark, src).contains(0L))
    SnapshotTable.detachClone(spark, cl, force = true)
  }
}
