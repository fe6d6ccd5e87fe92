package graft.sql

import graft.SparkSpec
import graft.ops.{SnapshotFileIndex, SnapshotTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** SQL-string DML/DDL over the table format (VERDICT r10 #1): Spark's own
  * parser resolves `graft.<ns>.<t>` through [[GraftCatalog]] and
  * [[GraftSqlRule]] lowers every statement onto the SnapshotTable commit
  * machinery — same CDC, same constraint gate, same file-skipping reads
  * as the Scala API. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  GraftSql.ensureCatalog(spark)

  private def sql(s: String): DataFrame = spark.sql(s)

  private def fresh(ns: String): String = {
    sql(s"DROP NAMESPACE IF EXISTS graft.$ns CASCADE")
    sql(s"CREATE NAMESPACE graft.$ns")
    ns
  }

  test("CTAS bootstraps; SELECT/INSERT/DESCRIBE/SHOW/DROP round-trip through the catalog") {
    val ns = fresh("cat1")
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "g", "v")
      .createOrReplaceTempView("cat1_seed")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM cat1_seed")
    assert(sql(s"SELECT count(*) AS n FROM graft.$ns.t").head().getLong(0) == 2L)
    assert(sql(s"SHOW TABLES IN graft.$ns").collect().map(_.getString(1)).toSet == Set("t"))
    assert(sql(s"DESCRIBE TABLE graft.$ns.t").collect()
      .map(_.getString(0)).toSet.intersect(Set("k", "g", "v")).size == 3)

    sql(s"INSERT INTO graft.$ns.t SELECT 3L AS k, 'c' AS g, 30.0 AS v")
    assert(sql(s"SELECT sum(k) AS s FROM graft.$ns.t").head().getLong(0) == 6L)
    // INSERT is an append COMMIT: version advanced, history shows it
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"
    assert(SnapshotTable.currentVersion(spark, root).contains(1L))
    assert(SnapshotTable.history(spark, root).filter(col("kind") === "append").count() == 1)

    // the reference's bootstrap shape: CTAS ... LIMIT 0 => empty, schema-bearing
    sql(s"CREATE TABLE graft.$ns.empty AS SELECT * FROM cat1_seed LIMIT 0")
    assert(sql(s"SELECT * FROM graft.$ns.empty").columns.toSeq == Seq("k", "g", "v"))
    assert(sql(s"SELECT count(*) AS n FROM graft.$ns.empty").head().getLong(0) == 0L)
    // ... and it accepts a first INSERT (append onto the empty version 0)
    sql(s"INSERT INTO graft.$ns.empty SELECT * FROM cat1_seed")
    assert(sql(s"SELECT count(*) AS n FROM graft.$ns.empty").head().getLong(0) == 2L)

    sql(s"DROP TABLE graft.$ns.empty")
    assert(!spark.catalog.tableExists(s"graft.$ns.empty"))
    assert(sql(s"SHOW TABLES IN graft.$ns").collect().map(_.getString(1)).toSet == Set("t"))
  }

  test("SQL MERGE INTO lowers onto SnapshotTable.mergeInto: clause algebra == DataFrame twin, CDC recorded") {
    val ns = fresh("cat2")
    val tgt = Seq((1L, 100.0, "O"), (2L, 200.0, "F"), (3L, 300.0, "O"))
      .toDF("k", "price", "st")
    val src = Seq((2L, 222.0, "F"), (3L, 333.0, "O"), (4L, 444.0, "O"),
      (5L, 50.0, "O")).toDF("k", "price", "st")
    tgt.createOrReplaceTempView("cat2_tgt")
    src.createOrReplaceTempView("cat2_src")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM cat2_tgt")
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"
    val v0 = SnapshotTable.currentVersion(spark, root).get

    // the reference's statement shape (main.py:349-358) + conditional arms
    sql(s"""MERGE INTO graft.$ns.t t
            USING cat2_src s
            ON t.k = s.k
            WHEN MATCHED AND s.st = 'F' THEN DELETE
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED AND s.price > 100 THEN INSERT *""")

    // DataFrame twin of the same clause algebra
    val want = graft.ops.MergeInto.into(tgt).using(src)
      .on("k")
      .whenMatchedDelete(col("s.st") === "F")
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll(Some(col("s.price") > 100))
      .result().collect().map(_.toString).toSet
    val got = sql(s"SELECT * FROM graft.$ns.t").collect().map(_.toString).toSet
    assert(got == want, s"SQL MERGE != DataFrame MERGE: $got vs $want")

    // the commit recorded row-level CDC (retraction form)
    val v1 = SnapshotTable.currentVersion(spark, root).get
    val Some((adds, removes)) = SnapshotTable.changesDelta(spark, root, v0, Some(v1))
    assert(removes.count() == 2L, "delete k=2 pre-image + update k=3 pre-image")
    assert(adds.count() == 2L, "update k=3 post-image + insert k=4")
  }

  test("SQL DELETE FROM and UPDATE lower onto the file-granular DML ops") {
    val ns = fresh("cat3")
    (1L to 40L).map(k => (k, k * 1.0)).toDF("k", "v")
      .createOrReplaceTempView("cat3_seed")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM cat3_seed")
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"

    sql(s"UPDATE graft.$ns.t SET v = v * 10 WHERE k <= 3")
    sql(s"DELETE FROM graft.$ns.t WHERE k > 35")
    val got = sql(s"SELECT * FROM graft.$ns.t").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == 35)
    assert(got(1L) == 10.0 && got(3L) == 30.0 && got(4L) == 4.0)
    assert(!got.contains(36L))
    // the UPDATE and DELETE commits both carry CDC pre/post images (the
    // CTAS bootstrap records none — a full snapshot is its own delta)
    val hist = SnapshotTable.history(spark, root)
    assert(hist.filter(col("has_cdc")).count() == 2)
  }

  test("catalog SELECT file-skips through SnapshotFileIndex (plan-gated); VERSION AS OF time travel") {
    val ns = fresh("cat4")
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"
    // clustered bootstrap via the Scala API; SQL reads it through the catalog
    SnapshotTable.commitClustered(spark, root,
      (1L to 4000L).map(k => (k, k * 2.0)).toDF("k", "v"), Seq("k"), numFiles = 8)
    val q = sql(s"SELECT sum(k) AS s FROM graft.$ns.t WHERE k BETWEEN 10 AND 20")
    assert(q.head().getLong(0) == (10L to 20L).sum)
    // The substituted scan is the ENGINE's read path: find its file index
    // and assert the WHERE pruned files at planning.
    val idx = q.queryExecution.optimizedPlan.collect {
      case LogicalRelation(HadoopFsRelation(i: SnapshotFileIndex, _, _, _, _, _), _, _, _, _) => i
    }
    assert(idx.nonEmpty, "catalog SELECT must plan through SnapshotFileIndex")
    assert(idx.head.lastSelected > 0 && idx.head.lastSelected < idx.head.totalFiles,
      s"key-range WHERE must file-skip: ${idx.head.lastSelected}/${idx.head.totalFiles}")

    // time travel: version 0 before an UPDATE
    sql(s"UPDATE graft.$ns.t SET v = 0.0 WHERE k = 1")
    assert(sql(s"SELECT v FROM graft.$ns.t WHERE k = 1").head().getDouble(0) == 0.0)
    assert(sql(s"SELECT v FROM graft.$ns.t VERSION AS OF 0 WHERE k = 1")
      .head().getDouble(0) == 2.0)

    // Column pruning survives the substitution's aliasing Project: a
    // 1-column SQL projection reads a 1-column parquet schema.
    val narrow = sql(s"SELECT sum(v) AS s FROM graft.$ns.t")
    narrow.collect()
    val planStr = narrow.queryExecution.executedPlan.toString
    assert(planStr.contains("ReadSchema: struct<v:double>"),
      s"projection must prune the scan to v alone:\n$planStr")

    // INSERT ... VALUES (the by-position write path)
    sql(s"INSERT INTO graft.$ns.t VALUES (9999L, 9.5)")
    assert(sql(s"SELECT v FROM graft.$ns.t WHERE k = 9999").head().getDouble(0) == 9.5)
  }

  test("ALTER TABLE RENAME/DROP COLUMN ride column mapping; INSERT OVERWRITE replaces") {
    val ns = fresh("cat5")
    Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "tag", "w")
      .createOrReplaceTempView("cat5_seed")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM cat5_seed")
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"

    sql(s"ALTER TABLE graft.$ns.t RENAME COLUMN tag TO label")
    assert(sql(s"SELECT label FROM graft.$ns.t WHERE k = 1").head().getString(0) == "x")
    assert(SnapshotTable.columnMapping(spark, root).nonEmpty)
    sql(s"ALTER TABLE graft.$ns.t DROP COLUMN w")
    assert(sql(s"SELECT * FROM graft.$ns.t").columns.toSeq == Seq("k", "label"))

    sql(s"INSERT OVERWRITE graft.$ns.t SELECT 9L AS k, 'z' AS label")
    val rows = sql(s"SELECT * FROM graft.$ns.t").collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 9L)
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT CHECK rides the commit gate (SQL surface)") {
    val ns = fresh("cat7")
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").createOrReplaceTempView("cat7_seed")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM cat7_seed")
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"

    sql(s"ALTER TABLE graft.$ns.t ADD CONSTRAINT v_pos CHECK (v > 0)")
    assert(SnapshotTable.checkConstraints(spark, root).get("v_pos").exists(_.contains("v")),
      "the SQL-declared CHECK must land in the manifest")
    // the gate enforces on the next commit — a violating INSERT is rejected atomically
    val before = SnapshotTable.currentVersion(spark, root).get
    intercept[Exception] {
      sql(s"INSERT INTO graft.$ns.t SELECT 3L AS k, -1.0 AS v")
    }
    assert(SnapshotTable.currentVersion(spark, root).contains(before),
      "a rejected commit must leave zero trace")
    sql(s"INSERT INTO graft.$ns.t SELECT 3L AS k, 30.0 AS v")
    assert(sql(s"SELECT count(*) AS n FROM graft.$ns.t").head().getLong(0) == 3L)
    // declaring a CHECK the data already violates fails loudly
    intercept[Exception] {
      sql(s"ALTER TABLE graft.$ns.t ADD CONSTRAINT v_big CHECK (v > 15)")
    }
    sql(s"ALTER TABLE graft.$ns.t DROP CONSTRAINT v_pos")
    assert(SnapshotTable.checkConstraints(spark, root).isEmpty)
    sql(s"INSERT INTO graft.$ns.t SELECT 4L AS k, -4.0 AS v") // gate gone
    assert(sql(s"SELECT count(*) AS n FROM graft.$ns.t").head().getLong(0) == 4L)
  }

  test("the Scala API reads/writes catalog tables by name: spark.table + writeTo") {
    val ns = fresh("cat11")
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"
    Seq((1L, 1.0)).toDF("k", "v").createOrReplaceTempView("cat11_seed")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM cat11_seed")
    // spark.table resolves through the catalog onto the engine's scan
    assert(spark.table(s"graft.$ns.t").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // DataFrameWriterV2 append lowers onto SnapshotTable.append
    Seq((2L, 2.0)).toDF("k", "v").writeTo(s"graft.$ns.t").append()
    assert(spark.table(s"graft.$ns.t").count() == 2L)
    assert(SnapshotTable.currentVersion(spark, root).contains(1L))
    // metadata observability rides DESCRIBE/SHOW TBLPROPERTIES
    val props = sql(s"SHOW TBLPROPERTIES graft.$ns.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.row.count").contains("2"))
    assert(props.get("graft.version").contains("1"))
  }

  test("replaceWhere: one atomic commit, untouched files carry byte-identical, contract enforced") {
    val ns = fresh("cat15")
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"
    // 4 range-clustered files of 10 keys; the replaced region is keys 11..20
    SnapshotTable.commitClustered(spark, root,
      (1L to 40L).map(k => (k, k * 1.0)).toDF("k", "v"), Seq("k"), numFiles = 4)
    val v0 = SnapshotTable.currentVersion(spark, root).get
    val v0Entries = SnapshotTable.read(spark, root).inputFiles.toSet

    // the SQL statement shape (Delta's replaceWhere grammar)
    (11L to 15L).map(k => (k, k * 100.0)).toDF("k", "v")
      .createOrReplaceTempView("cat15_batch")
    spark.sql(s"""INSERT INTO graft.$ns.t REPLACE WHERE k BETWEEN 11 AND 20
                  SELECT * FROM cat15_batch""")
    val v1 = SnapshotTable.currentVersion(spark, root).get
    assert(v1 == v0 + 1, "replaceWhere must be ONE commit (delete+insert atomically)")
    val got = sql(s"SELECT * FROM graft.$ns.t").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == 35, "10 replaced rows out, 5 batch rows in")
    assert(got(11L) == 1100.0 && !got.contains(16L) && got(10L) == 10.0 && got(21L) == 21.0)
    // the 3 files outside the region carry by manifest entry, byte-identical
    val after = SnapshotTable.read(spark, root).inputFiles.toSet
    assert((v0Entries & after).size == 3,
      s"3 untouched files must carry: ${(v0Entries & after).size}")
    // ONE CDC delta: removes = the 10 pre-images, adds = the 5 batch rows
    val Some((adds, removes)) = SnapshotTable.changesDelta(spark, root, v0, Some(v1))
    assert(removes.count() == 10 && adds.count() == 5)

    // classic contract: a batch row OUTSIDE the region is refused atomically
    Seq((11L, 1.0), (99L, 9.0)).toDF("k", "v").createOrReplaceTempView("cat15_bad")
    intercept[Exception] {
      spark.sql(s"""INSERT INTO graft.$ns.t REPLACE WHERE k BETWEEN 11 AND 20
                    SELECT * FROM cat15_bad""")
    }
    assert(SnapshotTable.currentVersion(spark, root).contains(v1), "no partial commit")

    // the DataFrameWriterV2 path lands on the same machinery
    (21L to 25L).map(k => (k, k * 1000.0)).toDF("k", "v")
      .writeTo(s"graft.$ns.t").overwrite(col("k").between(21L, 30L))
    assert(sql(s"SELECT count(*) AS n FROM graft.$ns.t").head().getLong(0) == 30L)
    assert(sql(s"SELECT v FROM graft.$ns.t WHERE k = 21").head().getDouble(0) == 21000.0)
  }

  test("IN-subquery DELETE/UPDATE decorrelate onto MERGE; touched files stay pruned; other shapes refused") {
    val ns = fresh("cat14")
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"
    // 4 range-clustered files of 10 keys each; the subquery selects keys
    // 5..8 only, so exactly ONE file may rewrite.
    SnapshotTable.commitClustered(spark, root,
      (1L to 40L).map(k => (k, k * 1.0, if (k % 2 == 0) "even" else "odd"))
        .toDF("k", "v", "par"), Seq("k"), numFiles = 4)
    val v0Files = SnapshotTable.read(spark, root).inputFiles.toSet
    Seq(5L, 6L, 7L, 8L, Long.MinValue).map(k => Tuple1(if (k == Long.MinValue) null
      else java.lang.Long.valueOf(k))).toDF("kk").createOrReplaceTempView("cat14_keys")

    sql(s"""UPDATE graft.$ns.t SET v = v + 100
            WHERE par = 'even' AND k IN (SELECT kk FROM cat14_keys)""")
    val afterUpd = SnapshotTable.read(spark, root)
    assert((afterUpd.inputFiles.toSet & v0Files).size == 3,
      "IN-subquery UPDATE must rewrite only the file holding keys 5..8")
    val got = afterUpd.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(6L) == 106.0 && got(8L) == 108.0, "matched evens updated")
    assert(got(5L) == 5.0 && got(10L) == 10.0, "odd keys / out-of-set keys untouched")

    sql(s"DELETE FROM graft.$ns.t WHERE k IN (SELECT kk FROM cat14_keys)")
    assert(SnapshotTable.read(spark, root).count() == 36)

    // NULL semantics: a NULL subquery value must not null-safe-match a
    // NULL target key (strict SQL IN keeps it).
    val nullTab = s"graft.$ns.nt"
    Seq((java.lang.Long.valueOf(1L), "a"), (null.asInstanceOf[java.lang.Long], "nullk"))
      .toDF("k", "v").createOrReplaceTempView("cat14_null")
    sql(s"CREATE TABLE $nullTab AS SELECT * FROM cat14_null")
    sql(s"DELETE FROM $nullTab WHERE k IN (SELECT kk FROM cat14_keys)")
    assert(sql(s"SELECT count(*) AS n FROM $nullTab").head().getLong(0) == 2,
      "neither the NULL-keyed row nor the unmatched row may delete")

    // refusals that remain: disjunctive placement, non-equi correlation
    intercept[Exception] {
      sql(s"DELETE FROM graft.$ns.t WHERE k = 1 OR k IN (SELECT kk FROM cat14_keys)")
    }
    intercept[Exception] {
      sql(s"""DELETE FROM graft.$ns.t WHERE EXISTS
              (SELECT 1 FROM cat14_keys WHERE kk < k)""")
    }
  }

  test("NOT IN / EXISTS / NOT EXISTS DML: anti-arms, three-valued no-op, correlation digs") {
    val ns = fresh("cat18")
    (1L to 10L).map(k => (k, "live")).toDF("k", "tag").createOrReplaceTempView("cat18_t")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM cat18_t")
    Seq(Some(1L), Some(2L), Some(3L)).toDF("kk").createOrReplaceTempView("cat18_keys")
    Seq(Some(1L), None).toDF("kk").createOrReplaceTempView("cat18_nullkeys")

    // NOT IN with a NULL among the values: UNKNOWN for every row -> no-op
    sql(s"DELETE FROM graft.$ns.t WHERE k NOT IN (SELECT kk FROM cat18_nullkeys)")
    assert(sql(s"SELECT count(*) AS n FROM graft.$ns.t").head().getLong(0) == 10L,
      "a NULL-bearing NOT IN subquery must delete NOTHING (strict SQL)")

    // EXISTS (equi-correlated, with a residual subquery-side filter)
    sql(s"""UPDATE graft.$ns.t SET tag = 'hit'
            WHERE EXISTS (SELECT 1 FROM cat18_keys WHERE kk = k AND kk >= 2)""")
    val tags = sql(s"SELECT k, tag FROM graft.$ns.t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tags(2L) == "hit" && tags(3L) == "hit" && tags(1L) == "live" && tags(4L) == "live")

    // NOT EXISTS deletes the anti side (incl. residual target conjunct)
    sql(s"""DELETE FROM graft.$ns.t
            WHERE k > 5 AND NOT EXISTS (SELECT 1 FROM cat18_keys WHERE kk = k)""")
    assert(sql(s"SELECT k FROM graft.$ns.t").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L, 4L, 5L), "k in 6..10 have no match and satisfy the residual")

    // NOT IN without NULLs: the by-source arm with the IS NOT NULL guard
    sql(s"DELETE FROM graft.$ns.t WHERE k NOT IN (SELECT kk FROM cat18_keys)")
    assert(sql(s"SELECT k FROM graft.$ns.t").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L))

    // NULL target keys: NOT EXISTS deletes them (no row can match),
    // NOT IN keeps them (UNKNOWN)
    Seq((java.lang.Long.valueOf(7L), "a"), (null.asInstanceOf[java.lang.Long], "nullk"))
      .toDF("k", "tag").createOrReplaceTempView("cat18_null")
    sql(s"CREATE TABLE graft.$ns.nt AS SELECT * FROM cat18_null")
    sql(s"DELETE FROM graft.$ns.nt WHERE k NOT IN (SELECT kk FROM cat18_keys)")
    assert(sql(s"SELECT tag FROM graft.$ns.nt").collect().map(_.getString(0)).toSet ==
      Set("nullk"), "NOT IN: non-member deletes, NULL key survives (UNKNOWN)")
    sql(s"""DELETE FROM graft.$ns.nt
            WHERE NOT EXISTS (SELECT 1 FROM cat18_keys WHERE kk = k)""")
    assert(sql(s"SELECT count(*) AS n FROM graft.$ns.nt").head().getLong(0) == 0L,
      "NOT EXISTS: a NULL key matches nothing, so it deletes")
  }

  test("SQL MERGE accepts MULTIPLE conditional arms per family, any order, first-match-wins") {
    val ns = fresh("cat21")
    (1L to 8L).map(k => (k, k * 10.0, "old")).toDF("k", "price", "st")
      .createOrReplaceTempView("cat21_tgt")
    (1L to 10L).map(k => (k, k * 1.0, if (k % 2 == 0) "F" else "O"))
      .toDF("k", "price", "st").createOrReplaceTempView("cat21_src")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM cat21_tgt")
    // UPDATE listed BEFORE DELETE (pre-r12 this order was refused), three
    // matched arms, two insert arms.
    sql(s"""MERGE INTO graft.$ns.t t USING cat21_src s ON t.k = s.k
            WHEN MATCHED AND s.k <= 2 THEN UPDATE SET st = 'tiny'
            WHEN MATCHED AND s.st = 'F' THEN DELETE
            WHEN MATCHED AND s.k <= 6 THEN UPDATE SET *
            WHEN NOT MATCHED AND s.k = 9 THEN INSERT (k, st) VALUES (s.k, 'nine')
            WHEN NOT MATCHED THEN INSERT *""")
    val got = sql(s"SELECT * FROM graft.$ns.t").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), r.getString(2)))).toMap
    assert(got(1L) == ((Some(10.0), "tiny")) && got(2L) == ((Some(20.0), "tiny")),
      "first arm wins even where the DELETE arm would also match k=2")
    assert(!got.contains(4L) && !got.contains(6L) && !got.contains(8L),
      "matched evens past the first arm carry st='F' and delete")
    assert(got(3L) == ((Some(3.0), "O")) && got(5L) == ((Some(5.0), "O")), "SET * arm")
    assert(got(7L) == ((Some(70.0), "old")),
      "a matched row with no firing arm keeps")
    assert(got(9L) == ((None, "nine")) && got(10L) == ((Some(10.0), "F")),
      "insert arms: explicit-column then star fallthrough")
  }

  test("SQL MERGE WITH SCHEMA EVOLUTION widens the table from the source") {
    val ns = fresh("cat19")
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "price").createOrReplaceTempView("cat19_tgt")
    Seq((2L, 22.0, "eu"), (3L, 33.0, "us")).toDF("k", "price", "region")
      .createOrReplaceTempView("cat19_src")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM cat19_tgt")
    sql(s"""MERGE WITH SCHEMA EVOLUTION INTO graft.$ns.t t
            USING cat19_src s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""")
    val got = sql(s"SELECT * FROM graft.$ns.t").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), Option(r.getString(2))))).toMap
    assert(sql(s"SELECT * FROM graft.$ns.t").columns.toSeq == Seq("k", "price", "region"))
    assert(got(1L) == ((10.0, None)) && got(2L) == ((22.0, Some("eu"))) &&
      got(3L) == ((33.0, Some("us"))))
  }

  test("partial MERGE assignment lists are PER-COLUMN updates, never silently SET * (ADVICE r11)") {
    val ns = fresh("cat12")
    Seq((1L, 100.0, "keep-me"), (2L, 200.0, "also-keep")).toDF("k", "price", "st")
      .createOrReplaceTempView("cat12_tgt")
    Seq((1L, 111.0, "CLOBBER"), (3L, 333.0, "CLOBBER")).toDF("k", "price", "st")
      .createOrReplaceTempView("cat12_src")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM cat12_tgt")
    // GraftTable has no SupportsRowLevelOperations, so Spark does NOT
    // align this partial list to the full column set — pre-fix it lowered
    // to UPDATE SET * / INSERT * and clobbered st.
    sql(s"""MERGE INTO graft.$ns.t t USING cat12_src s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET price = s.price
            WHEN NOT MATCHED THEN INSERT (k, price) VALUES (s.k, s.price)""")
    val got = sql(s"SELECT * FROM graft.$ns.t").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), Option(r.getString(2))))).toMap
    assert(got(1L) == ((111.0, Some("keep-me"))),
      s"unassigned target column must KEEP its value: ${got(1L)}")
    assert(got(2L) == ((200.0, Some("also-keep"))))
    assert(got(3L) == ((333.0, None)), "unlisted INSERT column must be NULL, not source value")
  }

  test("WHEN NOT MATCHED BY SOURCE expires vanished rows (SQL surface)") {
    val ns = fresh("cat13")
    (1L to 20L).map(k => (k, k * 1.0, "live")).toDF("k", "v", "status")
      .createOrReplaceTempView("cat13_tgt")
    (1L to 10L).map(k => (k, k * 2.0, "live")).toDF("k", "v", "status")
      .createOrReplaceTempView("cat13_src")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM cat13_tgt")
    sql(s"""MERGE INTO graft.$ns.t t USING cat13_src s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED BY SOURCE AND t.k > 15 THEN DELETE
            WHEN NOT MATCHED BY SOURCE THEN UPDATE SET status = 'expired'""")
    val got = sql(s"SELECT * FROM graft.$ns.t").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    assert(got.size == 15, "k in 16..20 deleted by the BY SOURCE arm")
    assert((1L to 10L).forall(k => got(k) == ((k * 2.0, "live"))), "matched rows updated")
    assert((11L to 15L).forall(k => got(k) == ((k * 1.0, "expired"))),
      "unmatched survivors carry the BY SOURCE update")
  }

  test("property: SQL MERGE ≡ DataFrame MergeInto over randomized clause combinations") {
    // Deterministic seed: 12 random (delete?, update?, insert?, condition)
    // combinations, each executed BOTH as a Spark-parsed MERGE string and
    // as the MergeInto combinator on identical frames — results must be
    // row-identical. This is the SQL front door's clause-algebra contract,
    // fuzzed rather than single-cased.
    val rnd = new scala.util.Random(41)
    val ns = fresh("cat8")
    val tgt = (1L to 300L).map(k => (k, k * 1.5, if (k % 3 == 0) "F" else "O"))
      .toDF("k", "price", "st")
    for (i <- 0 until 16) {
      val hasDel = rnd.nextBoolean()
      val hasUpd = rnd.nextBoolean()
      val hasIns = rnd.nextBoolean()
      // round-12 dimensions: per-column SET instead of SET *, and the BY
      // SOURCE family (delete and/or update over target-only rows).
      val perColUpd = hasUpd && rnd.nextBoolean()
      val hasBysDel = rnd.nextBoolean()
      val hasBysUpd = rnd.nextBoolean()
      if (hasDel || hasUpd || hasIns || hasBysDel || hasBysUpd) {
        // SQL: only the LAST matched clause may omit its condition, so a
        // DELETE listed before an UPDATE must carry one.
        val delCond = if ((hasDel && hasUpd) || rnd.nextBoolean())
          Some(s"s.st = 'F'") else None
        val updCond = if (rnd.nextBoolean()) Some(s"s.price > ${50 + rnd.nextInt(200)}") else None
        val insCond = if (rnd.nextBoolean()) Some(s"s.price < ${200 + rnd.nextInt(300)}") else None
        val bysDelCond = if ((hasBysDel && hasBysUpd) || rnd.nextBoolean())
          Some(s"t.price > ${100 + rnd.nextInt(200)}") else None
        val bysUpdCond = if (rnd.nextBoolean()) Some(s"t.st = 'O'") else None
        val lo = rnd.nextInt(3) + 2
        val src = (1L to 400L).filter(_ % lo == 0)
          .map(k => (k, k * 2.5, if (k % 4 == 0) "F" else "N"))
          .toDF("k", "price", "st")
        src.createOrReplaceTempView("cat8_src")
        tgt.createOrReplaceTempView("cat8_tgt")
        sql(s"CREATE OR REPLACE TABLE graft.$ns.t AS SELECT * FROM cat8_tgt")
        val updateSql = if (perColUpd)
          "UPDATE SET price = s.price + t.price" else "UPDATE SET *"
        val clauses = Seq(
          if (hasDel) Some("WHEN MATCHED" + delCond.map(c => s" AND $c").getOrElse("") +
            " THEN DELETE") else None,
          if (hasUpd) Some("WHEN MATCHED" + updCond.map(c => s" AND $c").getOrElse("") +
            s" THEN $updateSql") else None,
          if (hasIns) Some("WHEN NOT MATCHED" + insCond.map(c => s" AND $c").getOrElse("") +
            " THEN INSERT *") else None,
          if (hasBysDel) Some("WHEN NOT MATCHED BY SOURCE" +
            bysDelCond.map(c => s" AND $c").getOrElse("") + " THEN DELETE") else None,
          if (hasBysUpd) Some("WHEN NOT MATCHED BY SOURCE" +
            bysUpdCond.map(c => s" AND $c").getOrElse("") +
            " THEN UPDATE SET st = 'X'") else None).flatten.mkString("\n")
        sql(s"MERGE INTO graft.$ns.t t USING cat8_src s ON t.k = s.k\n$clauses")
        val got = sql(s"SELECT * FROM graft.$ns.t").collect().map(_.toString).sorted
        var mi = graft.ops.MergeInto.into(tgt).using(src).on("k")
        if (hasDel) mi = mi.whenMatchedDelete(
          delCond.map(expr).getOrElse(org.apache.spark.sql.functions.lit(true)))
        if (hasUpd && perColUpd) mi = mi.whenMatchedUpdate(
          Map("price" -> (col("s.price") + col("t.price"))), updCond.map(expr))
        else if (hasUpd) mi = mi.whenMatchedUpdateAll(updCond.map(expr))
        if (hasIns) mi = mi.whenNotMatchedInsertAll(insCond.map(expr))
        if (hasBysDel) mi = mi.whenNotMatchedBySourceDelete(bysDelCond.map(expr))
        if (hasBysUpd) mi = mi.whenNotMatchedBySourceUpdate(
          Map("st" -> org.apache.spark.sql.functions.lit("X")), bysUpdCond.map(expr))
        val want = mi.result().collect().map(_.toString).sorted
        assert(got.toSeq == want.toSeq,
          s"case $i (del=$hasDel/$delCond upd=$hasUpd/perCol=$perColUpd/$updCond " +
            s"ins=$hasIns/$insCond bysDel=$hasBysDel/$bysDelCond " +
            s"bysUpd=$hasBysUpd/$bysUpdCond): ${got.length} vs ${want.length} rows")
      }
    }
  }

  test("bloom config via SET TBLPROPERTIES; SHOW TBLPROPERTIES round-trips it") {
    val ns = fresh("cat9")
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"
    (1L to 2000L).map(k => (k, s"u$k")).toDF("k", "name")
      .createOrReplaceTempView("cat9_seed")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM cat9_seed")
    sql(s"ALTER TABLE graft.$ns.t SET TBLPROPERTIES ('graft.bloom.columns' = 'k')")
    assert(SnapshotTable.bloomColumns(spark, root) == Seq("k"))
    val props = sql(s"SHOW TBLPROPERTIES graft.$ns.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.bloom.columns").contains("k"))
    // the config is live: the next append builds per-file blooms
    sql(s"INSERT INTO graft.$ns.t SELECT /*+ REPARTITION(6) */ id + 5000 AS k, " +
      s"CAST(id AS STRING) AS name FROM range(600)")
    val snapDirs = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("snap-"))
    assert(snapDirs.flatMap(_.listFiles()).exists(_.getName.startsWith("_bloom-")),
      "the post-config append must carry bloom side-cars")
  }

  test("ALTER TABLE ADD COLUMNS is metadata-only; drop -> SQL re-add takes a fresh physical") {
    val ns = fresh("cat10")
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "price").createOrReplaceTempView("cat10_seed")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM cat10_seed")
    val filesBefore = SnapshotTable.read(spark, root).inputFiles.toSet

    sql(s"ALTER TABLE graft.$ns.t ADD COLUMNS (note STRING)")
    val cur = SnapshotTable.read(spark, root)
    assert(cur.columns.toSeq == Seq("k", "price", "note"))
    assert(cur.inputFiles.toSet == filesBefore, "ADD COLUMNS must move zero files")
    assert(cur.filter(col("note").isNull).count() == 2, "pre-add rows read NULL")
    sql(s"INSERT INTO graft.$ns.t SELECT 3L, 30.0, 'hello'")
    assert(sql(s"SELECT note FROM graft.$ns.t WHERE k = 3").head().getString(0) == "hello")
    // duplicate add refused loudly
    intercept[Exception] { sql(s"ALTER TABLE graft.$ns.t ADD COLUMNS (NOTE DOUBLE)") }

    // the orphan-resurface drill, all-SQL: drop 'price' (bytes stay in the
    // untouched files), re-add it via ADD COLUMNS -> fresh physical id, so
    // every retained row reads NULL instead of the orphaned values.
    sql(s"ALTER TABLE graft.$ns.t DROP COLUMN price")
    sql(s"ALTER TABLE graft.$ns.t ADD COLUMNS (price DOUBLE)")
    assert(SnapshotTable.columnMapping(spark, root).get("price").exists(_ != "price"))
    assert(sql(s"SELECT count(price) AS n FROM graft.$ns.t").head().getLong(0) == 0L,
      "orphaned bytes must not resurface through the SQL re-add")
  }

  test("DROP TABLE is recoverable: tombstoned, UNDROP restores history, purge reclaims") {
    val ns = fresh("cat16")
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").createOrReplaceTempView("cat16_seed")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM cat16_seed")
    sql(s"INSERT INTO graft.$ns.t VALUES (3L, 3.0)") // v1 — history to preserve

    sql(s"DROP TABLE graft.$ns.t")
    assert(!spark.catalog.tableExists(s"graft.$ns.t"))
    assert(sql(s"SHOW TABLES IN graft.$ns").count() == 0, "dropped table must leave listings")
    assert(SnapshotTable.currentVersion(spark, root).isEmpty)

    sql(s"UNDROP TABLE graft.$ns.t")
    assert(sql(s"SELECT count(*) AS n FROM graft.$ns.t").head().getLong(0) == 3L)
    // full manifest history survived the round trip
    val hist = sql(s"DESCRIBE HISTORY graft.$ns.t").collect()
    assert(hist.length == 2 && hist.map(_.getString(1)).contains("append"),
      s"history must survive drop+undrop: ${hist.toSeq}")

    // drop again; a NEW table under the name blocks undrop until renamed
    sql(s"DROP TABLE graft.$ns.t")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM cat16_seed")
    intercept[Exception] { sql(s"UNDROP TABLE graft.$ns.t") }
    sql(s"DROP TABLE graft.$ns.t") // second tombstone (newer)
    sql(s"UNDROP TABLE graft.$ns.t")
    assert(sql(s"SELECT count(*) AS n FROM graft.$ns.t").head().getLong(0) == 2L,
      "UNDROP restores the NEWEST tombstone")

    // GC: age-bounded purge keeps young tombstones; FORCE reclaims all
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    assert(cat.purgeDropped(Array(ns), maxAgeMs = 3600 * 1000L) == 0,
      "young tombstones survive an age-bounded purge")
    assert(cat.purgeDropped(Array(ns), maxAgeMs = 0L, force = true) == 1)
    sql(s"DROP TABLE graft.$ns.t")
    intercept[Exception] { // nothing left to restore after a forced purge
      cat.purgeDropped(Array(ns), 0L, force = true)
      sql(s"UNDROP TABLE graft.$ns.t")
    }
  }

  test("CTAS CLUSTER BY range-clusters v0 (key predicates file-skip); PARTITIONED BY refused") {
    val ns = fresh("cat20")
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"
    spark.range(4000).selectExpr("id AS k", "id * 2.0 AS v")
      .createOrReplaceTempView("cat20_seed")
    sql(s"CREATE TABLE graft.$ns.t CLUSTER BY (k) AS SELECT /*+ REPARTITION(8) */ * FROM cat20_seed")
    val q = sql(s"SELECT sum(k) AS s FROM graft.$ns.t WHERE k BETWEEN 10 AND 20")
    assert(q.head().getLong(0) == (10L to 20L).sum)
    val idx = q.queryExecution.optimizedPlan.collect {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
        org.apache.spark.sql.execution.datasources.HadoopFsRelation(
          i: SnapshotFileIndex, _, _, _, _, _), _, _, _, _) => i
    }
    assert(idx.nonEmpty && idx.head.lastSelected > 0 &&
      idx.head.lastSelected < idx.head.totalFiles,
      s"CLUSTER BY must enable file skipping: ${idx.map(i => s"${i.lastSelected}/${i.totalFiles}")}")
    intercept[Exception] {
      sql(s"CREATE TABLE graft.$ns.p PARTITIONED BY (k) AS SELECT * FROM cat20_seed")
    }
  }

  test("plain CREATE TABLE (explicit schema) bootstraps a files-less v0") {
    val ns = fresh("cat17")
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"
    sql(s"CREATE TABLE graft.$ns.t (k BIGINT, name STRING, v DOUBLE)")
    assert(sql(s"SELECT * FROM graft.$ns.t").columns.toSeq == Seq("k", "name", "v"))
    assert(sql(s"SELECT count(*) AS n FROM graft.$ns.t").head().getLong(0) == 0L)
    assert(SnapshotTable.currentVersion(spark, root).contains(0L))
    sql(s"INSERT INTO graft.$ns.t VALUES (1L, 'a', 1.5)")
    assert(sql(s"SELECT name FROM graft.$ns.t WHERE k = 1").head().getString(0) == "a")
    intercept[Exception] { sql(s"CREATE TABLE graft.$ns.t (k BIGINT)") }
    sql(s"CREATE TABLE IF NOT EXISTS graft.$ns.t (k BIGINT)") // no-op, no error
    assert(sql(s"SELECT count(*) AS n FROM graft.$ns.t").head().getLong(0) == 1L)
  }

  test("CREATE OR REPLACE TABLE AS SELECT commits a new version; history survives") {
    val ns = fresh("cat6")
    Seq((1L, 1.0)).toDF("k", "v").createOrReplaceTempView("cat6_a")
    Seq((2L, 2.0), (3L, 3.0)).toDF("k", "v").createOrReplaceTempView("cat6_b")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM cat6_a")
    sql(s"CREATE OR REPLACE TABLE graft.$ns.t AS SELECT * FROM cat6_b")
    assert(sql(s"SELECT count(*) AS n FROM graft.$ns.t").head().getLong(0) == 2L)
    val root = s"${GraftSql.defaultWarehouse}/$ns/t"
    assert(SnapshotTable.currentVersion(spark, root).contains(1L))
    // the replaced state is still time-travelable until vacuum
    assert(sql(s"SELECT count(*) AS n FROM graft.$ns.t VERSION AS OF 0")
      .head().getLong(0) == 1L)
  }
}
