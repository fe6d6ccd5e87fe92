package graft.sql

import graft.SparkSpec

/** Column DEFAULT values (round 13, VERDICT r12 #4): declared in CREATE
  * TABLE / ADD COLUMN, filled by the analyzer for INSERTs that omit the
  * column, and — the evolution interaction — files written BEFORE a
  * defaulted column existed read the DEFAULT, not NULL (Spark's
  * existence-defaults machinery keys off the declared schema's field
  * metadata, which this format persists in its manifests). */
class DefaultsSpec extends SparkSpec {

  private def cat(): GraftCatalog = {
    GraftSql.ensureCatalog(spark)
    spark.sessionState.catalogManager.catalog("graft") match {
      case g: GraftCatalog => g
      case other => fail(s"graft catalog is $other")
    }
  }

  test("CREATE TABLE ... DEFAULT: omitted columns fill; explicit values win") {
    val s = spark
    cat()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.dflt")
    s.sql("DROP TABLE IF EXISTS graft.dflt.t1")
    s.sql("""CREATE TABLE graft.dflt.t1 (
               k BIGINT, status STRING DEFAULT 'new', retries INT DEFAULT 0)""")
    s.sql("INSERT INTO graft.dflt.t1 (k) VALUES (1), (2)")
    s.sql("INSERT INTO graft.dflt.t1 VALUES (3, 'done', 4)")
    s.sql("INSERT INTO graft.dflt.t1 (k, status) VALUES (5, DEFAULT)")
    val got = s.sql("SELECT k, status, retries FROM graft.dflt.t1 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, "new", 0), (2L, "new", 0), (3L, "done", 4),
      (5L, "new", 0)))
    s.sql("DROP TABLE graft.dflt.t1")
    cat().purgeDropped(Array("dflt"), 0L, force = true)
  }

  test("ADD COLUMN ... DEFAULT: pre-existing files read the default, not NULL") {
    val s = spark
    cat()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.dflt")
    s.sql("DROP TABLE IF EXISTS graft.dflt.t2")
    s.sql("CREATE TABLE graft.dflt.t2 AS SELECT id AS k FROM range(5)")
    s.sql("ALTER TABLE graft.dflt.t2 ADD COLUMN tier STRING DEFAULT 'bronze'")
    // Rows written BEFORE the column existed: EXISTS_DEFAULT, never NULL.
    val pre = s.sql("SELECT DISTINCT tier FROM graft.dflt.t2").collect()
    assert(pre.map(_.getString(0)).toSeq == Seq("bronze"), pre.toSeq)
    // New INSERT omitting it: CURRENT_DEFAULT. Explicit NULL stays NULL.
    s.sql("INSERT INTO graft.dflt.t2 (k) VALUES (100)")
    s.sql("INSERT INTO graft.dflt.t2 VALUES (101, NULL)")
    val got = s.sql("""SELECT k, tier FROM graft.dflt.t2
                       WHERE k >= 100 ORDER BY k""").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(got == Seq((100L, Some("bronze")), (101L, None)), got)
    // And the aggregate over the mixed files is exact.
    assert(s.sql("SELECT count(*) FROM graft.dflt.t2 WHERE tier = 'bronze'")
      .head().getLong(0) == 6L)
    s.sql("DROP TABLE graft.dflt.t2")
    cat().purgeDropped(Array("dflt"), 0L, force = true)
  }

  test("SHOW CREATE TABLE emits DEFAULT clauses; the script round-trips them") {
    val s = spark
    cat()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.dflt")
    s.sql("DROP TABLE IF EXISTS graft.dflt.t3")
    s.sql("DROP TABLE IF EXISTS graft.dflt.t3b")
    s.sql("CREATE TABLE graft.dflt.t3 (k BIGINT, s STRING DEFAULT 'x')")
    val script = s.sql("SHOW CREATE TABLE graft.dflt.t3")
      .collect().map(_.getString(0)).toSeq
    assert(script.head.contains("DEFAULT 'x'"), script.head)
    script.filterNot(_.startsWith("--"))
      .map(_.replace("`graft`.`dflt`.`t3`", "graft.dflt.t3b")).foreach(s.sql(_))
    s.sql("INSERT INTO graft.dflt.t3b (k) VALUES (9)")
    assert(s.sql("SELECT s FROM graft.dflt.t3b").head().getString(0) == "x")
    s.sql("DROP TABLE graft.dflt.t3"); s.sql("DROP TABLE graft.dflt.t3b")
    cat().purgeDropped(Array("dflt"), 0L, force = true)
  }
  test("GENERATED ALWAYS AS IDENTITY: generation, HWM monotonicity, refusal") {
    val s = spark
    cat()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.dflt")
    s.sql("DROP TABLE IF EXISTS graft.dflt.ids")
    s.sql("""CREATE TABLE graft.dflt.ids (
               id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2),
               v STRING)""")
    s.sql("INSERT INTO graft.dflt.ids (v) VALUES ('a'), ('b'), ('c')")
    val first = s.sql("SELECT id FROM graft.dflt.ids").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(first.length == 3 && first.distinct.length == 3, first)
    assert(first.forall(i => i >= 10 && (i - 10) % 2 == 0),
      s"ids respect START/INCREMENT: $first")
    // Second batch strictly above the first (manifest HWM, not session).
    s.sql("INSERT INTO graft.dflt.ids (v) VALUES ('d'), ('e')")
    val second = s.sql("SELECT id FROM graft.dflt.ids WHERE v IN ('d','e')")
      .collect().map(_.getLong(0)).toSeq
    assert(second.forall(_ > first.max),
      s"new ids ${second.mkString(",")} must exceed prior max ${first.max}")
    assert(s.sql("SELECT count(DISTINCT id) FROM graft.dflt.ids")
      .head().getLong(0) == 5L)
    // GENERATED ALWAYS refuses explicit values.
    val e = intercept[Exception] {
      s.sql("INSERT INTO graft.dflt.ids VALUES (99, 'x')")
    }
    assert(e.getMessage.toLowerCase.contains("identity"), e.getMessage)
    // SHOW CREATE TABLE round-trips the declaration.
    val script = s.sql("SHOW CREATE TABLE graft.dflt.ids")
      .collect().map(_.getString(0)).toSeq
    assert(script.head.contains(
      "GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2)"), script.head)
    s.sql("DROP TABLE graft.dflt.ids")
    cat().purgeDropped(Array("dflt"), 0L, force = true)
  }

  test("GENERATED BY DEFAULT AS IDENTITY admits explicit values; HWM tracks them") {
    val s = spark
    cat()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.dflt")
    s.sql("DROP TABLE IF EXISTS graft.dflt.ids2")
    s.sql("""CREATE TABLE graft.dflt.ids2 (
               id BIGINT GENERATED BY DEFAULT AS IDENTITY,
               v STRING)""")
    s.sql("INSERT INTO graft.dflt.ids2 VALUES (1000, 'explicit')")
    s.sql("INSERT INTO graft.dflt.ids2 (v) VALUES ('generated')")
    val rows = s.sql("SELECT id, v FROM graft.dflt.ids2").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap.map(_.swap)
    assert(rows("explicit") == 1000L)
    assert(rows("generated") > 1000L,
      s"generation must start above the explicit landing: $rows")
    s.sql("DROP TABLE graft.dflt.ids2")
    cat().purgeDropped(Array("dflt"), 0L, force = true)
  }

  test("identity × MERGE: ALWAYS refuses INSERT arms; BY DEFAULT demands values (r14)") {
    val s = spark
    cat()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.dflt")
    s.sql("DROP TABLE IF EXISTS graft.dflt.mids")
    s.sql("""CREATE TABLE graft.dflt.mids (
               id BIGINT GENERATED ALWAYS AS IDENTITY, k BIGINT, v STRING)""")
    s.sql("INSERT INTO graft.dflt.mids (k, v) VALUES (1, 'a')")
    // A MERGE INSERT arm cannot generate — refused loudly, never NULL.
    val e1 = intercept[Exception] {
      s.sql("""MERGE INTO graft.dflt.mids t
               USING (SELECT 2L AS k, 'b' AS v) s ON t.k = s.k
               WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    }
    assert(e1.getMessage.contains("GENERATED ALWAYS"), e1.getMessage)
    // Insert-free MERGE arms still work on an identity table.
    s.sql("""MERGE INTO graft.dflt.mids t
             USING (SELECT 1L AS k, 'upd' AS v) s ON t.k = s.k
             WHEN MATCHED THEN UPDATE SET v = s.v""")
    assert(s.sql("SELECT v FROM graft.dflt.mids WHERE k = 1")
      .head().getString(0) == "upd")
    s.sql("DROP TABLE graft.dflt.mids")

    s.sql("DROP TABLE IF EXISTS graft.dflt.mids2")
    s.sql("""CREATE TABLE graft.dflt.mids2 (
               id BIGINT GENERATED BY DEFAULT AS IDENTITY, k BIGINT, v STRING)""")
    s.sql("INSERT INTO graft.dflt.mids2 VALUES (100, 1, 'a')")
    // BY DEFAULT: an arm that omits the identity column is refused
    // (generation lives only on the append path; NULL is unacceptable).
    val e2 = intercept[Exception] {
      s.sql("""MERGE INTO graft.dflt.mids2 t
               USING (SELECT 2L AS k, 'b' AS v) s ON t.k = s.k
               WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    }
    assert(e2.getMessage.contains("must assign identity"), e2.getMessage)
    // An arm that assigns it explicitly lands, and the HWM tracks it.
    s.sql("""MERGE INTO graft.dflt.mids2 t
             USING (SELECT 500L AS id, 2L AS k, 'b' AS v) s ON t.k = s.k
             WHEN NOT MATCHED THEN INSERT (id, k, v) VALUES (s.id, s.k, s.v)""")
    assert(s.sql("SELECT id FROM graft.dflt.mids2 WHERE k = 2")
      .head().getLong(0) == 500L)
    s.sql("INSERT INTO graft.dflt.mids2 (k, v) VALUES (3, 'c')")
    val gen = s.sql("SELECT id FROM graft.dflt.mids2 WHERE k = 3")
      .head().getLong(0)
    assert(gen > 500L, s"generation must clear the MERGE-landed value: $gen")
    s.sql("DROP TABLE graft.dflt.mids2")
    cat().purgeDropped(Array("dflt"), 0L, force = true)
  }

  test("identity on a non-BIGINT column is refused at declaration (ADVICE r13)") {
    val s = spark
    cat()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.dflt")
    s.sql("DROP TABLE IF EXISTS graft.dflt.badid")
    // Generation offsets exceed 2^33 from partition 1 on; an INT identity
    // would wrap to duplicates (or throw under ANSI) after the cast.
    val e = intercept[Exception] {
      s.sql("""CREATE TABLE graft.dflt.badid (
                 id INT GENERATED ALWAYS AS IDENTITY, v STRING)""")
    }
    assert(e.getMessage.contains("BIGINT"), e.getMessage)
    assert(!cat().tableExists(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("dflt"), "badid")), "refused table must not exist")
  }
}
