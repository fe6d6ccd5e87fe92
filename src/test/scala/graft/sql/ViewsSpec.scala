package graft.sql

import graft.SparkSpec

/** Persistent views (round 14, VERDICT r13 #6): `CREATE [OR REPLACE] VIEW
  * graft.ns.v AS SELECT ...` stores the query text in the catalog's
  * `_views/` side-car; reads late-bind through GraftSqlRule's
  * substitution. Pins: late binding over DML'd tables, REPLACE, DROP,
  * views over views, view over a clone, SHOW CREATE round-trip,
  * name-collision refusal both ways, self-reference refusal, and the
  * non-graft fallback to Spark's native CREATE VIEW. */
class ViewsSpec extends SparkSpec {

  private def cat(): GraftCatalog = {
    GraftSql.ensureCatalog(spark)
    spark.sessionState.catalogManager.catalog("graft") match {
      case g: GraftCatalog => g
      case other => fail(s"graft catalog is $other")
    }
  }

  test("CREATE VIEW: late-binding over a DML'd table; REPLACE; DROP") {
    val s = spark
    cat()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.vw")
    s.sql("DROP VIEW IF EXISTS graft.vw.big")
    s.sql("DROP TABLE IF EXISTS graft.vw.t")
    s.sql("CREATE TABLE graft.vw.t AS SELECT id AS k, id % 3 AS g FROM range(30)")
    s.sql("CREATE VIEW graft.vw.big AS " +
      "SELECT g, count(*) AS cnt FROM graft.vw.t WHERE k >= 10 GROUP BY g")
    val r1 = s.sql("SELECT sum(cnt) FROM graft.vw.big").head().getLong(0)
    assert(r1 == 20L)
    // Late binding: DML on the base table is visible on the next read.
    s.sql("DELETE FROM graft.vw.t WHERE k >= 20")
    val r2 = s.sql("SELECT sum(cnt) FROM graft.vw.big").head().getLong(0)
    assert(r2 == 10L, "view must re-read the table's current state")
    // REPLACE swaps the definition in place.
    s.sql("CREATE OR REPLACE VIEW graft.vw.big AS " +
      "SELECT g, sum(k) AS cnt FROM graft.vw.t GROUP BY g")
    val r3 = s.sql("SELECT sum(cnt) FROM graft.vw.big").head().getLong(0)
    assert(r3 == (0L until 20L).sum)
    // Views join like relations, qualify like names.
    val j = s.sql("""SELECT b.g FROM graft.vw.big b
                     JOIN graft.vw.t t ON b.g = t.g WHERE t.k = 0""")
    assert(j.count() == 1L)
    s.sql("DROP VIEW graft.vw.big")
    intercept[Exception] { s.sql("SELECT * FROM graft.vw.big").collect() }
    // IF EXISTS is a no-op; bare drop of a missing view is loud.
    s.sql("DROP VIEW IF EXISTS graft.vw.big")
    val e = intercept[Exception] { s.sql("DROP VIEW graft.vw.big") }
    assert(e.getMessage.contains("view not found"), e.getMessage)
    s.sql("DROP TABLE graft.vw.t")
    cat().purgeDropped(Array("vw"), 0L, force = true)
  }

  test("views over views; SHOW CREATE TABLE round-trips the definition") {
    val s = spark
    cat()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.vw")
    s.sql("DROP VIEW IF EXISTS graft.vw.v2")
    s.sql("DROP VIEW IF EXISTS graft.vw.v1")
    s.sql("DROP TABLE IF EXISTS graft.vw.base")
    s.sql("CREATE TABLE graft.vw.base AS SELECT id AS k FROM range(10)")
    s.sql("CREATE VIEW graft.vw.v1 AS SELECT k * 2 AS d FROM graft.vw.base")
    s.sql("CREATE VIEW graft.vw.v2 AS SELECT sum(d) AS s FROM graft.vw.v1")
    assert(s.sql("SELECT s FROM graft.vw.v2").head().getLong(0) == 90L)
    val script = s.sql("SHOW CREATE TABLE graft.vw.v1")
      .collect().map(_.getString(0)).toSeq
    assert(script.head.startsWith("CREATE VIEW `graft`.`vw`.`v1` AS"),
      script.head)
    assert(script.head.contains("SELECT k * 2 AS d"), script.head)
    // Round-trip: executing the script under a new name reproduces it.
    s.sql(script.head.replace("`graft`.`vw`.`v1`", "graft.vw.v1b"))
    assert(s.sql("SELECT sum(d) FROM graft.vw.v1b").head().getLong(0) == 90L)
    s.sql("DROP VIEW graft.vw.v2"); s.sql("DROP VIEW graft.vw.v1")
    s.sql("DROP VIEW graft.vw.v1b")
    s.sql("DROP TABLE graft.vw.base")
    cat().purgeDropped(Array("vw"), 0L, force = true)
  }

  test("SHOW VIEWS IN graft.ns enumerates the side-car definitions") {
    val s = spark
    cat()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.vw")
    s.sql("DROP VIEW IF EXISTS graft.vw.sv1")
    s.sql("DROP VIEW IF EXISTS graft.vw.sv2")
    s.sql("CREATE VIEW graft.vw.sv1 AS SELECT 1 AS one")
    s.sql("CREATE VIEW graft.vw.sv2 AS SELECT 2 AS two")
    val names = s.sql("SHOW VIEWS IN graft.vw")
      .collect().map(_.getString(1)).toSet
    assert(Set("sv1", "sv2").subsetOf(names), names)
    s.sql("DROP VIEW graft.vw.sv1")
    val names2 = s.sql("SHOW VIEWS IN graft.vw")
      .collect().map(_.getString(1)).toSet
    assert(!names2.contains("sv1") && names2.contains("sv2"), names2)
    s.sql("DROP VIEW graft.vw.sv2")
  }

  test("view over a SHALLOW CLONE reads the clone's pinned lineage") {
    val s = spark
    cat()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.vw")
    s.sql("DROP VIEW IF EXISTS graft.vw.cv")
    s.sql("DROP TABLE IF EXISTS graft.vw.cl")
    s.sql("DROP TABLE IF EXISTS graft.vw.src")
    s.sql("CREATE TABLE graft.vw.src AS SELECT id AS k FROM range(10)")
    s.sql("CREATE TABLE graft.vw.cl SHALLOW CLONE graft.vw.src")
    s.sql("CREATE VIEW graft.vw.cv AS SELECT count(*) AS c FROM graft.vw.cl")
    // Source divergence is invisible through the clone-backed view.
    s.sql("INSERT INTO graft.vw.src SELECT id FROM range(100, 105)")
    assert(s.sql("SELECT c FROM graft.vw.cv").head().getLong(0) == 10L)
    // Clone divergence IS visible (late binding).
    s.sql("DELETE FROM graft.vw.cl WHERE k < 5")
    assert(s.sql("SELECT c FROM graft.vw.cv").head().getLong(0) == 5L)
    s.sql("DROP VIEW graft.vw.cv")
    s.sql("DETACH CLONE graft.vw.cl FORCE")
    s.sql("DROP TABLE graft.vw.cl"); s.sql("DROP TABLE graft.vw.src")
    cat().purgeDropped(Array("vw"), 0L, force = true)
  }

  test("collisions and self-reference are refused; non-graft falls through") {
    val s = spark
    cat()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.vw")
    s.sql("DROP VIEW IF EXISTS graft.vw.x")
    s.sql("DROP VIEW IF EXISTS graft.vw.broken")
    s.sql("DROP TABLE IF EXISTS graft.vw.x")
    s.sql("DROP TABLE IF EXISTS graft.vw.tb")
    s.sql("CREATE TABLE graft.vw.tb AS SELECT id AS k FROM range(3)")
    // View name taken by a table → refused.
    val e1 = intercept[Exception] {
      s.sql("CREATE VIEW graft.vw.tb AS SELECT 1 AS one")
    }
    assert(e1.getMessage.contains("a table with that name exists"), e1.getMessage)
    // Table name taken by a view → refused.
    s.sql("CREATE VIEW graft.vw.x AS SELECT k FROM graft.vw.tb")
    val e2 = intercept[Exception] {
      s.sql("CREATE TABLE graft.vw.x AS SELECT id FROM range(2)")
    }
    assert(e2.getMessage.contains("a view with that name exists"), e2.getMessage)
    // Duplicate CREATE VIEW without OR REPLACE → refused.
    val e3 = intercept[Exception] {
      s.sql("CREATE VIEW graft.vw.x AS SELECT 1 AS one")
    }
    assert(e3.getMessage.contains("already exists"), e3.getMessage)
    // Direct self-reference → refused at CREATE.
    val e4 = intercept[Exception] {
      s.sql("CREATE OR REPLACE VIEW graft.vw.x AS " +
        "SELECT k FROM graft.vw.x WHERE k > 0")
    }
    assert(e4.getMessage.contains("recursive view"), e4.getMessage)
    // A broken query fails at CREATE, not first read.
    val e5 = intercept[Exception] {
      s.sql("CREATE VIEW graft.vw.broken AS SELECT no_such FROM graft.vw.tb")
    }
    assert(e5.getMessage.toLowerCase.contains("no_such"), e5.getMessage)
    // A STATEMENT body refuses at CREATE — and must not execute: the
    // parseQuery gate (parsePlan + eager ofRows would have DROPPED the
    // table during "validation" and re-run the command on every read).
    intercept[Exception] {
      s.sql("CREATE VIEW graft.vw.evil AS DROP TABLE graft.vw.tb")
    }
    assert(s.sql("SELECT count(*) FROM graft.vw.tb").head().getLong(0) == 3L,
      "the refused statement body must not have executed")
    s.sql("DROP VIEW graft.vw.x")
    s.sql("DROP TABLE graft.vw.tb")
    cat().purgeDropped(Array("vw"), 0L, force = true)
    // Non-graft dotted CREATE VIEW reaches Spark's native session-catalog
    // path through the delegate fallback.
    s.sql("CREATE DATABASE IF NOT EXISTS vwdb")
    s.sql("DROP VIEW IF EXISTS vwdb.plainv")
    s.sql("CREATE VIEW vwdb.plainv AS SELECT 42 AS answer")
    assert(s.sql("SELECT answer FROM vwdb.plainv").head().getInt(0) == 42)
    s.sql("DROP VIEW vwdb.plainv")
    s.sql("DROP DATABASE vwdb")
  }
}
