package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session wiring for the SQL front door over the table format: one call
  * registers the `graft` catalog (idempotent), after which the reference's
  * literal statements — `MERGE INTO`, `CREATE TABLE ... AS SELECT`,
  * `DELETE FROM`, `UPDATE`, `INSERT INTO`, `SELECT ... VERSION AS OF` —
  * run through `spark.sql`. The lowering rule itself rides the session's
  * `spark.sql.extensions = graft.GraftExtensions`. */
object GraftSql {

  /** Default warehouse: one fixed per-user tmp root — catalog options are
    * read once at first use and cached by Spark's CatalogManager, so the
    * warehouse must be JVM-stable; per-corpus isolation is carried in
    * table NAMES (the inventory queries suffix the corpus version). */
  def defaultWarehouse: String =
    new java.io.File(sys.props("java.io.tmpdir"), "graft-warehouse").getAbsolutePath

  def ensureCatalog(spark: SparkSession,
                    warehouse: String = defaultWarehouse): Unit = {
    if (!spark.conf.getOption("spark.sql.catalog.graft").contains(
        classOf[GraftCatalog].getName)) {
      spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
    }
  }

  /** Run a sequence of SQL statements, returning the LAST result — the
    * reference's job shape (bootstrap-if-missing, MERGE, then query;
    * main.py:349-384) as a statement list. */
  def run(spark: SparkSession, statements: Seq[String]): DataFrame = {
    ensureCatalog(spark)
    statements.map(spark.sql).last
  }
}
