package graft.ops

import graft.Tables
import graft.ext.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Oracle-gated additive schema evolution on [[SnapshotTable]] — the
  * lifecycle a long-lived 100 TB table actually goes through: a producer
  * starts shipping a NEW column mid-stream and the table must absorb it
  * without rewriting a byte of history (reference behavior: the extract
  * jobs re-ship full snapshots on schema change; the warehouse-scale
  * replacement is Delta/Iceberg metadata-declared schemas, which is what
  * [[SnapshotStats.schemaFromManifest]] implements).
  *
  * The registered query appends the even-key half of `orders` WITHOUT
  * `o_orderpriority`, then the odd-key half WITH it — the second commit
  * evolves the declared schema, the first commit's files are never
  * rewritten, and reading the evolved table yields NULL priority for
  * exactly the even keys. The DuckDB oracle reproduces that NULL pattern
  * with a CASE over the raw table, so the hash gate pins the
  * files-untouched + NULL-fill semantics end to end (count of non-null
  * priorities per status group would double-count or zero out if either
  * half read the wrong schema). */
object Evolution {

  /** One bootstrap per corpus CONTENT VERSION per JVM (the mvRoot /
    * bm25IndexBuild keying, ADVICE r8): a regenerated-in-place corpus gets
    * a fresh root so the exactly-once stamps can't serve stale appends.
    * Reruns at the same version replay as no-ops — no vacuum needed. */
  private val roots = new scala.collection.concurrent.TrieMap[String, String]()

  private def evoRoot(dir: String): String = {
    val vdir = s"$dir@${Similarity.corpusVersion(dir, "orders")}"
    roots.getOrElseUpdate(vdir, {
      val tag = vdir.replaceAll("[^a-zA-Z0-9]", "_")
      new java.io.File(
        sys.props("java.io.tmpdir"), s"graft-evo-$tag").getAbsolutePath
    })
  }

  /** Two exactly-once appends across a schema evolution, read back as one
    * grouped aggregate over the evolved schema. */
  def evolvedAppend(s: SparkSession, dir: String): DataFrame = {
    val root = evoRoot(dir)
    val orders = Tables(s, dir, "orders")
    SnapshotTable.appendOnce(s, root,
      orders.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice"),
      "graft-evo", 0L)
    SnapshotTable.appendOnce(s, root,
      orders.filter(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_orderstatus", "o_totalprice",
                "o_orderpriority"),
      "graft-evo", 1L)
    SnapshotTable.read(s, root)
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("cnt"),
        // Counts only rows whose FILE carries the column: pre-evolution
        // files must read NULL here or this double-counts.
        count(col("o_orderpriority")).as("with_prio"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("total"))
      .orderBy("o_orderstatus")
  }

  val qs: Seq[Q] = Seq(
    Q("x_schema_evolution",
      (s, dir) => evolvedAppend(s, dir),
      Some("""SELECT o_orderstatus, count(*) AS cnt,
              count(CASE WHEN o_orderkey % 2 = 1
                         THEN o_orderpriority END) AS with_prio,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM orders GROUP BY 1
              ORDER BY o_orderstatus ASC NULLS FIRST"""))
  )
}
