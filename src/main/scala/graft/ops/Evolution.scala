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

  /** CHECK-constraint gate as an oracle-paired lineage: bootstrap the
    * table, declare `o_totalprice > 0` (validated against existing rows),
    * prove a violating upsert is REJECTED ATOMICALLY (the table must read
    * as if it never happened), then land a valid upsert that doubles the
    * %13 keys' prices. The DuckDB oracle aggregates the same CASE rewrite
    * of the raw table — hash-green means the rejected commit left zero
    * trace AND the accepted one landed exactly once. Rerun-stable: the
    * source-wins bootstrap resets prior runs' doubling, re-declaring the
    * same constraint name is idempotent on the map, and vacuum bounds
    * version growth. */
  def constraintGate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val root = evoRoot(dir) + "-cons"
    val tag = s"$dir@${graft.ext.Similarity.corpusVersion(dir, "orders")}"
    val orders = Tables(s, dir, "orders")
    // Seed = bootstrap upsert + the constraint declaration (VERDICT r10
    // #5: both were per-run setup; restore rewinds constraints with the
    // rest of the metadata, so the seed version carries price_pos).
    val v0 = SeededLineage.seed(s, root, tag) {
      SnapshotTable.upsert(s, root, orders, Seq("o_orderkey"))
      SnapshotTable.setCheckConstraint(s, root, "price_pos", "o_totalprice > 0")
    }
    val rejected =
      try {
        SnapshotTable.upsert(s, root,
          orders.limit(50).withColumn("o_totalprice", lit(-1.0)),
          Seq("o_orderkey"))
        false
      } catch { case _: IllegalArgumentException => true }
    require(rejected, "violating upsert must be rejected")
    SnapshotTable.upsert(s, root,
      orders.filter(col("o_orderkey") % 13 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2),
      Seq("o_orderkey"))
    val out = SnapshotTable.read(s, root)
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("total"))
      .orderBy("o_orderstatus")
      .localCheckpoint() // materialize before reset drops the DML version
    SeededLineage.reset(s, root, tag, v0)
    out
  }

  /** Column-mapping lineage (VERDICT r9 #5 done-criterion): append the
    * even-key half WITH o_orderpriority, DROP the column (orphaning those
    * values), RE-ADD it by appending the odd-key half (fresh physical id —
    * the orphaned even-key values must stay invisible), then RENAME it to
    * `prio2` metadata-only. The aggregate distinguishes old-NULL from new
    * values per status group: `with_prio` counts ONLY the odd keys (a
    * resurfacing bug would count evens too) and `top_prio` proves the new
    * values flow under the renamed logical. Rerun-stable: both appends
    * are (appId, batchId)-stamped replays on rerun, and the two DDL steps
    * are guarded on the current schema, so the lineage is idempotent. */
  def columnMappingLineage(s: SparkSession, dir: String): DataFrame = {
    val root = evoRoot(dir) + "-map"
    val orders = Tables(s, dir, "orders")
    SnapshotTable.appendOnce(s, root,
      orders.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice",
                "o_orderpriority"),
      "graft-map", 0L)
    if (SnapshotTable.read(s, root).columns.contains("o_orderpriority")
        && !SnapshotTable.read(s, root).columns.contains("prio2"))
      SnapshotTable.dropColumn(s, root, "o_orderpriority")
    SnapshotTable.appendOnce(s, root,
      orders.filter(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_orderstatus", "o_totalprice",
                "o_orderpriority"),
      "graft-map", 1L)
    if (SnapshotTable.read(s, root).columns.contains("o_orderpriority"))
      SnapshotTable.renameColumn(s, root, "o_orderpriority", "prio2")
    SnapshotTable.read(s, root)
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("cnt"),
        // Counts only rows whose column carries the RE-ADDED physical:
        // a resurfacing bug would also count the even keys' orphans.
        count(col("prio2")).as("with_prio"),
        max(col("prio2")).as("top_prio"),
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
              ORDER BY o_orderstatus ASC NULLS FIRST""")),

    // The rejected upsert must leave zero trace and the accepted one must
    // land exactly once: the oracle is the CASE rewrite of the raw table.
    Q("x_constraint_gate",
      (s, dir) => constraintGate(s, dir),
      Some("""WITH fin AS (SELECT o_orderstatus,
                CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice * 2
                     ELSE o_totalprice END AS o_totalprice
              FROM orders)
              SELECT o_orderstatus, count(*) AS cnt,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM fin GROUP BY 1
              ORDER BY o_orderstatus ASC NULLS FIRST""")),

    // Column-mapping lineage: drop -> re-add (fresh physical) -> rename.
    // with_prio/top_prio see ONLY the odd keys' re-added values; the
    // oracle's CASE encodes exactly that — orphaned even-key values
    // resurfacing would flip both columns and fail the hash.
    Q("x_column_mapping",
      (s, dir) => columnMappingLineage(s, dir),
      Some("""SELECT o_orderstatus, count(*) AS cnt,
              count(CASE WHEN o_orderkey % 2 = 1
                         THEN o_orderpriority END) AS with_prio,
              max(CASE WHEN o_orderkey % 2 = 1
                       THEN o_orderpriority END) AS top_prio,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM orders GROUP BY 1
              ORDER BY o_orderstatus ASC NULLS FIRST"""))
  )
}
