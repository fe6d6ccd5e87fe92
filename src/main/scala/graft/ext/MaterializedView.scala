package graft.ext

import graft.Tables
import graft.ops.{Q, SeededLineage, SnapshotTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Incremental materialized-view maintenance off the SnapshotTable change
  * feed — the pattern that keeps a grouped-aggregate "dashboard" table
  * current over a 100 TB append-mostly fact table WITHOUT re-scanning it
  * per refresh (the reference's scheduled BigQuery-extract jobs re-run
  * their aggregate SQL per trigger; at warehouse scale the standard
  * replacement is delta maintenance, e.g. Delta Live Tables /
  * materialized-view incremental refresh):
  *
  *   1. each arriving batch lands via [[SnapshotTable.appendOnce]]
  *      (exactly-once, (appId, batchId)-stamped);
  *   2. the refresh reads ONLY that commit's file-granular delta from
  *      [[SnapshotTable.changes]] — never the whole table;
  *   3. the delta collapses to constant-width partial aggregates
  *      (count / decimal sum / min / max — all combinable under inserts);
  *   4. [[combine]] full-outer-merges the partials into the standing view:
  *      cost O(|delta| + |view|) per refresh, independent of table size.
  *
  * The registered query runs three append→refresh cycles (plus a
  * deliberate REPLAY of the last batch — a double-applied append would
  * double `cnt` and hash-mismatch) and the DuckDB oracle recomputes the
  * aggregate from the final table state, so the hash gate proves
  * incremental == full recompute EXACTLY. Exactness is by construction:
  * counts are integers, sums go through DECIMAL(18,2) casts before
  * summation (associative, order-independent), and min/max are lattice
  * joins — no floating-point drift can accumulate across refreshes.
  */
object MaterializedView {

  /** The pilot view, now an INSTANCE of the generalized [[MvSpec]]
    * operator (VERDICT r9 #1): orders grouped by (status, priority) with
    * count / exact decimal sum / min / max. The legacy `partial`/
    * `combine`/`combineDelta` entry points below delegate to it — every
    * existing consumer (streaming MV-refresh sink, rehearsal legs, the
    * four x_mv_* lineages) now runs THROUGH the parameterized op. */
  val ordersSpec: MvSpec = MvSpec(
    Seq("o_orderstatus", "o_orderpriority"),
    Seq(MvAgg.Count("cnt"),
      MvAgg.Sum("o_totalprice", "total", Some("decimal(18,2)")),
      MvAgg.Min("o_totalprice", "min_price"),
      MvAgg.Max("o_totalprice", "max_price")))

  private def mvKeys = ordersSpec.keys

  /** Constant-width combinable partials for one slice of `orders`. */
  def partial(df: DataFrame): DataFrame = ordersSpec.partial(df)

  /** Merge a delta's partials into the standing view (insert-only). */
  def combine(mv: DataFrame, delta: DataFrame): DataFrame =
    ordersSpec.combine(mv, delta)

  /** Memoized base-table roots (one bootstrap per corpus CONTENT VERSION
    * per JVM; across JVMs the appendOnce stamps make re-entry a no-op
    * replay). Keyed on [[Similarity.corpusVersion]] like bm25IndexBuild and
    * pqBuild (ADVICE r8): an orders table regenerated in place at the same
    * path gets a FRESH root — without the key, the (appId, batchId) stamps
    * would swallow every append as a replay and serve the stale table. */
  private val roots = new scala.collection.concurrent.TrieMap[String, String]()

  /** Corpus tag for [[SeededLineage]] markers (content-version keyed like
    * the roots themselves). */
  private def mvTag(dir: String): String =
    s"$dir@${Similarity.corpusVersion(dir, "orders")}"

  private def mvRoot(dir: String): String = {
    val vdir = s"$dir@${Similarity.corpusVersion(dir, "orders")}"
    roots.getOrElseUpdate(vdir, {
      val tag = vdir.replaceAll("[^a-zA-Z0-9]", "_")
      new java.io.File(
        sys.props("java.io.tmpdir"), s"graft-mv-$tag").getAbsolutePath
    })
  }

  /** [[mvRoot]] generalized to any base table (same content-version
    * keying; the table name joins the key so two tables of one corpus
    * never share a root). */
  private def mvRootFor(s: SparkSession, dir: String, table: String): String = {
    val vdir = s"$dir@${Similarity.corpusVersion(dir, table)}"
    roots.getOrElseUpdate(s"$table:$vdir", {
      val tag = vdir.replaceAll("[^a-zA-Z0-9]", "_")
      new java.io.File(
        sys.props("java.io.tmpdir"), s"graft-mv-$table-$tag").getAbsolutePath
    })
  }

  /** Retraction-capable refresh (VERDICT r8 #2): merge a row-level CDC
    * delta ([[SnapshotTable.changesDelta]]'s (adds, removes)) into the
    * standing view — see [[MvSpec.combineDelta]] for the algebra
    * (algebraic count/sum retraction, touched-group-only min/max
    * recompute, the restrictTerms threshold discipline on the touched-key
    * restriction). */
  def combineDelta(s: SparkSession, tableRoot: String, mv: DataFrame,
                   adds: DataFrame, removes: DataFrame): DataFrame =
    ordersSpec.combineDelta(s, tableRoot, mv, adds, removes)

  /** Three exactly-once appends of the orders table (split by
    * o_orderkey % 3), each followed by a change-feed-driven refresh of the
    * grouped-aggregate view; returns the final view. Deterministic and
    * rerun-stable: on a second run every appendOnce replays as a no-op and
    * anchors the same version pair, so the identical deltas (and therefore
    * the identical view) are reproduced. */
  def incrementalMv(s: SparkSession, dir: String): DataFrame = {
    val root = mvRoot(dir)
    val orders = Tables(s, dir, "orders")
    def batch(i: Int): DataFrame = orders.filter(col("o_orderkey") % 3 === i)

    val v0 = SnapshotTable.appendOnce(s, root, batch(0), "graft-mv", 0L)
    var mv = partial(SnapshotTable.read(s, root, Some(v0)))
    for (i <- 1 to 2) {
      val vi = SnapshotTable.appendOnce(s, root, batch(i), "graft-mv", i.toLong)
      val delta = SnapshotTable.changes(s, root, vi - 1, Some(vi))
      mv = combine(mv, partial(delta))
    }
    // Deliberate at-least-once replay: must resolve to the stamped version
    // without committing, or the view double-counts and the gate catches it.
    SnapshotTable.appendOnce(s, root, batch(2), "graft-mv", 2L)

    mv.select(
        col("o_orderstatus"), col("o_orderpriority"),
        col("cnt"), col("total").cast("double").as("total"),
        col("min_price"), col("max_price"))
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  /** Upsert-refresh lineage (VERDICT r8 #2 done-criterion): bootstrap the
    * base table as ONE upsert of the whole orders table (clustered on the
    * view keys), seed the view, then apply an UPSERT batch that MOVES every
    * o_orderkey % 7 == 0 row into a brand-new priority group — retraction
    * must fire in every source group (cnt/total shrink; where the moved row
    * held a group's min/max, the touched-group recompute must find the
    * runner-up) and the '9-MOVED' group must materialize from the adds.
    * The refresh consumes [[SnapshotTable.changesDelta]] over the upsert
    * commit — never re-reading the un-touched groups' rows — and the DuckDB
    * oracle recomputes the aggregate from the FINAL table state, so the
    * hash gate proves retraction ≡ full recompute exactly.
    *
    * Rerun-stable: each run re-upserts the same two states (source-wins
    * merge makes the bootstrap reset any prior run's moves), anchors the
    * delta on the versions THIS run's upserts returned, and vacuums to
    * bound version growth across reruns. */
  def incrementalUpsertMv(s: SparkSession, dir: String): DataFrame = {
    val root = mvRoot(dir) + "-up"
    val tag = mvTag(dir)
    val orders = Tables(s, dir, "orders")
    // Seed once per corpus (VERDICT r10 #5): the full-orders bootstrap
    // upsert was ~per-run setup cost; reruns now restore to it
    // metadata-only (SeededLineage.reset below).
    val v0 = SeededLineage.seed(s, root, tag) {
      SnapshotTable.upsert(s, root, orders, Seq("o_orderkey"),
        clusterBy = mvKeys)
    }
    val mv0 = partial(SnapshotTable.read(s, root, Some(v0)))
    val moved = orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_orderpriority", lit("9-MOVED"))
    val v1 = SnapshotTable.upsert(s, root, moved, Seq("o_orderkey"),
      clusterBy = mvKeys)
    val (adds, removes) = SnapshotTable.changesDelta(s, root, v0, Some(v1))
      .getOrElse(throw new IllegalStateException(
        s"upsert commit $v0 -> $v1 at $root lost its CDC"))
    val mv = combineDelta(s, root, mv0, adds, removes)
    val out = mv.select(
        col("o_orderstatus"), col("o_orderpriority"),
        col("cnt"), col("total").cast("double").as("total"),
        col("min_price"), col("max_price"))
      .orderBy("o_orderstatus", "o_orderpriority")
      .localCheckpoint() // materialize before reset drops the DML version
    SeededLineage.reset(s, root, tag, v0)
    out
  }

  /** Delete-refresh lineage: bootstrap the base table as one clustered
    * upsert, seed the view, then DELETE every o_orderkey % 5 == 0 row —
    * the [[SnapshotTable.delete]] commit's CDC is pure retraction (add =
    * empty), so the refresh exercises [[combineDelta]]'s remove leg alone:
    * cnt/total shrink algebraically in every group and every group is
    * remove-touched, so min/max recompute must find the surviving extrema.
    * The DuckDB oracle aggregates the post-delete predicate directly, so
    * the hash gate proves retraction refresh ≡ full recompute. Rerun-stable
    * the same way as [[incrementalUpsertMv]]: the bootstrap upsert restores
    * the deleted rows on a rerun, the delete re-fires, and vacuum bounds
    * version growth. */
  def incrementalDeleteMv(s: SparkSession, dir: String): DataFrame = {
    val root = mvRoot(dir) + "-del"
    val tag = mvTag(dir)
    val orders = Tables(s, dir, "orders")
    val v0 = SeededLineage.seed(s, root, tag) {
      SnapshotTable.upsert(s, root, orders, Seq("o_orderkey"),
        clusterBy = mvKeys)
    }
    val mv0 = partial(SnapshotTable.read(s, root, Some(v0)))
    val v1 = SnapshotTable.delete(s, root, col("o_orderkey") % 5 === 0)
    val (adds, removes) = SnapshotTable.changesDelta(s, root, v0, Some(v1))
      .getOrElse(throw new IllegalStateException(
        s"delete commit $v0 -> $v1 at $root lost its CDC"))
    val mv = combineDelta(s, root, mv0, adds, removes)
    val out = mv.select(
        col("o_orderstatus"), col("o_orderpriority"),
        col("cnt"), col("total").cast("double").as("total"),
        col("min_price"), col("max_price"))
      .orderBy("o_orderstatus", "o_orderpriority")
      .localCheckpoint() // materialize before reset drops the DML version
    SeededLineage.reset(s, root, tag, v0)
    out
  }

  /** Update-refresh lineage: bootstrap as one clustered upsert, seed the
    * view, then predicate-UPDATE every o_orderkey % 11 == 0 row — moving it
    * into a new priority group AND doubling its price. The
    * [[SnapshotTable.update]] commit's CDC is (post-image, pre-image), so
    * the refresh exercises BOTH combineDelta legs on the same rows:
    * retraction out of every source group (cnt/total shrink; vacated
    * min/max recompute to the runner-up) and insertion into the
    * '8-UPDATED' group whose extrema come from doubled prices. The DuckDB
    * oracle applies the same CASE rewrite to the raw table, pinning
    * update-CDC refresh ≡ full recompute. Rerun-stable like
    * [[incrementalUpsertMv]]: the source-wins bootstrap upsert resets any
    * prior run's update, and vacuum bounds version growth. */
  def incrementalUpdateMv(s: SparkSession, dir: String): DataFrame = {
    val root = mvRoot(dir) + "-updml"
    val tag = mvTag(dir)
    val orders = Tables(s, dir, "orders")
    val v0 = SeededLineage.seed(s, root, tag) {
      SnapshotTable.upsert(s, root, orders, Seq("o_orderkey"),
        clusterBy = mvKeys)
    }
    val mv0 = partial(SnapshotTable.read(s, root, Some(v0)))
    val v1 = SnapshotTable.update(s, root, col("o_orderkey") % 11 === 0,
      Map("o_orderpriority" -> lit("8-UPDATED"),
          "o_totalprice" -> (col("o_totalprice") * 2)))
    val (adds, removes) = SnapshotTable.changesDelta(s, root, v0, Some(v1))
      .getOrElse(throw new IllegalStateException(
        s"update commit $v0 -> $v1 at $root lost its CDC"))
    val mv = combineDelta(s, root, mv0, adds, removes)
    val out = mv.select(
        col("o_orderstatus"), col("o_orderpriority"),
        col("cnt"), col("total").cast("double").as("total"),
        col("min_price"), col("max_price"))
      .orderBy("o_orderstatus", "o_orderpriority")
      .localCheckpoint() // materialize before reset drops the DML version
    SeededLineage.reset(s, root, tag, v0)
    out
  }

  /** A SECOND view instance through the same generalized operator
    * (VERDICT r9 #1 done-criterion): events by event_type with count,
    * exact decimal sum, AVG (the algebraic (sum, count) pair — the agg
    * the pilot view lacked), min and max. */
  val eventsSpec: MvSpec = MvSpec(
    Seq("event_type"),
    Seq(MvAgg.Count("cnt"),
      MvAgg.Sum("value", "total", Some("decimal(18,2)")),
      MvAgg.Avg("value", "avg_value", Some("decimal(18,2)")),
      MvAgg.Min("value", "min_value"),
      MvAgg.Max("value", "max_value")))

  /** Delete-refresh lineage for the events view: bootstrap the base table
    * as one clustered upsert, seed the view, DELETE every
    * event_id % 3 == 0 row (pure retraction touching every group — avg
    * must retract its (sum, count) pair exactly, min/max must recompute
    * to the surviving extrema), refresh off the commit's CDC, and read
    * out through [[MvSpec.finish]]. The DuckDB oracle aggregates the
    * surviving predicate directly, so the hash gate pins the generalized
    * operator's avg retraction ≡ a full recompute. Rerun-stable like the
    * orders lineages: the source-wins bootstrap re-inserts prior runs'
    * deletions and vacuum bounds version growth. */
  def incrementalEventsAvgMv(s: SparkSession, dir: String): DataFrame = {
    val root = mvRootFor(s, dir, "events") + "-ev"
    val tag = s"$dir@${Similarity.corpusVersion(dir, "events")}"
    val events = Tables(s, dir, "events")
      .select("event_id", "event_type", "value")
    val v0 = SeededLineage.seed(s, root, tag) {
      SnapshotTable.upsert(s, root, events, Seq("event_id"),
        clusterBy = eventsSpec.keys)
    }
    val mv0 = eventsSpec.partial(SnapshotTable.read(s, root, Some(v0)))
    val v1 = SnapshotTable.delete(s, root, col("event_id") % 3 === 0)
    val (adds, removes) = SnapshotTable.changesDelta(s, root, v0, Some(v1))
      .getOrElse(throw new IllegalStateException(
        s"delete commit $v0 -> $v1 at $root lost its CDC"))
    val mv = eventsSpec.combineDelta(s, root, mv0, adds, removes)
    val out = eventsSpec.finish(mv)
      .select(col("event_type"), col("cnt"),
        col("total").cast("double").as("total"),
        col("avg_value"), col("min_value"), col("max_value"))
      .orderBy("event_type")
      .localCheckpoint() // materialize before reset drops the DML version
    SeededLineage.reset(s, root, tag, v0)
    out
  }

  /** MV refresh as a SUBSCRIBER of the streaming change-feed source
    * (VERDICT r9 #2 done-criterion): bootstrap the base table and seed
    * the view, land an upsert (group moves + doubled prices) and a
    * predicate delete as ordinary table commits, then let a
    * `readStream.format("graft-cdf")` stream — anchored at the bootstrap
    * version, one table version per micro-batch — drive the refresh
    * through [[MvSpec.combineDelta]]. The producer never wires the view:
    * the table's manifest log IS the stream. The DuckDB oracle recomputes
    * the final state, so hash-green pins streamed CDF refresh ≡ full
    * recompute. Rerun-stable: the source-wins bootstrap resets moves and
    * re-inserts deletions, the stream anchors on THIS run's bootstrap
    * version with a fresh checkpoint, and vacuum bounds version growth. */
  def streamedCdcMv(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val root = mvRoot(dir) + "-cdc"
    val tag = mvTag(dir)
    val orders = Tables(s, dir, "orders")
    val mvKeys = ordersSpec.keys
    val v0 = SeededLineage.seed(s, root, tag) {
      SnapshotTable.upsert(s, root, orders, Seq("o_orderkey"),
        clusterBy = mvKeys)
    }
    var view = ordersSpec.partial(SnapshotTable.read(s, root, Some(v0)))
      .localCheckpoint()
    SnapshotTable.upsert(s, root,
      orders.filter(col("o_orderkey") % 9 === 0)
        .withColumn("o_orderpriority", lit("7-CDC"))
        .withColumn("o_totalprice", col("o_totalprice") * 2),
      Seq("o_orderkey"), clusterBy = mvKeys)
    SnapshotTable.delete(s, root, col("o_orderkey") % 6 === 1)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-ckpt").toString
    val q = s.readStream.format("graft-cdf")
      .option("root", root)
      .option("startVersion", v0.toString)
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val adds = batch.filter(col("_change_type") === "insert")
          .drop("_change_type", "_commit_version")
        val removes = batch.filter(col("_change_type") === "delete")
          .drop("_change_type", "_commit_version")
        // localCheckpoint: the view chain must not re-read CDC files a
        // later vacuum may drop, and per-batch lineage stays constant.
        view = ordersSpec.combineDelta(s, root, view, adds, removes)
          .localCheckpoint()
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    q.stop()
    val out = view.select(
        col("o_orderstatus"), col("o_orderpriority"),
        col("cnt"), col("total").cast("double").as("total"),
        col("min_price"), col("max_price"))
      .orderBy("o_orderstatus", "o_orderpriority")
      .localCheckpoint()
    SeededLineage.reset(s, root, tag, v0)
    out
  }

  val qs: Seq[Q] = Seq(
    Q("x_mv_incremental",
      (s, dir) => incrementalMv(s, dir),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
              min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
              FROM orders GROUP BY 1, 2
              ORDER BY o_orderstatus ASC NULLS FIRST,
                       o_orderpriority ASC NULLS FIRST""")),

    // Retraction-capable refresh over a MERGE upsert: the oracle aggregates
    // the FINAL table state (orders with the %7 rows moved to '9-MOVED'),
    // so the hash gate pins retraction == full recompute.
    Q("x_mv_incremental_upsert",
      (s, dir) => incrementalUpsertMv(s, dir),
      Some("""WITH fin AS (SELECT o_orderstatus,
                CASE WHEN o_orderkey % 7 = 0 THEN '9-MOVED'
                     ELSE o_orderpriority END AS o_orderpriority,
                o_totalprice
              FROM orders)
              SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
              min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
              FROM fin GROUP BY 1, 2
              ORDER BY o_orderstatus ASC NULLS FIRST,
                       o_orderpriority ASC NULLS FIRST""")),

    // Retraction-only refresh over a predicate DELETE: the oracle
    // aggregates the surviving rows directly, pinning the delete commit's
    // CDC + combineDelta remove leg against a full recompute.
    Q("x_mv_incremental_delete",
      (s, dir) => incrementalDeleteMv(s, dir),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
              min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
              FROM orders WHERE o_orderkey % 5 <> 0 GROUP BY 1, 2
              ORDER BY o_orderstatus ASC NULLS FIRST,
                       o_orderpriority ASC NULLS FIRST""")),

    // Retract-and-insert refresh over a predicate UPDATE: the update's CDC
    // carries the pre-images out of their groups and the rewritten
    // post-images into '8-UPDATED' (price doubled — exact in binary, so the
    // doubled extrema hash identically in both engines). Oracle = the same
    // CASE rewrite aggregated from the raw table.
    Q("x_mv_incremental_update",
      (s, dir) => incrementalUpdateMv(s, dir),
      Some("""WITH fin AS (SELECT o_orderstatus,
                CASE WHEN o_orderkey % 11 = 0 THEN '8-UPDATED'
                     ELSE o_orderpriority END AS o_orderpriority,
                CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice * 2
                     ELSE o_totalprice END AS o_totalprice
              FROM orders)
              SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
              min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
              FROM fin GROUP BY 1, 2
              ORDER BY o_orderstatus ASC NULLS FIRST,
                       o_orderpriority ASC NULLS FIRST""")),

    // Second view instance through the generalized MvSpec (VERDICT r9 #1):
    // events by event_type with AVG — the algebraic (sum, count) pair
    // retracting under a predicate DELETE. Oracle = full recompute over
    // the surviving rows; avg is CAST(exact decimal sum AS DOUBLE)/count
    // in both engines, so the quotient hashes identically.
    Q("x_mv_events_avg",
      (s, dir) => incrementalEventsAvgMv(s, dir),
      Some("""SELECT event_type, count(*) AS cnt,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value)
                AS avg_value,
              min(value) AS min_value, max(value) AS max_value
              FROM events WHERE event_id % 3 <> 0 GROUP BY 1
              ORDER BY event_type ASC NULLS FIRST""")),

    // The change-feed SOURCE driving the refresh (VERDICT r9 #2): the view
    // subscribes to the table's CDC through readStream.format("graft-cdf"),
    // one version per micro-batch; oracle = full recompute of the final
    // state (upsert's moves+doubling, then the delete's survivors).
    Q("st_mv_cdc",
      (s, dir) => streamedCdcMv(s, dir),
      Some("""WITH fin AS (SELECT o_orderstatus,
                CASE WHEN o_orderkey % 9 = 0 THEN '7-CDC'
                     ELSE o_orderpriority END AS o_orderpriority,
                CASE WHEN o_orderkey % 9 = 0 THEN o_totalprice * 2
                     ELSE o_totalprice END AS o_totalprice
              FROM orders WHERE o_orderkey % 6 <> 1)
              SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
              min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
              FROM fin GROUP BY 1, 2
              ORDER BY o_orderstatus ASC NULLS FIRST,
                       o_orderpriority ASC NULLS FIRST"""))
  )
}
