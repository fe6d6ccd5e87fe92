package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Memoized bootstrap for rerun-stable DML lineage queries (VERDICT r10
  * #5): the x_mv_* / x_merge_into_* / x_constraint_gate inventory queries
  * re-seed their SnapshotTable from the fixture corpus on EVERY run so
  * verify passes and bench min-of-N reruns see identical results — by
  * round 10 that deliberate setup was ~30 s of every bench pass and
  * growing with the table-format family. This helper replaces the
  * per-run re-seed with a once-per-corpus bootstrap plus a METADATA-ONLY
  * rewind at query end:
  *
  *   1. [[seed]] — bootstrap (the expensive corpus write) only when the
  *      root's marker is absent or stale; otherwise the table already
  *      sits at the seed state and the recorded version is returned.
  *   2. the query runs its DML commits on top;
  *   3. [[reset]] — [[SnapshotTable.restore]] back to the seed (a KB
  *      manifest write, zero data moved) + vacuum to bound versions, and
  *      the marker re-pins the new current version.
  *
  * Crash-safe by construction: the marker records the version the table
  * must be SITTING AT; a run that died between DML and reset leaves
  * current != marker, so the next run re-bootstraps — and every lineage's
  * bootstrap is itself a state reset (source-wins upsert of the full
  * corpus slice, or a whole-snapshot commit), the pre-r11 rerun-stability
  * mechanism, now only paid on the healing path. */
object SeededLineage {

  private val MarkerName = "_graft_seed"

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readMarker(spark: SparkSession, root: String): Option[(String, Long)] = {
    val fs = fsOf(spark, root)
    val p = new Path(root, MarkerName)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      body.split("\n", 2) match {
        case Array(tag, v) => scala.util.Try((tag, v.trim.toLong)).toOption
        case _ => None
      }
    }
  }

  private def writeMarker(spark: SparkSession, root: String, tag: String,
                          version: Long): Unit = {
    val fs = fsOf(spark, root)
    val out = fs.create(new Path(root, MarkerName), true)
    try out.write(s"$tag\n$version".getBytes("UTF-8")) finally out.close()
  }

  /** The lineage's seed version: cheap when the marker pins the current
    * version under the same corpus tag, else `bootstrap` runs (and must
    * itself reset any stale state — all lineage bootstraps do). */
  def seed(spark: SparkSession, root: String, corpusTag: String)
          (bootstrap: => Long): Long =
    readMarker(spark, root) match {
      case Some((tag, v)) if tag == corpusTag &&
          SnapshotTable.currentVersion(spark, root).contains(v) => v
      case _ =>
        val v = bootstrap
        writeMarker(spark, root, corpusTag, v)
        v
    }

  /** End-of-run rewind: metadata-only restore to the seed state, vacuum
    * to one retained version, re-pin the marker. The caller must have
    * materialized (localCheckpoint) anything it still needs — vacuum
    * drops the DML versions' files. */
  def reset(spark: SparkSession, root: String, corpusTag: String,
            seedVersion: Long): Unit = {
    SnapshotTable.restore(spark, root, seedVersion)
    SnapshotTable.vacuum(spark, root, keep = 1)
    SnapshotTable.currentVersion(spark, root)
      .foreach(v => writeMarker(spark, root, corpusTag, v))
  }
}
