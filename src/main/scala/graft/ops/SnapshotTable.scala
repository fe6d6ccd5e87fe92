package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Manifest-committed snapshot table — the atomic-swap upgrade of
  * `Upsert.upsertParquet`'s rename discipline (round-1 roadmap; reference
  * behavior: BigQuery MERGE is transactional, main.py:349-363, and a bare
  * parquet dir is not).
  *
  * Layout:
  * {{{
  *   table/
  *     _manifests/manifest-00000042.json   // immutable, appears via rename
  *     snap-00000042/part-*.parquet        // immutable snapshot data
  * }}}
  *
  * Commit protocol: write the new snapshot dir, then write its manifest to a
  * temp name and RENAME it into `_manifests/` — a single-file rename, atomic
  * on HDFS/posix. Readers list `_manifests/`, pick the highest version, and
  * read exactly the files it names: a reader never sees a half-written
  * snapshot (the manifest appears only after the data is fully written), and
  * an in-flight reader of version N keeps working after version N+1 commits
  * because N's files are immutable until `vacuum`.
  *
  * This is the snapshot-isolation core of a table format (Delta/Iceberg),
  * sized to what an offline single-writer pipeline needs; no compaction or
  * writer-writer conflict detection (single-writer assumption, like the
  * reference's one scheduled Cloud Function).
  */
object SnapshotTable {

  private val ManifestDir = "_manifests"
  private val ManifestRe = raw"manifest-(\d{8})\.json".r

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest committed version, if any. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val fs = fsOf(spark, root)
    val mdir = new Path(root, ManifestDir)
    if (!fs.exists(mdir)) None
    else fs.listStatus(mdir).toSeq
      .flatMap(st => st.getPath.getName match {
        case ManifestRe(v) => Some(v.toLong)
        case _ => None
      }) match {
        case Nil => None
        case vs => Some(vs.max)
      }
  }

  private def manifestPath(root: String, v: Long): Path =
    new Path(new Path(root, ManifestDir), f"manifest-$v%08d.json")

  private def readManifest(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    // minimal JSON: {"version":N,"files":["...","..."]}
    raw""""([^"]*\.parquet)"""".r.findAllMatchIn(body).map(_.group(1)).toSeq
  }

  /** Read the table at its latest committed version (or a pinned `asOf`
    * version — time travel falls out of immutable manifests for free). */
  def read(spark: SparkSession, root: String, asOf: Option[Long] = None): DataFrame = {
    val v = asOf.orElse(currentVersion(spark, root))
      .getOrElse(throw new IllegalStateException(s"no committed version at $root"))
    val fs = fsOf(spark, root)
    val files = readManifest(fs, manifestPath(root, v))
    spark.read.parquet(files: _*)
  }

  /** Commit `df` as the next version; returns the committed version. */
  def commit(spark: SparkSession, root: String, df: DataFrame): Long = {
    val fs = fsOf(spark, root)
    val v = currentVersion(spark, root).map(_ + 1).getOrElse(0L)
    val snapDir = new Path(root, f"snap-$v%08d")
    df.write.mode(SaveMode.ErrorIfExists).parquet(snapDir.toString)
    val files = fs.listStatus(snapDir).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .map(_.toString).sorted
    val body = files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString(s"""{"version":$v,"files":[""", ",", "]}")
    val mdir = new Path(root, ManifestDir)
    fs.mkdirs(mdir)
    val tmp = new Path(mdir, f".manifest-$v%08d.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, manifestPath(root, v)))
      throw new IllegalStateException(s"manifest rename failed for version $v (concurrent writer?)")
    v
  }

  /** MERGE-upsert as a new snapshot: bootstrap on first commit (S7), else
    * source-wins merge against the current version. Old snapshots stay
    * readable until vacuum. */
  def upsert(spark: SparkSession, root: String, source: DataFrame,
             keys: Seq[String]): Long =
    currentVersion(spark, root) match {
      case None => commit(spark, root, source)
      case Some(v) =>
        val merged = Upsert.merge(read(spark, root, Some(v)), source, keys)
          .localCheckpoint() // cut lineage: the plan must not re-read files vacuum may later drop
        commit(spark, root, merged)
    }

  /** Drop all snapshots and manifests older than the latest `keep` versions. */
  def vacuum(spark: SparkSession, root: String, keep: Int = 1): Unit = {
    val fs = fsOf(spark, root)
    val mdir = new Path(root, ManifestDir)
    if (!fs.exists(mdir)) return
    val versions = fs.listStatus(mdir).toSeq.flatMap(_.getPath.getName match {
      case ManifestRe(v) => Some(v.toLong)
      case _ => None
    }).sorted
    versions.dropRight(keep).foreach { v =>
      fs.delete(new Path(root, f"snap-$v%08d"), true)
      fs.delete(manifestPath(root, v), false)
    }
  }
}
