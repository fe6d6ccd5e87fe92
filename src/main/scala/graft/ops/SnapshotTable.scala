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
  * sized to what an offline pipeline needs. Writer-writer conflicts are
  * DETECTED, not silently merged (round-3 roadmap item): every attempt
  * writes its data under a unique `snap-<v>-<token>/` dir (two racing
  * writers can never touch each other's files), and the manifest rename is
  * the single compare-and-swap — exactly one writer per version wins; the
  * loser's commit throws [[SnapshotTable.ConcurrentWriteException]] after
  * cleaning up its own orphan. `upsert` catches the conflict and REDOES the
  * merge against the winner's version (bounded retries) — the
  * read-merge-commit loop is serializable, not last-write-wins.
  */
object SnapshotTable {

  /** Another writer committed the version this commit targeted. The table is
    * intact (the winner's version is fully committed; this writer's partial
    * data was removed). Re-read and retry to serialize after the winner. */
  final class ConcurrentWriteException(msg: String) extends RuntimeException(msg)

  private val ManifestDir = "_manifests"
  private val ManifestRe = raw"manifest-(\d{8})\.json".r
  private val SnapRe = raw"snap-(\d{8})(-[0-9a-f]{8})?".r

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

  private def readManifestBody(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  // Real JSON parse (jackson ships on the Spark classpath): the writer
  // escapes backslashes/quotes, so a regex scrape would round-trip paths
  // containing either to a WRONG path (ADVICE r2). Jackson reverses the
  // escaping symmetrically.
  private def filesFromBody(body: String, p: Path): Seq[String] = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    val files = node.get("files")
    require(files != null && files.isArray, s"malformed manifest $p")
    (0 until files.size).map(i => files.get(i).asText())
  }

  private def readManifest(fs: FileSystem, p: Path): Seq[String] =
    filesFromBody(readManifestBody(fs, p), p)

  /** Read the table at its latest committed version (or a pinned `asOf`
    * version — time travel falls out of immutable manifests for free).
    *
    * When the manifest carries file stats (every commit since they were
    * introduced), the scan is served through a [[SnapshotFileIndex]]: any
    * `.filter` the caller adds prunes whole files at PLANNING time from the
    * manifest's (min, max, nulls) bounds — write-side clustering
    * ([[commitClustered]]) plus this read path is the Delta/Iceberg
    * data-skipping loop. Pre-stats manifests fall back to a plain
    * multi-path parquet read (identical rows, no skipping). */
  def read(spark: SparkSession, root: String, asOf: Option[Long] = None): DataFrame =
    readTracked(spark, root, asOf)._1

  /** [[read]], also returning the file index when one is in play — the
    * `lastSelected`/`totalFiles` counters make skipping observable (specs,
    * scan reports). */
  def readTracked(spark: SparkSession, root: String,
                  asOf: Option[Long] = None): (DataFrame, Option[SnapshotFileIndex]) = {
    val v = asOf.orElse(currentVersion(spark, root))
      .getOrElse(throw new IllegalStateException(s"no committed version at $root"))
    val fs = fsOf(spark, root)
    val body = readManifestBody(fs, manifestPath(root, v))
    val files = filesFromBody(body, manifestPath(root, v))
    val stats = SnapshotStats.statsFromManifest(body)
    if (stats.isEmpty || stats.map(_.path).sorted != files.sorted)
      (spark.read.parquet(files: _*), None)
    else {
      val index = new SnapshotFileIndex(spark, new Path(root), stats)
      // Snapshot files share one writer schema; one footer is authoritative.
      val dataSchema = spark.read.parquet(files.head).schema
      val relation = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
        index,
        partitionSchema = new org.apache.spark.sql.types.StructType(),
        dataSchema = dataSchema,
        bucketSpec = None,
        fileFormat = new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
        options = Map.empty)(spark)
      (spark.baseRelationToDataFrame(relation), Some(index))
    }
  }

  /** Commit `df` as the next version; returns the committed version.
    * Throws [[ConcurrentWriteException]] if another writer commits the same
    * version first (the manifest rename is the CAS). */
  def commit(spark: SparkSession, root: String, df: DataFrame): Long =
    commitAt(spark, root, currentVersion(spark, root).map(_ + 1).getOrElse(0L), df)

  /** Commit with the rows range-clustered on `clusterBy`: each output file
    * owns a disjoint key range (`repartitionByRange` + an in-file sort), so
    * the manifest's per-file bounds become TIGHT and a later
    * `read(...).filter(key ...)` skips every non-overlapping file. This is
    * the write-side half of data skipping (Delta OPTIMIZE's clustering,
    * minus multi-dimension Z-ordering — range-cluster on the dominant
    * filter column). */
  def commitClustered(spark: SparkSession, root: String, df: DataFrame,
                      clusterBy: Seq[String], numFiles: Int = 32): Long = {
    require(clusterBy.nonEmpty, "commitClustered needs at least one cluster column")
    val cols = clusterBy.map(df.col)
    commit(spark, root,
      df.repartitionByRange(numFiles, cols: _*).sortWithinPartitions(cols: _*))
  }

  /** Commit with MULTI-dimension clustering: each row maps to a z-value —
    * the bit-interleave of per-column bucket ids (10 bits each, buckets
    * uniform over the column's [min, max]) — and files are range-partitioned
    * + sorted by it. Along a space-filling curve every file covers a SMALL
    * range in EVERY z-ordered dimension, so the manifest's per-file bounds
    * prune on a filter over ANY of them (range-clustering on one column
    * only serves that column). This is Delta's OPTIMIZE ZORDER BY shape
    * with uniform rather than quantile buckets: one extra min/max
    * aggregation on the write path, no driver-side data.
    *
    * Skew note: heavily skewed columns waste z-resolution under uniform
    * buckets (most rows share few bucket ids); range-cluster on the
    * dominant column instead, or pre-transform (log, hash) the skewed
    * dimension. */
  def commitZOrdered(spark: SparkSession, root: String, df: DataFrame,
                     zorderBy: Seq[String], numFiles: Int = 32): Long = {
    require(zorderBy.size >= 2 && zorderBy.size <= 3,
      s"z-order needs 2-3 columns (got ${zorderBy.size}); use commitClustered for 1")
    import org.apache.spark.sql.functions._
    val bits = 10
    // One pass for global [min, max] per dimension (doubles: z-order cares
    // about ORDER, so the double image of ints/dates/timestamps is fine).
    val aggs = zorderBy.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"mn_$c"), max(col(c).cast("double")).as(s"mx_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val bucketCols = zorderBy.zipWithIndex.map { case (c, i) =>
      if (r.isNullAt(2 * i) || r.isNullAt(2 * i + 1)) lit(0L) // all-null column
      else {
        val (mn, mx) = (r.getDouble(2 * i), r.getDouble(2 * i + 1))
        if (mx <= mn) lit(0L) // constant column: contributes nothing
        else least(lit(((1 << bits) - 1).toLong), greatest(lit(0L),
          floor((col(c).cast("double") - lit(mn)) / lit(mx - mn) * lit(1 << bits))
            .cast("long")))
      }
    }
    // Interleave: bit j of dimension d lands at position j*D + d, keeping
    // high-order bits of all dimensions adjacent — the Morton curve.
    val d = zorderBy.size
    val zval = (0 until bits).flatMap { j =>
      bucketCols.zipWithIndex.map { case (b, dim) =>
        shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), j * d + dim)
      }
    }.reduce(_ + _)
    commit(spark, root,
      df.withColumn("__z", zval)
        .repartitionByRange(numFiles, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z"))
  }

  /** Current version's file entries, reconstructing bytes-only entries when
    * the manifest predates stats (bounds stay empty → those files are never
    * pruned, the usual degrade-to-keep). */
  private def currentEntries(spark: SparkSession, root: String,
                             v: Long): Seq[SnapshotStats.FileStats] = {
    val fs = fsOf(spark, root)
    val body = readManifestBody(fs, manifestPath(root, v))
    val files = filesFromBody(body, manifestPath(root, v))
    val stats = SnapshotStats.statsFromManifest(body)
    if (stats.map(_.path).sorted == files.sorted) stats
    else files.map { f =>
      val st = fs.getFileStatus(new Path(f))
      SnapshotStats.FileStats(f, st.getLen, 0L, Map.empty)
    }
  }

  /** Highest batchId committed for `appId`, scanning manifests newest-first
    * (driver-side KB reads; versions are bounded by vacuum). */
  def lastTxn(spark: SparkSession, root: String, appId: String): Option[Long] = {
    val fs = fsOf(spark, root)
    val mdir = new Path(root, ManifestDir)
    if (!fs.exists(mdir)) return None
    fs.listStatus(mdir).toSeq
      .flatMap(_.getPath.getName match {
        case ManifestRe(v) => Some(v.toLong)
        case _ => None
      }).sorted.reverse
      .iterator
      .map(v => SnapshotStats.txnFromManifest(readManifestBody(fs, manifestPath(root, v))))
      .collectFirst { case Some((a, b)) if a == appId => b }
  }

  /** Version whose manifest carries exactly the (appId, batchId) stamp, if
    * it is still retained (vacuum may have dropped old manifests). Scans
    * newest-first — driver-side KB reads, versions bounded by vacuum. */
  def txnVersion(spark: SparkSession, root: String, appId: String,
                 batchId: Long): Option[Long] = {
    val fs = fsOf(spark, root)
    val mdir = new Path(root, ManifestDir)
    if (!fs.exists(mdir)) return None
    fs.listStatus(mdir).toSeq
      .flatMap(_.getPath.getName match {
        case ManifestRe(v) => Some(v.toLong)
        case _ => None
      }).sorted.reverse
      .find(v => SnapshotStats
        .txnFromManifest(readManifestBody(fs, manifestPath(root, v)))
        .contains((appId, batchId)))
  }

  /** Exactly-once APPEND for streaming `foreachBatch` sinks — the Delta
    * `txn` pattern. Appends `df` as a new version whose manifest is the old
    * file list PLUS the new files (nothing rewritten), stamped with
    * (appId, batchId). A replay of an already-committed batchId (sink wrote,
    * crash before the streaming checkpoint advanced — the classic at-least-
    * once window; or an operator re-running a stream from an older
    * checkpoint) is detected from the stamp and SKIPPED, making the sink
    * exactly-once end to end. Writer-writer races resolve through the
    * manifest CAS: the loser re-reads (the winner may have BEEN this
    * batch's retry) and re-appends on top.
    *
    * Returns the version that CARRIES this batch — on replay, the version
    * whose manifest holds the (appId, batchId) stamp, NOT the table's
    * current version (ADVICE r5): if any later commit landed (a subsequent
    * batch, a compaction), anchoring a change feed on the replay's return
    * value would otherwise read the wrong version pair. Falls back to
    * currentVersion only when vacuum has already dropped the stamped
    * manifest, in which case no change-feed anchor for it exists anyway. */
  def appendOnce(spark: SparkSession, root: String, df: DataFrame,
                 appId: String, batchId: Long): Long = {
    var attempt = 0
    while (true) {
      if (lastTxn(spark, root, appId).exists(_ >= batchId))
        return txnVersion(spark, root, appId, batchId) // replay: already applied
          .getOrElse(currentVersion(spark, root).get)
      val target = currentVersion(spark, root)
      try {
        return target match {
          case None => commitAt(spark, root, 0L, df, Nil, Some((appId, batchId)))
          case Some(v) =>
            commitAt(spark, root, v + 1, df,
              currentEntries(spark, root, v), Some((appId, batchId)))
        }
      } catch {
        case e: ConcurrentWriteException =>
          attempt += 1
          if (attempt >= 5) throw e // loop re-checks lastTxn before retrying
      }
    }
    -1L // unreachable
  }

  /** Commit targeting an explicit version — the CAS core. A crash between
    * data write and manifest rename leaves an INVISIBLE orphan dir (readers
    * only follow manifests) which vacuum eventually sweeps; the unique
    * per-attempt token means a retry or a concurrent writer never collides
    * with it on ErrorIfExists.
    *
    * `carry` prepends existing file entries to the new manifest (the append
    * path: the new version = old files + this commit's files — no data is
    * rewritten); `txn` stamps the manifest with an (appId, batchId)
    * idempotence marker. */
  private[ops] def commitAt(spark: SparkSession, root: String, v: Long,
                            df: DataFrame,
                            carry: Seq[SnapshotStats.FileStats] = Nil,
                            txn: Option[(String, Long)] = None): Long = {
    val fs = fsOf(spark, root)
    val token = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val snapDir = new Path(root, f"snap-$v%08d-$token")
    df.write.mode(SaveMode.ErrorIfExists).parquet(snapDir.toString)
    // Harvest per-file column bounds from the just-written footers (metadata
    // reads only) so the manifest enables data skipping at read planning.
    val conf = spark.sparkContext.hadoopConfiguration
    val stats = fs.listStatus(snapDir)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.toString)
      .map(st => SnapshotStats.fromFooter(conf, st.getPath, st.getLen))
    val body = SnapshotStats.manifestJson(v, carry ++ stats.toSeq, txn)
    val mdir = new Path(root, ManifestDir)
    fs.mkdirs(mdir)
    val tmp = new Path(mdir, f".manifest-$v%08d-$token.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val dest = manifestPath(root, v)
    // CAS: Hadoop rename refuses an existing destination, so exactly one
    // writer's manifest lands for version v. The loser removes its own
    // (never the winner's) data before surfacing the conflict.
    if (fs.exists(dest) || !fs.rename(tmp, dest)) {
      fs.delete(tmp, false)
      fs.delete(snapDir, true)
      throw new ConcurrentWriteException(
        s"version $v at $root was committed by a concurrent writer")
    }
    v
  }

  /** MERGE-upsert as a new snapshot: bootstrap on first commit (S7), else
    * source-wins merge against the current version. Old snapshots stay
    * readable until vacuum. After the commit, auto-compacts when the new
    * version exceeds `maxFiles` files — without this, N tiny incremental
    * upserts accrete N × shuffle-partitions small files and scan planning
    * degrades (the classic streaming-ingest small-file problem). */
  def upsert(spark: SparkSession, root: String, source: DataFrame,
             keys: Seq[String], maxFiles: Int = 64): Long = {
    // Serializable read-merge-commit: on a writer-writer conflict the merge
    // is REDONE against the winner's version (never blind-retried — a lost
    // update would silently drop the winner's rows). Bounded attempts.
    var attempt = 0
    var committed = -1L
    var done = false
    while (!done) {
      try {
        committed = currentVersion(spark, root) match {
          case None => commit(spark, root, source)
          case Some(v) =>
            val merged = Upsert.merge(read(spark, root, Some(v)), source, keys)
              .localCheckpoint() // cut lineage: the plan must not re-read files vacuum may later drop
            commit(spark, root, merged)
        }
        done = true
      } catch {
        case e: ConcurrentWriteException =>
          attempt += 1
          if (attempt >= 3) throw e
      }
    }
    compact(spark, root, maxFiles).getOrElse(committed)
  }

  /** Incremental change feed between two versions, as the rows in files
    * ADDED after `fromVersion` (exclusive) up to `toVersion` (inclusive,
    * default current). For append-written tables (appendOnce) this is the
    * EXACT set of appended rows at file granularity — a downstream
    * incremental consumer reads only the new files, never rescans the
    * table, which is what keeps a 100 TB source → derived-table chain
    * incremental end to end. Rewrite commits (upsert/compact) replace the
    * whole file set; their "changes" are the full new snapshot, and the
    * caller should treat that as a reprocess signal, exactly as Delta's
    * change feed treats non-append commits without CDC files. */
  def changes(spark: SparkSession, root: String, fromVersion: Long,
              toVersion: Option[Long] = None): DataFrame = {
    val to = toVersion.orElse(currentVersion(spark, root))
      .getOrElse(throw new IllegalStateException(s"no committed version at $root"))
    require(fromVersion <= to, s"changes($fromVersion, $to) is inverted")
    val fs = fsOf(spark, root)
    val before = readManifest(fs, manifestPath(root, fromVersion)).toSet
    val after = readManifest(fs, manifestPath(root, to))
    val added = after.filterNot(before)
    if (added.isEmpty)
      read(spark, root, Some(to)).limit(0)
    else spark.read.parquet(added: _*)
  }

  /** Bin-pack the CURRENT snapshot into at most `maxFiles` files of roughly
    * `targetBytes` each, committed as a new version with identical rows
    * (Delta's OPTIMIZE shape: compaction is just another commit, readers of
    * older versions are undisturbed). No-op when already within bounds. */
  def compact(spark: SparkSession, root: String, maxFiles: Int = 64,
              targetBytes: Long = 128L << 20): Option[Long] =
    currentVersion(spark, root).flatMap { v =>
      val fs = fsOf(spark, root)
      val files = readManifest(fs, manifestPath(root, v))
      if (files.length <= maxFiles) None
      else {
        val totalBytes = files.map(f => fs.getFileStatus(new Path(f)).getLen).sum
        val n = math.max(1L, math.min(maxFiles.toLong,
          (totalBytes + targetBytes - 1) / targetBytes)).toInt
        // coalesce (not repartition): pure narrow bin-packing, no shuffle
        val packed = spark.read.parquet(files: _*).coalesce(n)
        Some(commit(spark, root, packed))
      }
    }

  /** Drop all snapshots and manifests older than the latest `keep` versions.
    * `keep >= 1` — vacuum(0) would delete the current version and leave the
    * table permanently unreadable (the same guard Delta's retention has). */
  def vacuum(spark: SparkSession, root: String, keep: Int = 1): Unit = {
    require(keep >= 1, s"vacuum keep must be >= 1 (got $keep)")
    val fs = fsOf(spark, root)
    val mdir = new Path(root, ManifestDir)
    if (!fs.exists(mdir)) return
    val versions = fs.listStatus(mdir).toSeq.flatMap(_.getPath.getName match {
      case ManifestRe(v) => Some(v.toLong)
      case _ => None
    }).sorted
    // Append commits make manifests SHARE data dirs (version N+1 references
    // version N's files), so deletion is reference-counted at dir
    // granularity: a dir dies only when no KEPT manifest references it.
    val live: Set[Path] = versions.takeRight(keep)
      .flatMap(v => readManifest(fs, manifestPath(root, v))
        .map(f => new Path(f).getParent)).toSet
    versions.dropRight(keep).foreach { v =>
      // Resolve the data dirs FROM the manifest (dir names carry per-attempt
      // tokens, so they can't be reconstructed from the version alone).
      readManifest(fs, manifestPath(root, v))
        .map(f => new Path(f).getParent).distinct
        .filterNot(live.contains)
        .foreach(d => fs.delete(d, true))
      fs.delete(manifestPath(root, v), false)
    }
    // Orphan sweep: losing-writer / crashed-commit dirs are invisible to
    // readers; once their target version is older than every kept manifest
    // no reader can be pinned to them — reclaim the space (skipping dirs a
    // kept append manifest still references).
    versions.takeRight(keep).headOption.foreach { minKept =>
      fs.listStatus(new Path(root)).foreach { st =>
        st.getPath.getName match {
          case SnapRe(v, _) if v.toLong < minKept && !live.contains(st.getPath) =>
            fs.delete(st.getPath, true)
          case _ => ()
        }
      }
    }
  }
}
