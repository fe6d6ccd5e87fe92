package graft.sources

import graft.ops.SnapshotTable
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}

/** Streaming CHANGE-FEED source over a [[SnapshotTable]] (VERDICT r9 #2 —
  * the Delta CDF `readStream` shape): any downstream stream can SUBSCRIBE
  * to a table's row-level changes instead of being hand-wired inside the
  * producer's foreachBatch. Offsets are table VERSIONS — the manifest log
  * IS the write-ahead log, so the source needs no state of its own: a
  * micro-batch covering (fromVersion, toVersion] is exactly
  * [[SnapshotTable.changesFeed]] over that version pair, replayable
  * verbatim after any crash because manifests and CDC side-cars are
  * immutable until vacuum.
  *
  * {{{
  *   spark.readStream.format("graft-cdf")
  *     .option("root", table)            // SnapshotTable root (required)
  *     .option("startVersion", v0)       // emit changes AFTER v0; default:
  *                                       //   the current version at start
  *                                       //   (-1 = include the bootstrap)
  *     .option("maxVersionsPerTrigger", 1) // optional batch bound
  *     .load()
  * }}}
  *
  * Rows carry the table's declared schema AT STREAM START plus
  * `_change_type` ('insert' | 'delete'; an upsert/update is a delete +
  * insert pair — retraction form, directly consumable by
  * `MvSpec.combineDelta`) and `_commit_version`. A schema evolved
  * mid-stream projects onto the start schema (new columns surface after a
  * stream restart — the streaming contract fixes the schema at plan
  * time); a pre-CDC rewrite commit fails the stream loudly (no
  * full-reprocess fallback exists mid-stream). Vacuum discipline is the
  * subscriber's SLA: retain at least as many versions as the slowest
  * subscriber lags, like any log-compacted feed.
  *
  * Trigger note: `Trigger.AvailableNow` snapshots the source's FIRST
  * getOffset as its end target, so combined with `maxVersionsPerTrigger`
  * it consumes exactly one bounded batch and stops — drive bounded
  * streams on the default trigger (`processAllAvailable` in tests, or a
  * standing query) and keep AvailableNow for the unbounded form. */
final class CdfSource(spark: SparkSession, root: String, startVersion: Long,
                      maxVersionsPerTrigger: Long) extends Source {

  private val tableSchema: StructType = CdfSource.declaredSchema(spark, root)
  // Logical -> physical mapping at stream start: renames keep their
  // physical, so one snapshot of it serves the whole stream; columns
  // re-added after start are not in tableSchema and stay invisible until
  // a restart (the streaming schema contract).
  private val tableMapping: Map[String, String] =
    SnapshotTable.columnMapping(spark, root)

  override val schema: StructType = CdfSource.feedSchema(tableSchema)

  /** Highest version any batch has been PLANNED up to — only used to
    * bound maxVersionsPerTrigger; re-learned from the engine's own offsets
    * on restart (getBatch advances it), never persisted. */
  @volatile private var planned: Long = startVersion

  private def versionOf(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[OffsetV1] = {
    val cur = SnapshotTable.currentVersion(spark, root).getOrElse(return None)
    val bounded =
      if (maxVersionsPerTrigger > 0) math.min(cur, planned + maxVersionsPerTrigger)
      else cur
    if (bounded <= startVersion) None
    else {
      planned = math.max(planned, bounded)
      Some(LongOffset(bounded))
    }
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(versionOf).getOrElse(startVersion)
    val to = versionOf(end)
    planned = math.max(planned, to) // restart: re-learn the engine's position
    CdfSource.internal(
      SnapshotTable.changesFeed(spark, root, from, to, tableSchema, tableMapping))
  }

  override def stop(): Unit = ()
}

class CdfSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdf"

  private def rootOf(params: Map[String, String]): String =
    params.getOrElse("root", throw new IllegalArgumentException(
      "graft-cdf needs option 'root' = the SnapshotTable root path"))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            params: Map[String, String]): (String, StructType) =
    (shortName(),
      CdfSource.feedSchema(CdfSource.declaredSchema(ctx.sparkSession, rootOf(params))))

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            params: Map[String, String]): Source = {
    val s = ctx.sparkSession
    val root = rootOf(params)
    val start = params.get("startVersion").map(_.trim.toLong).getOrElse(
      SnapshotTable.currentVersion(s, root).getOrElse(-1L))
    new CdfSource(s, root, start,
      params.get("maxVersionsPerTrigger").map(_.trim.toLong).getOrElse(0L))
  }
}

object CdfSource {

  private[sources] def declaredSchema(s: SparkSession, root: String): StructType =
    SnapshotTable.read(s, root).schema

  private[sources] def feedSchema(table: StructType): StructType =
    StructType(table.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))

  /** A v1 source's getBatch result must carry `isStreaming = true`
    * (MicroBatchExecution asserts it); the bridge wraps the batch plan the
    * way Spark's own v1 sources do. */
  private[sources] def internal(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.StreamingFrames.asStreaming(df)
}
