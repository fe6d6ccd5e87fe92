package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSourceV2 source modeling the reference's paginated REST ticket API
  * (SURVEY.md §2.1 S2; /root/reference/main.py:124-177): `limit`/`page`
  * cursor, newest-first order, hard page cap.
  *
  * Spark-first mapping: **one input partition per page** — the thread-pool
  * page fetcher (max_workers=10, main.py:437) becomes executor-task
  * parallelism, and the `page <= 20` early stop (main.py:134) becomes
  * `SupportsPushDownLimit` (a LIMIT in the query plans fewer pages — the
  * fetch never happens instead of being fetched-then-discarded).
  *
  * Offline, rows are synthesized deterministically per (page, offset); on a
  * live deployment `PageReader.fetch` is the HTTP GET — partition planning,
  * schema and pushdown stay identical.
  */
class PaginatedTicketSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "ticket-pages"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PaginatedTicketSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagesTable(
      pages = Option(properties.get("pages")).map(_.toInt).getOrElse(20),
      pageSize = Option(properties.get("pagesize"))
        .orElse(Option(properties.get("pageSize"))) // getTable keeps option case
        .map(_.toInt).getOrElse(100),
      failEvery = Option(properties.get("failevery"))
        .orElse(Option(properties.get("failEvery")))
        .map(_.toInt).getOrElse(0))
}

/** Driver-visible metric: item-level fetch failures, summed across tasks —
  * the success/failed tally the reference logs (main.py:186-194, 449-453),
  * surfaced the DataSourceV2 way (SQL-metrics pane / listener bus) instead
  * of a driver-side counter. */
class FetchFailureMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "fetchFailed"
  override def description(): String = "item fetch failures (rows dropped)"
}

object PaginatedTicketSource {
  val schema: StructType = StructType(Seq(
    StructField("_id", StringType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("createdTimestamp", LongType, nullable = false),
    StructField("subject", StringType, nullable = false)))

  /** Deterministic synthetic "API response" row for (page, i). */
  def row(page: Int, pageSize: Int, i: Int): (String, Int, Long, String) = {
    val global = page * pageSize + i
    (f"T$global%06d", page,
      1700000000L - global * 60L, // newest-first, like sortBy=createdOn desc
      s"Ticket <b>$global</b> &amp; update")
  }
}

class PagesTable(pages: Int, pageSize: Int, failEvery: Int = 0)
    extends Table with SupportsRead {
  override def name(): String = s"ticket_pages($pages x $pageSize)"
  override def schema(): StructType = PaginatedTicketSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagesScanBuilder(pages, pageSize, failEvery)
}

class PagesScanBuilder(var pages: Int, pageSize: Int, failEvery: Int = 0)
    extends ScanBuilder with SupportsPushDownLimit
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = PaginatedTicketSource.schema
  private var pageLo = 0                // inclusive
  private var pageHi = Int.MaxValue     // exclusive
  private var tsLo = Long.MinValue      // inclusive
  private var tsHi = Long.MaxValue      // inclusive
  private var accepted: Array[Filter] = Array.empty
  /** LIMIT n ⇒ plan only ceil(n / pageSize) pages — the page-cap early stop. */
  override def pushLimit(limit: Int): Boolean = {
    pages = math.min(pages, (limit + pageSize - 1) / pageSize)
    true // partial: Spark still applies the exact limit on top
  }
  /** Column pruning: a projection-only query ships only those fields off the
    * "API" (the live analogue: a fields= query parameter). */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Filter pushdown (P5 — the reference ships predicates as API query
    * params, main.py:138-141). `page` bounds prune whole INPUT PARTITIONS —
    * the page is never fetched; `createdTimestamp` bounds filter inside the
    * reader (the live analogue: createdOnMin/Max params). Every filter is
    * also returned as residual, so Spark re-applies it — pushdown is purely
    * an I/O optimization and can never change results. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter {
      case EqualTo("page", v: Int) =>
        pageLo = math.max(pageLo, v); pageHi = math.min(pageHi, v + 1); true
      case GreaterThan("page", v: Int) => pageLo = math.max(pageLo, v + 1); true
      case GreaterThanOrEqual("page", v: Int) => pageLo = math.max(pageLo, v); true
      case LessThan("page", v: Int) => pageHi = math.min(pageHi, v); true
      case LessThanOrEqual("page", v: Int) => pageHi = math.min(pageHi, v + 1); true
      case EqualTo("createdTimestamp", v: Long) =>
        tsLo = math.max(tsLo, v); tsHi = math.min(tsHi, v); true
      case GreaterThan("createdTimestamp", v: Long) => tsLo = math.max(tsLo, v + 1); true
      case GreaterThanOrEqual("createdTimestamp", v: Long) => tsLo = math.max(tsLo, v); true
      case LessThan("createdTimestamp", v: Long) => tsHi = math.min(tsHi, v - 1); true
      case LessThanOrEqual("createdTimestamp", v: Long) => tsHi = math.min(tsHi, v); true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def build(): Scan =
    new PagesScan(math.max(0, pageLo), math.min(pages, pageHi), pageSize,
      required, tsLo, tsHi, failEvery)
}

case class PagePartition(page: Int, pageSize: Int) extends InputPartition

class PagesScan(pageLo: Int, pageHi: Int, pageSize: Int, required: StructType,
                tsLo: Long, tsHi: Long, failEvery: Int = 0) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new FetchFailureMetric)
  override def planInputPartitions(): Array[InputPartition] =
    (pageLo until pageHi).map(p => PagePartition(p, pageSize): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = {
    val fieldNames = required.fieldNames
    val (lo, hi, fe) = (tsLo, tsHi, failEvery)
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[PagePartition]
      new PageReader(p.page, p.pageSize, fieldNames, lo, hi, fe)
    }
  }
}

/** Reads one page, emitting only the pruned columns and only rows inside the
  * pushed createdTimestamp bounds. On a live system `next()` walks the HTTP
  * response items (30 s timeout, null-on-error per main.py:186-194); here it
  * synthesizes. Item-level fetch failures (modeled by `failEvery` — every
  * Nth item's detail fetch "errors") follow the reference's contract: the
  * row is DROPPED, never poisons the batch, and the drop is tallied
  * (main.py:449-453) via the task metric. */
class PageReader(page: Int, pageSize: Int, fields: Array[String],
                 tsLo: Long, tsHi: Long, failEvery: Int = 0)
    extends PartitionReader[InternalRow] {
  private var i = -1
  private var failed = 0L
  private def fetchFails(i: Int): Boolean =
    failEvery > 0 && (page * pageSize + i) % failEvery == failEvery - 1
  override def next(): Boolean = {
    i += 1
    while (i < pageSize && {
      if (fetchFails(i)) { failed += 1; true }
      else {
        val ts = PaginatedTicketSource.row(page, pageSize, i)._3
        ts < tsLo || ts > tsHi
      }
    }) i += 1
    i < pageSize
  }
  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(new org.apache.spark.sql.connector.metric.CustomTaskMetric {
      override def name(): String = "fetchFailed"
      override def value(): Long = failed
    })
  override def get(): InternalRow = {
    val (id, pg, ts, subj) = PaginatedTicketSource.row(page, pageSize, i)
    InternalRow.fromSeq(fields.toIndexedSeq.map {
      case "_id" => UTF8String.fromString(id)
      case "page" => pg
      case "createdTimestamp" => ts
      case "subject" => UTF8String.fromString(subj)
    })
  }
  override def close(): Unit = ()
}
