package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.SnapshotStats.{ColStats, FileStats}

/** Planning-time data skipping for [[SnapshotTable]] reads.
  *
  * Spark's `FileSourceStrategy` hands every file-based scan's pushed data
  * filters to its [[FileIndex.listFiles]]; the default index ignores them
  * (they only prune at row-group level inside each opened file). This index
  * evaluates them against the per-file (min, max, nullCount) bounds the
  * manifest already carries, so files a predicate cannot match are dropped
  * from the plan itself — the user writes a plain `.filter(...)` and never
  * names a file. This is the FileIndex seam Delta/Iceberg use for the same
  * job; everything here goes through the stable `listFiles` contract, no
  * physical-plan surgery.
  *
  * Semantics: `mightMatch` is a MAY-analysis — `false` is only returned
  * when NO row in the file can satisfy the predicate, assuming the manifest
  * bounds are true bounds (parquet footer stats, folded by
  * [[SnapshotStats]]). Unknown columns, unsupported expressions, casts,
  * UDFs, missing bounds all yield `true` (keep). The pruned predicate is
  * STILL evaluated row-wise by the scan (Spark keeps data filters on the
  * FilterExec above the scan and inside the parquet reader), so a too-loose
  * analysis costs I/O, never correctness.
  *
  * String bounds compare as UTF-8 bytes (unsigned), matching both parquet's
  * unsigned binary stats order and `UTF8String`'s binary comparison — java
  * `String.compareTo` would disagree above the BMP and mis-prune.
  */
final class SnapshotFileIndex(
    spark: SparkSession,
    root: Path,
    stats: Seq[FileStats]) extends FileIndex {

  private val statuses: Seq[FileStatus] =
    stats.map(s => new FileStatus(s.bytes, false, 1, 128L << 20, 0L, new Path(s.path)))
  private val byPath: Map[String, FileStats] = stats.map(s => s.path -> s).toMap

  /** Files surviving the last `listFiles` — observability for specs/logs. */
  @volatile var lastSelected: Int = -1
  def totalFiles: Int = statuses.length

  override def rootPaths: Seq[Path] = Seq(root)
  override def partitionSchema: StructType = StructType(Nil)
  override def sizeInBytes: Long = stats.map(_.bytes).sum
  override def inputFiles: Array[String] = stats.map(_.path).toArray
  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // The SESSION's Hadoop configuration reaches the bloom side-car opens
    // (ADVICE r9): a fresh Configuration() lacks the filesystem credentials
    // (S3A keys, kerberos) the session carries, so every open would throw,
    // be swallowed, and silently degrade bloom pruning to keep-all.
    val conf = spark.sparkContext.hadoopConfiguration
    val kept = statuses.filter { st =>
      byPath.get(st.getPath.toString).forall(f =>
        dataFilters.forall(SnapshotPruning.mightMatch(_, f, conf)))
    }
    lastSelected = kept.length
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }
}

private[ops] object SnapshotPruning {

  /** Can any row of a file with stats `f` satisfy `e`? (MAY-analysis.)
    * `conf` is the session's Hadoop configuration, used to open bloom
    * side-car files on filesystems that need configured credentials. */
  def mightMatch(e: Expression, f: FileStats, conf: org.apache.hadoop.conf.Configuration): Boolean = e match {
    case And(l, r) => mightMatch(l, f, conf) && mightMatch(r, f, conf)
    case Or(l, r) => mightMatch(l, f, conf) || mightMatch(r, f, conf)

    case EqualTo(a: AttributeReference, Literal(v, _)) => cmpPossible(f, a.name, v, "eq", conf)
    case EqualTo(Literal(v, _), a: AttributeReference) => cmpPossible(f, a.name, v, "eq", conf)
    case EqualNullSafe(a: AttributeReference, Literal(v, _)) =>
      if (v == null) hasNulls(f, a.name) else cmpPossible(f, a.name, v, "eq", conf)
    case EqualNullSafe(Literal(v, _), a: AttributeReference) =>
      if (v == null) hasNulls(f, a.name) else cmpPossible(f, a.name, v, "eq", conf)
    case LessThan(a: AttributeReference, Literal(v, _)) => cmpPossible(f, a.name, v, "lt", conf)
    case LessThan(Literal(v, _), a: AttributeReference) => cmpPossible(f, a.name, v, "gt", conf)
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => cmpPossible(f, a.name, v, "le", conf)
    case LessThanOrEqual(Literal(v, _), a: AttributeReference) => cmpPossible(f, a.name, v, "ge", conf)
    case GreaterThan(a: AttributeReference, Literal(v, _)) => cmpPossible(f, a.name, v, "gt", conf)
    case GreaterThan(Literal(v, _), a: AttributeReference) => cmpPossible(f, a.name, v, "lt", conf)
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => cmpPossible(f, a.name, v, "ge", conf)
    case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) => cmpPossible(f, a.name, v, "le", conf)

    case In(a: AttributeReference, list) if list.forall(_.isInstanceOf[Literal]) =>
      list.exists { case Literal(v, _) => v != null && cmpPossible(f, a.name, v, "eq", conf) }
    case InSet(a: AttributeReference, hset) if hset.size <= 10000 =>
      hset.exists(v => v != null && cmpPossible(f, a.name, v, "eq", conf))

    case IsNull(a: AttributeReference) => hasNulls(f, a.name)
    case IsNotNull(a: AttributeReference) => hasNonNulls(f, a.name)
    case Not(IsNull(a: AttributeReference)) => hasNonNulls(f, a.name)
    case Not(IsNotNull(a: AttributeReference)) => hasNulls(f, a.name)

    case StartsWith(a: AttributeReference, Literal(p: UTF8String, _)) =>
      prefixPossible(f, a.name, p.toString)

    case _ => true // unsupported shape: never prune on it
  }

  private def statsFor(f: FileStats, col: String): Option[ColStats] =
    f.cols.get(col).orElse {
      // Spark analysis may change attribute case; the resolver is
      // case-insensitive by default, so fall back accordingly.
      f.cols.collectFirst { case (k, v) if k.equalsIgnoreCase(col) => v }
    }

  private def hasNulls(f: FileStats, col: String): Boolean =
    statsFor(f, col).forall(c => c.nulls != 0L)

  private def hasNonNulls(f: FileStats, col: String): Boolean =
    statsFor(f, col).forall(c => c.nulls == -1L || f.rows == 0L || c.nulls < f.rows)

  /** Is `attr <op> v` satisfiable inside [min, max] (and, for equality,
    * inside the file's bloom filter when one was committed)? */
  private def cmpPossible(f: FileStats, col: String, v: Any, op: String,
                          conf: org.apache.hadoop.conf.Configuration): Boolean =
    statsFor(f, col) match {
      case None => true
      case Some(c) =>
        // All-null file: every comparison is NULL, the filter cannot pass.
        if (c.nulls >= 0 && f.rows > 0 && c.nulls == f.rows) false
        else (c.min, c.max, litToDomain(v, c.kind)) match {
          case (Some(mn), Some(mx), Some(d)) => op match {
            case "eq" => cmp(mn, d, c.kind) <= 0 && cmp(mx, d, c.kind) >= 0 &&
              bloomMightContain(f, col, d, conf)
            case "lt" => cmp(mn, d, c.kind) < 0
            case "le" => cmp(mn, d, c.kind) <= 0
            case "gt" => cmp(mx, d, c.kind) > 0
            case "ge" => cmp(mx, d, c.kind) >= 0
            case _ => true
          }
          // Bounds may be absent (truncated binary stats) while the bloom
          // is not — equality can still prune on the bloom alone.
          case (_, _, Some(d)) if op == "eq" => bloomMightContain(f, col, d, conf)
          case _ => true
        }
    }

  // Deserialized-bloom cache: manifests are re-parsed per read, but the
  // base64 payload for a given (immutable file, column) never changes.
  // Bounded sweep keeps a long-lived JVM (tests, notebooks) from pinning
  // every table it ever read.
  private val bloomCache =
    new scala.collection.concurrent.TrieMap[(String, String),
      org.apache.spark.util.sketch.BloomFilter]()

  /** MAY a row of this file hold `d` for `col`, per its committed bloom?
    * No bloom (pre-config file, unsupported type) → keep; an unreadable
    * side-car also keeps (pruning is never a correctness dependency). ~1%
    * false positives cost I/O only — the scan re-filters rows. */
  private def bloomMightContain(f: FileStats, col: String, d: Any,
                                conf: org.apache.hadoop.conf.Configuration): Boolean = {
    val ref = f.bloom.get(col).orElse(
      f.bloom.collectFirst { case (k, b) if k.equalsIgnoreCase(col) => b })
    ref match {
      case None => true
      case Some(payload) =>
        if (bloomCache.size > 8192) bloomCache.clear()
        val loaded = scala.util.Try {
          bloomCache.getOrElseUpdate((f.path, col), {
            // Side-car path (the committed layout) or inline base64 (the
            // degenerate fallback — payload without a path separator).
            val in: java.io.InputStream =
              if (payload.contains('/')) {
                val p = new Path(payload)
                p.getFileSystem(conf).open(p)
              } else new java.io.ByteArrayInputStream(
                java.util.Base64.getDecoder.decode(payload))
            try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
            finally in.close()
          })
        }
        loaded match {
          case scala.util.Failure(_) => true
          case scala.util.Success(bf) => d match {
            // Build side (DataFrameStatFunctions.bloomFilter) puts integral
            // columns as longs and strings as UTF-8 bytes; mirror it exactly.
            case l: Long => bf.mightContainLong(l)
            case s: String => bf.mightContainString(s)
            case _ => true
          }
        }
    }
  }

  /** `attr LIKE 'p%'`: some string with prefix p can live in [min, max]
    * iff max >= p and min < succ(p) (p with its last non-0xFF byte
    * incremented — the least upper bound of the prefix range in byte
    * order; all-0xFF prefixes have no finite bound, lower check only). */
  private def prefixPossible(f: FileStats, col: String, p: String): Boolean =
    statsFor(f, col) match {
      case Some(c) if c.kind == "string" =>
        if (c.nulls >= 0 && f.rows > 0 && c.nulls == f.rows) false
        else (c.min, c.max) match {
          case (Some(mn: String), Some(mx: String)) =>
            val pb = p.getBytes(StandardCharsets.UTF_8)
            val upperOk = cmpBytes(mx.getBytes(StandardCharsets.UTF_8), pb) >= 0
            val lowerOk = succ(pb) match {
              case Some(s) => cmpBytes(mn.getBytes(StandardCharsets.UTF_8), s) < 0
              case None => true
            }
            upperOk && lowerOk
          case _ => true
        }
      case _ => true
    }

  private def succ(b: Array[Byte]): Option[Array[Byte]] = {
    val out = b.clone()
    var i = out.length - 1
    while (i >= 0 && out(i) == -1) i -= 1
    if (i < 0) None
    else { out(i) = (out(i) + 1).toByte; Some(out.take(i + 1)) }
  }

  /** Catalyst literal (internal representation) → stats domain value. */
  private def litToDomain(v: Any, kind: String): Option[Any] = (kind, v) match {
    case (_, null) => None
    case ("long", i: Int) => Some(i.toLong)
    case ("long", l: Long) => Some(l)
    case ("long", s: Short) => Some(s.toLong)
    case ("long", b: Byte) => Some(b.toLong)
    case ("long", b: Boolean) => Some(if (b) 1L else 0L)
    case ("double", d: Double) => if (d.isNaN) None else Some(d)
    case ("double", f: Float) => if (f.isNaN) None else Some(f.toDouble)
    case ("string", u: UTF8String) => Some(u.toString)
    case ("string", s: String) => Some(s)
    // Int-backed decimal bounds: align the literal onto the COLUMN's
    // scale exactly (setScale without rounding — a literal needing
    // rounding, or overflowing long, degrades to keep).
    case (k, d: org.apache.spark.sql.types.Decimal) if k.startsWith("dec:") =>
      try Some(d.toJavaBigDecimal
        .setScale(k.drop(4).toInt).unscaledValue.longValueExact)
      catch { case _: ArithmeticException => None }
    case _ => None
  }

  private def cmp(a: Any, b: Any, kind: String): Int = kind match {
    case "long" => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case k if k.startsWith("dec:") =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case "double" => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case _ => cmpBytes(a.asInstanceOf[String].getBytes(StandardCharsets.UTF_8),
                       b.asInstanceOf[String].getBytes(StandardCharsets.UTF_8))
  }

  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }
}
