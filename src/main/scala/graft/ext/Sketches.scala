package graft.ext

import graft.Tables
import graft.ops.{GlobalWindows, Q}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Mergeable-sketch operators (the Bloom filter's siblings — GraphOps holds
  * that one). A sketch earns its place at 100 TB by being (a) CONSTANT-SIZE
  * regardless of corpus size and (b) MERGEABLE by an associative cell-wise
  * op, so the build is one map-side-combinable aggregation and the result
  * broadcasts anywhere. Both sketches here run on the engine-portable md5-60
  * base hash, so — unlike the xxhash64-seeded `approx_count_distinct`
  * estimator, which is rows-only-checkable by construction — the ENTIRE
  * sketch (hashing, cell update, estimation formula, probe) is recomputed by
  * the DuckDB oracle and sits under the driver's hash gate.
  *
  *   - Count-Min (Cormode & Muthukrishnan 2005): d=4 salted rows × w=256
  *     counters; point estimate = min over rows. The build aggregates token
  *     fan-out into ≤ d·w cells (map-side combined — the shuffle carries at
  *     most d·w rows per map partition, NOT the token stream); the probe
  *     broadcasts the ≤1024-cell sketch. Output pins the sketch's defining
  *     guarantee next to the truth: estimate ≥ true count, with overcounts
  *     only from hash collisions.
  *
  *   - HyperLogLog (Flajolet et al. 2007): m=64 registers over the md5-60
  *     hash — bucket = h mod 64, rank = leading-zero count of the remaining
  *     54 bits (via `length(bin(v))`, exact integer arithmetic in both
  *     engines — no float log2 anywhere near the registers). The register
  *     harmonic sum Σ 2^-M_j is computed EXACTLY as the integer
  *     S = Σ 2^(55-M_j) (≤ 64·2^55 < 2^63, no overflow), so the only
  *     floating-point steps are the final alpha·m²·2^55/S division and the
  *     small-range linear-counting branch — identical literal-for-literal
  *     in both engines. Registers merge by cell-wise max (associative), the
  *     property that lets 1000 executors sketch independently and combine.
  */
object Sketches {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  private val CmD = 4   // Count-Min hash rows
  private val CmW = 256L // Count-Min counters per row
  private val HllM = 64L // HyperLogLog registers

  private def toks(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(explode(TextAnalysis.tokens(col("text"))).as("tok"))

  private def cmPositions(item: org.apache.spark.sql.Column) =
    posexplode(array((0 until CmD).map(r =>
      pmod(graft.functions.Md5Hash60(concat(item, lit(s":cm$r"))), lit(CmW))): _*))
      .as(Seq("row", "pos"))

  /** Count-Min CELLS of an item stream (column `item`): one aggregation
    * keyed by (row, pos) — ≤ d·w = 1024 rows out, whatever goes in. Cells
    * MERGE by (row, pos)-wise addition, which is what lets a streaming job
    * maintain the sketch incrementally (per-batch cells + running state —
    * see the `st_sketch_countmin` twin and StreamsSpec) and lets N
    * executors sketch shards independently. */
  def cmCells(items: DataFrame): DataFrame =
    items.select(cmPositions(col("item")))
      .groupBy("row", "pos").agg(count(lit(1)).as("n"))

  /** Probe `cells` for the exact top-k items of `items`: re-hash each item,
    * min over the d rows of the broadcast sketch. inner join is safe — a
    * probed cell always exists (the item itself incremented it), which is
    * also why estimate ≥ truth. */
  def cmTopK(items: DataFrame, cells: DataFrame, k: Int): DataFrame =
    items.groupBy("item").agg(count(lit(1)).as("n_true"))
      .orderBy(desc("n_true"), asc("item")).limit(k)
      .select(col("item"), col("n_true"), cmPositions(col("item")))
      .join(broadcast(cells), Seq("row", "pos"))
      .groupBy("item", "n_true").agg(min(col("n")).as("n_est"))
      .orderBy(desc("n_true"), asc("item"))

  /** Count-Min build + top-20 heavy-hitter probe over the document tokens:
    * (token, true count, sketch estimate). */
  def countMinTopTokens(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val t = toks(s, dir).select(col("tok").as("item"))
    cmTopK(t, cmCells(t), k)
      .select(col("item").as("tok"), col("n_true"), col("n_est"))
  }

  private def cmPosSql(col: String, r: Int): String =
    s"('0x' || substr(md5($col || ':cm$r'), 1, 15))::BIGINT % $CmW"

  private val countMinOracle: String = {
    val buildRows = (0 until CmD).map(r =>
      s"SELECT $r AS row, ${cmPosSql("tok", r)} AS pos FROM t").mkString(" UNION ALL ")
    val probeRows = (0 until CmD).map(r =>
      s"SELECT tok, n_true, $r AS row, ${cmPosSql("tok", r)} AS pos FROM top")
      .mkString(" UNION ALL ")
    s"""WITH t AS (
       |  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents),
       |cells AS (
       |  SELECT row, pos, count(*) AS n FROM ($buildRows) GROUP BY row, pos),
       |top AS (
       |  SELECT tok, count(*) AS n_true FROM t GROUP BY tok
       |  ORDER BY n_true DESC, tok ASC LIMIT 20),
       |probe AS ($probeRows)
       |SELECT p.tok, p.n_true, min(c.n) AS n_est
       |FROM probe p JOIN cells c ON p.row = c.row AND p.pos = c.pos
       |GROUP BY p.tok, p.n_true
       |ORDER BY n_true DESC NULLS LAST, tok ASC NULLS FIRST""".stripMargin
  }

  /** HLL REGISTERS of an item stream (column `item`): ≤ m rows of
    * (j, register). rank = leading zeros of the 54-bit remainder + 1 =
    * 55 − bit_length(v); bin() gives exact integer bit length in both
    * engines (no float log2). Registers merge by (j)-wise MAX — the
    * associative law that lets shards/micro-batches sketch independently
    * (StreamsSpec folds a multi-batch stream and pins ≡ one-shot build). */
  def hllRegisters(items: DataFrame): DataFrame =
    items
      .select(graft.functions.Md5Hash60(concat(col("item"), lit(":hll"))).as("h"))
      .select(pmod(col("h"), lit(HllM)).as("j"), expr(s"h div $HllM").as("v"))
      .select(col("j"),
        when(col("v") === 0L, lit(55L))
          .otherwise(lit(55L) - length(bin(col("v")))).as("rank"))
      .groupBy("j").agg(max("rank").as("m"))

  /** HyperLogLog distinct-token estimate vs exact truth, one output row:
    * (n_true, v_zero registers, hll_est). */
  def hllDistinctTokens(s: SparkSession, dir: String): DataFrame = {
    val regs = hllRegisters(toks(s, dir).select(col("tok").as("item")))
    // All m registers participate in the harmonic sum — unseen ones at M=0.
    val full = s.range(HllM).select(col("id").as("j"))
      .join(regs, Seq("j"), "left")
      .select(coalesce(col("m"), lit(0L)).as("m"))
    // Exact integer harmonic sum: S = Σ 2^(55-M_j); Σ 2^-M = S / 2^55.
    val sums = full.agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - m AS INT))")).as("sint"),
      sum(when(col("m") === 0L, 1L).otherwise(0L)).as("v_zero"))
    val truth = toks(s, dir).agg(countDistinct(col("tok")).as("n_true"))
    // alpha_64 · m² · 2^55 / S, with the standard small-range linear
    // counting correction (E ≤ 2.5m and empty registers present).
    truth.crossJoin(broadcast(sums))
      .select(col("n_true"), col("v_zero"),
        round(
          when((lit(0.709d) * lit(4096.0d) * lit(36028797018963968.0d)
              / col("sint").cast("double")) <= 160.0d && col("v_zero") > 0L,
            lit(64.0d) * log(lit(64.0d) / col("v_zero").cast("double")))
          .otherwise(lit(0.709d) * lit(4096.0d) * lit(36028797018963968.0d)
              / col("sint").cast("double")), 6).as("hll_est"))
  }

  private val hllOracle: String =
    s"""WITH t AS (
       |  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents),
       |h AS (
       |  SELECT ('0x' || substr(md5(tok || ':hll'), 1, 15))::BIGINT AS h FROM t),
       |r AS (
       |  SELECT h % $HllM AS j,
       |    CASE WHEN h // $HllM = 0 THEN 55
       |         ELSE 55 - length(bin(h // $HllM)) END AS rank
       |  FROM h),
       |regs AS (SELECT j, max(rank) AS m FROM r GROUP BY j),
       |full_regs AS (
       |  SELECT coalesce(regs.m, 0) AS m
       |  FROM generate_series(0, ${HllM - 1}) AS g(j)
       |  LEFT JOIN regs ON g.j = regs.j),
       |s AS (
       |  SELECT CAST(sum(CAST(1 AS BIGINT) << CAST(55 - m AS INTEGER)) AS BIGINT) AS sint,
       |    CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero
       |  FROM full_regs),
       |truth AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS n_true FROM t)
       |SELECT n_true, v_zero,
       |  round(CASE WHEN CAST(0.709 AS DOUBLE) * 4096.0 * 36028797018963968.0
       |                 / CAST(sint AS DOUBLE) <= 160.0
       |               AND v_zero > 0
       |        THEN 64.0 * ln(64.0 / CAST(v_zero AS DOUBLE))
       |        ELSE CAST(0.709 AS DOUBLE) * 4096.0 * 36028797018963968.0
       |                 / CAST(sint AS DOUBLE) END, 6)
       |    AS hll_est
       |FROM truth, s""".stripMargin

  /** Equi-width HISTOGRAM QUANTILES — the sketch-family answer to
    * percentiles (membership = Bloom, frequency = Count-Min, cardinality =
    * HLL, quantiles = histogram): 256 fixed-width bins over [min, max],
    * estimate = linear interpolation inside the target bin. Two passes
    * (bounds, then counts) but each is a constant-width aggregate, the bin
    * table is ≤256 rows (broadcast everywhere, cumulated by a broadcast
    * self-join — no SinglePartition window), and counts MERGE by cell-wise
    * addition once bin edges are shared — unlike the exact `percentile`,
    * whose per-group sorted-buffer state grows with the data. Output pins
    * the estimate against the exact interpolated percentile; the error
    * bound is one bin width. */
  def histQuantiles(s: SparkSession, dir: String): DataFrame = {
    val x = Tables(s, dir, "lineitem").select(col("l_extendedprice").as("x"))
    // Exact interpolated percentiles WITHOUT the built-in `percentile`
    // aggregate: that one funnels every value into a single final buffer
    // (5.4 s at sf0.1 — it was the whole query's cost, and it is exactly
    // the single-task reduction this engine bans elsewhere). Instead:
    // bucketed GLOBAL RANK (parallel sort, no SinglePartition), pick the
    // two bracketing order statistics per q, and interpolate with the SAME
    // formula Spark's Percentile uses — lower + (higher − lower)·(pos −
    // floor(pos)), pos = q·(n−1) — which is the established quantile_cont
    // parity. Ties order arbitrarily under row_number, but equal values
    // make the picked order statistic well-defined regardless.
    val ranked = GlobalWindows.withBucketedGlobalRank(
      x, floor(col("x") / 512.0d).cast("long"), "rn", col("x"))
    val nRow = x.agg(count(lit(1)).as("n"))
    val qpos = nRow.select(
        explode(array(lit(0.5d), lit(0.9d), lit(0.99d))).as("q"), col("n"))
      .withColumn("pos", col("q") * (col("n") - lit(1L)).cast("double"))
      .withColumn("lo_i", floor(col("pos")).cast("long"))
    val exact = qpos
      .join(ranked.select(col("rn").as("r1"), col("x").as("v1")),
        col("r1") === col("lo_i") + 1L)
      .join(ranked.select(col("rn").as("r2"), col("x").as("v2")),
        col("r2") === col("lo_i") + 2L, "left")
      .select(col("q"),
        round(col("v1") + (coalesce(col("v2"), col("v1")) - col("v1"))
          * (col("pos") - col("lo_i").cast("double")), 6).as("exact"))
    val mm = x.agg(min("x").as("lo"), max("x").as("hi"), count(lit(1)).as("n"))
      .crossJoin(broadcast(exact.groupBy().pivot("q", Seq(0.5d, 0.9d, 0.99d))
        .agg(first("exact"))
        .toDF("e50", "e90", "e99")))
    // Zero-width guard: a constant column (hi = lo) would divide by zero —
    // Spark (non-ANSI) yields NULL where DuckDB yields IEEE inf, the exact
    // engine divergence momentFinal guards against. Degenerate input maps
    // every value to bin 0 and the estimate to lo directly, mirrored
    // verbatim in the oracle text.
    val bins = x.crossJoin(broadcast(mm.select("lo", "hi")))
      .select(expr("CASE WHEN hi = lo THEN CAST(0 AS BIGINT) ELSE " +
        "CAST(least(floor((x - lo) / ((hi - lo) / 256.0)), 255.0) AS BIGINT) END").as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
    val cum = bins.toDF("b", "c")
      .join(broadcast(bins.toDF("b2", "c2")), col("b2") <= col("b"))
      .groupBy("b", "c").agg(sum("c2").as("cum"))
    val quants = mm.select(
      explode(array(lit(0.5d), lit(0.9d), lit(0.99d))).as("q"),
      col("lo"), col("hi"), col("n"), col("e50"), col("e90"), col("e99"))
    val tgtb = quants.join(broadcast(cum), col("cum") >= col("q") * col("n"))
      .groupBy("q", "lo", "hi", "n", "e50", "e90", "e99").agg(min("b").as("b"))
    tgtb.join(broadcast(cum), Seq("b"))
      .select(col("q"),
        round(expr("CASE WHEN hi = lo THEN lo ELSE " +
          "lo + ((hi - lo) / 256.0) * (b + (q * n - (cum - c)) / c) END"), 6)
          .as("est"),
        when(col("q") === 0.5d, col("e50"))
          .when(col("q") === 0.9d, col("e90"))
          .otherwise(col("e99")).as("exact"))
      .orderBy("q")
  }

  private val histQuantilesOracle: String =
    s"""WITH x AS (SELECT l_extendedprice AS x FROM lineitem),
       |mm AS (SELECT min(x) AS lo, max(x) AS hi, count(*) AS n,
       |         round(quantile_cont(x, 0.5), 6) AS e50,
       |         round(quantile_cont(x, 0.9), 6) AS e90,
       |         round(quantile_cont(x, 0.99), 6) AS e99
       |       FROM x),
       |bins AS (SELECT CASE WHEN hi = lo THEN CAST(0 AS BIGINT) ELSE
       |             CAST(least(floor((x - lo) / ((hi - lo) / 256.0)), 255.0) AS BIGINT) END AS b,
       |           count(*) AS c
       |         FROM x, mm GROUP BY 1),
       |cum AS (SELECT a.b, a.c, CAST(sum(y.c2) AS BIGINT) AS cum
       |        FROM bins a JOIN (SELECT b AS b2, c AS c2 FROM bins) y ON y.b2 <= a.b
       |        GROUP BY a.b, a.c),
       |quants AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q,
       |             lo, hi, n, e50, e90, e99 FROM mm),
       |tgtb AS (SELECT q, lo, hi, n, e50, e90, e99, min(b) AS b
       |         FROM quants JOIN cum ON cum >= q * n
       |         GROUP BY q, lo, hi, n, e50, e90, e99)
       |SELECT q,
       |  round(CASE WHEN hi = lo THEN lo ELSE
       |    lo + ((hi - lo) / 256.0) * (b + (q * n - (cum - c)) / c) END, 6) AS est,
       |  CASE WHEN q = 0.5 THEN e50 WHEN q = 0.9 THEN e90 ELSE e99 END AS exact
       |FROM tgtb JOIN cum USING (b)
       |ORDER BY q ASC NULLS FIRST""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("x_sketch_countmin",
      (s, dir) => countMinTopTokens(s, dir),
      Some(countMinOracle)),
    Q("x_sketch_hll_md5",
      (s, dir) => hllDistinctTokens(s, dir),
      Some(hllOracle)),
    Q("x_sketch_quantile_hist",
      (s, dir) => histQuantiles(s, dir),
      Some(histQuantilesOracle)))
}
