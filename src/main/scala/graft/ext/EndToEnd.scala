package graft.ext

import graft.Tables
import graft.functions.Md5Hash60
import graft.ops.{GlobalWindows, Q}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The full crawl → training-corpus pipeline composed END TO END (VERDICT r7
  * #3): every stage is an operator that is individually registered and
  * oracle-green elsewhere in the inventory, chained here the way a
  * production data-prep run chains them —
  *
  *   1. ingest gate        — non-null text, 5 ≤ tokens ≤ 2000 (reference
  *                           `main.py` cleans before loading; the length
  *                           gate is the corpus-prep rule filter)
  *   2. exact dedup        — min-doc_id representative per sha256(text)
  *   3. near dedup         — bounded-window exact n-gram Jaccard ≥ 0.5,
  *                           larger-id member of every verified pair drops
  *   4. ExactSubstr clean  — per-doc kept-token counts after removing
  *                           corpus-duplicated 8-gram spans (Lee et al. 2022)
  *   5. quality + decontamination
  *                         — novelty ≥ 0.5 (drop boilerplate carriers) and
  *                           drop docs leaking ≥ 5 distinct 3-grams into the
  *                           held-out eval set (docs 0–9), which is itself
  *                           excluded
  *   6. mixture allocation — α=0.5 temperature share_ppm per source over
  *                           the CURATED token counts (integer-exact)
  *   7. split assignment   — md5 holdout buckets, 80/10/10
  *   8. curriculum + packing
  *                         — per-split curriculum order (length-bucket, then
  *                           id) and greedy 512-token bin assignment via the
  *                           bucketed global prefix sum (never a
  *                           SinglePartition window)
  *
  * One declarative plan: stages are subplans, not materialized tables, so
  * Catalyst prunes columns through the whole DAG and the only shuffles are
  * the ones each stage owns. The report is per (split, source): docs, kept
  * tokens, mixture share, and how many training bins the slice touches.
  * [[graft.ScaleRehearsal]] runs the same chain stage-BY-stage over
  * SnapshotTable manifests at 21× to show total wall ≈ Σ stages (the
  * artifact-chain production story); this query is the hash-gated twin.
  *
  * Reference: HiZweli2/Data-pipeline-Bigquery-to-sftp-server main.py:245-331
  * (clean → reshape → load is its whole pipeline; this is that contract at
  * training-corpus scale). */
object EndToEnd {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Stage 1 — ingest gate. */
  def ingestGate(d: DataFrame): DataFrame = d
    .withColumn("n_toks", size(TextAnalysis.tokens(col("text"))).cast("long"))
    .filter(col("n_toks").between(5L, 2000L))
    .select("doc_id", "source", "text")

  /** Stage 2 — exact dedup: min-id representative per content hash. */
  def exactDedup(gate: DataFrame): DataFrame = {
    val exw = Window.partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id").asc)
    gate.withColumn("rn", row_number().over(exw)).filter(col("rn") === 1).drop("rn")
  }

  /** Stage 3 — near dedup over exact survivors: the verified bounded-window
    * edges; the larger id of every pair drops (chain-keep: at least one
    * member of every dup chain survives). */
  def nearDedup(ex: DataFrame): DataFrame = {
    val drops = Dedup.ngramJaccardEdges(ex)
      .select(col("b").as("doc_id")).distinct()
    ex.join(drops, Seq("doc_id"), "left_anti")
  }

  /** Stages 4+5 — ExactSubstr cleaning + novelty and decontamination gates
    * over the dedup survivors `nd` (doc_id, source, text). Span and novelty
    * statistics derive from the SURVIVOR set, not the raw corpus: over a
    * pre-dedup corpus every member of a duplicate group scores novelty ≈ 0
    * and every position is a "duplicated" span, so corpus-wide stats would
    * re-destroy exactly what stages 2–3 just cleaned (measured: the 21×
    * rehearsal curated 0 of 4,993 survivors until this ordering). The
    * decontamination bench set is the RAW eval docs (0–9) — leakage is
    * checked against what the benchmark contains, not what survived.
    * Returns the curated (doc_id, source, kept_toks). */
  def curate(s: SparkSession, dir: String, nd: DataFrame): DataFrame = {
    val kept = CorpusOps.spanRemovalOf(nd).select("doc_id", "kept_toks")
    val nov = CorpusOps.noveltyScoresOf(nd).select("doc_id", "novelty_ppm")
    val bench = docs(s, dir).filter(col("doc_id") < 10)
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("shash", graft.functions.ShingleHashes(col("toks"), 3))
      .select(explode_outer(col("shash")).as("h")).distinct()
    val ndSh = nd
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("shash", graft.functions.ShingleHashes(col("toks"), 3))
      .select(col("doc_id"), explode_outer(col("shash")).as("h"))
    val contam = ndSh.filter(col("doc_id") >= 10)
      .join(broadcast(bench), "h")
      .groupBy("doc_id").agg(countDistinct(col("h")).as("n_shared"))
      .filter(col("n_shared") >= 5).select("doc_id")
    nd.filter(col("doc_id") >= 10) // the eval set never trains
      .join(kept, "doc_id")
      .join(nov, "doc_id")
      .filter(col("novelty_ppm") >= 500000L)
      .join(contam, Seq("doc_id"), "left_anti")
      .select("doc_id", "source", "kept_toks")
  }

  /** Stage 6 — mixture allocation over the curated corpus (integer-exact
    * ppm): (source, share_ppm). */
  def mixtureShares(qual: DataFrame): DataFrame = {
    val per = qual.groupBy("source")
      .agg(sum(col("kept_toks")).as("toks"))
      .withColumn("weight_milli",
        expr("CAST(floor(sqrt(CAST(toks AS DOUBLE)) * 1000) AS BIGINT)"))
    val tot = per.agg(sum(col("weight_milli")).as("tw"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), expr("weight_milli * 1000000L div tw").as("share_ppm"))
  }

  /** Stages 7+8 — split assignment (md5 holdout buckets) + curriculum +
    * packing. Curriculum order inside each split: length bucket (64-token
    * bands, short-to-long) then doc_id; bins are 512-token greedy prefixes
    * in that order. The global prefix sum runs over (split_idx, diff,
    * doc_id) with a monotone composite bucket — per-split cumulative =
    * global − lower-split totals (3-row broadcast), so no split-wide window
    * partition. Returns per-doc (doc_id, source, kept_toks, split, bin_id). */
  def splitAndPack(qual: DataFrame): DataFrame = {
    val sp = qual
      .withColumn("b100", pmod(Md5Hash60(
        concat(col("doc_id").cast("string"), lit(":split"))), lit(100L)))
      .withColumn("split",
        when(col("b100") < 80, "train").when(col("b100") < 90, "val")
          .otherwise("test"))
      .withColumn("split_idx",
        when(col("split") === "train", 0L).when(col("split") === "val", 1L)
          .otherwise(2L))
      .withColumn("diff", floor(col("kept_toks") / 64).cast("long"))
      .drop("b100")
      .localCheckpoint() // skinny (6 cols); feeds the prefix sum 3× + totals
    val cum = GlobalWindows.withBucketedPrefixSum(sp,
      col("split_idx") * 1000000L + col("diff"), col("kept_toks"), "cum",
      col("split_idx"), col("diff"), col("doc_id"))
    val tots = sp.groupBy("split_idx").agg(sum(col("kept_toks")).as("t"))
    val offs = tots.as("x")
      .join(broadcast(tots.as("y")), col("y.split_idx") < col("x.split_idx"), "left")
      .groupBy(col("x.split_idx").as("split_idx"))
      .agg(coalesce(sum(col("y.t")), lit(0L)).as("soff"))
    cum.join(broadcast(offs), "split_idx")
      .withColumn("bin_id",
        floor((col("cum") - col("soff") - col("kept_toks")) / 512).cast("long"))
      .select("doc_id", "source", "kept_toks", "split", "bin_id")
  }

  /** Final report from the packed table + mixture shares. */
  def report(pk: DataFrame, shr: DataFrame): DataFrame =
    pk.join(broadcast(shr), "source")
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("kept_toks")).as("toks_kept"),
        max(col("share_ppm")).as("share_ppm"),
        countDistinct(col("bin_id")).as("n_bins"))
      .orderBy("split", "source")

  def endToEndReport(s: SparkSession, dir: String): DataFrame = {
    // survivors feed four stage-4/5 subtrees (spans, novelty, contamination,
    // base) — materialize once, like the e2e rehearsal's per-stage manifests
    val nd = nearDedup(exactDedup(ingestGate(docs(s, dir)))).localCheckpoint()
    val qual = curate(s, dir, nd)
    report(splitAndPack(qual), mixtureShares(qual))
  }

  /** Chained-CTE DuckDB twin — each stage's CTE is the registered operator's
    * own oracle text, composed. */
  private val endToEndOracle: String =
    """WITH raw AS (
      |  SELECT doc_id, source, text, string_split_regex(trim(text), '\s+') AS t
      |  FROM documents),
      |gate AS (SELECT doc_id, source, text, t FROM raw
      |  WHERE len(t) BETWEEN 5 AND 2000),
      |ex AS (SELECT doc_id, source, t FROM (
      |    SELECT g.*, row_number() OVER (PARTITION BY sha256(text)
      |      ORDER BY doc_id ASC) AS rn FROM gate g) WHERE rn = 1),
      |exsh AS (SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, greatest(len(t) - 2, 0)),
      |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM ex),
      |ndrop AS (SELECT DISTINCT b.doc_id AS doc_id
      |  FROM exsh a JOIN exsh b
      |    ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 20
      |  WHERE len(list_intersect(a.sh, b.sh))
      |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5),
      |nd AS (SELECT doc_id, source, t FROM ex
      |  WHERE doc_id NOT IN (SELECT doc_id FROM ndrop)),
      |ng AS (
      |  SELECT doc_id, i AS pos,
      |    ('0x' || substr(md5(list_aggregate(t[i:i+7], 'string_agg', ' ')), 1, 15))::BIGINT AS g
      |  FROM nd, LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i) u
      |  WHERE len(t) >= 8),
      |dup AS (SELECT g FROM ng GROUP BY g HAVING count(DISTINCT doc_id) > 1),
      |dpos AS (SELECT doc_id, pos FROM ng WHERE g IN (SELECT g FROM dup)),
      |mark AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 8
      |      THEN 1 ELSE 0 END AS ns
      |  FROM dpos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |spn AS (
      |  SELECT doc_id, pos, sum(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
      |  FROM mark),
      |spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
      |  FROM spn GROUP BY doc_id, sid),
      |spl AS (SELECT doc_id, list({'s': s, 'e': e} ORDER BY s) AS spans
      |  FROM spans GROUP BY doc_id),
      |kept AS (
      |  SELECT t.doc_id,
      |    CAST(CASE WHEN spans IS NULL THEN len(t.t)
      |      ELSE len(list_filter(t.t, (x, i) ->
      |        len(list_filter(spans, p -> i >= p.s AND i <= p.e)) = 0))
      |    END AS BIGINT) AS kept_toks
      |  FROM nd t LEFT JOIN spl ON t.doc_id = spl.doc_id),
      |gh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, len(t) - 4),
      |    i -> ('0x' || substr(md5(list_aggregate(t[i:i+4], 'string_agg', ' ')), 1, 15))::BIGINT)) AS gs
      |  FROM nd WHERE len(t) >= 5),
      |g AS (SELECT doc_id, unnest(gs) AS g FROM gh),
      |dfreq AS (SELECT g, count(*) AS dfreq FROM g GROUP BY g),
      |nov AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN dfreq = 1 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS novelty_ppm
      |  FROM g JOIN dfreq USING (g) GROUP BY doc_id),
      |bench AS (SELECT DISTINCT unnest(list_distinct(list_transform(
      |    generate_series(1, greatest(len(t) - 2, 0)),
      |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
      |  FROM raw WHERE doc_id < 10),
      |cont AS (SELECT doc_id FROM (
      |    SELECT c.doc_id, count(DISTINCT s) AS n_shared
      |    FROM (SELECT doc_id, unnest(sh) AS s
      |      FROM (SELECT doc_id, list_distinct(list_transform(
      |          generate_series(1, greatest(len(t) - 2, 0)),
      |          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      |        FROM nd WHERE doc_id >= 10)) c
      |    WHERE s IN (SELECT s FROM bench) GROUP BY c.doc_id)
      |  WHERE n_shared >= 5),
      |qual AS (
      |  SELECT nd.doc_id, nd.source, k.kept_toks
      |  FROM nd JOIN kept k USING (doc_id) JOIN nov USING (doc_id)
      |  WHERE nd.doc_id >= 10 AND nov.novelty_ppm >= 500000
      |    AND nd.doc_id NOT IN (SELECT doc_id FROM cont)),
      |per AS (SELECT source, CAST(sum(kept_toks) AS BIGINT) AS toks
      |  FROM qual GROUP BY source),
      |w8 AS (SELECT source,
      |    CAST(floor(sqrt(CAST(toks AS DOUBLE)) * 1000) AS BIGINT) AS weight_milli
      |  FROM per),
      |tw AS (SELECT CAST(sum(weight_milli) AS BIGINT) AS tw FROM w8),
      |shr AS (SELECT source,
      |    CAST(weight_milli * 1000000 // tw AS BIGINT) AS share_ppm
      |  FROM w8 CROSS JOIN tw),
      |sp AS (SELECT q.*,
      |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
      |      ELSE 'test' END AS split
      |  FROM (SELECT *,
      |      ('0x' || substr(md5(doc_id::VARCHAR || ':split'), 1, 15))::BIGINT % 100 AS b
      |    FROM qual) q),
      |pk AS (SELECT doc_id, source, split, kept_toks,
      |    (sum(kept_toks) OVER (PARTITION BY split
      |       ORDER BY kept_toks // 64, doc_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - kept_toks) // 512 AS bin_id
      |  FROM sp)
      |SELECT split, p.source, count(*) AS n_docs,
      |  CAST(sum(kept_toks) AS BIGINT) AS toks_kept,
      |  CAST(max(share_ppm) AS BIGINT) AS share_ppm,
      |  count(DISTINCT bin_id) AS n_bins
      |FROM pk p JOIN shr USING (source)
      |GROUP BY split, p.source
      |ORDER BY split ASC NULLS FIRST, source ASC NULLS FIRST""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("x_pipeline_end_to_end",
      (s, dir) => endToEndReport(s, dir),
      Some(endToEndOracle)))
}
