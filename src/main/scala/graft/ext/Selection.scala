package graft.ext

import graft.Tables
import graft.ops.Q
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Data-SELECTION operators — the "which documents do we actually train on"
  * tier that sits between curation (quality gates, dedup) and packing:
  *
  *   - [[dsirWeights]] — Data Selection with Importance Resampling (Xie et
  *     al. 2023, arXiv:2302.03169): rank raw documents by how much their
  *     hashed-n-gram feature distribution looks like a TARGET domain's
  *     distribution. The published recipe verbatim: hash unigrams into K
  *     buckets, fit two smoothed categorical distributions (target vs raw),
  *     score each doc by its summed log-likelihood ratio. The entire model
  *     is K=64 integers per side — broadcastable no matter the corpus size —
  *     so scoring is a scan-stage join; the only shuffle is the
  *     constant-width per-doc aggregation. This is the selection method
  *     behind several public pretraining corpora and composes with the
  *     repo's PPS sampler (weights → x_sample_pps) for the resampling step.
  *
  *   - [[linearProbe]] — a linear quality/domain classifier trained IN ONE
  *     DISTRIBUTED PASS via sufficient statistics: the normal-equation
  *     matrices G = Σ xxᵀ and b = Σ x·y are plain `agg` sums (map-side
  *     combined, constant width d² regardless of corpus size), the d×d ridge
  *     system (G + λI)w = b is solved EXACTLY on the driver in BigInt
  *     rational arithmetic (features and labels are integers, so G and b are
  *     exact — Cramer's rule, no float drift), and scoring is a scan-stage
  *     projection with the solved weights as literals. The classic
  *     "quality classifier" shape of GPT-3-style pipelines (classify docs
  *     against a trusted reference domain, keep high scorers) with the
  *     closed-form-fit twist that makes it a two-job batch pipeline instead
  *     of an iterative SGD loop. Oracle-paired via the repo's
  *     dynamic-literal mechanism (like the IVF centroids / PQ codebooks):
  *     the solved weights are interpolated into the DuckDB SQL, which
  *     re-derives the features and the scores — so the hash gate verifies
  *     that the distributed sufficient-statistics pass + exact solve
  *     produced weights consistent with the data.
  *
  * Reference scope: the reference pipeline selects rows by SQL predicates
  * only (`/root/reference/main.py:68-76` WHERE clauses); both operators here
  * are the LLM-pipeline extension tier the brief calls for.
  */
object Selection {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Hashed-unigram feature-space size. 64 buckets keeps the oracle's
    * bucket-distribution CTEs readable; production would use 10k+ — the
    * plan shape (two K-row broadcasts) is unchanged by K. */
  private val DsirK = 64L

  /** DSIR importance weights: target = English documents (the `lang` label
    * plays the "trusted domain" role Wikipedia plays in the paper), raw =
    * the whole corpus. Per doc: w = mean over tokens of
    * ln(p_target(bucket)/p_raw(bucket)), add-one smoothed; top `k` docs by
    * (w DESC, doc_id ASC). Log-ratios pass through an exact DECIMAL sum so
    * the per-doc mean is order-independent (the bigram-LM discipline). */
  def dsirWeights(s: SparkSession, dir: String, k: Int = 100): DataFrame =
    dsirPerDoc(s, dir).select("doc_id", "n_toks", "w")
      .orderBy(desc("w"), asc("doc_id")).limit(k)

  /** Per-doc DSIR scores (doc_id, n_toks, w) — the shared scorer behind the
    * ranked selection and the Gumbel resampler. */
  private def dsirPerDoc(s: SparkSession, dir: String): DataFrame = {
    val b = docs(s, dir)
      .select(col("doc_id"), col("lang"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .withColumn("b",
        pmod(graft.functions.Md5Hash60(concat(col("tok"), lit(":dsir"))), lit(DsirK)))
    val tc = b.filter(col("lang") === "en").groupBy("b").agg(count(lit(1)).as("ct"))
    val rc = b.groupBy("b").agg(count(lit(1)).as("cr"))
    val tot = tc.agg(sum("ct").as("tt")).crossJoin(rc.agg(sum("cr").as("rt")))
    // The model: K rows of (bucket, log-ratio). Buckets unseen in a side get
    // the +1 pseudo-count only. Built from two tiny aggregates + the 0..K-1
    // domain; broadcast to the scorer.
    val lw = s.range(DsirK).select(col("id").as("b"))
      .join(tc, Seq("b"), "left").join(rc, Seq("b"), "left").crossJoin(tot)
      .select(col("b"),
        // Add-one smoothing over the K-bucket domain: the denominator's
        // pseudo-count mass is one per bucket, i.e. DsirK — derived, so a
        // K change can never leave smoothing pinned at a stale constant.
        (log((coalesce(col("ct"), lit(0L)) + lit(1.0d)) / (col("tt") + lit(DsirK.toDouble)))
          - log((coalesce(col("cr"), lit(0L)) + lit(1.0d)) / (col("rt") + lit(DsirK.toDouble))))
          .as("lw"))
    b.join(broadcast(lw), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        round(sum(col("lw").cast("decimal(28,12)")).cast("double")
          / count(lit(1)), 6).as("w"),
        // the SUMMED log-ratio — the paper's resampling logit (length
        // matters: a long on-target doc outranks a short one)
        round(sum(col("lw").cast("decimal(28,12)")).cast("double"), 6).as("ws"))
  }

  /** DSIR's RESAMPLING step — the paper draws the training set ∝ exp(w)
    * WITHOUT replacement, which is exactly the Gumbel-top-k trick
    * (Efraimidis & Spirakis 2006 / Vieira 2014): key = logit + Gumbel
    * noise, take the global top-k. The logit is the doc's SUMMED log-ratio
    * (the paper's form — length matters), and the "noise" is DETERMINISTIC:
    * u = (md5-60(doc_id) mod 10⁶ + 0.5)/10⁶, g = ws − ln(−ln u) — so the
    * sample is a pure function of doc ids (reproducible across engines,
    * re-runs and partitionings, like every sampler in this engine), and the
    * whole draw sits under the DuckDB hash gate. Plans as one scan-stage
    * projection over the scorer plus TakeOrdered — no extra shuffle. */
  def dsirGumbelSample(s: SparkSession, dir: String, k: Int = 100): DataFrame = {
    dsirPerDoc(s, dir)
      .withColumn("u",
        (pmod(graft.functions.Md5Hash60(
          concat(col("doc_id").cast("string"), lit(":dsirg"))), lit(1000000L))
          .cast("double") + lit(0.5d)) / lit(1000000.0d))
      .withColumn("g", col("ws") - log(-log(col("u"))))
      .select(col("doc_id"), col("n_toks"), round(col("g"), 6).as("gumbel_key"))
      .orderBy(desc("gumbel_key"), asc("doc_id"))
      .limit(k)
  }

  /** Shared oracle prefix: per-doc DSIR scores as the `doc` CTE. */
  private val dsirScoreCtes: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |b AS (
       |  SELECT doc_id, lang,
       |    ('0x' || substr(md5(tok || ':dsir'), 1, 15))::BIGINT % $DsirK AS b
       |  FROM toks),
       |tc AS (SELECT b, count(*) AS ct FROM b WHERE lang = 'en' GROUP BY b),
       |rc AS (SELECT b, count(*) AS cr FROM b GROUP BY b),
       |tot AS (SELECT (SELECT sum(ct) FROM tc) AS tt, (SELECT sum(cr) FROM rc) AS rt),
       |lw AS (
       |  SELECT g.b,
       |    ln((coalesce(tc.ct, 0) + 1.0) / (tot.tt + $DsirK.0))
       |      - ln((coalesce(rc.cr, 0) + 1.0) / (tot.rt + $DsirK.0)) AS lw
       |  FROM generate_series(0, ${DsirK - 1}) AS g(b)
       |  LEFT JOIN tc ON g.b = tc.b
       |  LEFT JOIN rc ON g.b = rc.b
       |  CROSS JOIN tot),
       |doc AS (
       |  SELECT b.doc_id, count(*) AS n_toks,
       |    round(CAST(sum(CAST(lw.lw AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS w,
       |    round(CAST(sum(CAST(lw.lw AS DECIMAL(28,12))) AS DOUBLE), 6) AS ws
       |  FROM b JOIN lw ON b.b = lw.b
       |  GROUP BY b.doc_id)""".stripMargin

  private val dsirOracle: String =
    s"""$dsirScoreCtes
       |SELECT doc_id, n_toks, w FROM doc
       |ORDER BY w DESC, doc_id ASC
       |LIMIT 100""".stripMargin

  private val dsirSampleOracle: String =
    s"""$dsirScoreCtes
       |SELECT doc_id, n_toks,
       |  round(ws - ln(-ln(
       |    ((('0x' || substr(md5(doc_id::VARCHAR || ':dsirg'), 1, 15))::BIGINT
       |       % 1000000)::DOUBLE + 0.5) / 1000000.0)), 6) AS gumbel_key
       |FROM doc
       |ORDER BY gumbel_key DESC, doc_id ASC
       |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------------
  // Linear probe: sufficient-statistics fit + literal-weight scoring.
  // ---------------------------------------------------------------------

  /** The probe's integer features, exactly mirrored in the oracle SQL:
    * x1 = English stopword hits (on lowercased tokens — the lang-ID
    * heuristic's en list), x2 = token count, x3 = n_chars; label
    * y = [lang = 'en']. Integer features are what make G and b EXACT. */
  private val enStops = Seq("the", "a", "of", "and", "to", "in", "is")

  private def features(d: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    d.select(col("doc_id"),
      size(filter(TextAnalysis.tokens(lower(col("text"))),
        t => t.isin(enStops.map(x => x: Any): _*))).cast("long").as("x1"),
      size(toks).cast("long").as("x2"),
      col("n_chars").as("x3"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"))
  }

  /** Ridge strength. λ=1 keeps A = G + I integer, so the solve is exact. */
  private val Lambda = 1L

  /** Solved weights per corpus dir: decimal strings with 17 fractional
    * digits — enough that `toDouble` on the Spark side and DuckDB's literal
    * parse round to the IDENTICAL double, which is what makes literal-weight
    * scoring hash-exact across engines. */
  private val probeCache =
    new scala.collection.concurrent.TrieMap[String, IndexedSeq[String]]()
  @volatile private var probeLastDir: Option[String] = None

  /** 4×4 BigInt determinant by Laplace expansion — exact, tiny, driver-side. */
  private def det(m: IndexedSeq[IndexedSeq[BigInt]]): BigInt =
    if (m.size == 1) m(0)(0)
    else (m.indices).foldLeft(BigInt(0)) { (acc, j) =>
      val minor = m.tail.map(row => row.take(j) ++ row.drop(j + 1))
      val term = m(0)(j) * det(minor)
      if (j % 2 == 0) acc + term else acc - term
    }

  /** One distributed pass → exact normal equations → exact Cramer solve.
    * The agg is 14 BIGINT sums (the upper triangle of G plus b) — constant
    * width however large the corpus, fully map-side combinable: the
    * sufficient-statistics pattern that turns model fitting into a batch
    * aggregate. The collect() pulls ONE row (build-time, like the IVF
    * centroid pull), never data. */
  private def fitProbe(s: SparkSession, dir: String): IndexedSeq[String] =
    probeCache.getOrElseUpdate(dir, {
      val f = features(docs(s, dir))
      def p(a: String, bb: String) = sum(col(a) * col(bb))
      val r = f.agg(
        count(lit(1)).as("n"), sum("x1").as("s1"), sum("x2").as("s2"), sum("x3").as("s3"),
        p("x1", "x1").as("s11"), p("x1", "x2").as("s12"), p("x1", "x3").as("s13"),
        p("x2", "x2").as("s22"), p("x2", "x3").as("s23"), p("x3", "x3").as("s33"),
        sum("y").as("sy"), p("x1", "y").as("sy1"), p("x2", "y").as("sy2"),
        p("x3", "y").as("sy3")).collect()(0)
      def g(i: Int) = BigInt(r.getLong(i))
      val G = IndexedSeq(
        IndexedSeq(g(0), g(1), g(2), g(3)),
        IndexedSeq(g(1), g(4), g(5), g(6)),
        IndexedSeq(g(2), g(5), g(7), g(8)),
        IndexedSeq(g(3), g(6), g(8), g(9)))
      val bvec = IndexedSeq(g(10), g(11), g(12), g(13))
      val A = G.zipWithIndex.map { case (row, i) =>
        row.zipWithIndex.map { case (v, j) => if (i == j) v + Lambda else v } }
      val dA = det(A)
      require(dA != 0, "ridge system singular — cannot happen with λ > 0 on PSD G")
      (0 to 3).map { i =>
        val Ai = A.indices.map(r2 => A(r2).updated(i, bvec(r2)))
        new java.math.BigDecimal(det(Ai).bigInteger)
          .divide(new java.math.BigDecimal(dA.bigInteger), 17,
            java.math.RoundingMode.HALF_EVEN)
          .toPlainString
      }
    })

  /** Score every document with the fitted probe: a scan-stage projection
    * (literal weights — no join, no shuffle beyond the final sort). */
  def linearProbe(s: SparkSession, dir: String): DataFrame = {
    val w = fitProbe(s, dir)
    probeLastDir = Some(dir)
    val score = lit(w(0).toDouble) +
      lit(w(1).toDouble) * col("x1").cast("double") +
      lit(w(2).toDouble) * col("x2").cast("double") +
      lit(w(3).toDouble) * col("x3").cast("double")
    features(docs(s, dir))
      .select(col("doc_id"), col("x1"), col("x2"), col("x3"), col("y"),
        round(score, 6).as("score"))
      .orderBy("doc_id")
  }

  /** Dynamic oracle (post-run, like the IVF/PQ families): DuckDB re-derives
    * the features and scores them with the SAME weight literals the Spark
    * side used — the hash gate then verifies the whole fit+score pipeline. */
  def probeOracles: Map[String, String] = probeLastDir.flatMap(probeCache.get) match {
    case None => Map.empty
    case Some(w) =>
      Map("x_feat_linear_probe" ->
        s"""WITH f AS (
           |  SELECT doc_id,
           |    CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
           |      t -> t IN (${enStops.map(x => s"'$x'").mkString(", ")}))) AS BIGINT) AS x1,
           |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS x2,
           |    n_chars AS x3,
           |    CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
           |  FROM documents)
           |SELECT doc_id, x1, x2, x3, y,
           |  round(${w(0)} + ${w(1)} * x1 + ${w(2)} * x2 + ${w(3)} * x3, 6) AS score
           |FROM f
           |ORDER BY doc_id ASC NULLS FIRST""".stripMargin)
  }

  /** Exposed for the spec: exact residual check of (G+λI)w = b. */
  private[ext] def fittedWeights(s: SparkSession, dir: String): IndexedSeq[String] =
    fitProbe(s, dir)

  val qs: Seq[Q] = Seq(
    Q("x_pipeline_dsir",
      (s, dir) => dsirWeights(s, dir),
      Some(dsirOracle)),
    Q("x_pipeline_dsir_sample",
      (s, dir) => dsirGumbelSample(s, dir),
      Some(dsirSampleOracle)),
    Q("x_feat_linear_probe",
      (s, dir) => linearProbe(s, dir),
      None)) // oracle generated post-run (weights are data-dependent)
}
