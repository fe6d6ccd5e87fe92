package graft.ext

import graft.Tables
import graft.ops.{GlobalWindows, Q}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data preparation operators beyond dedup/similarity/text-stats
  * (SURVEY.md §2.11 extension tier, round 3): chunking, PII scrubbing,
  * benchmark decontamination, stratified sampling, and sequence packing.
  * Every operator is a declarative DataFrame program with a DuckDB oracle
  * twin — no UDFs, no driver-side loops.
  */
object PipelineOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Fixed-size overlapping character chunks (context-window prep for
    * RAG/training). stride = size − overlap; chunk i covers
    * [i·stride + 1, i·stride + size]. One Generate per doc — fan-out stays
    * in the scan stage, no shuffle until someone aggregates. */
  def chunk(df: DataFrame, size: Int = 200, overlap: Int = 50): DataFrame = {
    val stride = size - overlap
    require(stride > 0, "overlap must be smaller than size")
    // chunks = 1 + ceil((L − size) / stride) clamped at 1: the last chunk is
    // the FIRST one reaching the end of the doc — no redundant tail chunk
    // living entirely inside the previous chunk's overlap. The greatest(0,…)
    // also guards empty docs against Spark's descending sequence(0, −1).
    df.select(col("doc_id"), posexplode(expr(
        s"""transform(
           |  sequence(0, CAST(greatest(0, ceil((length(text) - $size) / $stride.0)) AS INT)),
           |  i -> substring(text, i * $stride + 1, $size))""".stripMargin)))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        col("col").as("chunk"))
  }

  /** PII scrub: redact emails and US-phone shapes, counting redactions.
    * Pure regexp expressions (codegen'd, linear scans) — the compliance
    * pass every served corpus runs before training. */
  def piiScrub(df: DataFrame, textCol: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\d{3}-\\d{3}-\\d{4}"
    df.withColumn("n_emails", regexp_count(col(textCol), lit(email)))
      .withColumn("n_phones", regexp_count(col(textCol), lit(phone)))
      .withColumn("scrubbed",
        regexp_replace(regexp_replace(col(textCol), email, "<EMAIL>"),
          phone, "<PHONE>"))
  }

  val qs: Seq[Q] = Seq(

    // Chunking with overlap — the Generate fans out ~L/stride rows per doc
    // inside the scan stage; empty docs yield one empty chunk (guarded
    // against Spark's descending sequence(0,-1)).
    Q("x_text_chunks",
      (s, dir) => chunk(docs(s, dir), size = 200, overlap = 50)
        .select(col("doc_id"), col("chunk_id"), col("chunk"),
          length(col("chunk")).cast("long").as("chunk_len"))
        .orderBy("doc_id", "chunk_id"),
      Some("""SELECT doc_id, CAST(i - 1 AS BIGINT) AS chunk_id,
                substr(text, (i - 1) * 150 + 1, 200) AS chunk,
                CAST(length(substr(text, (i - 1) * 150 + 1, 200)) AS BIGINT) AS chunk_len
              FROM documents, LATERAL (SELECT unnest(generate_series(1,
                     CAST(greatest(0, ceil((length(text) - 200) / 150.0)) AS BIGINT) + 1)) AS i) u
              ORDER BY doc_id ASC NULLS FIRST, chunk_id ASC NULLS FIRST""")),

    // PII scrubbing. The fixture corpus is synthetic, so PII is PLANTED
    // deterministically (every 10th doc gets an email + phone tail) in both
    // engines — the scrub then provably rewrites text and the counts are
    // hash-checked, not vacuously zero.
    Q("x_text_pii_scrub",
      (s, dir) => {
        val planted = docs(s, dir).withColumn("t2",
          concat(col("text"),
            when(pmod(col("doc_id"), lit(10)) === 0,
              concat(lit(" contact user"), col("doc_id").cast("string"),
                lit("@example.com or 555-123-4567")))
              .otherwise(lit(""))))
        piiScrub(planted, "t2")
          .select(col("doc_id"),
            col("n_emails").cast("long").as("n_emails"),
            col("n_phones").cast("long").as("n_phones"),
            sha2(col("scrubbed"), 256).as("scrubbed_sha"))
          .orderBy("doc_id")
      },
      Some("""WITH p AS (SELECT doc_id,
                     text || CASE WHEN doc_id % 10 = 0
                       THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 555-123-4567'
                       ELSE '' END AS t2
                   FROM documents)
              SELECT doc_id,
                CAST(len(regexp_extract_all(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
                CAST(len(regexp_extract_all(t2, '\d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phones,
                sha256(regexp_replace(regexp_replace(t2,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g')) AS scrubbed_sha
              FROM p ORDER BY doc_id ASC NULLS FIRST""")),

    // Benchmark decontamination: which corpus docs share any 3-gram with
    // the "benchmark" set (docs 0–9 stand in for an eval set), and how many
    // distinct 3-grams leak. Shape: explode HASHED shingles (xxhash64 —
    // joining/counting 8-byte longs instead of 30-char strings cut this
    // query 17 s → ~4 s at sf0.1; results equal the string join short of a
    // 2^-64 collision, same contract as the n-gram Jaccard path), broadcast
    // the benchmark shingle set (eval sets are tiny at any corpus scale),
    // inner-join + grouped distinct count.
    Q("x_text_contamination",
      (s, dir) => {
        // explode_OUTER, deliberately: plain explode lets
        // InferFiltersFromGenerate push `size(shash) > 0 AND isnotnull(...)`
        // below the Generate with the WHOLE tokenize→shingle→hash tree
        // inlined into the filter condition — evaluated per row on top of
        // the projection itself (17 s → 4 s at sf0.1 from this line alone).
        // The outer form implies no such predicate; null/empty docs yield a
        // null h that the inner join and countDistinct already ignore.
        val sh = docs(s, dir)
          .withColumn("toks", TextAnalysis.tokens(col("text")))
          .withColumn("shash", graft.functions.ShingleHashes(col("toks"), 3))
          .select(col("doc_id"), explode_outer(col("shash")).as("h"))
        val bench = sh.filter(col("doc_id") < 10).select("h").distinct()
        sh.filter(col("doc_id") >= 10)
          .join(broadcast(bench), "h")
          .groupBy("doc_id")
          .agg(countDistinct(col("h")).as("n_shared"))
          .orderBy("doc_id")
      },
      Some("""WITH sh AS (
                SELECT doc_id, unnest(list_distinct(
                  list_transform(generate_series(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 0)),
                    i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
                         string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
                         string_split_regex(trim(text), '\s+')[i+2]))) AS s
                FROM documents),
              b AS (SELECT DISTINCT s FROM sh WHERE doc_id < 10)
              SELECT doc_id, count(DISTINCT s) AS n_shared
              FROM sh WHERE doc_id >= 10 AND s IN (SELECT s FROM b)
              GROUP BY doc_id ORDER BY doc_id ASC NULLS FIRST""")),

    // Stratified systematic sampling: every 4th vector per label in vec_id
    // order — per-stratum quotas without a global pass (the window is
    // label-partitioned, so it scales with the widest stratum, and the
    // deterministic row_number keeps both engines and re-runs aligned).
    Q("x_sample_stratified",
      (s, dir) => {
        val w = Window.partitionBy("label").orderBy("vec_id")
        Tables(s, dir, "embeddings")
          .withColumn("rn", row_number().over(w))
          .filter(pmod(col("rn") - 1, lit(4)) === 0)
          .select(col("label"), col("vec_id"), col("rn").cast("long").as("rn"))
          .orderBy("label", "vec_id")
      },
      Some("""SELECT label, vec_id, CAST(rn AS BIGINT) AS rn
              FROM (SELECT label, vec_id,
                      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
                    FROM embeddings)
              WHERE (rn - 1) % 4 = 0
              ORDER BY label ASC NULLS FIRST, vec_id ASC NULLS FIRST""")),

    // Repetition quality signals (the Gopher-rules shape): fraction of
    // 2-gram slots taken by the single most frequent 2-gram, and fraction of
    // 3-gram slots whose 3-gram occurs more than once — the two signals that
    // catch boilerplate/looping text that length/stopword stats miss.
    // One scan, no shuffle: the gram counting is the native RepetitionStats
    // kernel (open-addressed counting over buffer-reused xxhash64 grams,
    // O(tokens) per doc — it replaced an O(n²) count-each-distinct HOF that
    // measured 5 s at sf0.1, then an O(n log n) sort-based HOF at ~1.5 s;
    // VectorMathSpec pins bit parity against the sorted-HOF form on the
    // real corpus). The oracle keeps the direct string-counting
    // formulation, so the gate re-proves value equality every run.
    Q("x_text_repetition",
      (s, dir) => docs(s, dir)
        .withColumn("st", graft.functions.RepetitionStats(
          TextAnalysis.tokens(col("text"))))
        .select(col("doc_id"),
          round(expr(
            """IF(element_at(st, 2) = 0, CAST(0.0 AS DOUBLE),
              |  CAST(element_at(st, 1) AS DOUBLE) / element_at(st, 2))""".stripMargin), 6)
            .as("top_bigram_frac"),
          round(expr(
            """IF(element_at(st, 4) = 0, CAST(0.0 AS DOUBLE),
              |  CAST(element_at(st, 3) AS DOUBLE) / element_at(st, 4))""".stripMargin), 6)
            .as("dup_trigram_frac"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
              g AS (SELECT doc_id,
                      CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
                           ELSE list_transform(generate_series(1, len(toks) - 1),
                                  i -> toks[i] || ' ' || toks[i+1]) END AS g2,
                      CASE WHEN len(toks) < 3 THEN []::VARCHAR[]
                           ELSE list_transform(generate_series(1, len(toks) - 2),
                                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS g3
                    FROM t)
              SELECT doc_id,
                round(CASE WHEN len(g2) = 0 THEN 0.0
                      ELSE list_max(list_transform(list_distinct(g2),
                             g -> len(list_filter(g2, x -> x = g))))::DOUBLE / len(g2) END, 6)
                  AS top_bigram_frac,
                round(CASE WHEN len(g3) = 0 THEN 0.0
                      ELSE len(list_filter(g3,
                             g -> len(list_filter(g3, x -> x = g)) > 1))::DOUBLE / len(g3) END, 6)
                  AS dup_trigram_frac
              FROM g ORDER BY doc_id ASC NULLS FIRST""")),

    // Domain mixing / weighted source sampling: keep each doc with a
    // per-source probability, decided by a DETERMINISTIC portable hash of
    // the doc id (md5-60, the same primitive the `_md5` dedup twins verify)
    // — so the sample is reproducible across engines, re-runs and
    // partitionings, and the comparison is pure integer (parts-per-million
    // vs rate×1e6: no float anywhere). The production use: downsample
    // over-represented domains (src0 keeps all, the long tail keeps 25%)
    // before training. Linear, no shuffle — a scan-stage filter at any
    // corpus size.
    Q("x_sample_weighted",
      (s, dir) => docs(s, dir)
        .withColumn("u_ppm",
          pmod(graft.functions.Md5Hash60(
            concat(col("doc_id").cast("string"), lit(":mix"))), lit(1000000L)))
        .withColumn("rate_ppm",
          when(col("source") === "src0", 1000000L)
            .when(col("source") === "src1", 750000L)
            .when(col("source") === "src2", 500000L)
            .otherwise(250000L))
        .filter(col("u_ppm") < col("rate_ppm"))
        .select(col("doc_id"), col("source"), col("u_ppm"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source, u_ppm
              FROM (SELECT doc_id, source,
                      ('0x' || substr(md5(doc_id::VARCHAR || ':mix'), 1, 15))::BIGINT % 1000000 AS u_ppm
                    FROM documents)
              WHERE u_ppm < CASE source WHEN 'src0' THEN 1000000
                                        WHEN 'src1' THEN 750000
                                        WHEN 'src2' THEN 500000
                                        ELSE 250000 END
              ORDER BY doc_id ASC NULLS FIRST""")),

    // Train/val/test holdout assignment (80/10/10): the same deterministic
    // md5-60 primitive as weighted sampling, but partitioning instead of
    // filtering — every doc lands in exactly one split, the assignment is a
    // pure function of doc_id (stable under re-runs, repartitioning, and
    // corpus growth: adding docs never moves an existing doc's split, which
    // is the property that keeps eval sets uncontaminated across dataset
    // versions). Scan-stage projection, no shuffle.
    Q("x_split_assign",
      (s, dir) => docs(s, dir)
        .withColumn("bucket",
          pmod(graft.functions.Md5Hash60(
            concat(col("doc_id").cast("string"), lit(":split"))), lit(100L)))
        .select(col("doc_id"),
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                CASE WHEN b < 80 THEN 'train'
                     WHEN b < 90 THEN 'val'
                     ELSE 'test' END AS split
              FROM (SELECT doc_id,
                      ('0x' || substr(md5(doc_id::VARCHAR || ':split'), 1, 15))::BIGINT % 100 AS b
                    FROM documents)
              ORDER BY doc_id ASC NULLS FIRST""")),

    // Adaptive (data-derived) length filter: keep docs whose token count is
    // at or above the CORPUS MEAN — the threshold comes from the data, not a
    // constant, which is the general shape of adaptive quality cutoffs
    // (percentile gates, mean±k·sd bands). Two passes over the scan: a
    // single-row global aggregate, broadcast back as a scalar, then a
    // scan-stage filter. The comparison is CROSS-MULTIPLIED integer
    // arithmetic (n_toks·n ≥ total) — no division, no float, so membership
    // can never flip on a sub-ulp threshold divergence between engines.
    Q("x_text_adaptive_filter",
      (s, dir) => {
        val t = docs(s, dir)
          .select(col("doc_id"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_toks"))
        val stats = t.agg(sum("n_toks").as("tot"), count(lit(1)).as("n"))
        t.crossJoin(broadcast(stats))
          .filter(col("n_toks") * col("n") >= col("tot"))
          .select("doc_id", "n_toks")
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
                     len(string_split_regex(trim(text), '\s+')) AS n_toks
                   FROM documents),
              s AS (SELECT sum(n_toks) AS tot, count(*) AS n FROM t)
              SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks
              FROM t, s
              WHERE n_toks * n >= tot
              ORDER BY doc_id ASC NULLS FIRST""")),

    // Per-source z-score normalization of document length — the feature-
    // engineering shape (standardize a signal within its domain before
    // cross-domain thresholds). Group moments come from INTEGER sums
    // (Σx, Σx², n — exact in both engines), broadcast back; every double op
    // after that is the same IEEE expression tree on both sides, so the
    // rounded z-scores hash-match. Degenerate groups (σ = 0) map to z = 0 on
    // both sides rather than dividing by zero.
    Q("x_feat_zscore",
      (s, dir) => {
        val t = docs(s, dir).select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("x"))
        val g = t.groupBy("source").agg(
          sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"),
          count(lit(1)).as("n"))
        t.join(broadcast(g), Seq("source"))
          .withColumn("mu", col("sx").cast("double") / col("n"))
          .withColumn("variance",
            (col("sxx").cast("double") - col("sx").cast("double") * col("sx") / col("n"))
              / (col("n") - 1))
          .withColumn("z",
            when(col("variance") <= 0, 0.0)
              .otherwise((col("x").cast("double") - col("mu")) / sqrt(col("variance"))))
          .select(col("doc_id"), col("source"), round(col("z"), 6).as("z"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, source,
                     CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS x
                   FROM documents),
              g AS (SELECT source, sum(x) AS sx, sum(x * x) AS sxx, count(*) AS n
                    FROM t GROUP BY source)
              SELECT t.doc_id, t.source,
                round(CASE WHEN (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1) <= 0
                           THEN 0.0
                           ELSE (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / n)
                                / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1))
                      END, 6) AS z
              FROM t JOIN g ON t.source = g.source
              ORDER BY doc_id ASC NULLS FIRST""")),

    // The corpus-prep pipeline as ONE declarative plan — rule filter →
    // exact dedup → split assignment → per-split report. Each stage is the
    // registered operator's exact shape (length gate; min-id-per-sha256 via
    // a hash-partitioned window; md5-60 holdout buckets; grouped agg), but
    // composed, Catalyst sees the whole DAG at once: the filter pushes to
    // the scan, the dedup window and the final groupBy are the only
    // shuffles, and column pruning rides through every stage. This is the
    // materialization-free shape of a production prep run — stages are
    // plans, not intermediate tables, until a sink asks for bytes.
    Q("x_pipeline_corpus_prep",
      (s, dir) => {
        val base = docs(s, dir).select(col("doc_id"), col("lang"), col("text"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_toks"))
        val filtered = base.filter(col("n_toks").between(5, 2000))
        val w = Window.partitionBy(sha2(col("text"), 256))
          .orderBy(col("doc_id").asc)
        val deduped = filtered.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
        val split = deduped.withColumn("bucket",
            pmod(graft.functions.Md5Hash60(
              concat(col("doc_id").cast("string"), lit(":split"))), lit(100L)))
          .withColumn("split",
            when(col("bucket") < 80, "train")
              .when(col("bucket") < 90, "val").otherwise("test"))
        split.groupBy("split", "lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
          .orderBy("split", "lang")
      },
      Some("""WITH t AS (SELECT doc_id, lang, text,
                     len(string_split_regex(trim(text), '\s+')) AS n_toks
                   FROM documents),
              f AS (SELECT * FROM t WHERE n_toks BETWEEN 5 AND 2000),
              d AS (SELECT * FROM (SELECT *, row_number() OVER (
                       PARTITION BY sha256(text) ORDER BY doc_id ASC) AS rn
                     FROM f) WHERE rn = 1),
              sp AS (SELECT doc_id, lang, n_toks,
                       CASE WHEN b < 80 THEN 'train'
                            WHEN b < 90 THEN 'val' ELSE 'test' END AS split
                     FROM (SELECT *,
                             ('0x' || substr(md5(doc_id::VARCHAR || ':split'), 1, 15))::BIGINT % 100 AS b
                           FROM d))
              SELECT split, lang, count(*) AS n_docs,
                     CAST(sum(n_toks) AS BIGINT) AS n_tokens
              FROM sp GROUP BY split, lang
              ORDER BY split ASC NULLS FIRST, lang ASC NULLS FIRST""")),

    // Sequence packing: assign docs (in doc_id order) to 512-token training
    // bins by exclusive running token count — bin = floor(prefix/512). The
    // global prefix sum is GlobalWindows' bucketed two-pass decomposition:
    // no SinglePartition window, exact long arithmetic end to end.
    Q("x_pack_greedy_bins",
      (s, dir) => {
        val toks = docs(s, dir)
          .withColumn("n_tokens",
            size(TextAnalysis.tokens(col("text"))).cast("long"))
          .select("doc_id", "n_tokens")
        GlobalWindows.withBucketedPrefixSum(toks,
            floor(col("doc_id") / 100).cast("long"), col("n_tokens"),
            "cum", col("doc_id"))
          .select(col("doc_id"), col("n_tokens"),
            floor((col("cum") - col("n_tokens")) / 512).cast("long").as("bin_id"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
                     CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
                   FROM documents),
              c AS (SELECT doc_id, n_tokens,
                      sum(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                    FROM t)
              SELECT doc_id, n_tokens,
                     CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS bin_id
              FROM c ORDER BY doc_id ASC NULLS FIRST""")),

    // Fixed-SIZE uniform sample (the reservoir-sampling contract, made
    // deterministic and distributed): rank every row by a content-free
    // md5-60 key and keep the 100 smallest. Plans as TakeOrderedAndProject
    // — each partition keeps its local top-100, the driver merges — so a
    // fixed-size sample never needs a global sort, and the sample is a pure
    // function of doc ids (stable across re-runs and partitionings; adding
    // docs perturbs membership only at the key boundary, the classic
    // bottom-k sketch property).
    Q("x_sample_fixed_k",
      (s, dir) => docs(s, dir)
        .withColumn("k", graft.functions.Md5Hash60(
          concat(col("doc_id").cast("string"), lit(":res"))))
        .select(col("doc_id"), col("source"), col("k"))
        .orderBy("k", "doc_id")
        .limit(100),
      Some("""SELECT doc_id, source, k
              FROM (SELECT doc_id, source,
                      ('0x' || substr(md5(doc_id::VARCHAR || ':res'), 1, 15))::BIGINT AS k
                    FROM documents)
              ORDER BY k ASC NULLS FIRST, doc_id ASC NULLS FIRST
              LIMIT 100""")),

    // Per-source min-max normalization — x_feat_zscore's bounded sibling
    // (rescale to [0,1] within each domain). Group extrema come from
    // INTEGER min/max (exact in both engines), broadcast back; the single
    // double division is the same IEEE expression both sides; degenerate
    // groups (max = min) map to 0 rather than dividing by zero.
    Q("x_feat_minmax",
      (s, dir) => {
        val t = docs(s, dir).select(col("doc_id"), col("source"),
          col("n_chars").as("x"))
        val g = t.groupBy("source").agg(min("x").as("lo"), max("x").as("hi"))
        t.join(broadcast(g), Seq("source"))
          .select(col("doc_id"), col("source"),
            round(when(col("hi") === col("lo"), 0.0)
              .otherwise((col("x") - col("lo")).cast("double") /
                (col("hi") - col("lo")).cast("double")), 6).as("scaled"))
          .orderBy("doc_id")
      },
      Some("""WITH g AS (SELECT source, min(n_chars) AS lo, max(n_chars) AS hi
                   FROM documents GROUP BY source)
              SELECT doc_id, d.source,
                round(CASE WHEN hi = lo THEN 0.0
                      ELSE CAST(n_chars - lo AS DOUBLE) / CAST(hi - lo AS DOUBLE)
                      END, 6) AS scaled
              FROM documents d JOIN g ON d.source = g.source
              ORDER BY doc_id ASC NULLS FIRST""")),

    // Curriculum assignment + deterministic epoch shuffle — the last mile of
    // a training-data pipeline: order the corpus easy→hard, but randomize
    // WITHIN each difficulty stage so batches aren't length-sorted.
    //  - Stage: quartiles of the integer token count, via data-derived
    //    thresholds from a cumulative histogram over DISTINCT scores (the
    //    x_text_adaptive_filter idiom — the prefix sum runs on |distinct
    //    scores| rows, never on the corpus, and goes through GlobalWindows'
    //    bucketed two-pass decomposition so even that stage plans no
    //    SinglePartition window; membership is integer-exact cross-
    //    multiplied arithmetic, so no percentile-interpolation divergence).
    //  - Shuffle: md5-60 of doc_id sharded mod 16, rank within (stage,
    //    shard) — 64 bounded windows instead of one global sort, and the
    //    (stage, shard, rank) triple is a total epoch order that is a pure
    //    function of the corpus (stable under re-runs and repartitioning).
    Q("x_pipeline_curriculum",
      (s, dir) => {
        val t = docs(s, dir).select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("score"))
        val hist = t.groupBy("score").agg(count(lit(1)).as("c"))
        val cum = GlobalWindows.withBucketedPrefixSum(hist,
            floor(col("score") / 64), col("c"), "cum", col("score"))
          .crossJoin(broadcast(t.agg(count(lit(1)).as("n"))))
        val thresholds = cum.agg(
          min(when(col("cum") * 4 >= col("n"), col("score"))).as("t1"),
          min(when(col("cum") * 4 >= col("n") * 2, col("score"))).as("t2"),
          min(when(col("cum") * 4 >= col("n") * 3, col("score"))).as("t3"))
        val keyed = t.crossJoin(broadcast(thresholds))
          .withColumn("stage",
            lit(1) + (col("score") > col("t1")).cast("int") +
              (col("score") > col("t2")).cast("int") +
              (col("score") > col("t3")).cast("int"))
          .withColumn("k", graft.functions.Md5Hash60(
            concat(col("doc_id").cast("string"), lit(":shuf"))))
          .withColumn("shard", pmod(col("k"), lit(16L)))
        val wr = Window.partitionBy("stage", "shard").orderBy("k", "doc_id")
        keyed.select(col("doc_id"), col("stage"), col("shard"),
            row_number().over(wr).as("rank_in_shard"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
                     CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS score
                   FROM documents),
              hist AS (SELECT score, count(*) AS c FROM t GROUP BY score),
              cum AS (SELECT score, sum(c) OVER (ORDER BY score
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                        (SELECT count(*) FROM t) AS n
                      FROM hist),
              th AS (SELECT
                       min(CASE WHEN cum * 4 >= n THEN score END) AS t1,
                       min(CASE WHEN cum * 4 >= n * 2 THEN score END) AS t2,
                       min(CASE WHEN cum * 4 >= n * 3 THEN score END) AS t3
                     FROM cum),
              keyed AS (SELECT doc_id,
                       1 + CAST(score > t1 AS INT) + CAST(score > t2 AS INT)
                         + CAST(score > t3 AS INT) AS stage,
                       ('0x' || substr(md5(doc_id::VARCHAR || ':shuf'), 1, 15))::BIGINT AS k
                     FROM t, th)
              SELECT doc_id, stage, k % 16 AS shard,
                     CAST(row_number() OVER (PARTITION BY stage, k % 16
                       ORDER BY k ASC, doc_id ASC) AS INT) AS rank_in_shard
              FROM keyed
              ORDER BY doc_id ASC NULLS FIRST"""))
  )
}
