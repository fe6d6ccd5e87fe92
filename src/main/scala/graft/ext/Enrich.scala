package graft.ext

import graft.Tables
import graft.ops.Q
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Second tier of training-data / warehouse operators (SURVEY.md §2.11
  * extension tier): corpus boilerplate removal, k-NN join, fuzzy entity
  * matching, SCD2 dimension history, equi-depth binning, the feature-hashing
  * trick, column profiling, and time-series gap-fill. Same contract as
  * PipelineOps: every operator is one declarative DataFrame program with a
  * DuckDB oracle twin — no UDFs, no driver-side loops, bounded shuffles.
  */
object Enrich {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Per-user hourly value sums (decimal-exact, surfaced as DOUBLE) left-
    * joined onto each user's DENSE hourly grid — the shared substrate of the
    * gap-fill (LOCF) and linear-interpolation queries: (user_id, h, hv) with
    * hv NULL on grid slots with no observations. Grid size is span-bounded
    * per entity; the sequence() fan-out is a Generate in the scan stage. */
  def hourlyGridJoined(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables(s, dir, "events").filter(col("user_id") < 50)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("hv"))
    val grid = hourly.groupBy("user_id")
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    grid.join(hourly, Seq("user_id", "h"), "left")
  }

  /** Ten-token boilerplate planted at the head of every 5th doc, so the
    * removal operator is provably non-vacuous on the synthetic corpus (same
    * planting idiom as the PII scrub). Exactly 10 tokens = exactly the first
    * segment of a planted doc. */
  private val Boiler =
    "subscribe to our newsletter and follow us for more updates"

  /** Non-overlapping 10-token segments of a doc, with ordinal. The corpus-
    * prep shape of CCNet-style paragraph dedup: segment, count distinct docs
    * per segment, drop segments shared by many docs (site chrome, licence
    * headers), reassemble the rest in order. */
  private def segments(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("toks", TextAnalysis.tokens(col(textCol)))
      .select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, cast(ceil(size(toks)/10.0) as int) - 1),
          |  i -> array_join(slice(toks, i*10+1, 10), ' '))""".stripMargin)))
      .withColumnRenamed("col", "seg")

  val qs: Seq[Q] = Seq(

    // Corpus-level boilerplate (repeated-segment) removal. Segment counting
    // shuffles constant-width segment keys; the boilerplate set is tiny by
    // construction (only segments shared by >=10 DISTINCT docs survive the
    // HAVING), so the membership probe is a broadcast left join; reassembly
    // shuffles once by doc_id. No O(n^2) anywhere — linear in corpus tokens
    // at any scale. The planted head makes the removal observable: every
    // 5th doc loses exactly its first segment.
    Q("x_text_boilerplate",
      (s, dir) => {
        val planted = docs(s, dir).withColumn("t2",
          when(pmod(col("doc_id"), lit(5)) === 0,
            concat(lit(Boiler + " "), col("text"))).otherwise(col("text")))
        val seg = segments(planted, "t2")
        val boiler = seg.groupBy("seg")
          .agg(countDistinct("doc_id").as("nd"))
          .filter(col("nd") >= 10)
          .select(col("seg"), lit(1).as("bl"))
        seg.join(broadcast(boiler), Seq("seg"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_segments"),
            count(col("bl")).as("n_removed"),
            expr("""array_join(transform(array_sort(
                |  collect_list(if(bl is null, struct(pos, seg), null))),
                |  x -> x.seg), ' ')""".stripMargin).as("cleaned"))
          .select(col("doc_id"), col("n_segments"), col("n_removed"),
            sha2(col("cleaned"), 256).as("clean_sha"))
          .orderBy("doc_id")
      },
      Some(s"""WITH p AS (SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0 THEN '$Boiler ' || text
                          ELSE text END AS t2
                   FROM documents),
              t AS (SELECT doc_id, string_split_regex(trim(t2), '\\s+') AS toks
                    FROM p),
              seg AS (SELECT doc_id, i AS pos,
                        array_to_string(toks[(i*10+1):(i*10+10)], ' ') AS seg
                      FROM t, LATERAL (SELECT unnest(generate_series(0,
                             CAST(ceil(len(toks)/10.0) AS BIGINT) - 1)) AS i) u),
              b AS (SELECT seg, 1 AS bl FROM seg
                    GROUP BY seg HAVING count(DISTINCT doc_id) >= 10),
              j AS (SELECT s.doc_id, s.pos, s.seg, b.bl
                    FROM seg s LEFT JOIN b USING (seg))
              SELECT doc_id, count(*) AS n_segments, count(bl) AS n_removed,
                     sha256(coalesce(string_agg(CASE WHEN bl IS NULL THEN seg END,
                       ' ' ORDER BY pos), '')) AS clean_sha
              FROM j GROUP BY doc_id
              ORDER BY doc_id ASC NULLS FIRST""")),

    // k-NN join: top-5 cosine neighbors for EACH query vector (the batch
    // retrieval shape — dedup candidates, RAG eval, hard-negative mining).
    // The query side is broadcast (query sets are small by definition); the
    // rank-filter window plans through WindowGroupLimit, so each partition
    // keeps only k rows per query before the shuffle — the partial top-k
    // that makes this hold when the candidate side is 100 TB.
    Q("x_sim_knn_join",
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
        val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))
        e.filter(col("vec_id") >= 5).crossJoin(broadcast(q))
          .withColumn("sim", round(Similarity.cosine(col("embedding"), col("qe")), 6))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("q_id"), col("vec_id").as("neighbor"), col("sim"),
            col("rn").cast("long").as("rn"))
          .orderBy("q_id", "rn")
      },
      Some("""WITH q AS (SELECT vec_id AS q_id, embedding AS qe
                   FROM embeddings WHERE vec_id < 5),
              c AS (SELECT q.q_id, e.vec_id,
                      round(list_sum(list_transform(list_zip(e.embedding, q.qe),
                          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                        / (sqrt(list_sum(list_transform(e.embedding,
                             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                         * sqrt(list_sum(list_transform(q.qe,
                             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS sim
                    FROM embeddings e, q WHERE e.vec_id >= 5)
              SELECT q_id, vec_id AS neighbor, sim, CAST(rn AS BIGINT) AS rn
              FROM (SELECT *, row_number() OVER (
                      PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rn
                    FROM c)
              WHERE rn <= 5
              ORDER BY q_id ASC NULLS FIRST, rn ASC NULLS FIRST""")),

    // Fuzzy entity matching (record linkage): candidate pairs come from an
    // EQUI join on a blocking key (noun + size) — never a cross join — then
    // a cheap length prefilter, then edit distance only on survivors. The
    // classic blocked-matching shape: the expensive O(len^2) levenshtein
    // runs on a bounded candidate set, and the blocking join shuffles
    // hash-partitioned keys, so the plan survives any table size with
    // bounded block cardinality.
    Q("x_match_fuzzy",
      (s, dir) => {
        val p = Tables(s, dir, "part").select(col("p_partkey").as("k"),
          col("p_name").as("n"),
          expr("split_part(p_name, ' ', 2)").as("noun"), col("p_size").as("sz"))
        val a = p.toDF("a_key", "a_name", "noun", "sz")
        val b = p.toDF("b_key", "b_name", "noun", "sz")
        a.join(b, Seq("noun", "sz"))
          .filter(col("a_key") < col("b_key") && col("a_name") =!= col("b_name") &&
            abs(length(col("a_name")) - length(col("b_name"))) <= 2)
          .withColumn("dist", levenshtein(col("a_name"), col("b_name")).cast("long"))
          .filter(col("dist").between(1, 2))
          .select(col("a_key"), col("b_key"), col("a_name"), col("b_name"), col("dist"))
          // The whole pipeline above is ONE narrow stage (the blocking join
          // broadcasts), so a bare orderBy would run it TWICE — the range
          // partitioner's boundary sampling re-executes the child, paying
          // the 437k-pair levenshtein again (measured 2.2 s vs 1.2 s warm
          // at sf0.1). Materialize the small match set first; the sort then
          // samples the checkpoint, not the pipeline.
          .localCheckpoint()
          .orderBy("a_key", "b_key")
      },
      Some("""WITH p AS (SELECT p_partkey AS k, p_name AS n,
                     split_part(p_name, ' ', 2) AS noun, p_size AS sz FROM part)
              SELECT a.k AS a_key, b.k AS b_key, a.n AS a_name, b.n AS b_name,
                     CAST(levenshtein(a.n, b.n) AS BIGINT) AS dist
              FROM p a JOIN p b
                ON a.noun = b.noun AND a.sz = b.sz AND a.k < b.k AND a.n <> b.n
              WHERE abs(length(a.n) - length(b.n)) <= 2
                AND levenshtein(a.n, b.n) BETWEEN 1 AND 2
              ORDER BY a_key ASC NULLS FIRST, b_key ASC NULLS FIRST""")),

    // SCD Type-2 dimension history from a change log: each event opens a
    // version valid [ts, next ts); the open version has valid_to NULL. One
    // user-partitioned window — shuffles by entity key, sorts only within
    // an entity's own history, so it scales with the widest entity, not the
    // table.
    Q("x_scd2_history",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("version", row_number().over(w).cast("long"))
          .withColumn("valid_to", lead(col("ts"), 1).over(w))
          .select(col("user_id"), col("version"), col("event_type").as("state"),
            col("ts").as("valid_from"), col("valid_to"))
          .orderBy("user_id", "version")
      },
      Some("""SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version,
                     event_type AS state, ts AS valid_from, lead(ts) OVER w AS valid_to
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
              ORDER BY user_id ASC NULLS FIRST, version ASC NULLS FIRST""")),

    // Equi-depth (quantile) binning per segment — the feature-bucketing
    // shape (monotone binning for models, percentile bands for monitoring).
    // The ntile window is PARTITIONED by segment: each group sorts its own
    // rows after a hash shuffle; no global sort, no SinglePartition
    // exchange.
    Q("x_feat_quantile_bins",
      (s, dir) => {
        val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
        Tables(s, dir, "customer")
          .withColumn("bin", ntile(4).over(w))
          .groupBy("c_mktsegment", "bin")
          .agg(count(lit(1)).as("n"),
            min("c_acctbal").as("min_bal"), max("c_acctbal").as("max_bal"))
          .select(col("c_mktsegment"), col("bin").cast("long").as("bin"),
            col("n"), col("min_bal"), col("max_bal"))
          .orderBy("c_mktsegment", "bin")
      },
      Some("""SELECT c_mktsegment, CAST(bin AS BIGINT) AS bin, count(*) AS n,
                     min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
              FROM (SELECT c_mktsegment, c_acctbal,
                      ntile(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY c_acctbal ASC, c_custkey ASC) AS bin
                    FROM customer)
              GROUP BY c_mktsegment, bin
              ORDER BY c_mktsegment ASC NULLS FIRST, bin ASC NULLS FIRST""")),

    // Feature hashing (the hashing trick): token -> md5-60 % 256 bucket,
    // per-doc bucket counts = a fixed-width sparse feature vector in long
    // form. The same portable hash primitive the dedup twins verify, so
    // both engines bucket identically. Explode stays in the scan stage; the
    // only shuffle is the (doc_id, bucket) aggregation — constant-width
    // keys, map-side combined.
    Q("x_feat_hashing_trick",
      (s, dir) => docs(s, dir)
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .withColumn("bucket", pmod(graft.functions.Md5Hash60(col("tok")), lit(256L)))
        .groupBy("doc_id", "bucket")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("doc_id", "bucket"),
      Some("""SELECT doc_id,
                     ('0x' || substr(md5(tok), 1, 15))::BIGINT % 256 AS bucket,
                     count(*) AS cnt
              FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
                    FROM documents)
              GROUP BY doc_id, bucket
              ORDER BY doc_id ASC NULLS FIRST, bucket ASC NULLS FIRST""")),

    // Column profiling (ANALYZE-style data quality report): one PRUNED scan
    // per column, each a two-phase pre-aggregate on the column's VALUES
    // (groupBy value → count, then a constant-width rollup) — deliberately
    // NOT the four-countDistinct single aggregate, which Catalyst plans as
    // a ×5 Expand of every full-width row: at 100 TB that multiplies
    // shuffle volume by the distinct-column count, while this shape
    // shuffles only each column's distinct values. The report is
    // O(columns) rows regardless of table size. Numeric min/max are
    // rendered through DECIMAL(18,2) so both engines print identical
    // strings.
    Q("x_stats_profile",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        def prof(c: String, render: Column => Column): DataFrame =
          li.select(col(c))
            .groupBy(col(c)).agg(count(lit(1)).as("__cnt"))
            .agg(
              coalesce(sum("__cnt"), lit(0L)).as("n_rows"),
              coalesce(sum(when(col(c).isNull, col("__cnt"))), lit(0L)).as("n_nulls"),
              count(when(col(c).isNotNull, lit(1))).as("n_distinct"),
              render(min(col(c))).as("min_s"), render(max(col(c))).as("max_s"))
            .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
              col("n_distinct"), col("min_s"), col("max_s"))
        def num(c: Column) = c.cast("decimal(18,2)").cast("string")
        def ts(c: Column) = date_format(c, "yyyy-MM-dd HH:mm:ss")
        prof("l_quantity", num)
          .unionByName(prof("l_extendedprice", num))
          .unionByName(prof("l_returnflag", c => c.cast("string")))
          .unionByName(prof("l_shipdate", ts))
          .orderBy("col_name")
      },
      Some("""WITH a AS (SELECT count(*) AS n,
                     count(l_quantity) AS c1, count(DISTINCT l_quantity) AS d1,
                     min(l_quantity) AS mn1, max(l_quantity) AS mx1,
                     count(l_extendedprice) AS c2, count(DISTINCT l_extendedprice) AS d2,
                     min(l_extendedprice) AS mn2, max(l_extendedprice) AS mx2,
                     count(l_returnflag) AS c3, count(DISTINCT l_returnflag) AS d3,
                     min(l_returnflag) AS mn3, max(l_returnflag) AS mx3,
                     count(l_shipdate) AS c4, count(DISTINCT l_shipdate) AS d4,
                     min(l_shipdate) AS mn4, max(l_shipdate) AS mx4
                   FROM lineitem)
              SELECT 'l_quantity' AS col_name, n AS n_rows, n - c1 AS n_nulls,
                     d1 AS n_distinct, mn1::DECIMAL(18,2)::VARCHAR AS min_s,
                     mx1::DECIMAL(18,2)::VARCHAR AS max_s FROM a
              UNION ALL
              SELECT 'l_extendedprice', n, n - c2, d2,
                     mn2::DECIMAL(18,2)::VARCHAR, mx2::DECIMAL(18,2)::VARCHAR FROM a
              UNION ALL
              SELECT 'l_returnflag', n, n - c3, d3, mn3, mx3 FROM a
              UNION ALL
              SELECT 'l_shipdate', n, n - c4, d4,
                     strftime(mn4, '%Y-%m-%d %H:%M:%S'),
                     strftime(mx4, '%Y-%m-%d %H:%M:%S') FROM a
              ORDER BY col_name ASC NULLS FIRST""")),

    // Time-series gap-fill + forward fill (sensor/metric resampling): build
    // each entity's hourly grid with sequence() (Generate — no shuffle),
    // left-join observed hourly sums, forward-fill with last(ignoreNulls)
    // over an entity-partitioned window. Grid size is span-bounded per
    // entity; the demo bounds output with user_id < 50 (the operator itself
    // is generic). The first grid slot is always observed (the grid starts
    // at each entity's first hour), so filled is never NULL.
    Q("x_ts_gapfill",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("h")
        hourlyGridJoined(s, dir)
          .withColumn("filled", last(col("hv"), ignoreNulls = true).over(w))
          .select(col("user_id"), col("h"), col("filled"), col("hv").isNull.as("is_gap"))
          .orderBy("user_id", "h")
      },
      Some("""WITH hourly AS (SELECT user_id, date_trunc('hour', ts) AS h,
                     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hv
                   FROM events WHERE user_id < 50 GROUP BY 1, 2),
              b AS (SELECT user_id, min(h) AS h0, max(h) AS h1
                    FROM hourly GROUP BY 1),
              g AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
                    FROM b),
              j AS (SELECT g.user_id, g.h, hourly.hv
                    FROM g LEFT JOIN hourly
                      ON g.user_id = hourly.user_id AND g.h = hourly.h)
              SELECT user_id, h,
                     last_value(hv IGNORE NULLS) OVER (PARTITION BY user_id
                       ORDER BY h ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
                     hv IS NULL AS is_gap
              FROM j
              ORDER BY user_id ASC NULLS FIRST, h ASC NULLS FIRST""")),

    // Leave-one-out + smoothed target encoding of a categorical feature
    // (o_orderpriority) against a numeric target (o_totalprice) — the
    // leakage-safe categorical encoder: each row's own target is excluded
    // from its category mean, and the smoothed variant shrinks sparse
    // categories toward the global mean (m = 10 pseudo-observations).
    // Numerators are DECIMAL-exact category/global sums broadcast back to
    // the row level; every double op after that is the same IEEE tree in
    // both engines, rounded at the surface. One grouped agg + one broadcast
    // join — no window, no per-category scan, scales to any cardinality.
    Q("x_feat_target_encode",
      (s, dir) => {
        val o = Tables(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderpriority").as("cat"),
          col("o_totalprice").cast("decimal(18,2)").as("y"))
        val byCat = o.groupBy("cat").agg(sum("y").as("sy"), count(lit(1)).as("n"))
        val glob = o.agg(sum("y").as("gy"), count(lit(1)).as("gn"))
        val gmean = col("gy").cast("double") / col("gn").cast("double")
        // Singleton categories have no leave-one-out peers: LOO is NULL
        // (not a 0/0 whose IEEE result the engines may disagree on), and
        // the smoothed form falls back to pure shrinkage toward the global
        // mean — the m pseudo-observations still give it a defined value.
        o.join(broadcast(byCat), "cat").crossJoin(broadcast(glob))
          .select(col("o_orderkey"), col("cat"),
            round(when(col("n") > 1, (col("sy") - col("y")).cast("double") /
              (col("n") - 1).cast("double")), 6).as("loo_mean"),
            round(((col("sy") - col("y")).cast("double") + lit(10.0) * gmean) /
              (col("n") - 1 + 10).cast("double"), 6).as("smoothed_mean"))
          .orderBy("o_orderkey")
      },
      Some("""WITH o AS (SELECT o_orderkey, o_orderpriority AS cat,
                     CAST(o_totalprice AS DECIMAL(18,2)) AS y FROM orders),
              c AS (SELECT cat, sum(y) AS sy, count(*) AS n FROM o GROUP BY cat),
              g AS (SELECT sum(y) AS gy, count(*) AS gn FROM o)
              SELECT o_orderkey, o.cat,
                round(CASE WHEN n > 1
                      THEN CAST(sy - y AS DOUBLE) / CAST(n - 1 AS DOUBLE) END, 6) AS loo_mean,
                round((CAST(sy - y AS DOUBLE)
                       + 10.0 * (CAST(gy AS DOUBLE) / CAST(gn AS DOUBLE)))
                      / CAST(n - 1 + 10 AS DOUBLE), 6) AS smoothed_mean
              FROM o JOIN c ON o.cat = c.cat CROSS JOIN g
              ORDER BY o_orderkey ASC NULLS FIRST"""))
  )
}
