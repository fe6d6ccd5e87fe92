package graft

import graft.ext.{CorpusOps, Dedup, EndToEnd, Enrich, EventAnalytics, GraphOps, HybridRetrieval, Ingest, MaterializedView, Multimodal, Phrase, PipelineOps, ProductQuant, Retrieval, Selection, Similarity, Sketches, TextAnalysis}
import graft.ops.{Evolution, MergeInto, Q, Relational, Relational2, Relational3, Relational4, Scalars, SkewAndBuckets, SqlFrontDoor}
import graft.sources.SourceQueries
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each entry in `queries` is one operator from SURVEY.md §2 (names carry the
  * §2 ids); `oracleSql` holds the DuckDB-equivalent SQL for the hash gate. */
object SparkEntry {

  /** All registered inventory queries, in registration order. */
  def registry: Seq[Q] =
    Relational.qs ++ Relational2.qs ++ Relational3.qs ++ Relational4.qs ++ Scalars.qs ++
      SkewAndBuckets.qs ++ TextAnalysis.qs ++ Dedup.qs ++ Similarity.qs ++ Multimodal.qs ++
      PipelineOps.qs ++ Enrich.qs ++ GraphOps.qs ++ EventAnalytics.qs ++ Streams.qs ++
      SourceQueries.qs ++ MergeInto.qs ++ SqlFrontDoor.qs ++ CorpusOps.qs ++ Ingest.qs ++
      ProductQuant.qs ++ Selection.qs ++ Sketches.qs ++ EndToEnd.qs ++
      Retrieval.qs ++ MaterializedView.qs ++ Phrase.qs ++ HybridRetrieval.qs ++
      Evolution.qs ++ graft.sql.SqlDml.qs ++ graft.pipeline.TicketSync.qs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's heart: existing-ids scan + anti-join + MERGE shape
    * compressed into one plan (scan→filter→join→agg). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
    orders.filter(col("o_custkey").isNotNull)
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
      .orderBy("c_mktsegment")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check.
    * The IVF pair's oracles are data-dependent (centroids trained on the
    * corpus under test) and so are generated AFTER the queries have run —
    * Verify evaluates `queries` first, then dumps this map. */
  def oracleSql: Map[String, String] =
    (registry.flatMap(q => q.sql.map(s => q.name -> normalize(s))) ++
      ext.Similarity.ivfOracles.map { case (k, v) => k -> normalize(v) } ++
      ext.ProductQuant.pqOracles.map { case (k, v) => k -> normalize(v) } ++
      ext.ProductQuant.ivfadcOracles.map { case (k, v) => k -> normalize(v) } ++
      ext.GraphOps.pagerankConvOracles.map { case (k, v) => k -> normalize(v) } ++
      ext.Selection.probeOracles.map { case (k, v) => k -> normalize(v) }).toMap

  /** Collapse the triple-quoted indentation to a single-line SQL string —
    * but ONLY outside single-quoted literals, so a literal containing
    * consecutive spaces, a tab, or a newline (a regex, a format string)
    * reaches DuckDB byte-exact. Standard SQL '' escaping inside literals is
    * handled by the quote toggle (the escaped quote flips state twice). */
  private[graft] def normalize(sql: String): String = {
    val out = new StringBuilder(sql.length)
    var inLiteral = false
    var pendingSpace = false
    sql.foreach { c =>
      if (inLiteral) {
        out.append(c)
        if (c == '\'') inLiteral = false
      } else if (c.isWhitespace) {
        pendingSpace = true
      } else {
        if (pendingSpace && out.nonEmpty) out.append(' ')
        pendingSpace = false
        out.append(c)
        if (c == '\'') inLiteral = true
      }
    }
    out.result()
  }
}
