package graft.ext

import graft.Tables
import graft.ops.{Q, SnapshotTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Positional postings + exact phrase / proximity matching over the corpus
  * (VERDICT r8 #6). BM25's impact index is bag-of-words; contamination
  * checks ("does this eval question appear verbatim?") and instruction-data
  * mining need EXACT phrase and proximity semantics, which take token
  * positions. The classic positional-inverted-index design (Manning,
  * Raghavan & Schütze, "Introduction to Information Retrieval", ch. 2.4):
  *
  *   - BUILD tokenizes the corpus ONCE into a persisted `positions` table
  *     (term, doc_id, poss: sorted 0-based token positions), range-
  *     CLUSTERED by term like the BM25 impacts — a probe's term restriction
  *     skips non-overlapping files at plan time;
  *   - PHRASE probe: a phrase [t_0 … t_{n-1}] matches doc d at anchor a iff
  *     t_i occurs at position a+i for EVERY i. Each position p of a probed
  *     term instance (p_id, i, t_i) votes for anchor p − i; an anchor with
  *     n votes is an occurrence (a given i can never vote twice for one
  *     anchor — p is determined by a+i — so count(*) = matched instances).
  *     This is the adjacency join re-expressed as one groupBy, no per-term
  *     self-joins: shuffle width is (p_id, doc_id, anchor) rows, bounded by
  *     Σ probed-term positions — matching-postings-sized, like BM25;
  *   - PROXIMITY probe: unordered co-occurrence of a term pair within a
  *     token window — the two position lists of a (doc, pair) meet in one
  *     doc-local zip_with-free join on exploded positions, cost
  *     |poss_a| × |poss_b| per doc (per-doc tf-bounded, never corpus-wide).
  *
  * Both probes reuse [[Retrieval.restrictTerms]], so a wide-vocabulary
  * workload switches from literal isin (plan-time file skipping) to a
  * broadcast semi-join instead of serializing the term list into tasks.
  * Oracles: DuckDB recomputes positions with an index-aware list_transform
  * and replays the same anchor-vote / window-join logic — exact integer
  * counts, no float in the gate.
  */
object Phrase {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Memoized positional-index roots (one build per corpus content version
    * per JVM; committed SnapshotTables are reused across JVMs). */
  private val roots = new scala.collection.concurrent.TrieMap[String, String]()

  /** BUILD: persist the positional postings (term, doc_id, poss) for the
    * corpus, term-clustered. One text scan ever per corpus version. */
  def positionsBuild(s: SparkSession, dir: String): String = synchronized {
    val vdir = s"$dir@${Similarity.corpusVersion(dir, "documents")}#pos1"
    roots.getOrElseUpdate(vdir, {
      val tag = vdir.replaceAll("[^a-zA-Z0-9]", "_")
      val root = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft-pos-$tag").getAbsolutePath
      if (SnapshotTable.currentVersion(s, s"$root/positions").isEmpty) {
        val toks = docs(s, dir)
          .select(col("doc_id"), TextAnalysis.tokens(lower(col("text"))).as("toks"))
        val positions = toks
          .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "term")))
          .groupBy("term", "doc_id")
          .agg(sort_array(collect_list(col("pos").cast("long"))).as("poss"))
        SnapshotTable.commitClustered(s, s"$root/positions", positions,
          clusterBy = Seq("term"), numFiles = 8)
      }
      root
    })
  }

  /** INGEST step: tokenize ONLY `newDocs` and append their positional
    * postings exactly-once ((appId, batchId)-stamped — a replayed drop is
    * swallowed). Positions are PER-DOCUMENT facts: unlike BM25 impacts,
    * which fold corpus-wide df/avgdl and need a refresh per drop, the
    * positional index is FULLY incremental — appends compose with NO
    * derived-artifact step, and a probe over the appended index is
    * row-identical to one over a cold build by construction. At 100 TB each
    * crawl drop pays exactly its own tokenization, ever. (Appended batches
    * are not term-clustered like the cold build's commit — recluster via
    * compaction when file-skipping matters more than ingest latency.) */
  def positionsAppend(s: SparkSession, indexRoot: String,
                      newDocs: DataFrame, batchId: Long): Unit = {
    val toks = newDocs
      .select(col("doc_id"), TextAnalysis.tokens(lower(col("text"))).as("toks"))
    val positions = toks
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "term")))
      .groupBy("term", "doc_id")
      .agg(sort_array(collect_list(col("pos").cast("long"))).as("poss"))
    SnapshotTable.appendOnce(s, s"$indexRoot/positions", positions,
      "phrase-positions", batchId)
    ()
  }

  /** Positions of the probed terms from an EXPLICIT index root (the
    * incremental-maintenance path). */
  private def probedPositionsAt(s: SparkSession, indexRoot: String,
                                terms: Seq[String]): DataFrame =
    Retrieval.restrictTerms(
      s, SnapshotTable.read(s, s"$indexRoot/positions"), terms)

  /** Positions of the probed terms only (plan-time restriction — see
    * [[Retrieval.restrictTerms]]). */
  private def probedPositions(s: SparkSession, dir: String,
                              terms: Seq[String]): DataFrame =
    probedPositionsAt(s, positionsBuild(s, dir), terms)

  /** PHRASE probe against an explicit index root (the incremental path);
    * see [[phraseMatch]] for semantics. */
  def phraseMatchAt(s: SparkSession, indexRoot: String,
                    phrases: Seq[(Long, Seq[String])]): DataFrame = {
    import s.implicits._
    val inst = phrases.flatMap { case (p, ts) =>
      ts.zipWithIndex.map { case (t, i) => (p, i.toLong, t) }
    }
    val instDf = inst.toDF("p_id", "idx", "term")
    val plens = phrases.map { case (p, ts) => (p, ts.size.toLong) }.toDF("p_id", "n")
    val hits = probedPositionsAt(s, indexRoot, inst.map(_._3).distinct)
      .join(broadcast(instDf), Seq("term"))
      .select(col("p_id"), col("idx"), col("doc_id"), explode(col("poss")).as("pos"))
      .select(col("p_id"), col("doc_id"), (col("pos") - col("idx")).as("anchor"))
    hits.groupBy("p_id", "doc_id", "anchor").agg(count(lit(1)).as("votes"))
      .join(broadcast(plens), Seq("p_id"))
      .filter(col("votes") === col("n"))
      .groupBy("p_id", "doc_id").agg(count(lit(1)).as("n_occ"))
      .orderBy("p_id", "doc_id")
  }

  /** PHRASE probe: per (phrase, doc) exact-occurrence counts (docs with ≥1
    * occurrence only). `phrases` is a bounded workload (it ships as a
    * broadcast relation); duplicate terms inside a phrase are handled by
    * the anchor vote (each instance index votes independently). */
  def phraseMatch(s: SparkSession, dir: String,
                  phrases: Seq[(Long, Seq[String])]): DataFrame =
    phraseMatchAt(s, positionsBuild(s, dir), phrases)

  /** Fixture lineage for the registered incremental query: the corpus
    * ingested as two exactly-once drops (doc_id parity) with the second
    * drop REPLAYED — the appended index must serve phrase matches identical
    * to a cold build, which the shared oracle checks. Memoized per corpus
    * content version. */
  private def incrementalRoot(s: SparkSession, dir: String): String = synchronized {
    val vdir = s"$dir@${Similarity.corpusVersion(dir, "documents")}#posinc1"
    roots.getOrElseUpdate(vdir, {
      val tag = vdir.replaceAll("[^a-zA-Z0-9]", "_")
      val root = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft-pos-$tag").getAbsolutePath
      if (SnapshotTable.currentVersion(s, s"$root/positions").isEmpty) {
        val d = docs(s, dir)
        positionsAppend(s, root, d.filter(pmod(col("doc_id"), lit(2)) === 0), 0L)
        positionsAppend(s, root, d.filter(pmod(col("doc_id"), lit(2)) === 1), 1L)
        // replayed drop: the batchId stamp must swallow it, or every
        // odd-doc phrase count doubles and the hash gate catches it
        positionsAppend(s, root, d.filter(pmod(col("doc_id"), lit(2)) === 1), 1L)
      }
      root
    })
  }

  /** PROXIMITY probe: for each (pair_id, term_a, term_b), the docs where
    * the terms co-occur within `window` tokens (unordered, distinct
    * positions), aggregated to (pair_id, n_docs, n_pairs) — n_pairs counts
    * qualifying position pairs. Per-doc cost is tf_a × tf_b; the join is
    * keyed by doc_id so nothing corpus-wide crosses partitions. */
  def proximityMatch(s: SparkSession, dir: String,
                     pairs: Seq[(Long, String, String)],
                     window: Int): DataFrame = {
    import s.implicits._
    val pos = probedPositions(s, dir,
      (pairs.map(_._2) ++ pairs.map(_._3)).distinct)
    val pairDf = pairs.toDF("pair_id", "term_a", "term_b")
    val a = pos.join(broadcast(pairDf), col("term") === col("term_a"))
      .select(col("pair_id"), col("doc_id"), explode(col("poss")).as("pa"))
    val b = pos.join(broadcast(pairDf.select("pair_id", "term_b")),
        col("term") === col("term_b"))
      .select(col("pair_id"), col("doc_id"), explode(col("poss")).as("pb"))
    a.join(b, Seq("pair_id", "doc_id"))
      .filter(col("pa") =!= col("pb") &&
        abs(col("pa") - col("pb")) <= window)
      .groupBy("pair_id")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_pairs"))
      .orderBy("pair_id")
  }

  /** Fixture phrases: a plain bigram, a REPEATED-term bigram (the anchor
    * vote must not double-count), and a trigram (empty at some SFs — the
    * probe must return no row for it, not a zero row). Mirrored verbatim in
    * the oracle VALUES. */
  private[graft] val fixturePhrases: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("table", "scan"),
    2L -> Seq("batch", "batch"),
    3L -> Seq("sort", "merge", "join"))

  private[graft] val fixturePairs: Seq[(Long, String, String)] = Seq(
    (1L, "spark", "merge"), (2L, "customer", "filter"), (3L, "vector", "stream"))

  /** Shared DuckDB tokenization-with-positions prelude. */
  private val posSql =
    """d AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      |      FROM documents),
      |pos AS (SELECT doc_id, u.term AS term, u.pos AS pos
      |        FROM (SELECT doc_id, unnest(list_transform(toks,
      |               (t, i) -> struct_pack(term := t, pos := i - 1))) AS u
      |              FROM d))""".stripMargin

  private val phraseValues = fixturePhrases.flatMap { case (p, ts) =>
    ts.zipWithIndex.map { case (t, i) => s"($p, $i, '$t')" }
  }.mkString(", ")

  private val pairValues = fixturePairs
    .map { case (id, a, b) => s"($id, '$a', '$b')" }.mkString(", ")

/** The phrase-match oracle, shared by the cold-build and incremental
    * queries (the appended index must be bit-identical to a cold build). */
  private lazy val phraseOracleSql: String =
    s"""WITH p(p_id, idx, term) AS (VALUES $phraseValues),
       |plen AS (SELECT p_id, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1),
       |$posSql,
       |hits AS (SELECT p.p_id, pos.doc_id, pos.pos - p.idx AS anchor
       |         FROM p JOIN pos ON pos.term = p.term),
       |anchors AS (SELECT p_id, doc_id, anchor,
       |            CAST(count(*) AS BIGINT) AS votes
       |            FROM hits GROUP BY 1, 2, 3)
       |SELECT a.p_id, a.doc_id, CAST(count(*) AS BIGINT) AS n_occ
       |FROM anchors a JOIN plen ON plen.p_id = a.p_id
       |WHERE a.votes = plen.n
       |GROUP BY 1, 2
       |ORDER BY a.p_id ASC, a.doc_id ASC""".stripMargin

  val qs: Seq[Q] = Seq(

    // Exact phrase occurrences per document from the positional index.
    Q("x_text_phrase_match",
      (s, dir) => phraseMatch(s, dir, fixturePhrases),
      Some(phraseOracleSql)),

    // Incrementally-appended positional index (two exactly-once drops, one
    // replayed): positions are per-document facts, so the appended index
    // must serve matches BIT-IDENTICAL to the cold build — it shares the
    // phrase oracle, and a double-applied replay would double every
    // odd-doc occurrence count.
    Q("x_text_phrase_incremental",
      (s, dir) => phraseMatchAt(s, incrementalRoot(s, dir), fixturePhrases),
      Some(phraseOracleSql)),

    // Unordered within-window co-occurrence of term pairs.
    Q("x_text_phrase_prox",
      (s, dir) => proximityMatch(s, dir, fixturePairs, window = 5),
      Some(s"""WITH pr(pair_id, term_a, term_b) AS (VALUES $pairValues),
              |$posSql,
              |joined AS (
              |  SELECT pr.pair_id, a.doc_id
              |  FROM pr
              |  JOIN pos a ON a.term = pr.term_a
              |  JOIN pos b ON b.term = pr.term_b AND b.doc_id = a.doc_id
              |  WHERE a.pos <> b.pos AND abs(a.pos - b.pos) <= 5)
              |SELECT pair_id, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
              |       CAST(count(*) AS BIGINT) AS n_pairs
              |FROM joined GROUP BY 1
              |ORDER BY pair_id ASC""".stripMargin))
  )
}
