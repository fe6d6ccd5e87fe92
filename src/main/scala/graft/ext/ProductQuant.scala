package graft.ext

import graft.Tables
import graft.ops.{Q, SnapshotTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Product quantization for the embedding store (VERDICT r4 next-round #5) —
  * the standard 100 TB residency step beyond scalar int8
  * (`x_sim_quantize_int8`): Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011.
  *
  * The 64-dim vector splits into m=8 contiguous 8-dim subvectors; each
  * subspace trains its own ksub=32-word codebook (seeded MLlib k-means, one
  * fit per subspace, OFFLINE — the ivfBuild pattern), and a vector is stored
  * as 8 code ids. At 5 bits/code that is 5 bytes against the raw 256
  * (64×float32) — 1/51 memory; even stored as int8 codes it is 1/32, far
  * under the ≤1/8 target. Probe-time scoring is ADC (asymmetric distance
  * computation): the query stays full-precision, its 8 subvectors score the
  * 8×32 codebook once into a 256-row lookup table, and every database
  * vector's approximate dot/norm is a sum of 8 table hits — no float vector
  * is touched until the exact re-rank of the small shortlist.
  *
  * Cross-engine determinism follows the IVF playbook: code assignment is OUR
  * expression (rounded squared-L2 expansion, code-ascending tiebreak) over
  * the FINAL fitted codebooks, which Verify embeds into the oracle as double
  * literals ([[pqOracles]]); the 8-term ADC sums accumulate through exact
  * DECIMAL(28,12) so no engine's aggregation order can flip a hash.
  */
object ProductQuant {

  private val m = 8        // subvectors per vector
  private val subDim = 8   // dims per subvector (64 / m)
  private val ksub = 32    // codewords per subspace (5-bit codes)

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  private def dot(a: Column, b: Column): Column = graft.functions.ArrayDot(a, b)

  /** Memoized build roots (one train per corpus dir per JVM; the committed
    * SnapshotTables are reused across JVMs). */
  private val pqRoots = new scala.collection.concurrent.TrieMap[String, String]()

  /** Fitted codebooks per dir, for dynamic oracle generation (the
    * ivfCentroidCache trick): (sub, code, centroid, cnorm2). */
  private val pqCodebookCache =
    new scala.collection.concurrent.TrieMap[String, Seq[(Int, Long, Array[Double], Double)]]()
  @volatile private var pqLastDir: Option[String] = None

  /** BUILD: train the 8 subspace codebooks and persist two SnapshotTables —
    * `codes` (vec_id, codes array — the compressed store, range-clustered by
    * vec_id) and `codebooks` (sub, code, centroid, cnorm2 — 256 rows,
    * broadcast-sized). Assignment is recomputed from the final centroids
    * with the shared rounded-distance expression, never taken from MLlib's
    * internal labels (cross-engine argmin — the ivfBuild rationale). */
  def pqBuild(s: SparkSession, dir: String): String = synchronized {
    pqRoots.getOrElseUpdate(dir, {
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val root = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft-pq-$tag-m$m-k$ksub").getAbsolutePath
      if (SnapshotTable.currentVersion(s, s"$root/codes").isEmpty ||
          SnapshotTable.currentVersion(s, s"$root/codebooks").isEmpty) {
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector
        val e = emb(s, dir)
        // One seeded fit per subspace over its 8-dim slice.
        val books: Seq[(Int, Long, Array[Double], Double)] = (0 until m).flatMap { sub =>
          val feats = e.select(array_to_vector(expr(
            s"transform(slice(embedding, ${sub * subDim + 1}, $subDim), x -> CAST(x AS DOUBLE))"))
            .as("features")).cache()
          val model =
            try new KMeans().setK(ksub).setSeed(42L + sub).setMaxIter(10)
              .setInitMode("random").fit(feats)
            finally feats.unpersist()
          model.clusterCenters.zipWithIndex.map { case (c, i) =>
            val cv = c.toArray
            (sub, i.toLong, cv, cv.foldLeft(0.0)((a, v) => a + v * v))
          }
        }
        // codes[sub] = argmin_code round(|xs|^2 - 2 xs.c + |c|^2, 6),
        // code-ascending tiebreak — the identical expression tree the oracle
        // spells per subspace.
        val codeCols = (0 until m).map { sub =>
          val xs = expr(
            s"transform(slice(embedding, ${sub * subDim + 1}, $subDim), x -> CAST(x AS DOUBLE))")
          val candidates = books.filter(_._1 == sub).map { case (_, code, cv, cc) =>
            struct(
              round(dot(xs, typedlit(cv.toSeq)) * -2.0 + dot(xs, xs) + lit(cc), 6)
                .as("dist"),
              lit(code).as("code"))
          }
          least(candidates: _*).getField("code")
        }
        val codes = e.select(col("vec_id"), array(codeCols: _*).as("codes"))
        SnapshotTable.commitClustered(s, s"$root/codes", codes, Seq("vec_id"))
        import s.implicits._
        SnapshotTable.commit(s, s"$root/codebooks",
          books.toDF("sub", "code", "centroid", "cnorm2"))
        pqCodebookCache.put(dir, books)
      }
      root
    })
    if (!pqCodebookCache.contains(dir)) {
      val books = SnapshotTable.read(s, s"${pqRoots(dir)}/codebooks")
        .collect().toSeq
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray, r.getDouble(3)))
        .sortBy(b => (b._1, b._2))
      pqCodebookCache.put(dir, books)
    }
    pqLastDir = Some(dir)
    pqRoots(dir)
  }

  /** Compressed store (vec_id, codes) from the build artifact. */
  def pqCodes(s: SparkSession, dir: String): DataFrame =
    SnapshotTable.read(s, s"${pqBuild(s, dir)}/codes")

  /** Codebook table (sub, code, centroid, cnorm2) from the build artifact. */
  def pqCodebooks(s: SparkSession, dir: String): DataFrame =
    SnapshotTable.read(s, s"${pqBuild(s, dir)}/codebooks")

  /** ADC probe + exact re-rank: approximate every vector's cosine against
    * the query from codes alone (dot ≈ Σ LUT hits, |x|² ≈ Σ cnorm2 of its
    * codes), shortlist the top `shortlist` by the rounded approximation,
    * then exact-rank ONLY the shortlist against full-precision vectors.
    * Plan shape: 256-row LUT broadcast, codes explode to constant-width
    * (vec_id, sub, code) rows, one vec_id-keyed aggregation, top-k — the
    * full-float corpus is only scanned by the shortlist join. The 8-term
    * sums accumulate as DECIMAL(28,12): order-independent, so both engines
    * agree bit-for-bit. */
  def pqTopK(s: SparkSession, dir: String, queryId: Long, k: Int,
             shortlist: Int = 100): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    // LUT: partial dot of the query's sub-slice with every codeword.
    val lut = pqCodebooks(s, dir).crossJoin(broadcast(q))
      .select(col("sub"), col("code"), col("cnorm2"),
        dot(expr("transform(slice(q_embedding, sub * 8 + 1, 8), x -> CAST(x AS DOUBLE))"),
          col("centroid")).as("partial"))
    val adc = pqCodes(s, dir)
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(lut), Seq("sub", "code"))
      .groupBy("vec_id")
      .agg(
        sum(col("partial").cast("decimal(28,12)")).cast("double").as("a_dot"),
        sum(col("cnorm2").cast("decimal(28,12)")).cast("double").as("a_norm2"))
    val qn = q.select(sqrt(dot(col("q_embedding"), col("q_embedding"))).as("qn"))
    val short = adc.crossJoin(broadcast(qn))
      .select(col("vec_id"),
        round(col("a_dot") / (sqrt(col("a_norm2")) * col("qn")), 6).as("a_sim"))
      .orderBy(desc("a_sim"), asc("vec_id"))
      .limit(shortlist)
    // Exact re-rank of the shortlist only.
    short.join(e, "vec_id").crossJoin(broadcast(q))
      .withColumn("sim",
        round(dot(col("embedding"), col("q_embedding")) /
          (sqrt(dot(col("embedding"), col("embedding"))) *
            sqrt(dot(col("q_embedding"), col("q_embedding")))), 6))
      .select(col("vec_id"), col("a_sim"), col("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
  }

  /** Per-subspace code occupancy — the build-absorbing inventory query (the
    * x_sim_ivf_lists role): sub 0's histogram shows the quantizer is
    * balanced, and its run is where the offline train cost lands. */
  def pqCodeHistogram(s: SparkSession, dir: String): DataFrame =
    pqCodes(s, dir)
      .select(posexplode(col("codes")).as(Seq("sub", "code")))
      .groupBy("sub", "code").agg(count(lit(1)).as("n"))
      .orderBy("sub", "code")

  /** Dynamic oracles (the ivfOracles mechanism): the fitted codebooks become
    * VALUES literals; DuckDB re-derives every vector's codes with the
    * identical rounded-distance argmin, rebuilds the ADC table for the
    * query, and re-ranks — both PQ queries hash-check end to end. */
  def pqOracles: Map[String, String] = pqLastDir.flatMap(pqCodebookCache.get) match {
    case None => Map.empty
    case Some(books) =>
      val values = books.map { case (sub, code, cv, cc) =>
        s"($sub, CAST($code AS BIGINT), [${cv.mkString(", ")}], CAST($cc AS DOUBLE))"
      }.mkString(", ")
      // slice of e.embedding for subspace `sub` (1-based, inclusive ends)
      def slc(v: String) = s"$v.embedding[cb.sub * 8 + 1 : cb.sub * 8 + 8]"
      val dist =
        s"""round(-2.0 * list_sum(list_transform(list_zip(${slc("e")}, cb.cv),
           |    p -> CAST(p[1] AS DOUBLE) * p[2]))
           |  + list_sum(list_transform(${slc("e")}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
           |  + cb.cc, 6)""".stripMargin
      val codes =
        s"""cb(sub, code, cv, cc) AS (VALUES $values),
           |codes AS (SELECT vec_id, sub, code, cc FROM (
           |    SELECT e.vec_id, cb.sub, cb.code, cb.cc,
           |      row_number() OVER (PARTITION BY e.vec_id, cb.sub
           |        ORDER BY $dist ASC, cb.code ASC) AS rn
           |    FROM embeddings e, cb) WHERE rn = 1)""".stripMargin
      val hist =
        s"""WITH $codes
           |SELECT sub, code, count(*) AS n FROM codes
           |GROUP BY sub, code
           |ORDER BY sub ASC NULLS FIRST, code ASC NULLS FIRST""".stripMargin
      val exactCos =
        """round(list_sum(list_transform(list_zip(e.embedding, q.qe),
          |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
          |  / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
          |   * sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)""".stripMargin
      val topk =
        s"""WITH $codes,
           |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           |lut AS (SELECT cb.sub, cb.code, cb.cc,
           |    list_sum(list_transform(list_zip(q.qe[cb.sub * 8 + 1 : cb.sub * 8 + 8], cb.cv),
           |      p -> CAST(p[1] AS DOUBLE) * p[2])) AS partial
           |  FROM cb, q),
           |adc AS (SELECT c.vec_id,
           |    CAST(sum(CAST(lut.partial AS DECIMAL(28,12))) AS DOUBLE) AS a_dot,
           |    CAST(sum(CAST(lut.cc AS DECIMAL(28,12))) AS DOUBLE) AS a_norm2
           |  FROM codes c JOIN lut ON c.sub = lut.sub AND c.code = lut.code
           |  WHERE c.vec_id <> 0
           |  GROUP BY c.vec_id),
           |qn AS (SELECT sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qn FROM q),
           |short AS (SELECT vec_id,
           |    round(a_dot / (sqrt(a_norm2) * qn.qn), 6) AS a_sim
           |  FROM adc, qn
           |  ORDER BY a_sim DESC NULLS LAST, vec_id ASC NULLS FIRST LIMIT 100)
           |SELECT s.vec_id, s.a_sim, $exactCos AS sim
           |FROM short s JOIN embeddings e ON s.vec_id = e.vec_id, q
           |ORDER BY sim DESC NULLS LAST, s.vec_id ASC NULLS FIRST LIMIT 10""".stripMargin
      Map("x_sim_pq_codes" -> hist, "x_sim_pq_topk" -> topk)
  }

  val qs: Seq[Q] = Seq(
    // Build-absorbing inventory (oracle-paired dynamically via pqOracles).
    Q("x_sim_pq_codes",
      (s, dir) => pqCodeHistogram(s, dir),
      None),
    // ADC probe + exact re-rank top-10 (oracle-paired dynamically).
    Q("x_sim_pq_topk",
      (s, dir) => pqTopK(s, dir, queryId = 0L, k = 10),
      None))
}
