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

  /** Memoized build roots per (corpus version, subspace count) (one train
    * per key per JVM; the committed SnapshotTables are reused across JVMs). */
  private val pqRoots = new scala.collection.concurrent.TrieMap[(String, Int), String]()

  /** Fitted codebooks per (dir, subs), for dynamic oracle generation (the
    * ivfCentroidCache trick): (sub, code, centroid, cnorm2). */
  private val pqCodebookCache =
    new scala.collection.concurrent.TrieMap[(String, Int), Seq[(Int, Long, Array[Double], Double)]]()
  @volatile private var pqLastDir: Option[String] = None

  /** BUILD: train the 8 subspace codebooks and persist two SnapshotTables —
    * `codes` (vec_id, codes array — the compressed store, range-clustered by
    * vec_id) and `codebooks` (sub, code, centroid, cnorm2 — 256 rows,
    * broadcast-sized). Assignment is recomputed from the final centroids
    * with the shared rounded-distance expression, never taken from MLlib's
    * internal labels (cross-engine argmin — the ivfBuild rationale). */
  def pqBuild(s: SparkSession, dir: String, subs: Int = m): String = synchronized {
    // Version-keyed memo (VERDICT r6 #5): corpus fingerprint in key + root.
    // `subs` (subspace count, VERDICT r7 #4) scales the scheme to any
    // embedding width that is a multiple of subDim=8 — dim 768 → subs 96;
    // every slice expression below uses sub*subDim offsets, so only the
    // loop bound changes. The registered fixture queries keep subs = m = 8.
    val vdir = s"$dir@${Similarity.corpusVersion(dir)}"
    pqRoots.getOrElseUpdate((vdir, subs), {
      val tag = vdir.replaceAll("[^a-zA-Z0-9]", "_")
      val root = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft-pq-$tag-m$subs-k$ksub").getAbsolutePath
      if (SnapshotTable.currentVersion(s, s"$root/codes").isEmpty ||
          SnapshotTable.currentVersion(s, s"$root/codebooks").isEmpty) {
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector
        val e = emb(s, dir)
        // One seeded fit per subspace over its 8-dim slice.
        val books: Seq[(Int, Long, Array[Double], Double)] = (0 until subs).flatMap { sub =>
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
        // code-ascending tiebreak — the identical arithmetic the oracle
        // spells per subspace, fused into ONE codegen kernel: the composed
        // m×ksub least(struct(round(ArrayDot…))) tree blew janino's method
        // budget at k=32 and fell back to interpreted eval (PqAssign's
        // scaladoc; bit-parity pinned by ProductQuantSpec).
        val codes = e.select(col("vec_id"),
          graft.functions.PqAssign(col("embedding"), books, subs, subDim)
            .as("codes"))
        SnapshotTable.commitClustered(s, s"$root/codes", codes, Seq("vec_id"))
        import s.implicits._
        SnapshotTable.commit(s, s"$root/codebooks",
          books.toDF("sub", "code", "centroid", "cnorm2"))
        pqCodebookCache.put((vdir, subs), books)
      }
      root
    })
    if (!pqCodebookCache.contains((vdir, subs))) {
      val books = SnapshotTable.read(s, s"${pqRoots((vdir, subs))}/codebooks")
        .collect().toSeq
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray, r.getDouble(3)))
        .sortBy(b => (b._1, b._2))
      pqCodebookCache.put((vdir, subs), books)
    }
    if (subs == m) pqLastDir = Some(vdir)
    pqRoots((vdir, subs))
  }

  /** Compressed store (vec_id, codes) from the build artifact. */
  def pqCodes(s: SparkSession, dir: String, subs: Int = m): DataFrame =
    SnapshotTable.read(s, s"${pqBuild(s, dir, subs)}/codes")

  /** Codebook table (sub, code, centroid, cnorm2) from the build artifact. */
  def pqCodebooks(s: SparkSession, dir: String, subs: Int = m): DataFrame =
    SnapshotTable.read(s, s"${pqBuild(s, dir, subs)}/codebooks")

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
             shortlist: Int = 100, subs: Int = m): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    // LUT: partial dot of the query's sub-slice with every codeword.
    val lut = pqCodebooks(s, dir, subs).crossJoin(broadcast(q))
      .select(col("sub"), col("code"), col("cnorm2"),
        dot(expr("transform(slice(q_embedding, sub * 8 + 1, 8), x -> CAST(x AS DOUBLE))"),
          col("centroid")).as("partial"))
    val adc = pqCodes(s, dir, subs)
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

  /** BATCH flat-PQ probe: a whole query table through ONE ADC pass. Flat
    * PQ scans every code row per query, so batching is where its
    * throughput comes from — the codes read and the per-query LUT join
    * amortize across the batch (IVFADC adds list pruning on top, see
    * [[ivfadcTopKAll]]). All ranks are q_id-partitioned windows. */
  def pqTopKAll(s: SparkSession, dir: String, queries: DataFrame, k: Int,
                shortlist: Int = 100, subs: Int = m): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(s, dir)
    val q = queries.select(col("q_id"), col("q_embedding"))
    val lut = pqCodebooks(s, dir, subs).crossJoin(broadcast(q))
      .select(col("q_id"), col("sub"), col("code"), col("cnorm2"),
        dot(expr("transform(slice(q_embedding, sub * 8 + 1, 8), x -> CAST(x AS DOUBLE))"),
          col("centroid")).as("partial"))
    val adc = pqCodes(s, dir, subs)
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(lut), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(
        sum(col("partial").cast("decimal(28,12)")).cast("double").as("a_dot"),
        sum(col("cnorm2").cast("decimal(28,12)")).cast("double").as("a_norm2"))
    val qn = q.select(col("q_id"),
      sqrt(dot(col("q_embedding"), col("q_embedding"))).as("qn"))
    val short = adc.join(broadcast(qn), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(col("a_dot") / (sqrt(col("a_norm2")) * col("qn")), 6).as("a_sim"))
      .withColumn("srn", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("a_sim"), asc("vec_id"))))
      .filter(col("srn") <= shortlist)
      .drop("srn")
    short.join(e, "vec_id").join(broadcast(q), Seq("q_id"))
      .withColumn("sim",
        round(dot(col("embedding"), col("q_embedding")) /
          (sqrt(dot(col("embedding"), col("embedding"))) *
            sqrt(dot(col("q_embedding"), col("q_embedding")))), 6))
      .withColumn("krn", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))))
      .filter(col("krn") <= k)
      .select(col("q_id"), col("vec_id"), col("a_sim"), col("sim"))
      .orderBy(asc("q_id"), desc("sim"), asc("vec_id"))
  }

  /** Per-subspace code occupancy — the build-absorbing inventory query (the
    * x_sim_ivf_lists role): sub 0's histogram shows the quantizer is
    * balanced, and its run is where the offline train cost lands. */
  def pqCodeHistogram(s: SparkSession, dir: String): DataFrame =
    pqCodes(s, dir)
      .select(posexplode(col("codes")).as(Seq("sub", "code")))
      .groupBy("sub", "code").agg(count(lit(1)).as("n"))
      .orderBy("sub", "code")

  // ---------------------------------------------------------------------
  // IVFADC (VERDICT r5 next-round #3): coarse-quantize into the existing
  // IVF lists, PQ-encode the RESIDUAL x − c(list(x)), probe = nprobe lists
  // × ADC + exact re-rank — Jégou et al. §IV, the standard 100 TB ANN
  // stack. The repo had both halves (ivfBuild, pqBuild); this composes
  // them: residual quantization cuts the error of flat PQ (residual
  // magnitudes ≪ vector magnitudes, so the same 8×32 budget spends its
  // resolution where the data actually is), and the coarse partition means
  // a probe scans only nprobe/nLists of the CODES — compression and scan
  // pruning multiply.
  // ---------------------------------------------------------------------

  private val nLists = 8  // coarse lists (shared with the IVF artifact)
  private val nprobe = 2

  private val ivfadcRoots = new scala.collection.concurrent.TrieMap[(String, Int, Int), String]()

  /** (coarse centroids, residual codebooks) per (dir, lists), for dynamic
    * oracles (the registered queries use the default lists). */
  private val ivfadcCache = new scala.collection.concurrent.TrieMap[
    (String, Int, Int), (Seq[(Long, Array[Double])], Seq[(Int, Long, Array[Double], Double)])]()
  @volatile private var ivfadcLastDir: Option[String] = None

  /** BUILD: residuals against the committed IVF coarse quantizer
    * ([[Similarity.ivfBuild]]), one seeded k-means per subspace over the
    * residual slices, then two SnapshotTables — `codes` (vec_id, list_id,
    * codes), clustered by list_id so a probe reads only its nprobe lists'
    * files, and `codebooks` (sub, code, centroid, rnorm2 — 256 rows).
    * Residual code assignment is the shared rounded-distance argmin over
    * the FINAL codebooks (the pqBuild/ivfBuild rationale). */
  def ivfadcBuild(s: SparkSession, dir: String, lists: Int = nLists,
                  subs: Int = m): String = synchronized {
    val vdir = s"$dir@${Similarity.corpusVersion(dir)}"
    ivfadcRoots.getOrElseUpdate((vdir, lists, subs), {
      val tag = vdir.replaceAll("[^a-zA-Z0-9]", "_")
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-ivfadc-$tag-m$subs-k$ksub-l$lists").getAbsolutePath
      if (SnapshotTable.currentVersion(s, s"$root/codes").isEmpty ||
          SnapshotTable.currentVersion(s, s"$root/codebooks").isEmpty) {
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector
        val res = emb(s, dir)
          .join(Similarity.ivfAssignments(s, dir, lists), "vec_id")
          .join(broadcast(Similarity.ivfCentroids(s, dir, lists)), "list_id")
          .withColumn("r",
            expr("zip_with(embedding, centroid, (x, c) -> CAST(x AS DOUBLE) - c)"))
          .select(col("vec_id"), col("list_id"), col("r"))
          .cache()
        val books: Seq[(Int, Long, Array[Double], Double)] =
          try (0 until subs).flatMap { sub =>
            val feats = res.select(array_to_vector(
              expr(s"slice(r, ${sub * subDim + 1}, $subDim)")).as("features"))
            val model = new KMeans().setK(ksub).setSeed(4242L + sub).setMaxIter(10)
              .setInitMode("random").fit(feats)
            model.clusterCenters.zipWithIndex.map { case (c, i) =>
              val cv = c.toArray
              (sub, i.toLong, cv, cv.foldLeft(0.0)((a, v) => a + v * v))
            }
          } finally ()
        // Residual code assignment through the same fused kernel (double
        // input path — residuals are zip_with doubles).
        val codes = res
          .select(col("vec_id"), col("list_id"),
            graft.functions.PqAssign(col("r"), books, subs, subDim).as("codes"))
          .repartition(col("list_id")).sortWithinPartitions("list_id")
        SnapshotTable.commit(s, s"$root/codes", codes)
        res.unpersist()
        import s.implicits._
        SnapshotTable.commit(s, s"$root/codebooks",
          books.toDF("sub", "code", "centroid", "rnorm2"))
      }
      root
    })
    if (!ivfadcCache.contains((vdir, lists, subs))) {
      val cents = Similarity.ivfCentroids(s, dir, lists).collect().toSeq
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
      val books = SnapshotTable.read(s, s"${ivfadcRoots((vdir, lists, subs))}/codebooks")
        .collect().toSeq
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray, r.getDouble(3)))
        .sortBy(b => (b._1, b._2))
      ivfadcCache.put((vdir, lists, subs), (cents, books))
    }
    if (lists == nLists && subs == m) ivfadcLastDir = Some(vdir)
    ivfadcRoots((vdir, lists, subs))
  }

  /** Residual-code occupancy per subspace — the build-absorbing inventory
    * query for the IVFADC artifact (oracle-paired dynamically). */
  def ivfadcCodeHistogram(s: SparkSession, dir: String): DataFrame =
    SnapshotTable.read(s, s"${ivfadcBuild(s, dir)}/codes")
      .select(posexplode(col("codes")).as(Seq("sub", "code")))
      .groupBy("sub", "code").agg(count(lit(1)).as("n"))
      .orderBy("sub", "code")

  /** PROBE: nprobe nearest lists by rounded centroid cosine; inside them,
    * ADC over residual codes — dot(x̂, q) = dot(c, q) + Σ LUT(sub, code)
    * and |x̂|² = |c|² + Σ (2·⟨c_sub, r̂⟩ + |r̂|²) — then exact re-rank of
    * the shortlist. The LUT (nprobe × 8 × 32 rows, per-list cross terms
    * included) broadcasts; codes in non-probed lists are never read
    * (clustered store), and full-float vectors are touched only by the
    * shortlist join. All 8-term sums accumulate as DECIMAL(28,12). */
  def ivfadcTopK(s: SparkSession, dir: String, queryId: Long, k: Int,
                 shortlist: Int = 100, lists: Int = nLists,
                 probe: Int = nprobe, subs: Int = m): DataFrame = {
    val root = ivfadcBuild(s, dir, lists, subs)
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    def qd = expr("transform(q_embedding, x -> CAST(x AS DOUBLE))")
    val probed = Similarity.ivfCentroids(s, dir, lists).crossJoin(broadcast(q))
      .withColumn("c_sim", round(Similarity.cosine(col("centroid"), col("q_embedding")), 6))
      .orderBy(desc("c_sim"), asc("list_id")).limit(probe)
      .select(col("list_id"), col("centroid").as("list_cent"))
    val lut = SnapshotTable.read(s, s"$root/codebooks")
      .crossJoin(broadcast(probed)).crossJoin(broadcast(q))
      .select(col("list_id"), col("sub"), col("code"), col("rnorm2"),
        dot(expr("transform(slice(q_embedding, sub * 8 + 1, 8), x -> CAST(x AS DOUBLE))"),
          col("centroid")).as("partial"),
        dot(expr("slice(list_cent, sub * 8 + 1, 8)"), col("centroid")).as("crossT"))
    val adc = SnapshotTable.read(s, s"$root/codes")
      .join(broadcast(probed.select("list_id")), Seq("list_id"))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("list_id"), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(lut), Seq("list_id", "sub", "code"))
      .groupBy("vec_id", "list_id")
      .agg(
        sum(col("partial").cast("decimal(28,12)")).cast("double").as("r_dot"),
        sum((col("crossT") * 2.0 + col("rnorm2")).cast("decimal(28,12)"))
          .cast("double").as("r_norm"))
    val listTerms = Similarity.ivfCentroids(s, dir, lists)
      .join(broadcast(probed.select("list_id")), Seq("list_id"))
      .crossJoin(broadcast(q))
      .select(col("list_id"),
        dot(col("centroid"), qd).as("cdot"),
        dot(col("centroid"), col("centroid")).as("cnorm2"))
    val qn = q.select(sqrt(dot(qd, qd)).as("qn"))
    val short = adc.join(broadcast(listTerms), "list_id").crossJoin(broadcast(qn))
      .select(col("vec_id"),
        round((col("cdot") + col("r_dot")) /
          (sqrt(col("cnorm2") + col("r_norm")) * col("qn")), 6).as("a_sim"))
      .orderBy(desc("a_sim"), asc("vec_id"))
      .limit(shortlist)
    short.join(e, "vec_id").crossJoin(broadcast(q))
      .withColumn("sim",
        round(Similarity.cosine(col("embedding"), col("q_embedding")), 6))
      .select(col("vec_id"), col("a_sim"), col("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
  }

  /** BATCH probe (VERDICT r6 #3): the API a production retrieval pass
    * actually calls — ONE plan for a whole query table instead of a job per
    * query. The x_sim_knn_join batch-join pattern applied to the compressed
    * domain: each query's nprobe lists come from a rank over broadcast
    * centroids (window partitioned by q_id — never a global sort), the
    * per-(query, list) LUT is batch × nprobe × 256 rows, and the CLUSTERED
    * codes table joins the (q_id, list_id) probe set once — per-list work
    * is (queries probing the list) × (codes in it), codes in unprobed
    * lists are never read, and full-float vectors are touched only by each
    * query's shortlist. The broadcast hints fit any probe batch up to
    * millions of (q_id, list_id) rows; past that, `broadcastLut = Some(false)`
    * switches to the list_id-bucketed shuffle join below (VERDICT r7 #1).
    * Amortization vs the single-query probe: centroids, codebooks and the
    * codes scan are shared across the whole batch — measured at 50×, see
    * SCALE.md.
    *
    * SHUFFLE path (`broadcastLut = Some(false)`) — the production shape once the
    * per-(query, list) LUT outgrows executor memory (a 1M-query retrieval
    * pass at nprobe=8 is ~2G LUT rows; a broadcast build would OOM the
    * driver long before). Structure:
    *
    *   - the LUT never materializes as a join input at all: the residual
    *     codebooks are ≤256 DRIVER-RESIDENT rows (the dynamic-oracle cache),
    *     so each probe row (q_id, list_id) computes its dense per-(sub,code)
    *     LUT slices `pd` / `pr` as one literal-centroid PROJECTION — the
    *     same ArrayDot left-to-right accumulation, term for term, so the
    *     scores are bit-identical to the broadcast path and both serve the
    *     one dynamic oracle;
    *   - the probe set then joins the codes artifact SHUFFLE-keyed on
    *     list_id (hint("merge") pins the sort-merge shape so fixture-scale
    *     AQE can't silently re-broadcast what this path exists to avoid);
    *     the artifact is already clustered by list_id, so at cluster scale
    *     only probed lists' files are scanned and the shuffle carries
    *     exactly the probe set and the probed codes;
    *   - each joined row scores by direct index into its pd/pr arrays —
    *     codes[sub] positions are dense per subspace even under RAGGED
    *     codebooks (k-means ids are contiguous 0..ksub_actual-1; offsets
    *     are plan-time literals) — so the quadratic (per-list work =
    *     queries-probing-it × codes-in-it) never explodes 8× through a
    *     posexplode before aggregating back;
    *   - batch-sized relations (qn, the rerank q join) flow as ordinary
    *     shuffle joins — NOTHING in this plan broadcasts anything that
    *     scales with the batch (PlanAuditSpec gates it: the only broadcast
    *     is the nLists-row coarse-centroid table).
    *
    * Per-list skew (a hot list probed by most of the batch) is AQE's
    * skew-join case; the rehearsal measures both paths at a ≥20k-query
    * batch (SCALE.md).
    *
    * STRATEGY SELECTION (VERDICT r8 #4): `broadcastLut = None` (the
    * default) picks the path from the DRIVER-KNOWN LUT row bound
    * |batch| × nprobe × |codebook entries| — the same plan-before-run
    * discipline bm25TopKPrunedBatch applies to its broadcast hints. The
    * bound costs one count() job over the workload-sized query relation
    * (cheap next to the probe itself; callers that already know their
    * batch size force the path with Some(...)). The threshold is set from
    * the measured wall: at ~41M LUT rows (20k queries × 8 × 256) the
    * broadcast build OOMs and at ~20M it is 12× slower than the shuffle
    * (SCALE.md) — [[MaxBroadcastLutRows]] stays well under both. */
  private[graft] val MaxBroadcastLutRows = 2000000L

  def ivfadcTopKAll(s: SparkSession, dir: String, queries: DataFrame, k: Int,
                    shortlist: Int = 100, lists: Int = nLists,
                    probe: Int = nprobe, broadcastLut: Option[Boolean] = None,
                    subs: Int = m, maxLiteralLut: Int = 512,
                    maxBroadcastLutRows: Long = MaxBroadcastLutRows): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val root = ivfadcBuild(s, dir, lists, subs)
    val e = emb(s, dir)
    // Auto path: pin the batch BEFORE counting it (ADVICE r9) — the count
    // and the executed probe must see the SAME rows (a non-deterministic
    // source could mis-size the path choice), and the collect-once
    // discipline avoids a second source scan. Forced paths skip the pin:
    // no count runs, so the caller's plan flows through untouched.
    val q0 = queries.select(col("q_id"), col("q_embedding"))
    val q = if (broadcastLut.isEmpty) q0.localCheckpoint() else q0
    def qd = expr("transform(q_embedding, x -> CAST(x AS DOUBLE))")
    val useBroadcast = broadcastLut.getOrElse {
      val vdir0 = s"$dir@${Similarity.corpusVersion(dir)}"
      val entries = ivfadcCache((vdir0, lists, subs))._2.size.toLong
      q.count() * probe * entries <= maxBroadcastLutRows
    }
    val probedBase = q.crossJoin(broadcast(Similarity.ivfCentroids(s, dir, lists)))
      .withColumn("c_sim",
        round(Similarity.cosine(col("centroid"), col("q_embedding")), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("c_sim"), asc("list_id"))))
      .filter(col("rn") <= probe)
      .select(col("q_id"), col("q_embedding"), col("list_id"),
        col("centroid").as("list_cent"))
    if (!useBroadcast) {
      val vdir = s"$dir@${Similarity.corpusVersion(dir)}"
      val books = ivfadcCache((vdir, lists, subs))._2 // sorted by (sub, code)
      // dense pd/pr offsets per subspace, robust to ragged codebooks
      val offs = (0 until subs).map(sub => books.count(_._1 == sub))
        .scanLeft(0)(_ + _)
      val withTerms = probedBase
        .withColumn("cdot", dot(col("list_cent"), qd))
        .withColumn("cnorm2", dot(col("list_cent"), col("list_cent")))
        .withColumn("qn", sqrt(dot(qd, qd)))
      // Two LUT-array builders, picked by codebook size. At the fixture
      // geometry (≤512 rows) each probe row computes its dense pd/pr arrays
      // as a LITERAL-codebook projection — zero extra stage, zero codebook
      // broadcast. Past that the literal expression tree itself becomes the
      // problem: at subs=96 (dim 768) it is ~200k serialized Expression
      // nodes, and 32 executor threads deserializing it concurrently OOM'd
      // an 8 GB heap before a single row flowed (measured, sim768 leg). The
      // large-width path instead derives the same arrays from the STATIC
      // codebooks table (one bounded broadcast, never batch-scaled) with a
      // per-(q, list) collect — expression size constant in subs. Both
      // compute the identical doubles: `partial` and the r_norm summand are
      // the broadcast path's own expressions, and array_sort on (sub, code)
      // reproduces the dense offset order.
      val perQL = (if (books.size <= maxLiteralLut) {
        // partial(sub, code) = dot(double(q_slice(sub)), centroid) with the
        // centroid a literal — replicates ArrayDot's 0.0-seeded
        // left-to-right double accumulation exactly (bit-identical a_sim)
        val pdEntries = books.map { case (sub, _, cv, _) =>
          (0 until subDim).foldLeft(lit(0.0)) { (acc, j) =>
            acc + col("q_embedding").getItem(sub * subDim + j).cast("double") * lit(cv(j))
          }
        }
        // rterm(sub, code) = crossT * 2.0 + rnorm2 (the r_norm summand)
        val prEntries = books.map { case (sub, _, cv, cc) =>
          (0 until subDim).foldLeft(lit(0.0)) { (acc, j) =>
            acc + col("list_cent").getItem(sub * subDim + j) * lit(cv(j))
          } * 2.0 + lit(cc)
        }
        withTerms
          .withColumn("pd", array(pdEntries: _*))
          .withColumn("pr", array(prEntries: _*))
      } else {
        withTerms
          .crossJoin(broadcast(SnapshotTable.read(s, s"$root/codebooks")))
          .select(col("q_id"), col("list_id"), col("cdot"), col("cnorm2"), col("qn"),
            col("sub"), col("code"),
            dot(expr("transform(slice(q_embedding, sub * 8 + 1, 8), x -> CAST(x AS DOUBLE))"),
              col("centroid")).as("partial"),
            (dot(expr("slice(list_cent, sub * 8 + 1, 8)"), col("centroid")) * 2.0
              + col("rnorm2")).as("rterm"))
          .groupBy("q_id", "list_id")
          .agg(first(col("cdot")).as("cdot"), first(col("cnorm2")).as("cnorm2"),
            first(col("qn")).as("qn"),
            array_sort(collect_list(struct(col("sub"), col("code"),
              col("partial"), col("rterm")))).as("ents"))
          .withColumn("pd", expr("transform(ents, e -> e.partial)"))
          .withColumn("pr", expr("transform(ents, e -> e.rterm)"))
          .drop("ents")
      }).drop("q_embedding", "list_cent") // skinny shuffle payload
      def adcSum(arr: String): Column = (0 until subs).map { sub =>
        element_at(col(arr),
          (col("codes").getItem(sub) + lit(offs(sub) + 1)).cast("int"))
          .cast("decimal(28,12)")
      }.reduce(_ + _).cast("double")
      val scored = SnapshotTable.read(s, s"$root/codes")
        .join(perQL.hint("merge"), Seq("list_id"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), col("cdot"), col("cnorm2"), col("qn"),
          adcSum("pd").as("r_dot"), adcSum("pr").as("r_norm"))
        .select(col("q_id"), col("vec_id"),
          round((col("cdot") + col("r_dot")) /
            (sqrt(col("cnorm2") + col("r_norm")) * col("qn")), 6).as("a_sim"))
      val short = scored
        .withColumn("srn", row_number().over(
          Window.partitionBy("q_id").orderBy(desc("a_sim"), asc("vec_id"))))
        .filter(col("srn") <= shortlist)
        .drop("srn")
      return short.join(e, "vec_id")
        .join(q, Seq("q_id")) // batch-sized: shuffle, never broadcast
        .withColumn("sim",
          round(Similarity.cosine(col("embedding"), col("q_embedding")), 6))
        .withColumn("krn", row_number().over(
          Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))))
        .filter(col("krn") <= k)
        .select(col("q_id"), col("vec_id"), col("a_sim"), col("sim"))
        .orderBy(asc("q_id"), desc("sim"), asc("vec_id"))
    }
    val probed = probedBase
      .localCheckpoint() // feeds LUT, the probe join and listTerms (3 uses)
    val lut = SnapshotTable.read(s, s"$root/codebooks")
      .crossJoin(broadcast(probed))
      .select(col("q_id"), col("list_id"), col("sub"), col("code"), col("rnorm2"),
        dot(expr("transform(slice(q_embedding, sub * 8 + 1, 8), x -> CAST(x AS DOUBLE))"),
          col("centroid")).as("partial"),
        dot(expr("slice(list_cent, sub * 8 + 1, 8)"), col("centroid")).as("crossT"))
    val adc = SnapshotTable.read(s, s"$root/codes")
      .join(broadcast(probed.select("q_id", "list_id")), Seq("list_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("list_id"),
        posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(lut), Seq("q_id", "list_id", "sub", "code"))
      .groupBy("q_id", "vec_id", "list_id")
      .agg(
        sum(col("partial").cast("decimal(28,12)")).cast("double").as("r_dot"),
        sum((col("crossT") * 2.0 + col("rnorm2")).cast("decimal(28,12)"))
          .cast("double").as("r_norm"))
    val listTerms = probed.select(col("q_id"), col("list_id"),
      dot(col("list_cent"), qd).as("cdot"),
      dot(col("list_cent"), col("list_cent")).as("cnorm2"))
    val qn = q.select(col("q_id"), sqrt(dot(qd, qd)).as("qn"))
    val short = adc.join(broadcast(listTerms), Seq("q_id", "list_id"))
      .join(broadcast(qn), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round((col("cdot") + col("r_dot")) /
          (sqrt(col("cnorm2") + col("r_norm")) * col("qn")), 6).as("a_sim"))
      .withColumn("srn", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("a_sim"), asc("vec_id"))))
      .filter(col("srn") <= shortlist)
      .drop("srn")
    short.join(e, "vec_id")
      .join(broadcast(q), Seq("q_id"))
      .withColumn("sim",
        round(Similarity.cosine(col("embedding"), col("q_embedding")), 6))
      .withColumn("krn", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))))
      .filter(col("krn") <= k)
      .select(col("q_id"), col("vec_id"), col("a_sim"), col("sim"))
      .orderBy(asc("q_id"), desc("sim"), asc("vec_id"))
  }

  /** Dynamic oracles for the IVFADC pair: coarse centroids AND residual
    * codebooks become VALUES literals; DuckDB re-derives the coarse
    * assignment, the residuals, the residual codes, the per-list LUT with
    * cross terms, and the two-stage rank — both queries hash-check. */
  def ivfadcOracles: Map[String, String] =
    ivfadcLastDir.flatMap(d => ivfadcCache.get((d, nLists, m))) match {
    case None => Map.empty
    case Some((cents, books)) =>
      val cValues = cents.map { case (id, cv) =>
        val cc = cv.foldLeft(0.0)((a, v) => a + v * v)
        s"(CAST($id AS BIGINT), [${cv.mkString(", ")}], CAST($cc AS DOUBLE))"
      }.mkString(", ")
      val rbValues = books.map { case (sub, code, cv, cc) =>
        s"($sub, CAST($code AS BIGINT), [${cv.mkString(", ")}], CAST($cc AS DOUBLE))"
      }.mkString(", ")
      // Coarse assignment: identical text to ivfOracles' assign CTE.
      val cdist =
        """round(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
          |  - 2.0 * list_sum(list_transform(list_zip(e.embedding, c.cv),
          |      p -> CAST(p[1] AS DOUBLE) * p[2]))
          |  + c.cc, 6)""".stripMargin
      // Residual assignment: the pqOracles dist shape over r slices.
      def rslc = "res.r[rb.sub * 8 + 1 : rb.sub * 8 + 8]"
      val rdist =
        s"""round(-2.0 * list_sum(list_transform(list_zip($rslc, rb.rv), p -> p[1] * p[2]))
           |  + list_sum(list_transform($rslc, x -> x * x))
           |  + rb.rn2, 6)""".stripMargin
      val base =
        s"""c(list_id, cv, cc) AS (VALUES $cValues),
           |rb(sub, code, rv, rn2) AS (VALUES $rbValues),
           |a AS (SELECT vec_id, list_id FROM (
           |    SELECT e.vec_id, c.list_id,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY $cdist ASC, c.list_id ASC) AS rn
           |    FROM embeddings e, c) WHERE rn = 1),
           |res AS (SELECT e.vec_id, a.list_id,
           |    list_transform(list_zip(e.embedding, c.cv), p -> CAST(p[1] AS DOUBLE) - p[2]) AS r
           |  FROM embeddings e JOIN a USING (vec_id) JOIN c USING (list_id)),
           |codes AS (SELECT vec_id, list_id, sub, code, rn2 FROM (
           |    SELECT res.vec_id, res.list_id, rb.sub, rb.code, rb.rn2,
           |      row_number() OVER (PARTITION BY res.vec_id, rb.sub
           |        ORDER BY $rdist ASC, rb.code ASC) AS rn
           |    FROM res, rb) WHERE rn = 1)""".stripMargin
      val hist =
        s"""WITH $base
           |SELECT sub, code, count(*) AS n FROM codes
           |GROUP BY sub, code
           |ORDER BY sub ASC NULLS FIRST, code ASC NULLS FIRST""".stripMargin
      val cosRaw = (a: String, b: String) =>
        s"""(list_sum(list_transform(list_zip($a, $b),
           |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           |  / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           |   * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))""".stripMargin
      val topk =
        s"""WITH $base,
           |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
           |probed AS (SELECT list_id, cv, cc FROM (
           |    SELECT c.list_id, c.cv, c.cc, row_number() OVER (
           |        ORDER BY round(${cosRaw("c.cv", "q.qe")}, 6) DESC, c.list_id ASC) AS rn
           |    FROM c, q) WHERE rn <= $nprobe),
           |lut AS (SELECT p.list_id, rb.sub, rb.code, rb.rn2,
           |    list_sum(list_transform(list_zip(q.qe[rb.sub * 8 + 1 : rb.sub * 8 + 8], rb.rv),
           |      z -> CAST(z[1] AS DOUBLE) * z[2])) AS partial,
           |    list_sum(list_transform(list_zip(p.cv[rb.sub * 8 + 1 : rb.sub * 8 + 8], rb.rv),
           |      z -> z[1] * z[2])) AS crossT
           |  FROM probed p, rb, q),
           |adc AS (SELECT cd.vec_id, cd.list_id,
           |    CAST(sum(CAST(lut.partial AS DECIMAL(28,12))) AS DOUBLE) AS r_dot,
           |    CAST(sum(CAST(lut.crossT * 2.0 + lut.rn2 AS DECIMAL(28,12))) AS DOUBLE) AS r_norm
           |  FROM codes cd
           |  JOIN lut ON cd.list_id = lut.list_id AND cd.sub = lut.sub AND cd.code = lut.code
           |  WHERE cd.vec_id <> 0
           |  GROUP BY cd.vec_id, cd.list_id),
           |lt AS (SELECT p.list_id,
           |    list_sum(list_transform(list_zip(p.cv, q.qe), z -> z[1] * CAST(z[2] AS DOUBLE))) AS cdot,
           |    list_sum(list_transform(p.cv, x -> x * x)) AS cnorm2
           |  FROM probed p, q),
           |qn AS (SELECT sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qn FROM q),
           |short AS (SELECT adc.vec_id,
           |    round((lt.cdot + adc.r_dot) / (sqrt(lt.cnorm2 + adc.r_norm) * qn.qn), 6) AS a_sim
           |  FROM adc JOIN lt ON adc.list_id = lt.list_id, qn
           |  ORDER BY a_sim DESC NULLS LAST, vec_id ASC NULLS FIRST LIMIT $shortlistLit)
           |SELECT s.vec_id, s.a_sim, round(${cosRaw("e.embedding", "q.qe")}, 6) AS sim
           |FROM short s JOIN embeddings e ON s.vec_id = e.vec_id, q
           |ORDER BY sim DESC NULLS LAST, s.vec_id ASC NULLS FIRST LIMIT 10""".stripMargin
      // Batched twin: the same pipeline with every stage keyed by q_id and
      // every rank a PARTITION BY q_id window — 20 queries, one statement.
      val batch =
        s"""WITH $base,
           |q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 20),
           |probed AS (SELECT q_id, list_id, cv, cc FROM (
           |    SELECT q.q_id, c.list_id, c.cv, c.cc, row_number() OVER (PARTITION BY q.q_id
           |        ORDER BY round(${cosRaw("c.cv", "q.qe")}, 6) DESC, c.list_id ASC) AS rn
           |    FROM c, q) WHERE rn <= $nprobe),
           |lut AS (SELECT p.q_id, p.list_id, rb.sub, rb.code, rb.rn2,
           |    list_sum(list_transform(list_zip(q.qe[rb.sub * 8 + 1 : rb.sub * 8 + 8], rb.rv),
           |      z -> CAST(z[1] AS DOUBLE) * z[2])) AS partial,
           |    list_sum(list_transform(list_zip(p.cv[rb.sub * 8 + 1 : rb.sub * 8 + 8], rb.rv),
           |      z -> z[1] * z[2])) AS crossT
           |  FROM probed p JOIN q USING (q_id), rb),
           |adc AS (SELECT lut.q_id, cd.vec_id, cd.list_id,
           |    CAST(sum(CAST(lut.partial AS DECIMAL(28,12))) AS DOUBLE) AS r_dot,
           |    CAST(sum(CAST(lut.crossT * 2.0 + lut.rn2 AS DECIMAL(28,12))) AS DOUBLE) AS r_norm
           |  FROM codes cd
           |  JOIN lut ON cd.list_id = lut.list_id AND cd.sub = lut.sub AND cd.code = lut.code
           |  WHERE cd.vec_id <> lut.q_id
           |  GROUP BY lut.q_id, cd.vec_id, cd.list_id),
           |lt AS (SELECT p.q_id, p.list_id,
           |    list_sum(list_transform(list_zip(p.cv, q.qe), z -> z[1] * CAST(z[2] AS DOUBLE))) AS cdot,
           |    list_sum(list_transform(p.cv, x -> x * x)) AS cnorm2
           |  FROM probed p JOIN q USING (q_id)),
           |qn AS (SELECT q_id, sqrt(list_sum(list_transform(qe,
           |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qn FROM q),
           |short AS (SELECT q_id, vec_id, a_sim FROM (
           |    SELECT t.q_id, t.vec_id, t.a_sim, row_number() OVER (PARTITION BY t.q_id
           |        ORDER BY t.a_sim DESC NULLS LAST, t.vec_id ASC) AS srn
           |    FROM (SELECT adc.q_id, adc.vec_id,
           |        round((lt.cdot + adc.r_dot) / (sqrt(lt.cnorm2 + adc.r_norm) * qn.qn), 6) AS a_sim
           |      FROM adc JOIN lt ON adc.q_id = lt.q_id AND adc.list_id = lt.list_id
           |      JOIN qn ON qn.q_id = adc.q_id) t)
           |  WHERE srn <= $shortlistLit)
           |SELECT q_id, vec_id, a_sim, sim FROM (
           |  SELECT s.q_id, s.vec_id, s.a_sim,
           |    round(${cosRaw("e.embedding", "q.qe")}, 6) AS sim,
           |    row_number() OVER (PARTITION BY s.q_id
           |      ORDER BY round(${cosRaw("e.embedding", "q.qe")}, 6) DESC NULLS LAST,
           |        s.vec_id ASC) AS krn
           |  FROM short s JOIN embeddings e ON s.vec_id = e.vec_id
           |  JOIN q ON q.q_id = s.q_id)
           |WHERE krn <= 3
           |ORDER BY q_id ASC NULLS FIRST, sim DESC NULLS LAST, vec_id ASC NULLS FIRST""".stripMargin
      Map("x_sim_ivfadc_codes" -> hist, "x_sim_ivfadc_topk" -> topk,
        "x_sim_ivfadc_batch" -> batch,
        // the shuffle-LUT path is numerically identical by construction —
        // one oracle text pins BOTH physical strategies
        "x_sim_ivfadc_batch_shuffle" -> batch)
  }

  private val shortlistLit = 100

  /** Dynamic oracles (the ivfOracles mechanism): the fitted codebooks become
    * VALUES literals; DuckDB re-derives every vector's codes with the
    * identical rounded-distance argmin, rebuilds the ADC table for the
    * query, and re-ranks — both PQ queries hash-check end to end. */
  def pqOracles: Map[String, String] =
    pqLastDir.flatMap(d => pqCodebookCache.get((d, m))) match {
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
      // Batched twin — every stage keyed by q_id, ranks as PARTITION BY
      // q_id windows.
      val batch =
        s"""WITH $codes,
           |q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 20),
           |lut AS (SELECT q.q_id, cb.sub, cb.code, cb.cc,
           |    list_sum(list_transform(list_zip(q.qe[cb.sub * 8 + 1 : cb.sub * 8 + 8], cb.cv),
           |      p -> CAST(p[1] AS DOUBLE) * p[2])) AS partial
           |  FROM cb, q),
           |adc AS (SELECT lut.q_id, c.vec_id,
           |    CAST(sum(CAST(lut.partial AS DECIMAL(28,12))) AS DOUBLE) AS a_dot,
           |    CAST(sum(CAST(lut.cc AS DECIMAL(28,12))) AS DOUBLE) AS a_norm2
           |  FROM codes c JOIN lut ON c.sub = lut.sub AND c.code = lut.code
           |  WHERE c.vec_id <> lut.q_id
           |  GROUP BY lut.q_id, c.vec_id),
           |qn AS (SELECT q_id, sqrt(list_sum(list_transform(qe,
           |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qn FROM q),
           |short AS (SELECT q_id, vec_id, a_sim FROM (
           |    SELECT t.q_id, t.vec_id, t.a_sim, row_number() OVER (PARTITION BY t.q_id
           |        ORDER BY t.a_sim DESC NULLS LAST, t.vec_id ASC) AS srn
           |    FROM (SELECT adc.q_id, adc.vec_id,
           |        round(a_dot / (sqrt(a_norm2) * qn.qn), 6) AS a_sim
           |      FROM adc JOIN qn ON qn.q_id = adc.q_id) t)
           |  WHERE srn <= 100)
           |SELECT q_id, vec_id, a_sim, sim FROM (
           |  SELECT s.q_id, s.vec_id, s.a_sim, $exactCos AS sim,
           |    row_number() OVER (PARTITION BY s.q_id
           |      ORDER BY $exactCos DESC NULLS LAST, s.vec_id ASC) AS krn
           |  FROM short s JOIN embeddings e ON s.vec_id = e.vec_id
           |  JOIN q ON q.q_id = s.q_id)
           |WHERE krn <= 3
           |ORDER BY q_id ASC NULLS FIRST, sim DESC NULLS LAST, vec_id ASC NULLS FIRST""".stripMargin
      Map("x_sim_pq_codes" -> hist, "x_sim_pq_topk" -> topk,
        "x_sim_pq_batch" -> batch)
  }

  val qs: Seq[Q] = Seq(
    // Build-absorbing inventory (oracle-paired dynamically via pqOracles).
    Q("x_sim_pq_codes",
      (s, dir) => pqCodeHistogram(s, dir),
      None),
    // ADC probe + exact re-rank top-10 (oracle-paired dynamically).
    Q("x_sim_pq_topk",
      (s, dir) => pqTopK(s, dir, queryId = 0L, k = 10),
      None),
    // BATCH flat-PQ probe: 20 queries through one ADC pass (dynamic oracle).
    Q("x_sim_pq_batch",
      (s, dir) => pqTopKAll(s, dir,
        emb(s, dir).filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding")),
        k = 3),
      None),
    // IVFADC build-absorbing residual-code inventory (dynamic oracle).
    Q("x_sim_ivfadc_codes",
      (s, dir) => ivfadcCodeHistogram(s, dir),
      None),
    // IVFADC probe: nprobe lists × residual ADC + exact re-rank (dynamic).
    Q("x_sim_ivfadc_topk",
      (s, dir) => ivfadcTopK(s, dir, queryId = 0L, k = 10),
      None),
    // BATCH IVFADC probe: 20 queries through ONE plan (dynamic oracle).
    Q("x_sim_ivfadc_batch",
      (s, dir) => ivfadcTopKAll(s, dir,
        emb(s, dir).filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding")),
        k = 3),
      None),
    // The SAME batch through the list_id-bucketed shuffle-join path
    // (broadcastLut = Some(false), VERDICT r7 #1) — hash-gated against the
    // identical dynamic oracle, so both physical strategies are pinned to
    // one answer.
    Q("x_sim_ivfadc_batch_shuffle",
      (s, dir) => ivfadcTopKAll(s, dir,
        emb(s, dir).filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding")),
        k = 3, broadcastLut = Some(false)),
      None))
}
