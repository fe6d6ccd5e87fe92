package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PQ invariants: the compressed store covers the corpus at the advertised
  * code budget, codes decode against the committed codebooks, the ADC
  * shortlist carries real recall against exact search, and re-ranked scores
  * are the true cosines. The DuckDB hash gate (dynamic codebook-literal
  * oracles) pins the exact values; these pin the algebra. */
class ProductQuantSpec extends SparkSpec {
  import spark.implicits._

  test("codes table: one row per vector, 8 codes in [0, 32)") {
    val codes = ProductQuant.pqCodes(spark, sf)
    val total = graft.Tables(spark, sf, "embeddings").count()
    assert(codes.count() == total)
    val bad = codes.filter(
      size(col("codes")) =!= 8 ||
        exists(col("codes"), c => c < 0 || c >= 32)).count()
    assert(bad == 0L, s"$bad rows with malformed codes")
  }

  test("codebooks: 8 subspaces x 32 codewords of dim 8, cnorm2 consistent") {
    val books = ProductQuant.pqCodebooks(spark, sf).collect()
    assert(books.length == 8 * 32)
    books.foreach { r =>
      val cv = r.getSeq[Double](2)
      assert(cv.length == 8)
      val cc = cv.foldLeft(0.0)((a, v) => a + v * v)
      assert(math.abs(cc - r.getDouble(3)) < 1e-9, "cnorm2 drifted from centroid")
    }
  }

  test("ADC + exact re-rank: top-10 recall >= 0.9 vs brute force, true cosines") {
    val pq = graft.SparkEntry.queries("x_sim_pq_topk")(spark, sf)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    assert(pq.length == 10)
    val brute = Similarity.bruteTopK(spark, sf, 0L, 10)
      .as[(Long, Double)].collect()
    val bruteAll = Similarity.bruteTopK(spark, sf, 0L, 500)
      .as[(Long, Double)].collect().toMap
    // re-ranked scores are EXACT cosines (re-rank reads full vectors)
    pq.foreach { case (id, s) => assert(math.abs(bruteAll(id) - s) < 1e-9) }
    // recall@10 against exact search — the VERDICT r4 acceptance bar
    val hits = pq.map(_._1).toSet.intersect(brute.map(_._1).toSet).size
    assert(hits >= 9, s"PQ recall@10 = $hits/10, need >= 9")
  }

  test("IVFADC: codes cover the corpus, ADC loses <= 1 of exact-in-probed-lists top-10") {
    val codes = ProductQuant.ivfadcCodeHistogram(spark, sf)
    assert(codes.agg(sum("n")).as[Long].head() ==
      graft.Tables(spark, sf, "embeddings").count() * 8)
    val adc = graft.SparkEntry.queries("x_sim_ivfadc_topk")(spark, sf)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    assert(adc.length == 10)
    // Re-ranked scores are TRUE cosines (the re-rank reads full vectors).
    val bruteAll = Similarity.bruteTopK(spark, sf, 0L, 500)
      .as[(Long, Double)].collect().toMap
    adc.foreach { case (id, s) => assert(math.abs(bruteAll(id) - s) < 1e-9) }
    // The honest recall bar: IVFADC's ceiling is the coarse probe (same
    // nprobe as ivfTopK), so measure what residual-PQ ADC loses INSIDE the
    // probed lists — exact search over the same lists is the reference.
    val exactProbed = Similarity.ivfTopK(spark, sf, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    val hits = adc.map(_._1).toSet.intersect(exactProbed).size
    assert(hits >= 9, s"IVFADC vs exact-in-probed recall@10 = $hits/10, need >= 9")
  }

  test("PqAssign kernel == composed least(struct(round(ArrayDot))) tree, float and double") {
    // The fused kernel replaced the 256-candidate Catalyst tree (janino
    // fallback at k=32); this pins bit-parity of the assignment against the
    // original composed expression on every corpus vector, for both input
    // element types (embedding float path, residual double path). Codebook:
    // deterministic synthetic words derived from the corpus itself.
    import graft.functions.{ArrayDot, PqAssign}
    val m = 8; val subDim = 8; val ksub = 32
    val e = graft.Tables(spark, sf, "embeddings")
    val seedRows = e.orderBy("vec_id").limit(ksub)
      .select("embedding").as[Array[Float]].collect()
    val books: Seq[(Int, Long, Array[Double], Double)] =
      (0 until m).flatMap { sub =>
        (0 until ksub).map { code =>
          val cv = seedRows(code).slice(sub * subDim, sub * subDim + subDim)
            .map(x => x.toDouble * 1.0000001 + 0.0000003)
          (sub, code.toLong, cv, cv.foldLeft(0.0)((a, v) => a + v * v))
        }
      }
    def composed(xsFor: Int => org.apache.spark.sql.Column) =
      array((0 until m).map { sub =>
        val xs = xsFor(sub)
        least(books.filter(_._1 == sub).map { case (_, code, cv, cc) =>
          struct(
            round(ArrayDot(xs, typedlit(cv.toSeq)) * -2.0 +
              ArrayDot(xs, xs) + lit(cc), 6).as("dist"),
            lit(code).as("code"))
        }: _*).getField("code")
      }: _*)
    // float path: raw embedding column
    val fl = e.select(
      PqAssign(col("embedding"), books, m, subDim).as("k"),
      composed(sub => expr(
        s"transform(slice(embedding, ${sub * subDim + 1}, $subDim), x -> CAST(x AS DOUBLE))"))
        .as("c"))
      .filter(not(col("k") <=> col("c"))).count()
    assert(fl == 0L, s"$fl float-path mismatches")
    // double path: a residual-shaped derived array
    val dbl = e.select(
      expr("transform(embedding, x -> CAST(x AS DOUBLE) - 0.125)").as("r"))
      .select(
        PqAssign(col("r"), books, m, subDim).as("k"),
        composed(sub => expr(s"slice(r, ${sub * subDim + 1}, $subDim)")).as("c"))
      .filter(not(col("k") <=> col("c"))).count()
    assert(dbl == 0L, s"$dbl double-path mismatches")
  }

  test("memory budget: 8 int codes per vector vs 64 floats is <= 1/8") {
    // 8 codes in [0,32) pack to 5 bits each = 5 bytes; even unpacked int8
    // storage is 8 bytes vs 256 raw — the artifact's logical width is the
    // claim, asserted from the schema (codes is the ONLY per-vector payload).
    val codes = ProductQuant.pqCodes(spark, sf)
    assert(codes.columns.toSeq == Seq("vec_id", "codes"))
    val maxCode = codes.select(max(array_max(col("codes")))).as[Long].head()
    assert(maxCode < 32, "codes exceed 5-bit range — memory claim void")
  }
}
