package graft.ext

import graft.SparkSpec

/** RRF fusion semantics ([[HybridRetrieval.rrfFuse]]): both-leg docs sum
  * both reciprocal terms, single-leg docs contribute one, ties break on
  * doc_id, and the fused cut is exact. The full hybrid lineage (index
  * probe + dense leg + fusion) is pinned by the x_retrieval_hybrid_rrf
  * DuckDB oracle at 3 SFs; this spec pins the fusion algebra in isolation
  * so a leg regression and a fusion regression fail differently. */
class HybridRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def leg(rows: (Long, Long, Long)*) =
    rows.toDF("q_id", "doc_id", "rank")

  test("rrf: both-leg docs sum reciprocal terms; single-leg docs get one") {
    // text: d1 #1, d2 #2; dense: d2 #1, d3 #2  (K = 60)
    val out = HybridRetrieval.rrfFuse(
        leg((1L, 1L, 1L), (1L, 2L, 2L)),
        leg((1L, 2L, 1L), (1L, 3L, 2L)), k = 3)
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getDouble(3)))
    // d2: 1/62 + 1/61 ≈ 0.032524 beats d1: 1/61 ≈ 0.016393, d3: 1/62
    assert(out.map(_._1).toSeq == Seq(2L, 1L, 3L), s"fused order wrong: ${out.toSeq}")
    val d2 = out.find(_._1 == 2L).get._3
    assert(math.abs(d2 - (1.0 / 62 + 1.0 / 61)) < 1e-6)
    assert(out.find(_._1 == 3L).get._3 == math.floor(1.0 / 62 * 1e6 + 0.5) / 1e6 ||
           math.abs(out.find(_._1 == 3L).get._3 - 1.0 / 62) < 1e-6)
  }

  test("rrf: equal fused scores break ties on doc_id; cut at k is exact") {
    // Four docs each in exactly one leg at the same rank -> identical rrf.
    val out = HybridRetrieval.rrfFuse(
        leg((7L, 30L, 1L), (7L, 10L, 1L)),
        leg((7L, 40L, 1L), (7L, 20L, 1L)), k = 3)
      .collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(10L, 20L, 30L),
      "equal scores must order by doc_id and cut at k")
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
  }

  test("rrf: queries fuse independently (no cross-query leakage)") {
    val out = HybridRetrieval.rrfFuse(
        leg((1L, 1L, 1L), (2L, 5L, 1L)),
        leg((1L, 1L, 1L), (2L, 6L, 1L)), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSet == Set((1L, 1L), (2L, 5L), (2L, 6L)))
  }
}
