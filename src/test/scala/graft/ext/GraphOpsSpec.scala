package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("pagerank: every node ranked, floor at damping base, mass bounded, deterministic") {
    val r = q("x_graph_pagerank").as[(Long, Long)].collect()
    val li = graft.Tables(spark, sf, "lineitem")
    val nNodes = li.select("l_suppkey").distinct().count() +
      li.select("l_partkey").distinct().count()
    assert(r.length == nNodes)
    assert(r.forall(_._2 >= 150000L), "rank below the 0.15 damping base")
    // Integer floor division only loses mass, never creates it.
    assert(r.map(_._2).sum <= nNodes * 1000000L)
    val r2 = q("x_graph_pagerank").as[(Long, Long)].collect()
    assert(r.sortBy(_._1).sameElements(r2.sortBy(_._1)))
  }

  test("triangles: degeneracy-oriented count equals the id-ordered brute count") {
    val fast = q("x_graph_triangles").select("n_triangles").as[Long].head()
    val li = graft.Tables(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    val und = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .agg(countDistinct(col("a.l_orderkey")).as("w"))
      .filter(col("w") >= 2)
      .select("u", "v").cache()
    // id-ordered closure: u<v<w with all three edges present — orientation-free.
    val brute = und.as("e1")
      .join(und.as("e2"), col("e1.v") === col("e2.u"))
      .join(und.as("e3"), col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
      .count()
    und.unpersist()
    assert(fast == brute, s"oriented=$fast brute=$brute")
    assert(fast > 0, "fixture graph should contain triangles")
  }

  test("bloom sketch: zero false negatives, false positives visible not fatal") {
    val r = q("x_sketch_bloom")
    val falseNeg = r.filter(col("actual") === 1 && col("bloom_hit") === 0).count()
    assert(falseNeg == 0, "Bloom filters must never produce false negatives")
    // Every in-corpus doc is actually flagged present.
    assert(r.filter(col("actual") === 1).count() > 0)
  }

  test("centroid assignment: argmax dominates the own-label centroid score") {
    val assigned = q("x_sim_centroid_assign")
    // The winning sim must be >= the sim to the vector's OWN label centroid
    // (equality when assigned == own label). Own-label sims recomputed
    // independently through the public cosine/centroid building blocks.
    val dims = (0 until 64).map { i =>
      (sum(element_at(col("embedding"), i + 1).cast("double")
        .cast("decimal(18,12)")).cast("double") / count(lit(1))).as(s"m$i")
    }
    val cent = graft.Tables(spark, sf, "embeddings").groupBy("label")
      .agg(dims.head, dims.tail: _*)
      .select(col("label").as("c_label"),
        array((0 until 64).map(i => col(s"m$i")): _*).as("cvec"))
    val own = graft.Tables(spark, sf, "embeddings")
      .join(cent, col("label") === col("c_label"))
      .select(col("vec_id").as("v2"),
        round(Similarity.cosine(col("embedding"), col("cvec")), 6).as("own_sim"))
    val joined = assigned.join(own, col("vec_id") === col("v2"))
    assert(joined.count() == assigned.count())
    val violations = joined.filter(col("sim") < col("own_sim")).count()
    assert(violations == 0, "assigned centroid scored below own-label centroid")
    // And when the argmax IS the own label, sims agree exactly.
    val eq = joined.filter(col("assigned_label") === col("label"))
      .filter(col("sim") =!= col("own_sim")).count()
    assert(eq == 0)
  }
}
