package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine expression matches a hand computation") {
    val df = Seq((Array(1.0f, 0.0f, 2.0f), Array(2.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
    val sim = df.select(Similarity.cosine(col("a"), col("b")).as("s"))
      .as[Double].head()
    val expect = 2.0 / (math.sqrt(5.0) * math.sqrt(5.0))
    assert(math.abs(sim - expect) < 1e-12)
  }

  test("brute top-k is ordered and self-excluded") {
    val top = Similarity.bruteTopK(spark, sf, 0L, 10)
      .as[(Long, Double)].collect()
    assert(top.length == 10)
    assert(!top.map(_._1).contains(0L))
    assert(top.map(_._2).toSeq == top.map(_._2).sorted(Ordering[Double].reverse).toSeq)
  }

  test("ANN results are a subset of the bucket and exact-scored") {
    val brute = Similarity.bruteTopK(spark, sf, 0L, 500)
      .as[(Long, Double)].collect().toMap
    val ann = Similarity.annTopK(spark, sf, 0L, 10)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    assert(ann.nonEmpty)
    // every ANN hit carries its true cosine score
    ann.foreach { case (id, s) => assert(math.abs(brute(id) - s) < 1e-9) }
  }

  test("LSH buckets partition the corpus") {
    val planes = Similarity.hyperplanes(4, 64)
    val e = graft.Tables(spark, sf, "embeddings")
    val total = e.count()
    val bucketed = e.withColumn("bucket", Similarity.lshBucket(col("embedding"), planes))
    assert(bucketed.count() == total)
    val nBuckets = bucketed.select("bucket").distinct().count()
    assert(nBuckets > 1 && nBuckets <= 16)
  }

  test("IVF assignments cover every vector with k lists") {
    val assign = Similarity.ivfAssignments(spark, sf, nLists = 8)
    assert(assign.count() == graft.Tables(spark, sf, "embeddings").count())
    val lists = assign.select("list_id").distinct().count()
    assert(lists == 8)
  }

  test("semantic dedup equals a brute-force recompute of the keep rule") {
    val tau = 0.4
    val got = Similarity.semanticDedup(spark, sf, nLists = 8, tau = tau)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val assign = Similarity.ivfAssignments(spark, sf, nLists = 8)
      .as[(Long, Long)].collect().toMap
    val vecs = graft.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = vecs.toMap
    val wantKept = vecs.map { case (id, v) =>
      id -> !vecs.exists { case (oid, _) =>
        oid < id && assign(oid) == assign(id) && cos(byId(oid), v) >= tau
      }
    }.toMap
    assert(got.length == vecs.length)
    got.foreach { case (id, list, kept) =>
      assert(list == assign(id))
      assert(kept == wantKept(id), s"vec $id kept=$kept want=${wantKept(id)}")
    }
    // The threshold sits inside the fixture's cosine range: both routes fire.
    assert(got.exists(!_._3), "no duplicates dropped — tau too high for fixture")
    assert(got.count(_._3) > got.length / 2, "most vectors should survive")
  }

  test("semantic keep-best drops the lower-quality member of every >=tau pair") {
    val tau = 0.4
    val got = Similarity.semanticKeepBest(spark, sf, nLists = 8, tau = tau)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    val assign = Similarity.ivfAssignments(spark, sf, nLists = 8)
      .as[(Long, Long)].collect().toMap
    val quality = graft.Tables(spark, sf, "documents")
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    val vecs = graft.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = vecs.toMap
    // brute recompute of the dominance rule: v dropped iff some cluster
    // sibling u with cos>=tau has higher quality (or equal quality and a
    // lower id)
    val wantKept = vecs.map { case (id, v) =>
      id -> !vecs.exists { case (oid, ov) =>
        oid != id && assign(oid) == assign(id) && cos(ov, v) >= tau &&
          (quality(oid) > quality(id) ||
            (quality(oid) == quality(id) && oid < id))
      }
    }.toMap
    assert(got.length == vecs.length)
    got.foreach { case (id, list, q, kept) =>
      assert(list == assign(id) && q == quality(id))
      assert(kept == wantKept(id), s"vec $id kept=$kept want=${wantKept(id)}")
    }
    assert(got.exists(!_._4), "no duplicates dropped — tau too high for fixture")
    // The keep rule differs from min-id where quality inverts the id order:
    // at least one survivor must be a NON-minimal id inside a >=tau pair,
    // or the upgrade is vacuous on this fixture.
    val minIdKept = Similarity.semanticDedup(spark, sf, nLists = 8, tau = tau)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert(got.exists { case (id, _, _, kept) => kept != minIdKept(id) },
      "keep-best coincides with min-id everywhere — fixture cannot tell them apart")
  }

  test("IVF probe-time top-k carries exact scores and decent recall") {
    val brute = Similarity.bruteTopK(spark, sf, 0L, 10)
      .as[(Long, Double)].collect()
    val bruteAll = Similarity.bruteTopK(spark, sf, 0L, 500)
      .as[(Long, Double)].collect().toMap
    val ivf = Similarity.ivfTopK(spark, sf, 0L, 10, nLists = 8, nprobe = 4)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    assert(ivf.length == 10)
    // every IVF hit carries its true cosine score
    ivf.foreach { case (id, s) => assert(math.abs(bruteAll(id) - s) < 1e-9) }
    // recall@10 with half the lists probed: expect a sane overlap (the
    // fixture's cosine landscape is flat, so demand >= 3/10, not perfection)
    val overlap = ivf.map(_._1).toSet.intersect(brute.map(_._1).toSet).size
    assert(overlap >= 3, s"recall@10 too low: $overlap/10")
  }

  test("recall eval: bounded, ppm-consistent, and q0 agrees with the ANN/brute queries") {
    val r = graft.SparkEntry.queries("x_sim_recall_eval")(spark, sf)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r.length == 20, "one row per query point")
    r.foreach { case (q, hits, ppm) =>
      assert(hits >= 0 && hits <= 10, s"q$q hits=$hits")
      assert(ppm == hits * 100000L, s"q$q ppm=$ppm for hits=$hits")
    }
    // Cross-check query 0 against the independently registered single-query
    // formulations: hits(0) == |ann_lsh top-10 ∩ brute top-10|.
    val ann = graft.SparkEntry.queries("x_sim_ann_lsh")(spark, sf)
      .select("vec_id").as[Long].collect().toSet
    val brute0 = Similarity.bruteTopK(spark, sf, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(r.head._1 == 0L && r.head._2 == ann.intersect(brute0).size,
      s"q0 hits ${r.head._2} != |ann ∩ brute| = ${ann.intersect(brute0).size}")
  }
}
