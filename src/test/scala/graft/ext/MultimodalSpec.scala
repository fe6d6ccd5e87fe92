package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("phash: bands recompose the signature, stride is content-sensitive") {
    val r = q("x_mm_phash").cache()
    val n = graft.Tables(spark, sf, "documents")
      .filter(col("doc_id") % 3 === 0).count()
    assert(r.count() == n)
    // b0..b3 are a lossless decomposition of the 60-bit signature.
    val broken = r.filter(
      col("b0") + shiftleft(col("b1"), 15) + shiftleft(col("b2"), 30) +
        shiftleft(col("b3"), 45) =!= col("phash")).count()
    assert(broken == 0, "bands do not recompose the signature")
    // Different contents give a spread of signatures (not a constant hash).
    assert(r.select("phash").distinct().count() > n / 2)
    r.unpersist()
  }

  test("phash near-dup join: banded pairs == brute force, exact at threshold 3") {
    // Synthetic media: a base payload and variants with 0-5 single-char
    // substitutions at stride sample points — hamming distances straddle
    // the threshold, so both inclusion AND exclusion paths are exercised.
    val base = ('a' to 'z').mkString * 10 // 260 chars
    def mutate(s: String, positions: Seq[Int]): String =
      positions.foldLeft(s)((acc, p) => acc.updated(p, if (acc(p) == 'z') 'a' else 'z'))
    val payloads = Seq(
      (1L, base),
      (2L, base),                              // identical → hamming 0
      (3L, mutate(base, Seq(4))),              // 1 sample flipped
      (4L, mutate(base, Seq(4, 30, 60, 90, 120, 150, 180, 210))), // many
      (5L, mutate(base, Seq(8, 12))),
      (6L, base.reverse))                      // far
    val df = payloads.toDF("media_id", "text")
      .select(col("media_id"), Multimodal.phash60("text").as("phash"))
      .cache()
    val banded = Multimodal.phashNearDupPairs(df)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val rows = df.as[(Long, Long)].collect()
    val brute = (for {
      (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
      hm = java.lang.Long.bitCount(ha ^ hb) if hm <= 3
    } yield (ia, ib, hm)).toSet
    assert(banded == brute, s"banded=$banded brute=$brute")
    assert(brute.contains((1L, 2L, 0)), "identical payloads at hamming 0")
    assert(brute.exists(t => t._3 > 0), "a mutated variant within threshold")
    df.unpersist()
  }

  test("phash near-dup join: fixture consistency — banding loses nothing vs brute") {
    val images = graft.Tables(spark, sf, "documents")
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("media_id"), col("text"))
    val hashed = images
      .select(col("media_id"), Multimodal.phash60("text").as("phash")).cache()
    val banded = Multimodal.phashNearDupPairs(hashed).count()
    val brute = hashed.as("a").join(hashed.as("b"),
        col("a.media_id") < col("b.media_id") &&
          expr("bit_count(a.phash ^ b.phash)") <= 3)
      .count()
    assert(banded == brute, s"banded=$banded brute=$brute")
    hashed.unpersist()
  }
}
