package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bit-parity of the native kernels vs the higher-order formulations they
  * replaced: same fold order, same null semantics — every previously-green
  * oracle hash must be unmovable by the swap. */
class VectorMathSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("ArrayDot == aggregate(zip_with(...)) bit-for-bit on the corpus") {
    val e = graft.Tables(spark, sf, "embeddings")
    val a = e.select(col("vec_id").as("a"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("eb"))
    val pairs = a.join(b, col("b") === col("a") + 1)
    val diffs = pairs
      .select(ArrayDot(col("ea"), col("eb")).as("fast"),
        hofDot(col("ea"), col("eb")).as("slow"))
      .filter(col("fast") =!= col("slow") ||
        col("fast").isNull =!= col("slow").isNull)
      .count()
    assert(diffs == 0)
    assert(pairs.count() > 0)
  }

  test("ArrayDot handles double arrays, mixed types, and null semantics") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(3.0, 4.0)),   // float × double
      (2L, Seq(0.5f, -1.5f), Seq(2.0, 2.0))
    ).toDF("id", "f", "d")
    val got = df.select(col("id"), ArrayDot(col("f"), col("d")).as("dot"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 11.0 && got(2L) == -2.0)
    // length mismatch -> null (zip_with padding semantics)
    val mismatch = Seq((Seq(1.0f, 2.0f), Seq(1.0))).toDF("x", "y")
      .select(ArrayDot(col("x"), col("y")).as("dot"))
      .collect().head
    assert(mismatch.isNullAt(0))
    // null input array -> null
    val nullIn = Seq((Option.empty[Seq[Float]], Some(Seq(1.0)))).toDF("x", "y")
      .select(ArrayDot(col("x"), col("y")).as("dot")).collect().head
    assert(nullIn.isNullAt(0))
  }

  test("ShingleHashes == composed shingle->distinct->xxhash64 on the corpus") {
    val d = graft.Tables(spark, sf, "documents")
      .withColumn("toks", graft.ext.TextAnalysis.tokens(col("text")))
      .withColumn("shingles", expr(graft.ext.Dedup.shingleExpr))
    val diffs = d
      .select(ShingleHashes(col("toks"), 3).as("fast"),
        expr(graft.ext.Dedup.shingleHashExpr).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diffs == 0)
    // edge shapes: <3 tokens -> empty; duplicate shingles dedup in order
    val edge = Seq((1L, ""), (2L, "a b"), (3L, "a b c a b c a b c"))
      .toDF("doc_id", "text")
      .withColumn("toks", graft.ext.TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), ShingleHashes(col("toks"), 3).as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(edge(1L).isEmpty && edge(2L).isEmpty)
    assert(edge(3L).size == 3 && edge(3L).distinct == edge(3L)) // a b c / b c a / c a b, repeats deduped
  }

  test("MinHashSig == generated-SQL signature bit-for-bit on the corpus") {
    val (a, b) = graft.ext.Dedup.minhashSeeds(32)
    val d = graft.Tables(spark, sf, "documents")
      .withColumn("toks", graft.ext.TextAnalysis.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .withColumn("shingles", expr(graft.ext.Dedup.shingleExpr))
      .withColumn("shash", expr(graft.ext.Dedup.shingleHashExpr))
    val diffs = d
      .select(MinHashSig(col("shash"), a, b).as("fast"),
        expr(graft.ext.Dedup.minhashSig(32)).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diffs == 0)
    assert(d.count() > 0)
  }

  test("Md5Hash60 == conv(substring(md5)) SQL form bit-for-bit on the corpus") {
    val d = graft.Tables(spark, sf, "documents")
    val diffs = d
      .select(Md5Hash60(col("text")).as("fast"),
        expr(graft.ext.Dedup.md5Hash60("text")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diffs == 0)
    // known value: md5('hello') = 5d41402abc4b2a76... -> 0x5d41402abc4b2a7
    val hello = Seq("hello").toDF("s").select(Md5Hash60(col("s"))).as[Long].head()
    assert(hello == 419982666956583591L)
  }

  test("SimHashMd5 == simhashMd5Expr bit-for-bit on the corpus") {
    val d = graft.Tables(spark, sf, "documents")
      .withColumn("toks", graft.ext.TextAnalysis.tokens(col("text")))
    val diffs = d
      .select(SimHashMd5(col("toks")).as("fast"),
        expr(graft.ext.Dedup.simhashMd5Expr).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diffs == 0)
    assert(d.count() > 0)
  }

  test("SimHash64 == simhashExpr bit-for-bit on the corpus") {
    val d = graft.Tables(spark, sf, "documents")
      .withColumn("toks", graft.ext.TextAnalysis.tokens(col("text")))
    val diffs = d
      .select(SimHash64(col("toks")).as("fast"),
        expr(graft.ext.Dedup.simhashExpr).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diffs == 0)
    assert(d.count() > 0)
  }

  test("RepetitionStats == sorted-HOF gram counts bit-for-bit on the corpus") {
    val d = graft.Tables(spark, sf, "documents")
      .withColumn("toks", graft.ext.TextAnalysis.tokens(col("text")))
      .withColumn("st", RepetitionStats(col("toks")))
      .withColumn("h2", expr(
        """IF(size(toks) < 2, CAST(array() AS ARRAY<BIGINT>),
          |  array_sort(transform(sequence(1, size(toks) - 1),
          |    i -> xxhash64(concat_ws(' ', element_at(toks, i), element_at(toks, i+1))))))""".stripMargin))
      .withColumn("h3", expr(
        """IF(size(toks) < 3, CAST(array() AS ARRAY<BIGINT>),
          |  array_sort(transform(sequence(1, size(toks) - 2),
          |    i -> xxhash64(concat_ws(' ', element_at(toks, i), element_at(toks, i+1), element_at(toks, i+2))))))""".stripMargin))
      // max run length in the sorted array == top gram count; sorted-neighbour
      // equality == duplicated-gram membership (both IF-guarded: sequence(1,0)
      // is DESCENDING, the round-1 trap)
      .withColumn("top2", expr(
        """IF(size(h2) = 0, 0L, aggregate(h2,
          |  named_struct('run', 0L, 'best', 0L, 'prev', CAST(NULL AS BIGINT)),
          |  (acc, x) -> named_struct(
          |    'run', IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1L, 1L),
          |    'best', greatest(acc.best, IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1L, 1L)),
          |    'prev', x),
          |  acc -> acc.best))""".stripMargin))
      .withColumn("dup3", expr(
        """IF(size(h3) = 0, 0L, CAST(size(filter(sequence(1, size(h3)), i ->
          |  (i > 1 AND element_at(h3, i) = element_at(h3, i - 1)) OR
          |  (i < size(h3) AND element_at(h3, i) = element_at(h3, i + 1)))) AS BIGINT))""".stripMargin))
    val diffs = d.filter(col("st") =!= array(col("top2"),
        size(col("h2")).cast("long"), col("dup3"), size(col("h3")).cast("long")))
      .count()
    assert(diffs == 0)
    assert(d.count() > 0)
    // edge shapes by hand
    val edge = Seq((1L, ""), (2L, "a"), (3L, "a b"), (4L, "a a a"))
      .toDF("doc_id", "text")
      .withColumn("toks", graft.ext.TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), RepetitionStats(col("toks")).as("st"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(edge(2L) == Seq(0L, 0L, 0L, 0L))
    assert(edge(3L) == Seq(1L, 1L, 0L, 0L))      // one unique 2-gram, no 3-gram
    assert(edge(4L) == Seq(2L, 2L, 0L, 1L))      // 'a a' twice; single 3-gram not duplicated
  }
}
