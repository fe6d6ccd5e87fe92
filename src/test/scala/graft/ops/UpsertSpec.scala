package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Property tests for the MERGE combinator (SURVEY.md §5): idempotence,
  * key-cardinality invariant, full-outer formulation equivalence, and the
  * parquet upsert's bootstrap/swap discipline. */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  /** Random key-unique frames sharing a schema (k, v1, v2). */
  private def frame(keys: Seq[Int]): DataFrame =
    keys.map(k => (k.toLong, s"v${rnd.nextInt(100)}", rnd.nextDouble()))
      .toDF("k", "v1", "v2")

  private def canon(df: DataFrame): Seq[String] =
    df.orderBy("k").collect().map(_.toString).toSeq

  test("property: merge idempotence + key cardinality (20 random cases)") {
    (1 to 20).foreach { _ =>
      val tKeys = (1 to 30).filter(_ => rnd.nextBoolean())
      val sKeys = (1 to 30).filter(_ => rnd.nextBoolean())
      val t = frame(tKeys)
      val s = frame(sKeys)
      val once = Upsert.merge(t, s, Seq("k"))
      // |t ⋈full s| == |keys(t) ∪ keys(s)|
      assert(once.count() == (tKeys.toSet ++ sKeys.toSet).size)
      // merge(merge(t,s),s) == merge(t,s)
      assert(canon(Upsert.merge(once, s, Seq("k"))) == canon(once))
      // full-outer+coalesce formulation agrees with anti-join+union
      assert(canon(Upsert.mergeFullOuter(t, s, Seq("k"))) == canon(once))
    }
  }

  test("source wins on every matched key; target survives elsewhere") {
    val t = Seq((1L, "old", 1.0), (2L, "keep", 2.0)).toDF("k", "v1", "v2")
    val s = Seq((1L, "new", 9.0), (3L, "ins", 3.0)).toDF("k", "v1", "v2")
    val m = Upsert.merge(t, s, Seq("k")).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(m == Seq((1L, "new", 9.0), (2L, "keep", 2.0), (3L, "ins", 3.0)))
  }

  test("upsertParquet: bootstrap, merge, snapshot swap, no leftovers") {
    val path = tmpDir() + "/target"
    Upsert.upsertParquet(spark, path, frame(Seq(1, 2, 3)), Seq("k"))
    assert(spark.read.parquet(path).count() == 3)
    Upsert.upsertParquet(spark, path, frame(Seq(3, 4)), Seq("k"))
    val after = spark.read.parquet(path)
    assert(after.count() == 4)
    assert(after.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // snapshot-swap leaves no tmp/old dirs behind
    val parent = new java.io.File(path).getParentFile.listFiles().map(_.getName)
    assert(parent.toSeq == Seq("target"))
  }

  test("latestPerKey keeps the newest version per key") {
    val src = Seq((1L, 100L, "a"), (1L, 300L, "c"), (1L, 200L, "b"), (2L, 50L, "x"))
      .toDF("k", "ver", "v")
    val out = Upsert.latestPerKey(src, Seq("k"), "ver").orderBy("k")
      .as[(Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, 300L, "c"), (2L, 50L, "x")))
  }

  test("withRetry: transient failures retried, exhaustion rethrows, upsert converges") {
    // two transient failures then success
    var calls = 0
    val got = Upsert.withRetry(attempts = 3, backoffMs = 1) {
      calls += 1
      if (calls < 3) throw new RuntimeException(s"transient $calls")
      42
    }
    assert(got == 42 && calls == 3)
    // exhaustion rethrows the LAST failure
    var n = 0
    val e = intercept[RuntimeException](Upsert.withRetry(attempts = 2, backoffMs = 1) {
      n += 1; throw new RuntimeException(s"boom $n")
    })
    assert(e.getMessage == "boom 2" && n == 2)
    // retried MERGE is idempotent end-to-end: a failure AFTER a completed
    // upsert (sink flake) triggers a re-run that must not change the table
    val path = tmpDir() + "/target"
    Upsert.upsertParquetWithRetry(spark, path, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    var attempt = 0
    Upsert.withRetry(attempts = 2, backoffMs = 1) {
      attempt += 1
      Upsert.upsertParquet(spark, path, Seq((1L, "A2"), (2L, "b")).toDF("k", "v"), Seq("k"))
      if (attempt == 1) throw new RuntimeException("post-commit transient flake")
    }
    val after = spark.read.parquet(path).orderBy("k").as[(Long, String)].collect().toSeq
    assert(after == Seq((1L, "A2"), (2L, "b")))
  }
}
