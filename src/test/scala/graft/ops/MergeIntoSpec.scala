package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clause-level semantics of the declarative MERGE builder plus the
  * property pinning it to `Upsert.merge` on the unconditional case. */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)

  private def frame(keys: Seq[Int]): DataFrame =
    keys.map(k => (k.toLong, s"v${rnd.nextInt(100)}", rnd.nextDouble()))
      .toDF("k", "v1", "v2")

  private def canon(df: DataFrame): Seq[String] =
    df.orderBy("k").collect().map(_.toString).toSeq

  test("property: updateAll+insertAll ≡ Upsert.merge (20 random cases)") {
    (1 to 20).foreach { _ =>
      val t = frame((1 to 30).filter(_ => rnd.nextBoolean()))
      val s = frame((1 to 30).filter(_ => rnd.nextBoolean()))
      val declarative = MergeInto.into(t).using(s).on("k")
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().result()
      assert(canon(declarative) == canon(Upsert.merge(t, s, Seq("k"))))
    }
  }

  test("matched delete beats update; conditions gate each clause") {
    val t = Seq((1L, "t1", 1.0), (2L, "t2", 2.0), (3L, "t3", 3.0)).toDF("k", "v1", "v2")
    val s = Seq((1L, "s1", 9.0), (2L, "s2", 0.5), (4L, "s4", 9.0), (5L, "s5", 0.5))
      .toDF("k", "v1", "v2")
    val out = MergeInto.into(t).using(s).on("k")
      .whenMatchedDelete(col("s.v2") < 1.0)        // kills k=2
      .whenMatchedUpdateAll()                      // updates k=1
      .whenNotMatchedInsertAll(Some(col("s.v2") > 1.0)) // inserts k=4, drops k=5
      .result()
    assert(canon(out) == Seq("[1,s1,9.0]", "[3,t3,3.0]", "[4,s4,9.0]"))
  }

  test("no insert clause drops source-only rows; no update keeps target values") {
    val t = Seq((1L, "t1", 1.0)).toDF("k", "v1", "v2")
    val s = Seq((1L, "s1", 9.0), (2L, "s2", 2.0)).toDF("k", "v1", "v2")
    val out = MergeInto.into(t).using(s).on("k").result()
    assert(canon(out) == Seq("[1,t1,1.0]"))
  }

  test("merge lowers to one join (no extra shuffles of the target)") {
    val t = frame(1 to 20)
    val s = frame(5 to 25)
    val df = MergeInto.into(t).using(s).on("k")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().result()
    df.write.format("noop").mode("overwrite").save() // finalize AQE subtrees
    val p0 = df.queryExecution.executedPlan
    val plans = p0 +: p0.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
    }
    val joins = plans.flatMap(_.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    })
    assert(joins.size == 1, s"expected exactly one join, got: $joins")
  }
}
