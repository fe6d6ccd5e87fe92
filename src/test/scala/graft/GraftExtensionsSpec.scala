package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-surface registration of graft's custom expressions. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("clean_html is callable from SQL via SparkSessionExtensions") {
    val shared = TestSpark.spark // ensure the shared context exists first
    // getOrCreate returns any active session as-is; clear (not stop) so a new
    // session with extensions is built over the same SparkContext.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder().master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import spark.implicits._
      Seq("<p>Hello <b>World</b> &amp; co</p>").toDF("d")
        .createOrReplaceTempView("docs_html")
      val out = spark.sql("SELECT clean_html(d) AS t FROM docs_html")
        .as[String].head()
      assert(out == "Hello World & co")
      // codegen'd path: over a real source the projection must sit inside a
      // WholeStageCodegen span (a local relation would collapse to
      // LocalTableScan and prove nothing)
      Tables(spark, "/root/testdata/sf0.001", "documents")
        .createOrReplaceTempView("docs_pq")
      val codegenStages = spark.sql("SELECT clean_html(text) FROM docs_pq")
        .queryExecution.executedPlan.collect {
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
        }
      assert(codegenStages.nonEmpty)
      // nested applications must NOT be collapsed by any optimizer rule:
      // clean_html is not idempotent (unescape-before-strip), so both calls
      // have to survive optimization
      val optimized = spark.sql("SELECT clean_html(clean_html(text)) AS t FROM docs_pq")
        .queryExecution.optimizedPlan
      val nCalls = optimized.expressions.map(_.collect {
        case c: graft.functions.CleanHtml => c
      }.size).sum
      assert(nCalls == 2, s"nested clean_html must not collapse, plan: $optimized")
      // the concrete divergence a collapse would hide:
      Seq("Tom &amp;amp; Jerry").toDF("d").createOrReplaceTempView("docs_dbl")
      val (once, twice) = {
        val r = spark.sql(
          "SELECT clean_html(d) AS o, clean_html(clean_html(d)) AS t FROM docs_dbl")
          .collect().head
        (r.getString(0), r.getString(1))
      }
      assert(once == "Tom &amp; Jerry")
      assert(twice == "Tom & Jerry")
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("native kernels are callable from SQL via SparkSessionExtensions") {
    val shared = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder().master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import spark.implicits._
      Seq((Seq(1.0f, 2.0f, 3.0f), Seq(2.0f, 0.5f, 1.0f), "the quick brown fox jumps"))
        .toDF("a", "b", "t").createOrReplaceTempView("kern")
      val row = spark.sql(
        """SELECT array_dot(a, b) AS dot,
                  simhash64(split(t, ' ')) AS sh,
                  size(shingle_hashes(split(t, ' '), 3)) AS nsh
           FROM kern""").collect().head
      assert(row.getDouble(0) == 1.0 * 2 + 2 * 0.5 + 3 * 1)
      assert(row.getLong(1) != 0L)
      assert(row.getInt(2) == 3) // 5 tokens -> 3 trigrams
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("approx_percentile stays within 1% of the exact quantile") {
    val spark = TestSpark.spark
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val exact = li.agg(org.apache.spark.sql.functions
      .expr("percentile(l_extendedprice, 0.5)")).head().getDouble(0)
    val approx = li.agg(org.apache.spark.sql.functions
      .expr("percentile_approx(l_extendedprice, 0.5, 10000)")).head().getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.01, s"approx=$approx exact=$exact")
  }

  test("md5 bottom-k sample percentile stays within its sampling envelope") {
    // The hash-gated estimator (a11_approx_percentile_md5): a 200-row
    // deterministic bottom-k sample per group. Sampling theory puts the
    // p50 estimate's relative error around 1/sqrt(200) ≈ 7% of the IQR;
    // gate generously at 15% of the exact value per group — the point is
    // the estimator ESTIMATES, while the DuckDB hash gate pins that both
    // engines compute the identical deterministic sample.
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val est = SparkEntry.queries("a11_approx_percentile_md5")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions
          .expr("percentile(l_extendedprice, 0.5)").as("p50"),
        org.apache.spark.sql.functions
          .expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (flag, (e50, e95)) =>
      val (a50, a95) = est(flag)
      assert(math.abs(a50 - e50) / e50 < 0.15, s"$flag p50: est=$a50 exact=$e50")
      assert(math.abs(a95 - e95) / e95 < 0.15, s"$flag p95: est=$a95 exact=$e95")
    }
  }

  test("approx_count_distinct stays within HLL error envelope") {
    val spark = TestSpark.spark
    val exact = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_partkey").distinct().count()
    val approx = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .agg(org.apache.spark.sql.functions
        .approx_count_distinct("l_partkey").as("a"))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }
}
