package graft.ext

import graft.SparkSpec
import graft.ops.SnapshotTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contract of the GENERALIZED MvSpec operator (VERDICT r9 #1): any
  * (keys, aggs) view maintains exactly under CDC deltas — avg retracts as
  * its (sum, count) pair, NULL group keys merge as one group (SQL GROUP BY
  * semantics), emptied groups drop, and the touched-group restriction's
  * two paths (plan-time literal predicate vs broadcast null-safe
  * semi-join) are row-identical, so the threshold is a pure performance
  * knob. */
class MvSpecSpec extends SparkSpec {
  import spark.implicits._

  private val spec = MvSpec(
    Seq("grp"),
    Seq(MvAgg.Count("cnt"),
      MvAgg.Sum("v", "total", Some("decimal(18,2)")),
      MvAgg.Avg("v", "avg_v", Some("decimal(18,2)")),
      MvAgg.Min("v", "min_v"),
      MvAgg.Max("v", "max_v")))

  private def rows(df: DataFrame): Set[(Option[String], Long, Option[Double],
      Option[Double], Option[Double], Option[Double])] =
    spec.finish(df).collect().map { r =>
      def d(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      (Option(r.getString(0)), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDecimal(2).doubleValue), d(3), d(4), d(5))
    }.toSet

  test("delete refresh equals full recompute: avg retraction, group drop, null keys") {
    val root = s"${tmpDir()}/t"
    // group "a": loses its min (1.0) -> recompute must find 5.0
    // group "b": fully deleted -> drops from the view
    // group NULL: one row deleted, one kept (null keys must merge)
    // group "c": a NULL v among kept rows (avg counts non-null only)
    val base = Seq(
      (1L, Some("a"), Some(1.0)), (2L, Some("a"), Some(5.0)), (3L, Some("a"), Some(9.0)),
      (4L, Some("b"), Some(2.0)),
      (5L, None, Some(3.0)), (6L, None, Some(7.0)),
      (7L, Some("c"), Some(4.0)), (8L, Some("c"), None), (9L, Some("c"), Some(6.0))
    ).toDF("k", "grp", "v")
    val v0 = SnapshotTable.upsert(spark, root, base, Seq("k"))
    val mv0 = spec.partial(SnapshotTable.read(spark, root, Some(v0)))
    val v1 = SnapshotTable.delete(spark, root,
      col("k").isin(1L, 4L, 5L, 7L))
    val Some((adds, removes)) = SnapshotTable.changesDelta(spark, root, v0, Some(v1))
    val got = rows(spec.combineDelta(spark, root, mv0, adds, removes))
    val full = rows(spec.partial(SnapshotTable.read(spark, root)))
    assert(got == full, s"refresh $got != recompute $full")
    assert(!got.exists(_._1.contains("b")), "emptied group must drop")
    assert(got.count(_._1.isEmpty) == 1, "NULL keys must merge to one group")
    val a = got.find(_._1.contains("a")).get
    assert(a._5.contains(5.0), "vacated min must recompute to the runner-up")
    val c = got.find(_._1.contains("c")).get
    assert(c._2 == 2L && c._4.contains(6.0), "avg must count non-null values only")
  }

  test("high-cardinality view: literal path and semi-join path are row-identical") {
    val root = s"${tmpDir()}/t"
    // 300 single-row groups deleted: far past a tiny literal threshold.
    val base = spark.range(3000)
      .select(col("id").as("k"), concat(lit("g"), col("id") % 1000).as("grp"),
        (col("id") % 97).cast("double").as("v"))
    val v0 = SnapshotTable.upsert(spark, root, base, Seq("k"))
    val mv0 = spec.partial(SnapshotTable.read(spark, root, Some(v0)))
    val v1 = SnapshotTable.delete(spark, root, col("k") % 10 === 0)
    val Some((adds, removes)) = SnapshotTable.changesDelta(spark, root, v0, Some(v1))
    val viaLiteral = rows(
      spec.combineDelta(spark, root, mv0, adds, removes, maxLiteralKeys = 100000))
    val viaSemiJoin = rows(
      spec.combineDelta(spark, root, mv0, adds, removes, maxLiteralKeys = 4))
    assert(viaLiteral == viaSemiJoin,
      "the touched-key restriction paths must be row-identical")
    assert(viaLiteral == rows(spec.partial(SnapshotTable.read(spark, root))))
  }

  test("insert-only combine: null keys merge, new groups appear, sums stay exact") {
    val mv0 = spec.partial(Seq(
      (Some("a"), Some(1.5)), (None, Some(2.5))).toDF("grp", "v"))
    val delta = spec.partial(Seq(
      (Some("a"), Some(0.25)), (None, Some(0.75)), (Some("z"), Some(9.0))
    ).toDF("grp", "v"))
    val got = rows(spec.combine(mv0, delta))
    assert(got == Set(
      (Some("a"), 2L, Some(1.75), Some(0.875), Some(0.25), Some(1.5)),
      (None, 2L, Some(3.25), Some(1.625), Some(0.75), Some(2.5)),
      (Some("z"), 1L, Some(9.0), Some(9.0), Some(9.0), Some(9.0))))
  }

  test("update CDC through the op: retraction + insertion on the same rows") {
    val root = s"${tmpDir()}/t"
    val base = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 40.0)
    ).toDF("k", "grp", "v")
    val v0 = SnapshotTable.upsert(spark, root, base, Seq("k"))
    val mv0 = spec.partial(SnapshotTable.read(spark, root, Some(v0)))
    // moves k=2 into group "b" AND rescales it — both groups change shape
    val v1 = SnapshotTable.update(spark, root, col("k") === 2,
      Map("grp" -> lit("b"), "v" -> (col("v") * 10)))
    val Some((adds, removes)) = SnapshotTable.changesDelta(spark, root, v0, Some(v1))
    val got = rows(spec.combineDelta(spark, root, mv0, adds, removes))
    assert(got == rows(spec.partial(SnapshotTable.read(spark, root))))
    val b = got.find(_._1.contains("b")).get
    assert(b._2 == 3L && b._6.contains(200.0))
  }

  test("spec validation refuses colliding aliases and empty shapes") {
    intercept[IllegalArgumentException](MvSpec(Nil, Seq(MvAgg.Count("c"))))
    intercept[IllegalArgumentException](MvSpec(Seq("k"), Nil))
    intercept[IllegalArgumentException](
      MvSpec(Seq("k"), Seq(MvAgg.Count("x"), MvAgg.Sum("v", "x"))))
    intercept[IllegalArgumentException](
      MvSpec(Seq("k"), Seq(MvAgg.Count("k"))))
  }
}
