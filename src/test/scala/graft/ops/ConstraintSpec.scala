package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Named CHECK constraints ([[SnapshotTable.setCheckConstraint]]): SQL
  * semantics (only FALSE violates, NULL passes), validated against existing
  * data at declaration, enforced on every commit's NEW rows before the
  * manifest CAS — a violating commit never becomes visible and leaves the
  * table exactly as it was. */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  test("declaration validates existing data; violating commits are rejected atomically") {
    val root = s"${tmpDir()}/t"
    SnapshotTable.upsert(spark, root,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "grp", "price"), Seq("k"))
    // Declaring a constraint the data already breaks must fail loudly.
    intercept[IllegalArgumentException] {
      SnapshotTable.setCheckConstraint(spark, root, "price_cap", "price < 15.0")
    }
    val v = SnapshotTable.setCheckConstraint(spark, root, "price_pos", "price > 0.0")

    // A violating append is REJECTED and the table is untouched (version,
    // rows, and no orphan files visible).
    intercept[IllegalArgumentException] {
      SnapshotTable.appendOnce(spark, root,
        Seq((3L, "c", -1.0)).toDF("k", "grp", "price"), "cons-spec", 0L)
    }
    assert(SnapshotTable.currentVersion(spark, root).contains(v))
    assert(SnapshotTable.read(spark, root).count() == 2)

    // A violating UPDATE is rejected too — the rewrite is checked, not
    // just inserts.
    intercept[IllegalArgumentException] {
      SnapshotTable.update(spark, root, col("k") === 1L,
        Map("price" -> lit(-5.0)))
    }
    assert(SnapshotTable.read(spark, root).filter(col("price") < 0).count() == 0)

    // Valid commits flow, and the constraint is inherited through them.
    SnapshotTable.appendOnce(spark, root,
      Seq((3L, "c", 30.0)).toDF("k", "grp", "price"), "cons-spec", 1L)
    intercept[IllegalArgumentException] {
      SnapshotTable.upsert(spark, root,
        Seq((4L, "d", 0.0)).toDF("k", "grp", "price"), Seq("k"))
    }
    assert(SnapshotTable.read(spark, root).count() == 3)

    // Dropping the constraint re-opens the gate.
    SnapshotTable.dropCheckConstraint(spark, root, "price_pos")
    SnapshotTable.upsert(spark, root,
      Seq((4L, "d", 0.0)).toDF("k", "grp", "price"), Seq("k"))
    assert(SnapshotTable.read(spark, root).count() == 4)
  }

  test("NULL passes (SQL CHECK): constraints on evolved columns hold over old rows") {
    val root = s"${tmpDir()}/t"
    SnapshotTable.appendOnce(spark, root,
      Seq((1L, "a")).toDF("k", "grp"), "cons-spec", 0L)
    // Evolve a score column, then constrain it: the pre-evolution rows
    // read NULL — which must PASS, both at declaration and on commits that
    // carry NULL for it.
    SnapshotTable.appendOnce(spark, root,
      Seq((2L, "b", 0.5)).toDF("k", "grp", "score"), "cons-spec", 1L)
    SnapshotTable.setCheckConstraint(spark, root, "score_unit",
      "score >= 0.0 AND score <= 1.0")
    SnapshotTable.appendOnce(spark, root,
      Seq((3L, "c")).toDF("k", "grp"), "cons-spec", 2L) // NULL score: passes
    intercept[IllegalArgumentException] {
      SnapshotTable.appendOnce(spark, root,
        Seq((4L, "d", 1.5)).toDF("k", "grp", "score"), "cons-spec", 3L)
    }
    assert(SnapshotTable.read(spark, root).count() == 3)

    // dropColumn of a constrained column is refused until the constraint
    // goes; then the drop works.
    intercept[IllegalArgumentException] {
      SnapshotTable.dropColumn(spark, root, "score")
    }
    SnapshotTable.dropCheckConstraint(spark, root, "score_unit")
    SnapshotTable.dropColumn(spark, root, "score")
    assert(SnapshotTable.read(spark, root).columns.toSeq == Seq("k", "grp"))
  }

  test("restore rewinds the constraint set with the data") {
    val root = s"${tmpDir()}/t"
    val v0 = SnapshotTable.upsert(spark, root,
      Seq((1L, 10.0)).toDF("k", "price"), Seq("k"))
    SnapshotTable.setCheckConstraint(spark, root, "cap", "price < 100.0")
    SnapshotTable.restore(spark, root, v0)
    // The pre-constraint state is back: a 150.0 row commits fine.
    SnapshotTable.upsert(spark, root, Seq((2L, 150.0)).toDF("k", "price"), Seq("k"))
    assert(SnapshotTable.read(spark, root).count() == 2)
    // A malformed expression fails at declaration, not at the next commit.
    intercept[Exception] {
      SnapshotTable.setCheckConstraint(spark, root, "bad", "price <<>> 1")
    }
  }
}
