package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The memoized-bootstrap contract (VERDICT r10 #5) that nine lineage
  * queries' RERUN-STABILITY now rests on: seed once per corpus tag, DML on
  * top, metadata-only rewind at query end — and a run that crashed between
  * DML and rewind self-heals by re-bootstrapping (the marker pins the
  * exact version the table must sit at). */
class SeededLineageSpec extends SparkSpec {
  import spark.implicits._

  test("seed memoizes per tag; reset rewinds metadata-only; crash and corpus-change self-heal") {
    val root = s"${tmpDir()}/t"
    var boots = 0
    def bootstrap(): Long = {
      boots += 1
      SnapshotTable.commit(spark, root, Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"))
    }
    def rows(): Set[(Long, Double)] = SnapshotTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val seedRows = Set(1L -> 1.0, 2L -> 2.0)

    // Run 1: boot, DML, read, rewind.
    val v0 = SeededLineage.seed(spark, root, "corpus-a")(bootstrap())
    assert(boots == 1 && rows() == seedRows)
    SnapshotTable.delete(spark, root, col("k") === 1L)
    assert(rows() == Set(2L -> 2.0))
    SeededLineage.reset(spark, root, "corpus-a", v0)
    assert(rows() == seedRows, "reset must rewind to the seed state")

    // Run 2: the memoized path — no re-bootstrap, same seed state.
    val v1 = SeededLineage.seed(spark, root, "corpus-a")(bootstrap())
    assert(boots == 1, "a clean rerun must not re-bootstrap")
    assert(rows() == seedRows)

    // Crash simulation: DML lands, the run dies before reset — the marker
    // no longer pins the current version, so the next seed re-bootstraps
    // (and the bootstrap, a whole-snapshot commit, resets the state).
    SnapshotTable.update(spark, root, col("k") === 2L, Map("v" -> lit(99.0)))
    val v2 = SeededLineage.seed(spark, root, "corpus-a")(bootstrap())
    assert(boots == 2, "a crashed run must self-heal by re-bootstrapping")
    assert(rows() == seedRows)

    // Corpus change: a different tag re-bootstraps even at a pinned version.
    SeededLineage.reset(spark, root, "corpus-a", v2)
    SeededLineage.seed(spark, root, "corpus-b")(bootstrap())
    assert(boots == 3, "a new corpus tag must re-bootstrap")

    // Version bookkeeping stays bounded: reset vacuums to one retained
    // version whatever the run count.
    val manifests = new java.io.File(root, "_manifests").listFiles()
      .count(_.getName.startsWith("manifest-"))
    assert(manifests <= 3, s"reset+vacuum must bound retained versions ($manifests)")
  }
}
