package graft.ext

import graft.{DuckDb, SparkSpec}
import org.apache.spark.sql.functions._

/** Committed cross-engine cover for the hot-bucket CHAIN branch of the
  * production MinHash oracle (ADVICE r7): no fixture bucket exceeds
  * maxBucket=64 ids, so the `len(ids) > maxBucket → consecutive pairs`
  * branch of [[Dedup.productionMinhashOracleSql]] — and of the Spark
  * pipeline it mirrors — previously ran only in an ad-hoc rehearsal. This
  * plants one 80-copy boilerplate group (chain branch), one exactly-64-copy
  * group (all-pairs branch at the boundary), a near pair and a loner, and
  * asserts Spark [[Dedup.verifiedNearDupPairs]] equals the oracle SQL run
  * in DuckDB on the identical corpus. */
class MinhashChainBranchSpec extends SparkSpec {

  test("chain-pair branch: Spark == DuckDB oracle on a >maxBucket bucket") {
    assume(DuckDb.available, "python3+duckdb not on this container")
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val group64 = "pack my box with five dozen liquor jugs for the trip home"
    val rows: Seq[(Long, String)] =
      (1 to 80).map(i => (i.toLong, boiler)) ++          // 80 > maxBucket → chain
      (200 to 263).map(i => (i.toLong, group64)) ++      // exactly 64 → all pairs
      Seq(
        (500L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (501L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        (600L, "completely different text with no overlap whatsoever in here"))
    import spark.implicits._
    val docsDf = rows.toDF("doc_id", "text")
    val dir = tmpDir() + "/documents"
    docsDf.write.parquet(dir)

    val sparkPairs = Dedup.verifiedNearDupPairs(docsDf)
      .select(col("a"), col("b"), round(col("j_raw"), 6).as("jaccard"))
      .orderBy("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // The branch genuinely fired: the 80-copy group must appear as exactly
    // its 79 sorted-consecutive pairs — all-pairs would emit C(80,2)=3160,
    // including e.g. (1,3).
    val g80 = sparkPairs.filter { case (a, _, _) => a < 100 }
    assert(g80.map { case (a, b, _) => (a, b) }.toSet ==
      (1L to 79L).map(i => (i, i + 1)).toSet)
    assert(g80.forall(_._3 == 1.0))
    // And the ≤ maxBucket boundary kept the full-pairs branch: the 64-copy
    // group emits all C(64,2)=2016, including the non-consecutive extremes.
    val g64 = sparkPairs.filter { case (a, _, _) => a >= 200 && a < 300 }
    assert(g64.length == 64 * 63 / 2)
    assert(g64.map { case (a, b, _) => (a, b) }.contains((200L, 263L)))

    val duckRows = DuckDb.query(Dedup.productionMinhashOracleSql(),
      Map("documents" -> dir))
    val duckPairs = duckRows.map(r => (r(0).toLong, r(1).toLong, r(2).toDouble))
    assert(duckPairs.length == sparkPairs.length,
      s"row count: duck=${duckPairs.length} spark=${sparkPairs.length}")
    duckPairs.zip(sparkPairs.sortBy(p => (p._1, p._2))).foreach {
      case ((da, db, dj), (sa, sb, sj)) =>
        assert(da == sa && db == sb, s"pair mismatch: duck=($da,$db) spark=($sa,$sb)")
        // both engines round(·, 6); allow a half-ulp-of-rounding skew
        assert(math.abs(dj - sj) <= 2e-6, s"jaccard($da,$db): duck=$dj spark=$sj")
    }
  }
}
