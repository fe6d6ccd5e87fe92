package graft.ext

import graft.{DuckDb, SparkSpec}
import org.apache.spark.sql.functions._

/** Cross-engine parity for the generated-XXH64 DuckDB SQL (ADVICE r7): the
  * docstring's "validated byte-for-byte" claim, committed as a regression
  * spec. Byte lengths are chosen to drive every branch of XXH64_finalize:
  * the <32 short path, the 4-accumulator stripe loop (32, 33, 63, 64, 65),
  * each tail shape after the stripes (full 8-byte lanes, the single 4-byte
  * lane, trailing single bytes) and multi-byte UTF-8 that lands lane
  * boundaries mid-codepoint. */
class XxSqlParitySpec extends SparkSpec {

  /** deterministic ASCII filler with non-repeating bytes */
  private def ascii(n: Int): String =
    (0 until n).map(i => ('a' + (i * 7 + i / 26) % 26).toChar).mkString

  test("xx64 SQL == Spark xxhash64 over adversarial byte lengths and UTF-8") {
    assume(DuckDb.available, "python3+duckdb not on this container")
    val cases: Seq[String] =
      // every finalize branch: 0,1,3 (bytes only), 4,7 (4-lane + bytes),
      // 8,9,12,15 (8-lane + 4-lane + bytes), 16,31 (two 8-lanes + tails),
      // 32,33,36,37,39,40 (one stripe + each tail shape), 63,64,65 (stripe
      // boundary straddles)
      Seq(0, 1, 3, 4, 7, 8, 9, 12, 15, 16, 31, 32, 33, 36, 37, 39, 40, 63, 64, 65)
        .map(ascii) ++
      Seq(
        "é",                     // 2-byte codepoint, total 2
        "→",                     // 3-byte codepoint, total 3
        "🦑",          // 🦑 4-byte codepoint, total 4
        "aé→🦑",       // 1+2+3+4 = 10 bytes, mixed widths
        "é" * 17,                // 34 bytes: 2-byte chars straddle the 32-byte stripe
        "日本語テキスト処理の行", // 3-byte chars, 30 bytes
        ("héllo wörld " * 6) + "→→") // 13-byte unit ×6 + 6 = 84 bytes, 2 stripes + tail
    import spark.implicits._
    val df = cases.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    // sanity: the UTF-8 byte lengths cover both sides of every branch guard
    val lens = df.select(octet_length(col("s"))).collect().map(_.getInt(0)).toSet
    assert(Set(0, 3, 4, 7, 8, 31, 32, 33, 63, 64).subsetOf(lens))

    val dir = tmpDir() + "/strings"
    df.write.parquet(dir)
    val sparkH = df.select(col("id"), xxhash64(col("s")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val duckRows = DuckDb.query(
      s"SELECT id, ${XxSql.xx64("s")} AS h FROM strings ORDER BY id",
      Map("strings" -> dir))
    assert(duckRows.size == cases.size)
    duckRows.foreach { r =>
      val id = r(0).toLong
      assert(r(1).toLong == sparkH(id),
        s"xx64 mismatch for id=$id (${cases(id.toInt).take(20)}…): " +
          s"duck=${r(1)} spark=${sparkH(id)}")
    }
  }

  test("hashLongChain == Spark multi-arg xxhash64 over BIGINT vectors") {
    assume(DuckDb.available, "python3+duckdb not on this container")
    val top = (BigInt(1) << 61) - 1 // the Carter-Wegman value ceiling
    val rng = new scala.util.Random(4242)
    val vectors: Seq[Seq[Long]] =
      Seq(
        Seq(0L, 0L, 0L, 0L),
        Seq(top.toLong, top.toLong, top.toLong, top.toLong),
        Seq(0L, top.toLong, 1L, (top - 1).toLong),
        Seq(1L, 2L, 3L, 4L)) ++
      (1 to 8).map(_ => Seq.fill(4)(math.abs(rng.nextLong()) % top.toLong))
    import spark.implicits._
    val df = vectors.zipWithIndex
      .map { case (v, i) => (i.toLong, v(0), v(1), v(2), v(3)) }
      .toDF("id", "c1", "c2", "c3", "c4")
    val dir = tmpDir() + "/longs"
    df.write.parquet(dir)
    val sparkH = df
      .select(col("id"), xxhash64(col("c1"), col("c2"), col("c3"), col("c4")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hashLongChain returns unsigned HUGEINT (bucket keys are bijection-
    // invariant); wrap to the signed bit pattern for the comparison
    val chain = XxSql.hashLongChain(Seq("c1", "c2", "c3", "c4"))
    val duckRows = DuckDb.query(
      s"""SELECT id, CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
         |  THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS hs
         |FROM (SELECT id, $chain AS h FROM longs) ORDER BY id""".stripMargin,
      Map("longs" -> dir))
    assert(duckRows.size == vectors.size)
    duckRows.foreach { r =>
      val id = r(0).toLong
      assert(r(1).toLong == sparkH(id),
        s"hashLongChain mismatch for id=$id ${vectors(id.toInt)}: " +
          s"duck=${r(1)} spark=${sparkH(id)}")
    }
  }
}
