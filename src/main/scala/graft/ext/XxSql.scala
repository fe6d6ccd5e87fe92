package graft.ext

/** DuckDB-SQL code generator for Spark's `xxhash64` (XXH64, default seed
  * 42) — the piece that lets the PRODUCTION MinHash/SimHash queries sit
  * under the DuckDB hash gate instead of rows-only (VERDICT r6 #8). DuckDB
  * has no xxhash64, but it has HUGEINT (int128): every 64-bit wraparound
  * multiply is expressible as a 32-bit-split product mod 2^64, rotations as
  * shift-and-add, and the variable-length stripe/tail loops as
  * `list_reduce` over byte lists derived from `hex(encode(s))`. The
  * generated expression was validated byte-for-byte against Spark's
  * `xxhash64` output on empty/short/32+/multi-byte-UTF-8 strings (and the
  * pure XXH64 reference): string hashing follows XXH64_finalize exactly —
  * 32-byte accumulator stripes, 8-byte lanes, one 4-byte lane, single
  * bytes, avalanche.
  *
  * Spark reference: `org.apache.spark.sql.catalyst.expressions.XXH64`
  * (hashUTF8String / hashLong); algorithm: Collet's xxHash64 spec. */
object XxSql {

  private val M = BigInt(1) << 64
  private val MS = "18446744073709551616::HUGEINT"
  private val P1 = BigInt("11400714785074694791")
  private val P2 = BigInt("14029467366897019727")
  private val P3 = BigInt("1609587929392839161")
  private val P4 = BigInt("9650029242287828579")
  private val P5 = BigInt("2870177450012600261")

  /** (a * b) mod 2^64 for a variable expression in [0, 2^64) and a constant
    * b < 2^64: 32-bit split keeps every intermediate under 2^97 (HUGEINT is
    * signed int128, so a direct 64×64 product could overflow). */
  private def mul(a: String, b: BigInt): String =
    s"((((($a) // 4294967296) * $b::HUGEINT) % 4294967296) * 4294967296" +
      s" + (($a) % 4294967296) * $b::HUGEINT) % $MS"

  /** rotl64: the two shifted halves occupy disjoint bits, so + is |. */
  private def rot(x: String, r: Int): String =
    s"((($x) * ${BigInt(1) << r}::HUGEINT) % $MS + (($x) // ${BigInt(1) << (64 - r)}::HUGEINT))"

  private def xor(a: String, b: String): String = s"xor($a, $b)"
  private def shr(x: String, r: Int): String =
    s"(($x) // ${BigInt(1) << r}::HUGEINT)"

  /** XXH64 round: rotl31(acc + lane·P2) · P1. */
  private def rnd(acc: String, lane: String): String =
    mul(rot(s"(($acc) + ${mul(lane, P2)}) % $MS", 31), P1)

  /** Little-endian 8/4-byte lane from the bound byte list `bl` (1-based) at
    * 0-based byte offset `off0`. */
  private def le(off0: String, w: Int): String =
    (0 until w).map(j => s"bl[(($off0) + ${j + 1})::BIGINT] * ${BigInt(256).pow(j)}::HUGEINT")
      .mkString("(", " + ", ")")

  private def avalanche(h: String): String = {
    val a1 = mul(xor(h, shr(h, 33)), P2)
    val a2 = s"list_transform([($a1)], a -> ${mul(xor("a", shr("a", 29)), P3)})[1]"
    s"list_transform([($a2)], a -> ${xor("a", shr("a", 32))})[1]"
  }

  private def toSigned(h: String): String =
    s"list_transform([($h)], a -> CASE WHEN a >= 9223372036854775808::HUGEINT" +
      s" THEN a - $MS ELSE a END)[1]::BIGINT"

  /** xxhash64 of the UTF-8 bytes of VARCHAR expression `inner`, as a signed
    * BIGINT — exactly Spark's `xxhash64(inner)` (seed 42). ~90 KB of SQL
    * per call site; bind it once per query (inside a lambda). */
  def xx64(inner: String, seed: Long = 42L): String = {
    val s = BigInt(seed)
    val init = Seq((s + P1 + P2).mod(M), (s + P2).mod(M), s.mod(M), (s - P1).mod(M))
    // ≥32-byte path: 4-accumulator state reduced over 32-byte stripes. The
    // state and the stripe indices must share one list type, so stripes
    // ride as [k, 0, 0, 0] and the initial state is prepended.
    val lanes = (0 until 4).map(j => le(s"x[1]*32 + ${8 * j}", 8))
    val newState = (0 until 4).map(j => rnd(s"a[${j + 1}]", lanes(j))).mkString(", ")
    val bigState =
      s"list_reduce(list_prepend(${init.map(v => s"$v::HUGEINT").mkString("[", ",", "]")}, " +
        s"list_transform(generate_series(0, (n//32)::INT - 1), " +
        s"k -> [k::HUGEINT, 0::HUGEINT, 0::HUGEINT, 0::HUGEINT])), (a, x) -> [$newState])"
    val combined = s"((${rot("v[1]", 1)}) + (${rot("v[2]", 7)}) + " +
      s"(${rot("v[3]", 12)}) + (${rot("v[4]", 18)})) % $MS"
    val merged = (0 until 4).foldLeft(combined) { (h, j) =>
      s"(${mul(xor(s"($h)", rnd("0::HUGEINT", s"v[${j + 1}]")), P1)} + $P4::HUGEINT) % $MS"
    }
    val hBig = s"list_transform([$bigState], v -> $merged)[1]"
    val h0 = s"(CASE WHEN n >= 32 THEN $hBig ELSE ${(s + P5).mod(M)}::HUGEINT END + n) % $MS"
    // tail: full 8-byte lanes after the stripes
    val t8Off = "list_transform(generate_series(0, ((n % 32) // 8)::INT - 1), " +
      "j -> ((n // 32) * 32 + 8 * j)::HUGEINT)"
    val step8 = s"(${mul(rot(xor("a", rnd("0::HUGEINT", le("o", 8))), 27), P1)} + $P4::HUGEINT) % $MS"
    val h8 = s"list_reduce(list_prepend(($h0), $t8Off), (a, o) -> $step8)"
    // one 4-byte lane if ≥4 bytes remain
    val o4 = "((n // 32) * 32 + ((n % 32) // 8) * 8)"
    val lane4 = s"(${le(o4, 4)} * $P1::HUGEINT) % $MS"
    val h4Body = s"(${mul(rot(xor("a", lane4), 23), P2)} + $P3::HUGEINT) % $MS"
    val h4 = s"list_transform([($h8)], a -> CASE WHEN n - $o4 >= 4 THEN $h4Body ELSE a END)[1]"
    // remaining single bytes
    val ob = s"($o4 + CASE WHEN n - $o4 >= 4 THEN 4 ELSE 0 END)"
    val byteList = s"list_transform(generate_series(($ob)::INT + 1, n::INT), i -> bl[i])"
    val stepB = mul(rot(xor("a", s"(o * $P5::HUGEINT) % $MS"), 11), P1)
    val hB = s"list_reduce(list_prepend(($h4), $byteList), (a, o) -> $stepB)"
    // let-bind before the avalanche: its first stage references its operand
    // ~6× and would duplicate the whole pipeline above otherwise
    val out = s"list_transform([($hB)], hh -> ${toSigned(avalanche("hh"))})[1]"
    // binders: hx = hex bytes, n = byte count, bl = 1-based byte list
    s"list_transform([hex(encode($inner))], hx -> " +
      s"list_transform([octet_length(encode($inner))::HUGEINT], n -> " +
      s"list_transform([list_transform(generate_series(1, n::INT), " +
      s"i -> ('0x' || substr(hx, 2*i-1, 2))::BIGINT::HUGEINT)], bl -> $out)[1])[1])[1]"
  }

  /** Spark's multi-argument `xxhash64(l1, l2, …)` over BIGINT expressions:
    * hash = XXH64.hashLong(l_i, hash_so_far) left to right, initial seed
    * 42. hashLong is loop-free (one 8-byte lane + avalanche). The operands
    * here are Carter-Wegman signature values in [0, 2^61), so the unsigned
    * bit pattern is the value itself. Returns an UNSIGNED HUGEINT — fine
    * for its only use as a bucket key (grouping is bijection-invariant).
    * Validated directly against Spark's `xxhash64(c1, c2, c3, c4)` on
    * 4-long vectors including zeros and values at the 2^61 boundary —
    * bit-identical on every case (besides the end-to-end minhash gate). */
  def hashLongChain(elems: Seq[String], seed: Long = 42L): String =
    elems.foldLeft(s"${BigInt(seed).mod(M)}::HUGEINT") { (seedExpr, l) =>
      // Every stage is let-bound through a single-element list_transform:
      // a naive textual fold would duplicate the previous hash expression
      // ~6× per stage (mul/rot/xor each reference their operand twice) and
      // blow up exponentially over the chain.
      val h0 = s"((s + ${(P5 + 8).mod(M)}::HUGEINT) % $MS)"
      val k1 = rnd("0::HUGEINT", s"($l)::HUGEINT")
      val h1 = s"(${mul(rot(xor(h0, k1), 27), P1)} + $P4::HUGEINT) % $MS"
      s"list_transform([($seedExpr)], s -> " +
        s"list_transform([$h1], t -> ${avalanche("t")})[1])[1]"
    }
}
