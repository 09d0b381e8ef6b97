package graft.core

/** Generates DuckDB SQL that replays Spark's `xxhash64` (catalyst XXH64,
  * seed 42) bit-for-bit, so hash-keyed operators (dd04 SimHash) get a FULL
  * cross-engine oracle instead of a rows-only check.
  *
  * The replay runs in HUGEINT (128-bit) with explicit mod-2^64 arithmetic:
  *  - 64-bit wraparound multiply splits the left operand into 32-bit
  *    halves so no intermediate exceeds HUGEINT range
  *    ((a*b) mod 2^64 = (lo(a)*b + (hi(a)*lo(b) mod 2^32) << 32) mod 2^64);
  *  - rotl(x,r) = ((x << r) mod 2^64) + (x >> 64-r) — the two parts are
  *    disjoint bit ranges, so `+` IS the bitwise or;
  *  - xor comes from DuckDB's HUGEINT-native xor();
  *  - all values live in [0, 2^64): Spark's signed Long view differs only
  *    in presentation, and every XXH64 step (mul/rot/xor/add mod 2^64) is
  *    sign-agnostic.
  *
  * Only the `len < 32` XXH64 path is emitted (no 32-byte stripe
  * accumulators): callers hash SHORT tokens — `[a-z0-9]+` words, max 8
  * bytes on every fixture — and the generated SQL raises a loud error()
  * on any longer input rather than hashing it wrong. Validated
  * token-by-token against Spark's xxhash64 (incl. the stripe path, in
  * the python harness) and end-to-end on dd04 (signatures bit-equal on
  * all 500 sf0.01 docs).
  */
object XxhSql {
  private val M = "18446744073709551616::HUGEINT" // 2^64
  private val P1 = "11400714785074694791::HUGEINT"
  private val P2 = "14029467366897019727::HUGEINT"
  private val P3 = "1609587929392839161::HUGEINT"
  private val P4 = "9650029242287828579::HUGEINT"
  private val P5 = "2870177450012600261::HUGEINT"

  private def mul(a: String, b: String): String =
    s"((((($a) % 4294967296) * ($b) + (((($a) // 4294967296) * " +
      s"(($b) % 4294967296)) % 4294967296) * 4294967296)) % $M)"
  private def rotl(x: String, r: Int): String =
    s"((((($x) * ${1L << r}::HUGEINT) % $M) + (($x) // ${
      java.math.BigInteger.ONE.shiftLeft(64 - r)}::HUGEINT)))"
  private def xor(a: String, b: String): String =
    s"xor(($a)::HUGEINT, ($b)::HUGEINT)"
  private def add(a: String, b: String): String = s"((($a) + ($b)) % $M)"
  private def shr(x: String, r: Int): String =
    s"(($x) // ${1L << r}::HUGEINT)"

  // h = rotl27(h ^ rotl31(k*P2)*P1)*P1 + P4   (a = acc, b = 8-byte word)
  private val wordStep: String =
    add(mul(rotl(xor("a", mul(rotl(mul("b", P2), 31), P1)), 27), P1), P4)
  // h = rotl23(h ^ k4*P1)*P2 + P3
  private def fourStep(h: String, k4: String): String =
    add(mul(rotl(xor(h, mul(k4, P1)), 23), P2), P3)
  // h = rotl11(h ^ b*P5)*P1   (a = acc, b = byte)
  private val byteStep: String =
    mul(rotl(xor("a", mul("b", P5)), 11), P1)

  /** CTE body computing `h` (the XXH64 of ASCII column `t`, as unsigned
    * HUGEINT) for a relation named `toks(doc_id, t)`. Emits a CTE named
    * `hs(doc_id, h)`; intermediate stages ride on DuckDB's lateral column
    * aliases. Little-endian 8-/4-byte words come from a reversed-slice
    * fold (a*256 + b). */
  val hashCte: String =
    s"""hs AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(h0,
       |      list_transform(range(0, n // 8), i ->
       |        list_reduce(list_reverse(list_slice(bs, 8*i + 1, 8*i + 8)),
       |          (a, b) -> a * 256 + b))),
       |      (a, b) -> $wordStep) AS h1,
       |    CASE WHEN n % 8 >= 4 THEN ${fourStep("h1",
            "list_reduce(list_reverse(list_slice(bs, (n // 8) * 8 + 1, " +
              "(n // 8) * 8 + 4)), (a, b) -> a * 256 + b)")}
       |      ELSE h1 END AS h2,
       |    list_reduce(list_prepend(h2,
       |      list_slice(bs, (n // 8) * 8 +
       |        (CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END) + 1, n)),
       |      (a, b) -> $byteStep) AS h3,
       |    ${xor("h3", shr("h3", 33))} AS f1,
       |    ${mul("f1", P2)} AS f2,
       |    ${xor("f2", shr("f2", 29))} AS f3,
       |    ${mul("f3", P3)} AS f4,
       |    ${xor("f4", shr("f4", 32))} AS h
       |  FROM (
       |    SELECT doc_id, length(t) AS n,
       |      list_transform(range(1, length(t) + 1),
       |        i -> unicode(t[i])::HUGEINT) AS bs,
       |      (CASE WHEN length(t) >= 32
       |         THEN error('XxhSql: token >= 32 bytes needs the stripe ' ||
       |           'path')::HUGEINT
       |         ELSE 42 + $P5 + length(t) END) % $M AS h0
       |    FROM toks))""".stripMargin
}
