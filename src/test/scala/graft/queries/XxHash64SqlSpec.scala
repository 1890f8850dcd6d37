package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the algorithm assumptions encoded in the generated DuckDB xxhash64
  * oracle (XxHash64Sql) against Spark's actual `xxhash64`: a pure-Scala
  * XXH64 (public spec, github.com/Cyan4973/xxHash) with Spark's seed-42
  * per-column chaining must reproduce the engine exactly on every code
  * path the SQL generator branches on — empty input, byte/4-byte/8-byte
  * tails, the ≥32-byte stripe+merge path, multi-word chaining, and
  * multi-byte UTF-8. If Spark ever changed its hash, this spec — not a
  * silent oracle mismatch in the driver — names the drift.
  *
  * (The DuckDB side of the oracle is validated by the driver's three-gate
  * compare and tools/oracle_check.py; it is the same arithmetic, emitted as
  * HUGEINT mod-2^64 SQL.)
  */
class XxHash64SqlSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val M = BigInt(1) << 64
  private val mask = M - 1
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)

  private def rotl(x: BigInt, r: Int): BigInt =
    ((x << r) | (x >> (64 - r))) & mask
  private def round(acc: BigInt, inp: BigInt): BigInt =
    (rotl((acc + inp * P2) & mask, 31) * P1) & mask
  private def mergeRound(h: BigInt, v: BigInt): BigInt =
    (((h ^ round(0, v)) * P1) + P4) & mask

  /** Reference XXH64 over bytes, mirroring the stage split the SQL
    * generator emits (stripes → 8-byte words → 4-byte chunk → bytes →
    * avalanche). */
  private def xxh64(data: Array[Byte], seed: BigInt): BigInt = {
    val n = data.length
    def word(o: Int, nb: Int): BigInt =
      (0 until nb).map(i => BigInt(data(o + i) & 0xFF) << (8 * i)).sum
    var o = 0
    var h =
      if (n >= 32) {
        var v1 = (seed + P1 + P2) & mask
        var v2 = (seed + P2) & mask
        var v3 = seed & mask
        var v4 = (seed - P1) & mask
        while (o <= n - 32) {
          v1 = round(v1, word(o, 8)); v2 = round(v2, word(o + 8, 8))
          v3 = round(v3, word(o + 16, 8)); v4 = round(v4, word(o + 24, 8))
          o += 32
        }
        var hh = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & mask
        Seq(v1, v2, v3, v4).foreach(v => hh = mergeRound(hh, v))
        hh
      } else (seed + P5) & mask
    h = (h + n) & mask
    while (o <= n - 8) {
      h = ((rotl(h ^ round(0, word(o, 8)), 27) * P1) + P4) & mask
      o += 8
    }
    if (o <= n - 4) {
      h = ((rotl(h ^ ((word(o, 4) * P1) & mask), 23) * P2) + P3) & mask
      o += 4
    }
    while (o < n) {
      h = (rotl(h ^ ((BigInt(data(o) & 0xFF) * P5) & mask), 11) * P1) & mask
      o += 1
    }
    h ^= h >> 33; h = (h * P2) & mask
    h ^= h >> 29; h = (h * P3) & mask
    h ^ (h >> 32)
  }

  private def chain(words: Seq[String]): Long = {
    var h = BigInt(42)
    words.foreach(w => h = xxh64(w.getBytes("UTF-8"), h))
    h.longValue
  }

  private val cases: Seq[Seq[String]] = Seq(
    Seq(""), Seq("a"), Seq("abc"), Seq("sevenchr"), Seq("123456789012"),
    Seq("hello world this is a long string over thirty two bytes for stripes"),
    Seq("exactly32bytes_0123456789abcdef!"),
    Seq("w1", "w2", "w3"), Seq("the", "quick", "brown"),
    Seq("unicodeé中文", "x"), Seq("𐍈 astral", "plane"),
    Seq("0123456789abcdefghijklmnopqrstuvwxyzABCDE", "x", "yz"))

  test("pure-Scala XXH64 chain matches Spark's xxhash64 on every code path") {
    import spark.implicits._
    cases.zipWithIndex.foreach { case (ws, i) =>
      val got = Seq(1).toDF("x")
        .select(xxhash64(ws.map(lit): _*).as("h")).head.getLong(0)
      assert(got === chain(ws), s"case $i: $ws")
    }
  }

  test("generated SQL embeds the same constants the reference uses") {
    val sql = XxHash64Sql.chainUnsigned("ws")
    // the lane-merge prime split (P1 low half) and the final avalanche
    // prime split (P3 low half) both appear in the var×const splits
    assert(sql.contains((P1 & BigInt(0xFFFFFFFFL)).toString))
    assert(sql.contains((P3 & BigInt(0xFFFFFFFFL)).toString))
    assert(sql.contains("CAST(42 AS HUGEINT)"))
    // balanced delimiters — a paren slip in the generator would otherwise
    // only surface driver-side inside DuckDB
    def bal(open: Char, close: Char): Boolean = {
      var d = 0
      sql.foreach { c =>
        if (c == open) d += 1 else if (c == close) d -= 1
        if (d < 0) return false
      }
      d == 0
    }
    assert(bal('(', ')') && bal('[', ']'))
  }
}
