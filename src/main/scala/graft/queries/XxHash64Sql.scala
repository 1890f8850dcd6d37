package graft.queries

/** Generates a DuckDB SQL expression that computes Spark's `xxhash64`
  * (XXH64, public spec — github.com/Cyan4973/xxHash — with Spark's seed-42
  * per-column chaining: `h = XXH64(bytes(col_i), seed = h)`) over a SQL
  * `LIST(VARCHAR)` expression, so the production LSH hash path gets a real
  * cross-engine oracle instead of a rows-only check.
  *
  * Implementation notes (all arithmetic is HUGEINT mod 2^64):
  *   - var×const multiplies split the constant into 32-bit halves, keeping
  *     every intermediate below 2^97 ≪ the signed-128-bit HUGEINT range;
  *   - `rotl(x, r)` is `(x mod 2^(64-r))·2^r + x div 2^(64-r)` — the two
  *     parts occupy disjoint bit ranges, so the OR is a plain `+`;
  *   - byte/stripe loops are `list_reduce` folds (accumulator and element
  *     types must match, hence the single-element-list trick for both the
  *     chained seed and let-bindings);
  *   - strings become UTF-8 bytes by arithmetic expansion of each
  *     codepoint (1-4 byte arms), matching UTF8String's bytes exactly;
  *   - let-bindings are `list_transform([v], x -> body)[1]`, which keeps
  *     the generated expression linear in the algorithm instead of
  *     exponential under the duplication `rotl`/mul-split introduce.
  *
  * Validated against Spark 4.1's `xxhash64` (empty/short/4-byte/8-byte
  * tails, ≥32-byte stripe path, multi-word chaining, multi-byte UTF-8) by
  * XxHash64SqlSpec plus the q_dedup_minhash / q_dedup_simhash three-gate
  * oracles.
  */
private[queries] object XxHash64Sql {
  private val M = BigInt(1) << 64
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)

  /** Spark's xxhash64 seed chain (seed 42) over a LIST(VARCHAR) SQL
    * expression; yields a HUGEINT in [0, 2^64). */
  def chainUnsigned(wordsListExpr: String): String =
    new Gen().chain(wordsListExpr)

  // deliberately the ONLY entry point: the oracle CTEs compute the chain
  // once into a column and apply reinterpretations (signed cast, low-31
  // mask) as plain SQL on that column — expression-level variants here
  // would be uncalled code that every future chain change must keep
  // consistent with no caller to catch drift

  private final class Gen {
    private var ctr = 0
    private def fresh(p: String): String = { ctr += 1; s"__$p$ctr" }

    def let(value: String, body: String => String): String = {
      val v = fresh("t")
      s"list_transform([$value], $v -> ${body(v)})[1]"
    }

    private def add(a: String, b: Any) = s"(($a) + ($b)) % $M"

    /** (a · c) mod 2^64 for expression a < 2^64 and constant c — c split at
      * 2^32 so both partial products stay below 2^97. */
    private def mulc(a: String, c: BigInt): String = {
      val ch = c >> 32
      val cl = c & 0xFFFFFFFFL
      s"((($a) * $cl + ((($a) * $ch) % 4294967296) * 4294967296) % $M)"
    }

    private def rotl(a: String, r: Int): String = {
      val lo = BigInt(1) << (64 - r)
      val hi = BigInt(1) << r
      s"((($a) % $lo) * $hi + ($a) // $lo)"
    }

    private def xor(a: String, b: String) = s"xor($a, $b)"
    private def shr(a: String, r: Int) = s"(($a) // ${BigInt(1) << r})"

    /** Little-endian read of `nbytes` at 0-based offset expr `o` from byte
      * list `b`. */
    private def word(b: String, o: String, nbytes: Int): String =
      (0 until nbytes).map(i => s"$b[($o) + ${i + 1}] * ${BigInt(1) << (8 * i)}")
        .mkString("(", " + ", ")")

    private def round0(v: String): String = mulc(rotl(mulc(v, P2), 31), P1)

    private def xround(acc: String, inp: String): String =
      let(add(acc, mulc(inp, P2)), t => mulc(rotl(t, 31), P1))

    private def avalanche(h: String): String =
      let(h, a => let(mulc(xor(a, shr(a, 33)), P2), b =>
        let(mulc(xor(b, shr(b, 29)), P3), c => xor(c, shr(c, 32)))))

    /** XXH64 of byte-list variable `bs` (HUGEINT[]) with seed expr `seed`. */
    private def hashWord(bs: String, seed: String): String =
      let(s"len($bs)", n => let(s"CASE WHEN $n >= 32 THEN $n//32 ELSE 0 END", ns => {
        // ≥32-byte path: 4-lane stripe rounds, then lane merge
        val lanesInit = s"[${add(seed, (P1 + P2) % M)}, ${add(seed, P2)}, " +
          s"($seed) % $M, ${add(seed, M - P1)}]"
        val st = fresh("s")
        val stripes = s"list_transform(range(0, $ns), $st -> " +
          s"[${word(bs, s"32*$st", 8)}, ${word(bs, s"32*$st+8", 8)}, " +
          s"${word(bs, s"32*$st+16", 8)}, ${word(bs, s"32*$st+24", 8)}])"
        val (accV, wV) = (fresh("A"), fresh("W"))
        val folded = s"list_reduce(list_prepend($lanesInit, $stripes), " +
          s"($accV, $wV) -> [" +
          (1 to 4).map(i => xround(s"$accV[$i]", s"$wV[$i]")).mkString(", ") + "])"
        val big = let(folded, a => {
          val h0 = s"(${rotl(s"$a[1]", 1)} + ${rotl(s"$a[2]", 7)} + " +
            s"${rotl(s"$a[3]", 12)} + ${rotl(s"$a[4]", 18)}) % $M"
          val (hv, vv) = (fresh("h"), fresh("v"))
          val step = let(xor(hv, round0(vv)), t => add(mulc(t, P1), P4))
          s"list_reduce(list_prepend($h0, $a), ($hv, $vv) -> $step)"
        })
        val h1 = add(s"CASE WHEN $n >= 32 THEN $big ELSE ${add(seed, P5)} END", n)
        // remaining full 8-byte words after the stripes
        val wi = fresh("w")
        val tailWords =
          s"list_transform(range(4*$ns, $n//8), $wi -> ${word(bs, s"8*$wi", 8)})"
        val (hv2, wv2) = (fresh("h"), fresh("w"))
        val step27 = let(xor(hv2, round0(wv2)), t => add(mulc(rotl(t, 27), P1), P4))
        val h2 = s"list_reduce(list_prepend($h1, $tailWords), ($hv2, $wv2) -> $step27)"
        let(h2, h2v => {
          // optional 4-byte chunk, then single bytes, then avalanche
          val fourStep = let(word(bs, s"($n//8)*8", 4), c4 =>
            let(xor(h2v, mulc(c4, P1)), t => add(mulc(rotl(t, 23), P2), P3)))
          val h3 = s"CASE WHEN $n % 8 >= 4 THEN $fourStep ELSE $h2v END"
          val bi = fresh("b")
          val tailBytes = s"list_transform(range(($n//8)*8 + " +
            s"CASE WHEN $n % 8 >= 4 THEN 4 ELSE 0 END, $n), $bi -> $bs[$bi+1])"
          val (hv3, bv3) = (fresh("h"), fresh("b"))
          val stepB = let(xor(hv3, mulc(bv3, P5)), t => mulc(rotl(t, 11), P1))
          val h4 = s"list_reduce(list_prepend($h3, $tailBytes), ($hv3, $bv3) -> $stepB)"
          avalanche(h4)
        })
      }))

    /** UTF-8 bytes of a VARCHAR expression as LIST(HUGEINT): arithmetic
      * expansion of each codepoint into its 1-4 byte encoding. */
    private def utf8Bytes(w: String): String = {
      val ch = fresh("c")
      val u = fresh("u")
      val arms =
        s"CASE WHEN $u < 128 THEN [CAST($u AS HUGEINT)] " +
        s"WHEN $u < 2048 THEN [CAST(192 + $u//64 AS HUGEINT), CAST(128 + $u%64 AS HUGEINT)] " +
        s"WHEN $u < 65536 THEN [CAST(224 + $u//4096 AS HUGEINT), " +
          s"CAST(128 + ($u//64)%64 AS HUGEINT), CAST(128 + $u%64 AS HUGEINT)] " +
        s"ELSE [CAST(240 + $u//262144 AS HUGEINT), CAST(128 + ($u//4096)%64 AS HUGEINT), " +
          s"CAST(128 + ($u//64)%64 AS HUGEINT), CAST(128 + $u%64 AS HUGEINT)] END"
      s"flatten(list_transform(list_filter(string_split($w, ''), $ch -> $ch != ''), " +
        s"$ch -> list_transform([unicode($ch)], $u -> $arms)[1]))"
    }

    /** Seed-chained fold over the word list: accumulator is the 1-element
      * hash list (so it type-matches the byte-list elements' container). */
    def chain(wordsListExpr: String): String = {
      val wv = fresh("w")
      val (accV, bV) = (fresh("K"), fresh("B"))
      val byteLists = s"list_transform($wordsListExpr, $wv -> ${utf8Bytes(wv)})"
      s"list_reduce(list_prepend([CAST(42 AS HUGEINT)], $byteLists), " +
        s"($accV, $bV) -> [${hashWord(bV, s"$accV[1]")}])[1]"
    }
  }
}
