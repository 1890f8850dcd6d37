"""Prototype of the DuckDB-SQL XXH64 generator (ported to Scala once green).

Emits a single SQL expression computing Spark's xxhash64(w1,..,wk) (seed 42,
per-column chaining) over a SQL LIST(VARCHAR) expression, using HUGEINT
mod-2^64 arithmetic and list_reduce folds. All multiplications are
var*const split into 32-bit halves so nothing exceeds HUGEINT range.
"""
M = 1 << 64
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

_ctr = [0]
def fresh(p):
    _ctr[0] += 1
    return f"{p}{_ctr[0]}"

def let(val, body_fn, prefix="t"):
    v = fresh(prefix)
    return f"list_transform([{val}], {v} -> {body_fn(v)})[1]"

def add(a, b):
    return f"(({a}) + ({b})) % {M}"

def mulc(a, c):
    ch, cl = c >> 32, c & 0xFFFFFFFF
    return (f"((({a}) * {cl} + ((({a}) * {ch}) % 4294967296) * 4294967296) % {M})")

def rotl(a, r):
    lo, hi = 1 << (64 - r), 1 << r
    return f"((({a}) % {lo}) * {hi} + ({a}) // {lo})"

def xor(a, b):
    return f"xor({a}, {b})"

def shr(a, r):
    return f"(({a}) // {1 << r})"

def word(b, o, nbytes):
    # little-endian read of nbytes at 0-based offset expr o from byte list b
    terms = [f"{b}[({o}) + {i + 1}] * {1 << (8 * i)}" for i in range(nbytes)]
    return "(" + " + ".join(terms) + ")"

def round0(v):
    return mulc(rotl(mulc(v, P2), 31), P1)

def xround(acc, inp):
    return let(add(acc, mulc(inp, P2)), lambda t: mulc(rotl(t, 31), P1))

def avalanche(h):
    return let(h, lambda a:
        let(mulc(xor(a, shr(a, 33)), P2), lambda b:
            let(mulc(xor(b, shr(b, 29)), P3), lambda c:
                xor(c, shr(c, 32)))))

def hash_word(B, S):
    """XXH64 of byte-list var B (HUGEINT[]) with seed expr S."""
    def body(n):
        def body2(ns):
            # big path: 4-lane stripes then merge
            ACC, W, h, v = fresh("A"), fresh("W"), fresh("h"), fresh("v")
            lanes_init = (f"[{add(S, (P1 + P2) % M)}, {add(S, P2)}, "
                          f"({S}) % {M}, {add(S, M - P1)}]")
            st = fresh("s")
            stripes = (f"list_transform(range(0, {ns}), {st} -> "
                       f"[{word(B, f'32*{st}', 8)}, {word(B, f'32*{st}+8', 8)}, "
                       f"{word(B, f'32*{st}+16', 8)}, {word(B, f'32*{st}+24', 8)}])")
            folded = (f"list_reduce(list_prepend({lanes_init}, {stripes}), "
                      f"({ACC}, {W}) -> [" +
                      ", ".join(xround(f"{ACC}[{i}]", f"{W}[{i}]") for i in (1, 2, 3, 4)) + "])")
            def merged(A):
                h0 = (f"({rotl(f'{A}[1]', 1)} + {rotl(f'{A}[2]', 7)} + "
                      f"{rotl(f'{A}[3]', 12)} + {rotl(f'{A}[4]', 18)}) % {M}")
                hv, vv = fresh("h"), fresh("v")
                step = let(xor(hv, round0(vv)), lambda t: add(mulc(t, P1), P4))
                return (f"list_reduce(list_prepend({h0}, {A}), "
                        f"({hv}, {vv}) -> {step})")
            big = let(folded, merged, prefix="A")
            small = add(S, P5)
            h1 = add(f"CASE WHEN {n} >= 32 THEN {big} ELSE {small} END", n)
            # tail 8-byte words
            wi = fresh("w")
            tailw = f"list_transform(range(4*{ns}, {n}//8), {wi} -> {word(B, f'8*{wi}', 8)})"
            hv2, wv2 = fresh("h"), fresh("w")
            step27 = let(xor(hv2, round0(wv2)), lambda t: add(mulc(rotl(t, 27), P1), P4))
            h2 = f"list_reduce(list_prepend({h1}, {tailw}), ({hv2}, {wv2}) -> {step27})"
            def after8(h2v):
                w4 = word(B, f"({n}//8)*8", 4)
                fourstep = let(w4, lambda c4:
                    let(xor(h2v, mulc(c4, P1)), lambda t: add(mulc(rotl(t, 23), P2), P3)))
                h3 = f"CASE WHEN {n} % 8 >= 4 THEN {fourstep} ELSE {h2v} END"
                bi = fresh("b")
                tailb = (f"list_transform(range(({n}//8)*8 + CASE WHEN {n} % 8 >= 4 THEN 4 ELSE 0 END, {n}), "
                         f"{bi} -> {B}[{bi}+1])")
                hv3, bv3 = fresh("h"), fresh("b")
                stepb = let(xor(hv3, mulc(bv3, P5)), lambda t: mulc(rotl(t, 11), P1))
                h4 = f"list_reduce(list_prepend({h3}, {tailb}), ({hv3}, {bv3}) -> {stepb})"
                return avalanche(h4)
            return let(h2, after8, prefix="g")
        return let(f"CASE WHEN {n} >= 32 THEN {n}//32 ELSE 0 END", body2, prefix="n")
    return let(f"len({B})", body, prefix="n")

def utf8bytes(w):
    ch, u = fresh("c"), fresh("u")
    case = (f"CASE WHEN {u} < 128 THEN [CAST({u} AS HUGEINT)] "
            f"WHEN {u} < 2048 THEN [CAST(192 + {u}//64 AS HUGEINT), CAST(128 + {u}%64 AS HUGEINT)] "
            f"WHEN {u} < 65536 THEN [CAST(224 + {u}//4096 AS HUGEINT), CAST(128 + ({u}//64)%64 AS HUGEINT), CAST(128 + {u}%64 AS HUGEINT)] "
            f"ELSE [CAST(240 + {u}//262144 AS HUGEINT), CAST(128 + ({u}//4096)%64 AS HUGEINT), CAST(128 + ({u}//64)%64 AS HUGEINT), CAST(128 + {u}%64 AS HUGEINT)] END")
    return (f"flatten(list_transform(list_filter(string_split({w}, ''), {ch} -> {ch} != ''), "
            f"{ch} -> list_transform([unicode({ch})], {u} -> {case})[1]))")

def xxchain(words_list_expr):
    """Spark xxhash64 chain (seed 42) over a LIST(VARCHAR) expr; returns HUGEINT."""
    wv, ACC, BB = fresh("w"), fresh("K"), fresh("B")
    blists = f"list_transform({words_list_expr}, {wv} -> {utf8bytes(wv)})"
    return (f"list_reduce(list_prepend([CAST(42 AS HUGEINT)], {blists}), "
            f"({ACC}, {BB}) -> [{hash_word(BB, f'{ACC}[1]')}])[1]")

def to_signed(u_expr):
    return let(u_expr, lambda u:
        f"CAST(CASE WHEN {u} >= 9223372036854775808 THEN {u} - {M} ELSE {u} END AS BIGINT)", prefix="sg")

if __name__ == '__main__':
    import duckdb, random, string
    from xxh64_ref import spark_xxhash64, to_signed as tos
    con = duckdb.connect()
    random.seed(7)
    cases = [[""], ["a"], ["hello"], ["hello world this is a long string over thirty two bytes for stripes"],
             ["w1", "w2", "w3"], ["the", "quick", "brown"], ["unicodeé中文", "x"],
             ["0123456789abcdefghijklmnopqrstuvwxyzABCDE", "x", "yz"]]
    for _ in range(40):
        k = random.randint(1, 3)
        cases.append(["".join(random.choices(string.ascii_letters + "0123456789", k=random.randint(0, 45))) for _ in range(k)])
    nfail = 0
    expr = to_signed(xxchain("ws"))
    sql = f"SELECT {expr} FROM (SELECT ? AS wsj) t, LATERAL (SELECT string_split(wsj, chr(1)) AS ws) u"
    for ws in cases:
        got = con.execute(sql, ["\x01".join(ws)]).fetchone()[0]
        want = tos(spark_xxhash64(*ws))
        if got != want:
            nfail += 1
            print("MISMATCH", ws, got, want)
    print("expr_len", len(expr), "fails", nfail, "of", len(cases))
