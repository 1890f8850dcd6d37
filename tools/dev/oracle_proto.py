import duckdb
from xxh64_sqlgen import xxchain, to_signed, M

DOCNORM = "regexp_replace(trim(text), '\\s+', ' ', 'g')"
SHINGLE_CTE = f"""WITH d AS (
  SELECT doc_id, string_split({DOCNORM}, ' ') AS words FROM documents
), shm AS (
  SELECT doc_id, [words[i], words[i+1], words[i+2]] AS ws
  FROM (SELECT doc_id, words, unnest(range(1, len(words)-1)) AS i
        FROM d WHERE len(words) >= 3) t
  UNION ALL
  SELECT doc_id, [array_to_string(words, ' ')] AS ws
  FROM d WHERE len(words) < 3
), hx AS (
  SELECT doc_id, {xxchain('ws')} AS hu FROM shm
)"""

# minhash constants replicated from Dedup.minhashAB / MinhashPrime
def minhash_ab(i):
    def jmul(a, b):
        return ((a * b) & (M - 1))
    GOLD = 0x9E3779B97F4A7C15
    C2 = 0xC2B2AE3D27D4EB4F
    def tosig(u):
        return u - M if u >= (1 << 63) else u
    a = abs(tosig(jmul(GOLD, 2 * i + 1)) >> 33) | 1
    b = abs(tosig(jmul(C2, i + 1)) >> 33)
    return a, b

PRIME = 2305843009213693951

def minhash_sql():
    mins = ",\n    ".join(
        f"MIN((h31 * {minhash_ab(i)[0]} + {minhash_ab(i)[1]}) % {PRIME}) AS m{i}"
        for i in range(32))
    bands = []
    for b in range(8):
        fold = "CAST(0 AS BIGINT)"
        for i in range(b * 4, b * 4 + 4):
            fold = f"(({fold} * 1000003 + m{i} % 2147483647) % 2147483647)"
        bands.append(f"SELECT doc_id, {b} AS band, {fold} AS band_hash FROM sig")
    bands_sql = "\n  UNION ALL\n  ".join(bands)
    return f"""{SHINGLE_CTE}, hxd AS (
  SELECT DISTINCT doc_id, hu FROM hx
), h31t AS (
  SELECT doc_id, CAST(hu % 2147483648 AS BIGINT) AS h31 FROM hxd
), sig AS (
  SELECT doc_id,
    {mins}
  FROM h31t GROUP BY doc_id
), bands AS (
  {bands_sql}
), capped AS (
  SELECT doc_id, band, band_hash FROM (
    SELECT doc_id, band, band_hash,
      COUNT(*) OVER (PARTITION BY band, band_hash) AS bn
    FROM bands) t
  WHERE bn <= 64
)
SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
FROM capped l JOIN capped r
  ON l.band = r.band AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id
ORDER BY a, b"""

def simhash_sql():
    # bit sums from the unsigned HUGEINT hash; sig assembled as signed BIGINT
    bitcols = ",\n    ".join(
        f"SUM(CAST((hu // {1 << j}) % 2 AS BIGINT)) AS b{j}" for j in range(64))
    sigterms = " + ".join(
        [f"CASE WHEN b{j} * 2 > n THEN CAST({1 << j} AS BIGINT) ELSE 0 END" for j in range(63)] +
        ["CASE WHEN b63 * 2 > n THEN CAST(-9223372036854775808 AS BIGINT) ELSE 0 END"])
    return f"""{SHINGLE_CTE}, bits AS (
  SELECT doc_id, COUNT(*) AS n,
    {bitcols}
  FROM hx GROUP BY doc_id
), sg AS (
  SELECT doc_id, {sigterms} AS sig FROM bits
), ch AS (
  SELECT doc_id, cc.c AS chunk, (sig >> (cc.c * 16)) & 65535 AS cv
  FROM sg, (SELECT unnest(range(4)) AS c) cc
), capped AS (
  SELECT doc_id, chunk, cv FROM (
    SELECT doc_id, chunk, cv, COUNT(*) OVER (PARTITION BY chunk, cv) AS bn
    FROM ch) t
  WHERE bn <= 64
), pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM capped l JOIN capped r
    ON l.chunk = r.chunk AND l.cv = r.cv AND l.doc_id < r.doc_id
)
SELECT a, b, CAST(bit_count(xor(sa.sig, sb.sig)) AS BIGINT) AS hamming
FROM pairs JOIN sg sa ON sa.doc_id = a JOIN sg sb ON sb.doc_id = b
WHERE bit_count(xor(sa.sig, sb.sig)) <= 8
ORDER BY a, b"""

if __name__ == '__main__':
    import sys, time
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    for name, sql in [("q_dedup_minhash", minhash_sql()), ("q_dedup_simhash", simhash_sql())]:
        t0 = time.time()
        want = con.execute(sql).fetchall()
        got = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet' ORDER BY a, b").fetchall()
        ok = want == got
        print(name, "OK" if ok else "MISMATCH", f"{len(want)} vs {len(got)} rows", f"{time.time()-t0:.1f}s")
        if not ok:
            sw, sg = set(want), set(got)
            print("  only oracle:", sorted(sw - sg)[:5])
            print("  only spark:", sorted(sg - sw)[:5])
