"""Pure-Python XXH64 reference (public spec, github.com/Cyan4973/xxHash)
plus Spark's multi-column chaining (seed 42, each column's hash seeds the
next). Dev-only scaffolding for validating the generated DuckDB oracle SQL."""
M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

def rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M

def xround(acc, inp):
    return (rotl((acc + inp * P2) & M, 31) * P1) & M

def merge_round(h, v):
    return ((h ^ xround(0, v)) * P1 + P4) & M

def xxh64(data: bytes, seed: int) -> int:
    n = len(data)
    def w8(o):
        return int.from_bytes(data[o:o+8], 'little')
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        o = 0
        while o <= n - 32:
            v1 = xround(v1, w8(o)); v2 = xround(v2, w8(o+8))
            v3 = xround(v3, w8(o+16)); v4 = xround(v4, w8(o+24))
            o += 32
        h = (rotl(v1,1) + rotl(v2,7) + rotl(v3,12) + rotl(v4,18)) & M
        for v in (v1, v2, v3, v4):
            h = merge_round(h, v)
    else:
        o = 0
        h = (seed + P5) & M
    h = (h + n) & M
    while o <= n - 8:
        h = ((rotl(h ^ xround(0, w8(o)), 27) * P1) + P4) & M
        o += 8
    if o <= n - 4:
        h = ((rotl(h ^ ((int.from_bytes(data[o:o+4], 'little')) * P1) & M, 23) * P2) + P3) & M
        o += 4
    while o < n:
        h = (rotl(h ^ ((data[o] * P5) & M), 11) * P1) & M
        o += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h

def spark_xxhash64(*strings, seed=42):
    h = seed
    for s in strings:
        h = xxh64(s.encode('utf-8'), h)
    return h

def to_signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u

if __name__ == '__main__':
    import sys
    print(to_signed(spark_xxhash64(*sys.argv[1:])))
