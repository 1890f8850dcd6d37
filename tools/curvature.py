#!/usr/bin/env python3
"""Three-point scaling-curvature readout (r17 ask #1).

Two scale points cannot distinguish linear from quadratic; with the
committed sf0.1/sf1 pair plus the r17 sf3 leg this prints, per query:
the measured times, the sf0.1->sf1 ratio (10x data), the sf1->sf3
ratio (3x data), and the fitted power-law exponent over the upper pair
p = log(t3/t1)/log(3) — p~1 linear, p~2 quadratic, p<1 fixed-cost-
dominated. The upper pair is the honest curvature instrument: both
legs are big enough that per-job fixed costs no longer dominate.

Usage: python3 tools/curvature.py <sf01.json> <sf1.json> <sf3.json>
"""
import json
import math
import sys


def main():
    b01 = json.load(open(sys.argv[1]))["queries"]
    b1 = json.load(open(sys.argv[2]))["queries"]
    b3 = json.load(open(sys.argv[3]))
    names = b3.get("only") or sorted(b3["queries"].keys())
    q3 = b3["queries"]
    rows = []
    for n in names:
        if n not in b1 or n not in q3 or n not in b01:
            continue
        t01, t1, t3 = b01[n], b1[n], q3[n]
        r10 = t1 / t01 if t01 else float("nan")
        r3 = t3 / t1 if t1 else float("nan")
        p = math.log(t3 / t1) / math.log(3) if t1 > 0 and t3 > 0 else float("nan")
        if not math.isfinite(p):
            # an errored/zero timing gives NaN; NaN-keyed sorts are
            # order-unstable (every comparison False), so drop loudly
            print(f"# dropped {n}: non-finite exponent "
                  f"(t1={t1}, t3={t3})", file=sys.stderr)
            continue
        rows.append((p, n, t01, t1, t3, r10, r3))
    rows.sort(reverse=True)
    print(f"{'query':34} {'sf0.1':>7} {'sf1':>7} {'sf3':>8} "
          f"{'x10':>5} {'x3':>5} {'p':>5}")
    for p, n, t01, t1, t3, r10, r3 in rows:
        print(f"{n:34} {t01:7.2f} {t1:7.2f} {t3:8.2f} "
              f"{r10:5.1f} {r3:5.2f} {p:5.2f}")


if __name__ == "__main__":
    main()
