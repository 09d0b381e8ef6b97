#!/usr/bin/env python3
"""Per-query scaling-exponent table from the full-surface sidecars.

Reads BENCH_sf1/sf2/sf4 (same-protocol, same-HEAD runs), fits each
query's log-log slope alpha where t ~ sf^alpha (least squares over the
available points), and writes BENCH_exponents.json: per-query alpha,
the per-family median, and a flag list of queries whose alpha exceeds
the superlinearity threshold (default 1.3) — with their fixed-cost
floor noted, since a sub-second query's "slope" is mostly JIT/session
noise (PLANS.md round-11 decomposition).

Usage: python3 tools/scale_exponents.py [out.json] [--threshold 1.3]
       (expects BENCH_sf1.json BENCH_sf2.json BENCH_sf4.json in cwd)
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        txt = f.read()
    doc = json.loads(txt)
    return doc["queries"]


def main():
    out = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith(
        "--") else "BENCH_exponents.json"
    thr = 1.3
    if "--threshold" in sys.argv:
        thr = float(sys.argv[sys.argv.index("--threshold") + 1])
    # sf8 joins the fit when its sidecar exists (r14: BENCH_sf8.json
    # filled) -> 4-point fits; queries absent at a point (gated/skipped/
    # failed, value <= 0) simply contribute fewer points
    sfs = [1.0, 2.0, 4.0]
    import os
    if os.path.exists("BENCH_sf8.json") and os.path.getsize("BENCH_sf8.json") > 0:
        sfs = [1.0, 2.0, 4.0, 8.0]
    tables = [load(f"BENCH_sf{int(s)}.json") for s in sfs]
    names = sorted(set().union(*[set(t) for t in tables]))
    rows = {}
    flags = []
    for q in names:
        pts = [(s, t[q]) for s, t in zip(sfs, tables)
               if q in t and t[q] is not None and t[q] > 0]
        if len(pts) < 2:
            rows[q] = {"alpha": None, "points": len(pts)}
            continue
        xs = [math.log2(s) for s, _ in pts]
        ys = [math.log2(v) for _, v in pts]
        n = len(pts)
        mx, my = sum(xs) / n, sum(ys) / n
        denom = sum((x - mx) ** 2 for x in xs)
        alpha = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
        # pts[0] is the smallest AVAILABLE point, not necessarily sf1
        # (a query can be gated/skipped/failed at sf1): record its
        # actual scale and key the fixed-cost floor on it instead of
        # mislabeling an sf2+ time as t_sf1 (r14 advisor)
        t_min, min_sf = pts[0][1], pts[0][0]
        rows[q] = {"alpha": round(alpha, 3),
                   "t_min_sf": t_min, "min_sf": min_sf,
                   "t_max_sf": pts[-1][1], "max_sf": pts[-1][0],
                   "points": n}
        # flag real superlinearity: slope over threshold AND the
        # smallest point is above the ~1 s fixed-cost floor (sub-second
        # queries' slopes are session noise, not data cost)
        if alpha > thr and t_min >= 1.0:
            flags.append({"query": q, "alpha": round(alpha, 3),
                          "t_min_sf": t_min, "min_sf": min_sf,
                          "t_max_sf": rows[q]["t_max_sf"]})
    fam = {}
    for q, r in rows.items():
        if r.get("alpha") is None:
            continue
        fam.setdefault(q.split("_")[0].rstrip("0123456789"), []).append(
            r["alpha"])
    fam_med = {k: round(sorted(v)[len(v) // 2], 3) for k, v in fam.items()}
    doc = {
        "metric": "scale_exponents",
        "protocol": "alpha = least-squares log2-slope of min-of-2 seconds "
                    "over the sf%s full-surface sidecars (same host, same "
                    "protocol); flag = alpha > %.2f AND "
                    "t_min_sf >= 1 s (fixed-cost floor at the smallest "
                    "available point, min_sf)" % ("/".join(str(int(s)) for s in sfs), thr),
        "family_median_alpha": dict(sorted(fam_med.items())),
        "flags_superlinear": sorted(flags, key=lambda x: -x["alpha"]),
        "queries": dict(sorted(rows.items())),
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"{out}: {len(rows)} queries, {len(flags)} flagged > {thr}")
    for fl in doc["flags_superlinear"]:
        print("  FLAG", fl)


if __name__ == "__main__":
    main()
