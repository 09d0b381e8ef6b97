#!/usr/bin/env python3
"""Independent replica oracle for sim07_mmr_rerank.

sim07 carries no DuckDB oracle (iterated argmax is not relational), so
this checker re-runs the whole operator OUTSIDE Spark: exact relevance
scoring of the broadcast query set (vec_id < 10) against the corpus,
top-30 candidate pool per query on (round(cos,6) desc, vec_id asc),
then the Carbonell-Goldstein greedy
  argmax 0.5*rel(q,c) - 0.5*max_{s in selected} cos(c,s)
with vec_id tie-breaks and the pairwise penalty rounded to 6dp
BEFORE the max, exactly as the engine's executor-side greedy runs it
(r12: the greedy moved off the driver to flatMapGroups and gained a
full unrolled DuckDB oracle; this replica stays as defense-in-depth).
Dot products use sequential-order double accumulation (the same order
the codegen'd cosine kernel uses), so scores are bit-identical, not
merely close. Output rounds at 7dp: mmr = 0.5*(a-b) of 6dp terms sits
exactly on the 5e-7 grid, where 6dp rounding is a half-boundary
coin-flip. Dev-loop tool only, like check_dd05.py.

Usage: python3 tools/check_sim07.py <sfDir> <verifyOutDir>
"""
import sys

import duckdb
import numpy as np

NQ = 10
POOL = 30
K = 5
LAM = 0.5


def r6(x):
    # Spark SQL round() = BigDecimal HALF_UP; values here never sit at a
    # half boundary, so rint on the scaled value matches it exactly
    import numpy as _np
    return float(_np.rint(x * 1e6) / 1e6) if x >= 0 else -float(
        _np.rint(-x * 1e6) / 1e6)


def cos(a, b):
    dt = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dt += x * y
        na += x * x
        nb += y * y
    if na == 0 or nb == 0:
        return 0.0
    import math
    return dt / math.sqrt(na * nb)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    vecs = {int(i): [float(x) for x in e] for i, e in rows}
    queries = {i: v for i, v in vecs.items() if i < NQ}
    want = set()
    for qid, qv in sorted(queries.items()):
        scored = [(round(cos(qv, v), 6), vid)
                  for vid, v in vecs.items() if vid != qid]
        pool = sorted(scored, key=lambda t: (-t[0], t[1]))[:POOL]
        remaining = [(vid, rel) for rel, vid in pool]
        selected = []
        for rank in range(1, min(K, len(remaining)) + 1):
            best = None
            for vid, rel in remaining:
                pen = max((r6(cos(vecs[vid], vecs[s]))
                           for s, _ in selected), default=0.0)
                m = LAM * rel - (1 - LAM) * pen
                if best is None or (-m, vid) < (-best[2], best[0]):
                    best = (vid, rel, m)
            selected.append((best[0], best[1]))
            remaining = [r for r in remaining if r[0] != best[0]]
            want.add((qid, rank, best[0],
                      float(np.rint(best[2] * 1e7) / 1e7)))
    got = con.execute(
        f"SELECT qid, rank, vec_id, mmr_r FROM '{out_dir}/sim07_mmr_rerank/"
        "*.parquet'").fetchall()
    got = set((int(q), int(r), int(v), float(m)) for q, r, v, m in got)
    if got == want:
        print(f"PASS sim07_mmr_rerank ({len(got)} rows, "
              "independent MMR replica)")
        return 0
    print(f"FAIL sim07_mmr_rerank: spark {len(got)} vs replica "
          f"{len(want)}; only-spark {sorted(got - want)[:4]}; "
          f"only-replica {sorted(want - got)[:4]}")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
