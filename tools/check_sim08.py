#!/usr/bin/env python3
"""Blocked-numpy oracle for sim08_knn_graph at scale factors where the
DuckDB all-pairs SQL is infeasible (sf>=1.0: ~2.5e9 directed pairs).
Computes the exact top-K neighbor list per vector with BLAS matmuls in
row blocks — ranked on (cosine rounded to 6dp DESC, dst ASC), the same
total order both engines use — and compares (src, rank, dst, cos_r)
against the Spark output parquet. Dev-loop tool only.

Usage: python3 tools/check_sim08.py <sfDir> <verifyOutDir>
"""
import decimal
import sys

import duckdb
import numpy as np

K = 5

SIX = decimal.Decimal("0.000001")


def round_half_up(x):
    """Java/Spark round(x, 6): BigDecimal of the double's SHORTEST
    DECIMAL repr, HALF_UP. np.round is half-even ON THE BINARY value —
    both legs differ from the engine on exact 6dp ties (e.g. 2.5e-6
    rounds to 2e-6 under numpy but 3e-6 under Spark), so the candidate
    slate is re-rounded with the engine's exact semantics before the
    final ranking."""
    return float(decimal.Decimal(repr(float(x)))
                 .quantize(SIX, rounding=decimal.ROUND_HALF_UP))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id").fetchnumpy()
    ids = emb["vec_id"]
    v = np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    n = len(v)
    want = {}
    block = 2048
    for i0 in range(0, n, block):
        c = v[i0:i0 + block] @ v.T
        cr = np.round(c, 6)
        for bi in range(c.shape[0]):
            i = i0 + bi
            row = cr[bi].copy()
            row[i] = -np.inf  # exclude self
            # fast slate: everything within 1e-6 of the K-th value under
            # numpy rounding (value-based cutoff — a fixed +8 could drop
            # a true top-K member if a tie plateau at the K-th boundary
            # exceeded 8 candidates; numpy half-even differs from the
            # engine's HALF_UP by <=1e-6, so the true top-K is inside
            # this slate), then re-round the slate with the engine's
            # HALF_UP-on-decimal-repr semantics and re-rank
            order = np.lexsort((ids, -row))
            kth = row[order[min(K, len(order)) - 1]]
            cut = np.searchsorted(-row[order], -(kth - 1e-6), side="right")
            slate = order[:max(cut, K)]
            precise = sorted(
                ((round_half_up(c[bi][j]), int(ids[j])) for j in slate
                 if int(ids[j]) != int(ids[i])),
                key=lambda t: (-t[0], t[1]))[:K]
            want[int(ids[i])] = [
                (r + 1, j, v) for r, (v, j) in enumerate(precise)]
    got = {}
    for src, rank, dst, cos_r in con.execute(
            f"SELECT src, rank, dst, cos_r FROM '{out_dir}/sim08_knn_graph/"
            "*.parquet'").fetchall():
        got.setdefault(int(src), []).append(
            (int(rank), int(dst), float(cos_r)))
    for s in got:
        got[s].sort()
    if got == want:
        print(f"PASS sim08_knn_graph ({sum(map(len, got.values()))} rows, "
              "numpy oracle)")
        return 0
    bad = [s for s in want if got.get(s) != want[s]][:3]
    print(f"FAIL sim08_knn_graph: {len(bad)}+ mismatched sources, e.g. "
          + "; ".join(f"src {s}: spark {got.get(s)} vs numpy {want[s]}"
                      for s in bad))
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
