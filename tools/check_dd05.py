#!/usr/bin/env python3
"""Blocked-numpy oracle for dd05_embedding_neardup at scale factors where
DuckDB's all-pairs list-transform SQL is infeasible (sf>=1.0: ~1.25e9
pairs). Computes the exact cosine>=0.45 pair set with BLAS matmuls in
row blocks and compares it (v1, v2, cos_r rounded to 6dp) against the
Spark output parquet. Dev-loop tool only.

Usage: python3 tools/check_dd05.py <sfDir> <verifyOutDir>
"""
import sys

import duckdb
import numpy as np


def main(sf_dir, out_dir):
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id").fetchnumpy()
    ids = emb["vec_id"]
    v = np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    n = len(v)
    want = set()
    block = 2048
    for i0 in range(0, n, block):
        a = v[i0:i0 + block]
        c = a @ v.T
        ii, jj = np.nonzero(np.round(c, 6) >= 0.45)
        for bi, j in zip(ii, jj):
            i = i0 + bi
            if i < j:
                want.add((int(ids[i]), int(ids[j]),
                          float(np.round(c[bi, j], 6))))
    got = con.execute(
        f"SELECT v1, v2, cos_r FROM '{out_dir}/dd05_embedding_neardup/"
        "*.parquet'").fetchall()
    got = set((int(a), int(b), float(c)) for a, b, c in got)
    if got == want:
        print(f"PASS dd05_embedding_neardup ({len(got)} rows, numpy oracle)")
        return 0
    print(f"FAIL dd05_embedding_neardup: spark {len(got)} vs numpy "
          f"{len(want)} rows; only-spark {sorted(got - want)[:3]}; "
          f"only-numpy {sorted(want - got)[:3]}")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
