#!/usr/bin/env python3
"""Independent brute-force oracle for tx05_winnow_pairs.

tx05 is hash-function-specific (winnowing fingerprints over a 64-bit
polynomial rolling hash), so it carries no DuckDB oracle. This checker
recomputes the ENTIRE pipeline outside Spark — the K=24/W=16/base-257
rolling hash with 64-bit wraparound, robust winnowing's rightmost-min
pick under SIGNED long comparison, per-doc fingerprint dedup, the
df-capped (StopKeyCap=1000) inverted index, and exact shared-fingerprint
pair counts >= 5 — and demands the engine output match row for row
(n_shared included). numpy vectorizes the per-doc hash/window math; the
cross-window dedup reduces to keep[i] = (pick[i] != pick[i-1]).

Usage: python3 tools/check_tx05.py <sfDir> <verifyOutDir>
"""
import sys
from itertools import combinations

import duckdb
import numpy as np

K = 24
W = 16
BASE = 257
MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
STOP_KEY_CAP = 1000
MIN_SHARED = 5


def winnow(text: str):
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(b)
    if n < K:
        return set()
    n_grams = n - K + 1
    # hs[i] = sum_j b[i+j] * BASE^(K-1-j)  (mod 2^64)
    hs = np.zeros(n_grams, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(K):
            p = np.uint64(pow(BASE, K - 1 - j, 1 << 64))
            hs += b[j:j + n_grams] * p
    signed = hs.astype(np.int64)
    # rightmost-min per W-window under signed comparison (`<=` while
    # scanning left to right == last argmin)
    last_win = max(n_grams - W, 0)
    picks = np.empty(last_win + 1, dtype=np.int64)
    if n_grams <= W:
        w = signed[::-1]
        picks[0] = len(signed) - 1 - int(np.argmin(w))
    else:
        sw = np.lib.stride_tricks.sliding_window_view(signed, W)[:, ::-1]
        picks = (W - 1 - np.argmin(sw, axis=1)) + np.arange(len(sw))
    keep = np.ones(len(picks), dtype=bool)
    keep[1:] = picks[1:] != picks[:-1]
    return set(hs[picks[keep]].tolist())


def main(sf_dir, out_dir):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    postings = {}
    for doc_id, text in docs:
        for f in winnow(text):
            postings.setdefault(f, []).append(doc_id)
    counts = {}
    for f, ds in postings.items():
        if 2 <= len(ds) <= STOP_KEY_CAP:
            for a, b in combinations(sorted(ds), 2):
                counts[(a, b)] = counts.get((a, b), 0) + 1
    want = {(a, b, c) for (a, b), c in counts.items() if c >= MIN_SHARED}
    got = {(int(r[0]), int(r[1]), int(r[2])) for r in con.execute(
        f"SELECT d1, d2, n_shared FROM '{out_dir}/tx05_winnow_pairs/"
        "*.parquet'").fetchall()}
    if got != want:
        print(f"tx05 MISMATCH: engine {len(got)} rows, brute {len(want)}; "
              f"engine-only {sorted(got - want)[:5]}, "
              f"brute-only {sorted(want - got)[:5]}")
        return 1
    print(f"tx05 OK: {len(got)} pairs match the pure-python winnowing "
          "brute force exactly")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
