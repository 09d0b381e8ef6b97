#!/usr/bin/env python3
"""Python union-find checker for the connected-components query family
(dd06/dd09 cluster census, dd08/dd10 deduplicated corpus, dd14 canonical
selection).

The pair graph still comes from the INDEPENDENT DuckDB oracle — the very
dd02_jaccard_pairs SQL recorded in the dump's oracle_sql.json — so the
only piece replicated in python is the transitive closure (plus dd14's
per-cluster argmax). The previous sidecar tier ran that closure as a
recursive CTE in DuckDB once PER QUERY; the closure enumerates reachable
pairs (quadratic per component) and dominated the whole sf1 correctness
gate (~50 of ~70 min). A path-compressed union-find over the same edge
list is near-linear and grades all five queries from one edge
materialization. The recursive-CTE form remains the driver's oracle at
sf0.01 (oracle_sql.json is unchanged), and the sidecar can spot-check it
here with SIDECAR_CC_CTE=1.

Usage: python3 tools/check_cc.py <sfDir> <verifyOutDir>
"""
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check  # noqa: E402

CC_QUERIES = (
    "dd06_dedup_clusters",
    "dd08_dedup_corpus",
    "dd09_clusters_from_pairs",
    "dd10_dedup_corpus_from_pairs",
    "dd14_cluster_canonical",
)

_EDGE_CACHE = {}


def _membership(con, sf_dir, out_dir):
    """node -> component representative (min doc_id), from the dd02
    DuckDB oracle's >=0.8 Jaccard pair relation."""
    key = (sf_dir, out_dir)
    if key in _EDGE_CACHE:
        return _EDGE_CACHE[key]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    pairs = con.execute(oracle["dd02_jaccard_pairs"]).fetchall()
    parent = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for d1, d2, _ in pairs:
        parent.setdefault(d1, d1)
        parent.setdefault(d2, d2)
        r1, r2 = find(d1), find(d2)
        if r1 != r2:
            parent[r1] = r2
    rep = {}
    for n in parent:
        r = find(n)
        if r not in rep or n < rep[r]:
            rep[r] = n
    member = {n: rep[find(n)] for n in parent}
    _EDGE_CACHE[key] = member
    return member


def _dump(con, out_dir, name, cols):
    return con.execute(
        f"SELECT {cols} FROM '{out_dir}/{name}/*.parquet'").fetchall()


def check_one(con, sf_dir, out_dir, name):
    """Grade one CC-family dump; returns (ok, msg)."""
    member = _membership(con, sf_dir, out_dir)
    if name in ("dd06_dedup_clusters", "dd09_clusters_from_pairs"):
        want = {}
        for _, r in member.items():
            want[r] = want.get(r, 0) + 1
        # Compare as a sorted row multiset, NOT a dict keyed on rep — a
        # dict collapse would let a dump with duplicated or conflicting
        # census rows (two rows for one rep) pass as long as the LAST
        # row agreed, which the replaced full-relation CTE oracle would
        # have caught.
        got = sorted((int(a), int(b)) for a, b in
                     _dump(con, out_dir, name, "cluster_rep, cluster_size"))
        wrows = sorted((int(r), int(c)) for r, c in want.items())
        ok = got == wrows
        msg = (f"{len(wrows)} clusters over {len(member)} member docs"
               if ok else
               f"census mismatch: {len(got)} vs {len(wrows)} rows, "
               f"first diff {sorted(set(got) ^ set(wrows))[:3]}")
        return ok, msg
    if name in ("dd08_dedup_corpus", "dd10_dedup_corpus_from_pairs"):
        removed = {n for n, r in member.items() if n != r}
        docs = con.execute(
            f"SELECT doc_id, lang, source FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
        want = sorted((int(d), l, s) for d, l, s in docs
                      if int(d) not in removed)
        got = sorted((int(d), l, s) for d, l, s in
                     _dump(con, out_dir, name, "doc_id, lang, source"))
        ok = got == want
        return ok, (f"{len(want)} kept of {len(docs)} docs" if ok else
                    f"corpus mismatch: {len(got)} vs {len(want)} rows")
    if name == "dd14_cluster_canonical":
        nchars = dict(con.execute(
            f"SELECT doc_id, n_chars FROM '{sf_dir}/documents.parquet'"
        ).fetchall())
        best = {}
        for n, r in member.items():
            cand = (-nchars[n], n)
            if r not in best or cand < best[r]:
                best[r] = cand
        want = sorted((int(r), int(n), int(-neg))
                      for r, (neg, n) in best.items())
        got = sorted((int(a), int(b), int(c)) for a, b, c in
                     _dump(con, out_dir, name,
                           "cluster_rep, kept_doc, n_chars"))
        ok = got == want
        return ok, (f"{len(want)} canonical picks" if ok else
                    f"canonical mismatch: {len(got)} vs {len(want)} rows")
    raise ValueError(f"not a CC-family query: {name}")


def main(sf_dir, out_dir):
    con = duckdb.connect()
    check.create_views(con, sf_dir)
    fails = 0
    for name in CC_QUERIES:
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"NO-DUMP {name}")
            continue
        ok, msg = check_one(con, sf_dir, out_dir, name)
        print(f"{'PASS' if ok else 'FAIL'} {name}: {msg}")
        fails += 0 if ok else 1
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
