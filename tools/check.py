#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same sfDir
parquet tables, sorts columns by name and rows by all columns, and compares
values. Dev-loop tool only — the real gate is driver-side.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def create_views(con, sf_dir):
    """One view per table; `events.ts` is normalized to TIMESTAMP.

    The physical type of events.ts varies by generation (TESTDATA.md /
    PLANS.md): TIMESTAMP(NANOS) and micros TIMESTAMP_NTZ read as
    timestamps directly, but graft.ScaleData's sf>=1 fixtures store raw
    epoch-NANOS int64 — the oracle SQL (date_diff/date_trunc on ts) needs
    the same `timestamp_micros(ts DIV 1000)` normalization the engine's
    Tables.normalizeEventTs applies, or every events oracle binder-fails.
    """
    for t in TABLES:
        src = f"'{sf_dir}/{t}.parquet'"
        if t == "events":
            # read the type from the SCHEMA, not a data row — on an empty
            # events.parquet a LIMIT 1 probe returns no row and crashes
            ty = con.execute(
                f"DESCRIBE SELECT ts FROM {src}").fetchone()[1]
            if ty in ("BIGINT", "HUGEINT", "UBIGINT"):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) FROM {src}")
                continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def canon(df):
    df = df[sorted(df.columns)]
    rows = [tuple(norm(v) for v in r) for r in df.itertuples(index=False)]
    return sorted(rows, key=repr)


def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    create_views(con, sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_nodump = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name}")
            continue
        if not os.path.isdir(f"{out_dir}/{name}"):
            # Either a partial Verify dump (its query-filter arg) or a
            # query that CRASHED mid-Verify (it catches per-query errors
            # and moves on). Loudly distinguishable from PASS/FAIL so a
            # run that silently lost dumps cannot read as clean — r8's
            # dd15 rewrite burned two timing runs on exactly that.
            print(f"SKIP {name} (no dump)")
            n_nodump += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if sorted(c.lower() for c in got.columns) != sorted(
                c.lower() for c in want.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs "
                  f"{sorted(want.columns)}")
            n_fail += 1
        elif g == w:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {len(g)} vs {len(w)} rows")
            diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
            for a, b in diff:
                print(f"   spark: {a}\n   duck : {b}")
            if not diff and len(g) != len(w):
                only_g = [r for r in g if r not in set(map(tuple, w))][:3]
                only_w = [r for r in w if r not in set(map(tuple, g))][:3]
                print(f"   only-spark: {only_g}\n   only-duck : {only_w}")
            n_fail += 1
    nodump = f", {n_nodump} no-dump" if n_nodump else ""
    print(f"\n{n_pass} pass, {n_fail} fail{nodump}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    # Optional 3rd arg: comma-separated query names to skip (e.g. dd05's
    # all-pairs oracle, which is intentionally quadratic and infeasible in
    # DuckDB above sf0.1 — tools/check_dd05.py covers it with blocked numpy).
    skip = sys.argv[3].split(",") if len(sys.argv) > 3 else ()
    sys.exit(main(sys.argv[1], sys.argv[2], skip))
