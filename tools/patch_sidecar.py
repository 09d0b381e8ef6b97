#!/usr/bin/env python3
"""Patch late-dumped or re-graded queries into a CORRECTNESS_sf* sidecar.

The full sidecar pass (sidecar_correctness.py) prices every DuckDB oracle
at the target sf — ~an hour at sf1, dominated by the recursive-CTE pair
oracles. When a handful of queries land AFTER a pass started (new
operators, a re-graded derived check), re-running everything to pick them
up is waste: this re-grades ONLY the named queries with the identical
logic (same canon compare, same SPECIAL/derived dispatch) and updates the
sidecar's counts in place.

Usage: python3 tools/patch_sidecar.py <sfDir> <verifyOutDir> <sidecar.json> <name> [name ...]
"""
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check  # noqa: E402
import check_cc  # noqa: E402
import check_derived  # noqa: E402
import sidecar_correctness as sc  # noqa: E402


def main(sf_dir, out_dir, sidecar_path, names):
    con = duckdb.connect()
    check.create_views(con, sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    doc = json.load(open(sidecar_path))
    for name in names:
        rows = con.execute(
            f"SELECT COUNT(*) FROM '{out_dir}/{name}/*.parquet'"
        ).fetchone()[0]
        if name in sc.SPECIAL:
            label, fn = sc.SPECIAL[name]
            ok = fn(sf_dir, out_dir) == 0
            entry = {"oracle": label, "pass": ok, "spark_rows": int(rows)}
        elif name in check_cc.CC_QUERIES:
            ok, msg = check_cc.check_one(con, sf_dir, out_dir, name)
            entry = {"oracle": "duckdb pairs + python union-find "
                               "(tools/check_cc.py)",
                     "pass": bool(ok), "spark_rows": int(rows), "note": msg}
        elif name in oracle:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.execute(oracle[name]).fetchdf()
            cols_ok = sorted(c.lower() for c in got.columns) == sorted(
                c.lower() for c in want.columns)
            ok = cols_ok and check.canon(got) == check.canon(want)
            if name in sc.AUGMENT:
                # dd04/tx05: DuckDB oracle primary + python brute-force
                # second tier, same dual grading as the full sidecar pass
                label, fn = sc.AUGMENT[name]
                checker_ok = fn(sf_dir, out_dir) == 0
                entry = {"oracle": f"duckdb + {label}",
                         "pass": bool(ok and checker_ok),
                         "spark_rows": int(rows),
                         "checker_pass": bool(checker_ok)}
            else:
                entry = {"oracle": "duckdb", "pass": bool(ok),
                         "spark_rows": int(rows)}
        elif name in check_derived.CHECKS:
            ok, msg = check_derived.CHECKS[name](con, sf_dir, out_dir)
            entry = {"oracle": "derived (tools/check_derived.py)",
                     "pass": bool(ok), "spark_rows": int(rows), "note": msg}
        else:
            entry = {"oracle": None, "pass": None, "spark_rows": int(rows),
                     "err": "no_oracle (spec-gated)"}
        doc["queries"][name] = entry
        print(f"{'PASS' if entry.get('pass') else str(entry.get('pass'))} "
              f"{name} ({rows} rows)")
    oracled = [q for q in doc["queries"].values() if q["oracle"]]
    doc["n_queries"] = len(doc["queries"])
    doc["n_oracled"] = len(oracled)
    doc["n_pass"] = sum(1 for q in oracled if q["pass"])
    doc["n_fail"] = sum(1 for q in oracled if not q["pass"])
    with open(sidecar_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"{doc['n_pass']}/{doc['n_oracled']} oracled pass, "
          f"{doc['n_fail']} fail, {doc['n_queries']} queries")
    return 1 if doc["n_fail"] else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4:]))
