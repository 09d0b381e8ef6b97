#!/usr/bin/env python3
"""Assemble a CORRECTNESS_sf<N>.json evidence sidecar from a Verify dump.

Runs the DuckDB oracle for every query in oracle_sql.json (check.py's
comparison, same canonicalization), the independent Python checkers for
the operators that have them (dd05/sim08 numpy, mm04 stub contract;
dd04/tx05 run their brute-force replicas as a SECOND tier on top of
their r12 DuckDB oracles), and records row counts + a
`no_oracle (spec-gated)` marker for the rest. Output format matches the
hand-assembled round-7 sidecar so cross-round diffs stay trivial.

Usage: python3 tools/sidecar_correctness.py <sfDir> <verifyOutDir> <sf> <out.json>
"""
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check  # noqa: E402
import check_cc  # noqa: E402
import check_dd04  # noqa: E402
import check_dd05  # noqa: E402
import check_derived  # noqa: E402
import check_mm04  # noqa: E402
import check_sim07  # noqa: E402  (dev-loop replica; sim07 now oracled)
import check_sim08  # noqa: E402
import check_tx05  # noqa: E402

SPECIAL = {
    "dd05_embedding_neardup": ("numpy (tools/check_dd05.py)",
                               check_dd05.main),
    # DuckDB-oracled at the sf0.01 driver gate; the sf>=1 sidecar swaps
    # the infeasible all-pairs SQL for the blocked-numpy replica
    "sim08_knn_graph": ("numpy (tools/check_sim08.py)",
                        check_sim08.main),
}

# dd04/tx05 gained FULL DuckDB oracles in r12 (XxhSql / winnow replay in
# HUGEINT mod-2^64 arithmetic), so the standard oracle compare is now the
# primary grade; the python brute-force replicas stay as an independent
# second tier — a pass requires BOTH graders to agree with the engine.
AUGMENT = {
    "dd04_simhash_pairs": ("xxh64 brute force (tools/check_dd04.py)",
                           check_dd04.main),
    "tx05_winnow_pairs": ("winnowing brute force (tools/check_tx05.py)",
                          check_tx05.main),
    # mm04 gained a full audit oracle in r13 (closed-form embedding
    # signature + twin census replayed in SQL); the numpy replica stays
    # as the independent third arithmetic path
    "mm04_media_embed_knn": ("stub-encoder contract (tools/check_mm04.py)",
                             check_mm04.main),
}


def fixture_fingerprint(sf_dir):
    """Physical fingerprint of the measured fixture: per-table
    [bytes, rows, row_groups, files] from the parquet footers plus an md5
    of the documents table's first part file — the same quadruple
    Bench.scala stamps, so a bench and a correctness sidecar claiming one
    fixture are mechanically checkable against each other (and against
    any future regeneration drift like the r9/r10 block-size one)."""
    import hashlib
    con = duckdb.connect()
    out = {"layout": "[bytes,rows,row_groups,files]"}
    tables = {}
    for fn in sorted(os.listdir(sf_dir)):
        if not fn.endswith(".parquet"):
            continue
        path = os.path.join(sf_dir, fn)
        glob = path if os.path.isfile(path) else path + "/*.parquet"
        try:
            nbytes, files = 0, 0
            walk = [path] if os.path.isfile(path) else [
                os.path.join(r, f) for r, _, fs in os.walk(path)
                for f in fs if not f.startswith(("_", "."))]
            for f in walk:
                nbytes += os.path.getsize(f)
                files += 1
            rows, groups = con.execute(
                "SELECT COUNT(*), COUNT(DISTINCT (file_name, row_group_id))"
                f" FROM parquet_metadata('{glob}')").fetchone()
            nrows = con.execute(
                f"SELECT SUM(num_rows) FROM (SELECT DISTINCT file_name,"
                f" row_group_id, row_group_num_rows AS num_rows FROM"
                f" parquet_metadata('{glob}'))").fetchone()[0]
            tables[fn[:-len(".parquet")]] = [
                nbytes, int(nrows), int(groups), files]
        except Exception as e:  # tolerate odd layouts; fingerprint is advisory
            tables[fn[:-len(".parquet")]] = ["error", str(e)[:80]]
    out["tables"] = tables
    doc = os.path.join(sf_dir, "documents.parquet")
    if os.path.exists(doc):
        part = doc if os.path.isfile(doc) else sorted(
            os.path.join(doc, f) for f in os.listdir(doc)
            if not f.startswith(("_", ".")))[0]
        h = hashlib.md5()
        with open(part, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                h.update(chunk)
        out["documents_md5"] = h.hexdigest()
    return out


def main(sf_dir, out_dir, sf, out_path):
    con = duckdb.connect()
    check.create_views(con, sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    dumped = sorted(d for d in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, d)))
    queries = {}
    for name in dumped:
        rows = con.execute(
            f"SELECT COUNT(*) FROM '{out_dir}/{name}/*.parquet'"
        ).fetchone()[0]
        if name in SPECIAL:
            label, fn = SPECIAL[name]
            ok = fn(sf_dir, out_dir) == 0
            queries[name] = {"oracle": label, "pass": ok,
                             "spark_rows": int(rows)}
            continue
        if name in check_cc.CC_QUERIES:
            # The recursive-CTE closure oracle is quadratic per component
            # and dominated the sf1 gate (~50 of ~70 min); union-find over
            # the SAME DuckDB-oracled pair relation grades all five CC
            # queries in seconds. SIDECAR_CC_CTE=1 re-enables the CTE as a
            # spot-check tier (it stays the driver's oracle at sf0.01).
            ok, msg = check_cc.check_one(con, sf_dir, out_dir, name)
            entry = {"oracle": "duckdb pairs + python union-find "
                               "(tools/check_cc.py)",
                     "pass": bool(ok), "spark_rows": int(rows), "note": msg}
            if os.environ.get("SIDECAR_CC_CTE"):
                got = con.execute(
                    f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
                want = con.execute(oracle[name]).fetchdf()
                cte_ok = bool(
                    sorted(c.lower() for c in got.columns) ==
                    sorted(c.lower() for c in want.columns)
                    and check.canon(got) == check.canon(want))
                entry["cte_spot_check"] = cte_ok
                if not cte_ok:
                    # A CTE/union-find disagreement is exactly the grader
                    # divergence the spot-check tier exists to catch —
                    # it must fail the query, not decorate a green one.
                    ok = False
                    entry["pass"] = False
                    entry["note"] = msg + "; CTE SPOT-CHECK DISAGREES"
            queries[name] = entry
            print(f"{'PASS' if ok else 'FAIL'} {name} (union-find): "
                  f"{entry['note'] if not ok else msg}")
            continue
        if name not in oracle:
            # Sketch/recall-specific queries: graded by the independent
            # derived checks (exact DuckDB quantities or another dump whose
            # own correctness is separately pinned) where one exists; the
            # residue stays spec-gated.
            if name in check_derived.CHECKS:
                ok, msg = check_derived.CHECKS[name](con, sf_dir, out_dir)
                queries[name] = {
                    "oracle": "derived (tools/check_derived.py)",
                    "pass": bool(ok), "spark_rows": int(rows), "note": msg}
                print(f"{'PASS' if ok else 'FAIL'} {name} (derived): {msg}")
            else:
                queries[name] = {"oracle": None, "pass": None,
                                 "spark_rows": int(rows),
                                 "err": "no_oracle (spec-gated)"}
                print(f"NO-ORACLE {name} ({rows} rows)")
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.execute(oracle[name]).fetchdf()
            cols_ok = sorted(c.lower() for c in got.columns) == sorted(
                c.lower() for c in want.columns)
            ok = cols_ok and check.canon(got) == check.canon(want)
        except Exception as e:
            queries[name] = {"oracle": "duckdb", "pass": False,
                             "spark_rows": int(rows), "err": str(e)[:200]}
            print(f"FAIL {name}: {e}")
            continue
        if name in AUGMENT:
            label, fn = AUGMENT[name]
            checker_ok = fn(sf_dir, out_dir) == 0
            queries[name] = {"oracle": f"duckdb + {label}",
                             "pass": bool(ok and checker_ok),
                             "spark_rows": int(rows),
                             "checker_pass": bool(checker_ok)}
            print(f"{'PASS' if ok and checker_ok else 'FAIL'} {name} "
                  f"({rows} rows, oracle={ok}, checker={checker_ok})")
            continue
        queries[name] = {"oracle": "duckdb", "pass": bool(ok),
                         "spark_rows": int(rows)}
        print(f"{'PASS' if ok else 'FAIL'} {name} ({rows} rows)")
    oracled = [q for q in queries.values() if q["oracle"]]
    doc = {
        "sf": float(sf),
        "data": sf_dir + (" (graft.ScaleData, deterministic, driver-shape)"
                          if "testdata_gen" in sf_dir else ""),
        "fixture": fixture_fingerprint(sf_dir),
        "n_queries": len(queries),
        "n_oracled": len(oracled),
        "n_pass": sum(1 for q in oracled if q["pass"]),
        "n_fail": sum(1 for q in oracled if not q["pass"]),
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"\n{doc['n_pass']}/{doc['n_oracled']} oracled pass, "
          f"{doc['n_fail']} fail, {len(queries)} queries -> {out_path}")
    return 1 if doc["n_fail"] else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]))
