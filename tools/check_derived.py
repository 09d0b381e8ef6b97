"""Independent derived checks for spec-gated (no-DuckDB-oracle) queries.

r12 NOTE: every check this module used to carry (ev05/q26/tx11/tx17
rel-err + rank-window + CMS + Bloom one-sidedness, dd07/dd13 subset +
recall, sim02/03/05 recall floors, probe parity, sim09's GW-model
recall floor) moved INTO the engine queries themselves: each of those
`SparkEntry.queries` entries now emits the derived bound as its output
and carries a DuckDB oracle that pins the structural columns and
expects the bound booleans TRUE — so the standard oracle compare
grades them in CORRECTNESS_r{N} directly (VERDICT r11 #4). The floors
are the same values that lived here; the raw relations remain public
(graft.operators.Similarity.annLsh etc.) and their invariants are
additionally spec-gated in ScalaTest.

CHECKS is therefore empty; the module remains for sidecar import
compatibility and as the place future non-oracle checks would live.
"""
import math  # noqa: F401  (kept for future checks)
import os
import sys

import duckdb


CHECKS = {}


def main(sf_dir, out_dir, names=()):
    import check
    con = duckdb.connect()
    check.create_views(con, sf_dir)
    rc = 0
    for name, fn in sorted(CHECKS.items()):
        if names and name not in names:
            continue
        ok, msg = fn(con, sf_dir, out_dir)
        print(f"{'PASS' if ok else 'FAIL'} {name}: {msg}")
        rc |= 0 if ok else 1
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
