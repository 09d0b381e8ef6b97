#!/usr/bin/env python3
"""Restore the TIMESTAMP(NANOS) logical type on events.ts for generated
scale data (graft.ScaleData writes raw epoch-nanos int64 because Spark
cannot write nanos timestamps). Driver-format compatibility shim so the
DuckDB oracle (tools/check.py) sees the same schema as on the driver
testdata. Dev-loop tool only.

Usage: python3 tools/scale_nanos.py <sfDir>
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main(sf_dir):
    path = f"{sf_dir}/events.parquet"
    t = pq.read_table(path)
    if pa.types.is_timestamp(t.schema.field("ts").type):
        print(f"{path}: ts already timestamp, nothing to do")
        return
    ts = t.column("ts").cast(pa.timestamp("ns"))
    idx = t.schema.get_field_index("ts")
    t = t.set_column(idx, pa.field("ts", pa.timestamp("ns")), ts)
    pq.write_table(t, path)
    print(f"{path}: ts int64 -> timestamp[ns], {t.num_rows} rows")


if __name__ == "__main__":
    main(sys.argv[1])
