#!/usr/bin/env python3
"""Merge a quiet-pass streaming bench into a batch bench JSON.

The big-sf sidecar protocol (PLANS.md, round 8): Bench runs the batch
section with SPARK_GRAFT_STREAMING=skip (streaming_rec_s comes out {}),
then the streaming section runs alone in a quiet process
(SPARK_GRAFT_STREAMING=only -> bench_streaming.json), so multi-hour batch
contention cannot depress the scale-invariant streaming rows. This stitches
the two back into one self-describing sidecar.

Usage: python3 tools/merge_bench.py <bench_full.json> <bench_streaming.json> <out.json>
"""
import json
import sys


def main(batch_path, streaming_path, out_path):
    batch = json.load(open(batch_path))
    streaming = json.load(open(streaming_path))
    batch["streaming_rec_s"] = streaming["streaming_rec_s"]
    batch["streaming_protocol"] = "max2, dedicated quiet process"
    with open(out_path, "w") as f:
        json.dump(batch, f)
        f.write("\n")
    print(f"merged -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
