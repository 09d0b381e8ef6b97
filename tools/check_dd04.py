#!/usr/bin/env python3
"""Independent brute-force oracle for dd04_simhash_pairs.

dd04 is hash-function-specific (SimHash over Spark's xxhash64 token
hashes), so it carries no DuckDB oracle; its Manku block-permutation
blocking is the part an SQL oracle could not check anyway. This checker
recomputes everything OUTSIDE Spark — pure-Python XXH64 (public
xxHash spec, seed 42 = Spark's xxhash64 seed), the same tokenizer
regex, the same +/-1 bit votes — and brute-forces the EXACT
popcount(sig_a ^ sig_b) <= 3 pair set over all N^2/2 pairs, which the
banded engine output must equal (the pigeonhole recall-1 claim made
checkable). Dev-loop tool only, like check_dd05.py.

Usage: python3 tools/check_dd04.py <sfDir> <verifyOutDir>
"""
import re
import sys

import duckdb
import numpy as np

M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Canonical XXH64 (little-endian), matching Spark's xxhash64()."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i <= n - 32:
            for vi, off in ((0, 0), (1, 8), (2, 16), (3, 24)):
                lane = int.from_bytes(data[i + off:i + off + 8], "little")
                v = (v1, v2, v3, v4)[vi]
                v = rotl((v + lane * P2) & M, 31) * P1 & M
                if vi == 0:
                    v1 = v
                elif vi == 1:
                    v2 = v
                elif vi == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h ^= rotl((v * P2) & M, 31) * P1 & M
            h = (h * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i <= n - 8:
        lane = int.from_bytes(data[i:i + 8], "little")
        h ^= rotl((lane * P2) & M, 31) * P1 & M
        h = (rotl(h, 27) * P1 + P4) & M
        i += 8
    if i <= n - 4:
        lane = int.from_bytes(data[i:i + 4], "little")
        h ^= (lane * P1) & M
        h = (rotl(h, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (rotl(h, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def selftest():
    # Published xxHash test vectors (xxHash spec, seed 0).
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64(b"Nobody inspects the spammish repetition", 0) == \
        0xFBCEA83C8A378BF1


def simhash(text: str) -> int:
    votes = [0] * 64
    for t in re.findall(r"[a-z0-9]+", text.lower()):
        h = xxh64(t.encode("utf-8"))
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    sig = 0
    for b in range(64):
        if votes[b] > 0:
            sig |= 1 << b
    return sig


POP16 = np.array([bin(x).count("1") for x in range(1 << 16)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    r = POP16[x & 0xFFFF].astype(np.int32)
    for s in (16, 32, 48):
        r += POP16[(x >> s) & 0xFFFF]
    return r


def main(sf_dir, out_dir):
    selftest()
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    # docs with zero tokens never reach the signature aggregate in the
    # engine (explode of an empty token array drops the row)
    sigs = [(i, simhash(t)) for i, t in rows
            if re.search(r"[a-z0-9]", t.lower())]
    ids = np.array([i for i, _ in sigs], dtype=np.int64)
    sg = np.array([s for _, s in sigs], dtype=np.uint64)
    want = set()
    block = 4096
    for i0 in range(0, len(sg), block):
        a = sg[i0:i0 + block, None] ^ sg[None, :]
        ii, jj = np.nonzero(popcount64(a) <= 3)
        for bi, j in zip(ii, jj):
            i = i0 + bi
            if ids[i] < ids[j]:
                want.add((int(ids[i]), int(ids[j]),
                          bin(int(sg[i] ^ sg[j])).count("1")))
    got = con.execute(
        f"SELECT d1, d2, hamming FROM '{out_dir}/dd04_simhash_pairs/"
        "*.parquet'").fetchall()
    got = set((int(a), int(b), int(h)) for a, b, h in got)
    if got == want:
        print(f"PASS dd04_simhash_pairs ({len(got)} rows, "
              "independent xxh64+simhash brute force)")
        return 0
    print(f"FAIL dd04_simhash_pairs: spark {len(got)} vs brute "
          f"{len(want)}; only-spark {sorted(got - want)[:3]}; "
          f"only-brute {sorted(want - got)[:3]}")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
