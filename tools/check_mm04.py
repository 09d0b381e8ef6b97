#!/usr/bin/env python3
"""Independent contract check for mm04_media_embed_knn (second tier).

Since r13 the gated mm04 output is the AUDIT relation: one row per
media with the codec-path embedding's 8 slot sums pinned as `emb_sig`,
the identical-twin flag, and the contract booleans (sound_ok / le1_row
/ dup_recall_ok) the engine evaluated over its raw top-1 relation. The
DuckDB oracle re-derives emb_sig/has_twin from the closed forms in SQL;
THIS script re-derives them independently in numpy (a third arithmetic
path) and additionally requires every contract boolean to be TRUE —
so a regression must fool three engines at once to pass.

NOTE (r14): sound_ok is engine-evaluated with the same graftx
dot_product/l2_norm kernels mediaKnn itself uses, so this script alone
cannot catch a kernel regression. The engine-INDEPENDENT rescore of
the raw top-1 relation (per-row sim vs true cosine, plain-Scala
arithmetic over the closed-form embeddings) lives in
src/test/scala/graft/Round14Spec.scala and runs in every sbt test.

mm04's candidate generation is blocking-specific (mean-centered sign-LSH
buckets + a sorted-neighborhood ring), so an exact SQL oracle does not
exist; its documented CONTRACT, though, is independently checkable
outside Spark by replicating the deterministic encoder per kind (image:
closed-form pixel fold; audio: closed-form PCM sample fold; video:
closed-form per-frame pixel fold over the decoded AVI/MPNG frames — all
integer-valued float32 slots, exact up to 2^24, so the replica is
bit-faithful):

  1. soundness — every output row names a distinct same-kind neighbor
     and its `sim` is a valid 6-decimal rounding of the true cosine of
     the two stub embeddings (|sim - cos| <= 5e-7 + 1e-12);
  2. exact-duplicate recall — every media whose embedding is IDENTICAL
     to another same-kind media's (the stub's duplicate clusters, the
     adversarial case the ring window was built for) must appear with
     sim = 1.0: identical vectors co-bucket at any plane count, the
     ring probes at least one successor in an m >= 2 bucket, and an
     identical neighbor scores exactly 1.0.

Usage: python3 tools/check_mm04.py <sfDir> <verifyOutDir>
"""
import sys

import duckdb
import numpy as np


def embed_video(doc_id: int) -> np.ndarray:
    """Replica of the video-kind embedding: the engine parses a REAL
    AVI/MPNG container and PNG-decodes every frame (MediaCodec closed-form
    frames -> RIFF+ImageIO round trip), folding the concatenated frame
    rasters into 8 chunked sums; this recomputes the same sums from the
    closed-form vpixel formula (kept in sync with MediaCodec.vpixel and
    the mm02 SQL oracle). Payloads synthesize from the GROUP SEED
    (MediaCodec.vseed — runs of 5 video ids share one payload, the
    planted duplicate clusters the recall tier below exists for). Slot
    sums stay under 2^19 — integer-exact in the engine's float32
    slots."""
    doc_id = doc_id - 3 * ((doc_id // 3) % 5)  # vseed
    w, h = 8 + doc_id % 9, 8 + doc_id % 7
    nf = 4 + doc_id % 8
    f, y, x, c = np.meshgrid(np.arange(nf), np.arange(h), np.arange(w),
                             np.arange(3), indexing="ij")
    px = (doc_id * 31 + f * 17 + x * 7 + y * 13 + c * 101 + x * y) % 256
    flat = px.reshape(-1).astype(np.int64)
    emb = np.zeros(8, dtype=np.int64)
    for r in range(8):
        emb[r] = int(flat[r::8].sum(dtype=np.int64))
    return emb.astype(np.float64)


def embed_audio(doc_id: int) -> np.ndarray:
    """Replica of the audio-kind embedding: the engine decodes a REAL WAV
    (MediaCodec closed-form PCM -> javax.sound round trip) and folds the
    signed 16-bit samples into 8 chunked sums; this recomputes the same
    sums from the closed form (kept in sync with MediaCodec.sample and
    the mm02 SQL oracle). Slot sums stay under 2^21 — integer-exact in
    the engine's float32 slots."""
    n = 256 + doc_id % 257
    i = np.arange(n, dtype=np.int64)
    s = (doc_id * 37 + i * 11 + i * i) % 65536 - 32768
    emb = np.zeros(8, dtype=np.int64)
    for r in range(8):
        emb[r] = int(s[r::8].sum(dtype=np.int64))
    return emb.astype(np.float64)


def embed_image(doc_id: int) -> np.ndarray:
    """Replica of the image-kind embedding: the engine decodes a REAL PNG
    (MediaCodec synth -> ImageIO round trip) and folds the (y, x, c)
    pixel raster into 8 chunked sums; this recomputes the same sums from
    the closed-form pixel formula (kept in sync with MediaCodec.pixel
    and the mm02/mm05 SQL oracles)."""
    w, h = 8 + doc_id % 9, 8 + doc_id % 7
    y, x, c = np.meshgrid(np.arange(h), np.arange(w), np.arange(3),
                          indexing="ij")
    px = (doc_id * 31 + x * 7 + y * 13 + c * 101 + x * y) % 256
    flat = px.reshape(-1).astype(np.int64)
    emb = np.zeros(8, dtype=np.int64)
    for r in range(8):
        emb[r] = int(flat[r::8].sum(dtype=np.int64))
    return emb.astype(np.float64)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    kinds = {d: ("image", "audio", "video")[d % 3] for (d,) in docs}
    embs = {d: embed_image(d) if d % 3 == 0
            else embed_audio(d) if d % 3 == 1
            else embed_video(d) for (d,) in docs}
    nrm = {d: float(np.sqrt((e * e).sum())) for d, e in embs.items()}
    groups = {}
    for d, e in embs.items():
        if nrm[d] > 0:
            groups.setdefault((kinds[d],) + tuple(e), []).append(d)
    twin = {d for members in groups.values() if len(members) > 1
            for d in members}
    rows = con.execute(
        "SELECT media_id, kind, emb_sig, has_twin, dup_recall_ok, "
        "le1_row, sound_ok FROM "
        f"'{out_dir}/mm04_media_embed_knn/*.parquet'").fetchall()
    if len(rows) != len(docs):
        return fail(f"audit covers {len(rows)} media, corpus has {len(docs)}")
    n_twin = 0
    for mid, kind, sig, has_twin, dup_ok, le1, sound in rows:
        if kinds.get(mid) != kind:
            return fail(f"media {mid}: kind {kind} != {kinds.get(mid)}")
        want = ":".join(str(int(v)) for v in embs[mid])
        if sig != want:
            return fail(f"media {mid}: engine emb_sig {sig} != numpy {want}")
        if bool(has_twin) != (mid in twin):
            return fail(f"media {mid}: has_twin {has_twin}, numpy says "
                        f"{mid in twin}")
        if not (dup_ok and le1 and sound):
            return fail(f"media {mid}: contract booleans "
                        f"dup={dup_ok} le1={le1} sound={sound}")
        n_twin += bool(has_twin)
    print(f"mm04 OK: {len(rows)} media audited; every codec-path "
          f"embedding matches the numpy closed form bit-for-bit; "
          f"{n_twin} twin media all report contract booleans TRUE")
    return 0


def fail(msg):
    print(f"mm04 MISMATCH: {msg}")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
