#!/usr/bin/env python3
"""Independent contract check for mm04_media_embed_knn.

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
    rows = con.execute(
        f"SELECT media_id, kind, neighbor_id, sim FROM "
        f"'{out_dir}/mm04_media_embed_knn/*.parquet'").fetchall()
    seen = {}
    for mid, kind, nid, sim in rows:
        if mid in seen:
            return fail(f"media {mid} appears twice")
        seen[mid] = sim
        if nid == mid:
            return fail(f"media {mid} is its own neighbor")
        if kinds[mid] != kind or kinds[nid] != kind:
            return fail(f"pair ({mid},{nid}) crosses kinds")
        if nrm[mid] == 0 or nrm[nid] == 0:
            return fail(f"pair ({mid},{nid}) includes a zero-norm vector")
        cos = float(embs[mid] @ embs[nid]) / (nrm[mid] * nrm[nid])
        if abs(sim - cos) > 5e-7 + 1e-12:
            return fail(f"({mid},{nid}): sim {sim} vs true cosine {cos}")
    # exact-duplicate recall: same-kind identical embeddings must hit 1.0
    groups = {}
    for d, e in embs.items():
        if nrm[d] > 0:
            groups.setdefault((kinds[d],) + tuple(e), []).append(d)
    n_dup = 0
    for members in groups.values():
        if len(members) < 2:
            continue
        for d in members:
            n_dup += 1
            if seen.get(d) != 1.0:
                return fail(
                    f"media {d} has an identical same-kind twin but "
                    f"reports sim {seen.get(d)}")
    print(f"mm04 OK: {len(rows)} rows sound vs the replicated stub "
          f"encoder; all {n_dup} exact-duplicate media report sim 1.0")
    return 0


def fail(msg):
    print(f"mm04 MISMATCH: {msg}")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
