#!/usr/bin/env python3
"""Independent recomputation oracle for s_mmr_rerank at tiers where
the DuckDB oracle is infeasible (round 14: the unrolled 5-round
greedy SQL OOMs DuckDB at the sf10 200k-vector corpus even with the
whole host free, while the Spark side runs it fine — an ORACLE-side
scaling limit, not an operator defect).

Recomputes the exact operator semantics in numpy float64 (embeddings
widened from float32 like both engines do): per query (vec_id < 10),
brute top-10 candidates by (cosine desc, nid asc), then 5 greedy MMR
rounds scoring 0.7*rel - 0.3*max_sim_to_selected with (score, -nid)
argmax — and compares (qid, ord, nid) exactly plus score to the
4-decimal HALF_UP rounding the gated row emits. Cross-engine float
caveat: numpy's pairwise-summation dot differs from the engines'
sequential fold at ~1e-15 relative; picks only flip on near-exact
score ties, which the gaussian fixture doesn't produce and replica
clones tie EXACTLY (identical bits) so the nid tie-break decides
identically.

Usage: python3 tools/mmr_scale_gate.py <sfDir> <dumpDir>
  <sfDir>  dir with embeddings.parquet (file or Spark dir)
  <dumpDir> Verify-style dump containing s_mmr_rerank/*.parquet
"""
import sys, glob, os
from decimal import Decimal, ROUND_HALF_UP

import numpy as np
import pyarrow.parquet as pq


def load_embeddings(sf_dir):
    p = os.path.join(sf_dir, "embeddings.parquet")
    files = sorted(glob.glob(p + "/*.parquet")) if os.path.isdir(p) else [p]
    ids, vecs = [], []
    for f in files:
        t = pq.read_table(f, columns=["vec_id", "embedding"])
        ids.append(np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64))
        vecs.append(np.array(t.column("embedding").to_pylist(),
                             dtype=np.float32).astype(np.float64))
    vid = np.concatenate(ids)
    v = np.vstack(vecs)
    order = np.argsort(vid, kind="stable")
    return vid[order], v[order]


def mmr_reference(vid, v, n_queries=10, topk=10, picks=5,
                  lam=0.7, div=0.3):
    nrm = np.sqrt((v * v).sum(axis=1))
    out = []  # (qid, ord, nid, score)
    for qpos in range(n_queries):
        qid = vid[qpos]
        assert qid == qpos, "fixture contract: query ids are 0..9"
        rel = (v @ v[qpos]) / (nrm * nrm[qpos])
        rel[qpos] = -np.inf  # exclude self
        # top-10 by (rel desc, nid asc): sort on (-rel, vid)
        idx = np.lexsort((vid, -rel))[:topk]
        crel = rel[idx]
        cv, cn = v[idx], nrm[idx]
        sims = (cv @ cv.T) / np.outer(cn, cn)  # candidate pairwise
        selected = []
        for r in range(1, picks + 1):
            best = None  # (score, -nid, pos)
            for pos in range(len(idx)):
                if pos in selected:
                    continue
                ms = max((sims[pos][s] for s in selected), default=0.0)
                score = lam * crel[pos] - div * ms
                key = (score, -vid[idx[pos]])
                if best is None or key > best[0]:
                    best = (key, pos, score)
            selected.append(best[1])
            out.append((qid, r, int(vid[idx[best[1]]]), best[2]))
    return out


def main(sf_dir, dump_dir):
    vid, v = load_embeddings(sf_dir)
    ref = mmr_reference(vid, v)
    files = glob.glob(os.path.join(dump_dir, "s_mmr_rerank", "*.parquet"))
    t = pq.read_table(files[0])
    got = sorted(zip(t.column("qid").to_pylist(), t.column("ord").to_pylist(),
                     t.column("nid").to_pylist(), t.column("score").to_pylist()))
    ref = sorted(ref)
    if len(got) != len(ref):
        print(f"FAIL row count {len(got)} vs {len(ref)}")
        return 1
    bad = 0
    for (gq, go, gn, gs), (rq, ro, rn, rs) in zip(got, ref):
        rs4 = float(Decimal(repr(rs)).quantize(Decimal("0.0001"),
                                               rounding=ROUND_HALF_UP))
        if (gq, go, gn) != (rq, ro, rn) or abs(gs - rs4) > 1e-9:
            print(f"FAIL row spark=({gq},{go},{gn},{gs}) "
                  f"numpy=({rq},{ro},{rn},{rs4})")
            bad += 1
    if bad:
        print(f"{bad}/{len(got)} rows diverge")
        return 1
    print(f"PASS s_mmr_rerank: {len(got)} rows equal "
          f"(corpus {len(vid)} vectors)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
