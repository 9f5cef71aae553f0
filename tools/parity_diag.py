"""Diagnose dataset-mode oracle-parity mismatches.

Replicates data/harness.py:oracle_rank_parity exactly (same f64 oracle,
same tie-grouped acceptance) and, for each counted mismatch, prints the
engine / f64-oracle / tie-grouped rankings plus the float64 relative
score gap at every divergence, to distinguish:

- engine bug: diverging docs have CLEARLY different f64 scores
  (rel gap >> 1e-6) — a real rank error;
- f32 boundary swap: diverging docs differ by ~f32 resolution — the
  engine's f32 comparison legitimately flipped (the engine scores in
  f32 exactly like the reference, bm25.rs), but the flipped order
  happens to match neither the f64 order nor the doc-asc tie order.

Usage: python tools/parity_diag.py --cache .benchcache \
           --dataset synthetic:msmarco-1m [--audit 256] [--k 10] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", required=True)
    ap.add_argument("--dataset", default="synthetic:msmarco-1m")
    ap.add_argument("--audit", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from vectorchord_bm25_tpu.data.harness import make_queries
    from vectorchord_bm25_tpu.data.stream_synth import generate_streaming
    from vectorchord_bm25_tpu.index.storage import open_index
    from vectorchord_bm25_tpu.search.exact import oracle_scores, oracle_topk

    shape = args.dataset.split(":", 1)[1]
    ds = generate_streaming(shape)
    index = open_index(os.path.join(args.cache, f"dsidx_{shape}"))
    queries = make_queries(ds, index)[: args.audit]
    seg = index.sealed
    k, rtol = args.k, 1e-6

    mismatches = 0
    for qi, query in enumerate(queries):
        hits = index.search(query, k=k)
        got = [h.payload for h in hits]
        _, o_ids = oracle_topk(seg, query, k, dtype=np.float64)
        expect = [int(seg.doc_payload[i]) for i in o_ids]
        if got == expect:
            continue
        scores64 = oracle_scores(seg, query, dtype=np.float64)
        docs = np.flatnonzero(scores64 > 0)
        order = np.lexsort((docs, -scores64[docs]))
        docs = docs[order]
        s = scores64[docs]
        groups = np.zeros(docs.size, dtype=np.int64)
        if docs.size > 1:
            new_group = (s[:-1] - s[1:]) > rtol * np.abs(s[:-1])
            groups[1:] = np.cumsum(new_group)
        canon_order = np.lexsort((docs, groups))
        expect_tied = [int(seg.doc_payload[i]) for i in docs[canon_order[:k]]]
        if got == expect_tied:
            continue
        mismatches += 1
        pay2doc = {int(seg.doc_payload[i]): int(i) for i in docs[:200]}
        print(f"query {qi} ({query.keys.shape[0]} terms):")
        print(f"  engine : {got}")
        print(f"  f64    : {expect}")
        print(f"  tie-grp: {expect_tied}")
        ref = expect_tied if len(expect_tied) == len(got) else expect
        for r, (a, b) in enumerate(zip(got, ref)):
            if a == b:
                continue
            da, db = pay2doc.get(a), pay2doc.get(b)
            if da is None or db is None:
                print(f"  rank {r}: payload {a} vs {b} (doc not in top-200)")
                continue
            sa, sb = scores64[da], scores64[db]
            rel = abs(sa - sb) / max(abs(sa), abs(sb), 1e-12)
            print(
                f"  rank {r}: engine {a} s64={sa:.9f} vs expected {b} "
                f"s64={sb:.9f} rel_gap={rel:.3e}"
                + ("  <- f32 boundary" if rel <= 4e-6 else "  <- REAL GAP")
            )
    print(f"mismatches (same rule as the bench audit): "
          f"{mismatches}/{len(queries)}")


if __name__ == "__main__":
    main()
