"""Host-side MaxScore tier diagnostics over a cached bench corpus.

Computes, per query of a cached query set, the tier-1/tier-2 prefix
statistics the pruned path would use — window survival fraction,
excluded-term count, certification remainder S vs the query's max
bound — without touching the device.  This is the evidence base for the
tier/router constants (MS_TIERS, MS_ROUTE_FRAC): the per-query
distribution says whether fixed taus give the bound machinery traction
on a given query mix, which the aggregate ms_* bench fields cannot.

Usage: python tools/ms_tier_stats.py --cache .benchcache --docs 8388608 \
           [--queries 2048] [--query-mix heavy]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", required=True)
    ap.add_argument("--docs", type=int, required=True)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--query-mix", default="heavy")
    ap.add_argument("--vocab", type=int, default=50000)
    ap.add_argument("--avg-len", type=int, default=80)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-only analysis

    from vectorchord_bm25_tpu.index.storage import load_segment
    from vectorchord_bm25_tpu.index.stream import load_stream_index
    from vectorchord_bm25_tpu.search.stream import StreamEngine, _ms_prefix_prep
    from vectorchord_bm25_tpu.text.intern import Query
    from vectorchord_bm25_tpu.utils.batchkeys import batch_lookup
    from vectorchord_bm25_tpu.utils.options import IndexOptions

    tag = f"{args.docs}_{args.vocab}_{args.avg_len}"
    with open(os.path.join(args.cache, f"meta_{tag}.json")) as f:
        m = json.load(f)
    seg = load_segment(
        os.path.join(args.cache, f"seg_{tag}.npz"),
        IndexOptions(),
        m["n_docs"],
        m["sum_dl"],
    )
    qtag = (
        f"{tag}_{args.queries}"
        if args.query_mix == "informative"
        else f"{tag}_{args.queries}_{args.query_mix}"
    )
    q_path = os.path.join(args.cache, f"queries_{qtag}.npz")
    if os.path.exists(q_path):
        qz = np.load(q_path)
        qk, qoff = qz["keys"], qz["offsets"]
        queries = [
            Query(keys=qk[qoff[i] : qoff[i + 1]])
            for i in range(len(qoff) - 1)
        ]
    else:
        from bench import synth_queries_from_segment

        queries = synth_queries_from_segment(
            seg, args.queries, args.vocab, mix=args.query_mix
        )
    stream = load_stream_index(
        os.path.join(args.cache, f"stream_{tag}.npz")
    )
    # Host tables only — bypass device upload entirely.
    eng = StreamEngine.__new__(StreamEngine)
    eng.segment = seg
    eng.stream = stream
    eng.n_docs = seg.n_docs
    eng._ms = None
    eng.ms_exclude = 0.5  # the engine's __init__ default

    qn = len(queries)
    ids, qidx = batch_lookup(seg.lookup_tokens, queries)
    order, bounds = eng._maxscore_tables()
    tws = stream.token_w_start

    out = {"docs": args.docs, "query_mix": args.query_mix, "queries": qn}
    for ti, (tau_frac, pool_min, excl_over) in enumerate(
        StreamEngine.MS_TIERS, start=1
    ):
        excl_frac = (
            eng.ms_exclude if excl_over is None else excl_over
        )
        lo, hi, cut, s_rem, excl = _ms_prefix_prep(
            order, bounds, tws, ids, qidx, qn, tau_frac, excl_frac
        )
        tot = np.bincount(
            qidx, weights=(hi - lo).astype(np.float64), minlength=qn
        )
        ph1 = np.bincount(
            qidx, weights=cut.astype(np.float64), minlength=qn
        )
        surv = np.where(tot > 0, ph1 / np.maximum(tot, 1.0), 1.0)
        maxb = np.zeros(qn, dtype=np.float64)
        np.maximum.at(maxb, qidx, bounds[lo])
        nterm = np.bincount(qidx, minlength=qn)
        nexcl = np.bincount(qidx, weights=excl.astype(np.float64),
                            minlength=qn)
        qs = lambda a: [round(float(x), 4) for x in np.quantile(
            a, [0.1, 0.5, 0.9])]
        out[f"tier{ti}"] = {
            "tau_frac": tau_frac,
            "window_survival_mean": round(float(ph1.sum() / tot.sum()), 4),
            "window_survival_q10_50_90": qs(surv),
            "excluded_terms_frac": round(
                float(nexcl.sum() / max(nterm.sum(), 1)), 4
            ),
            "s_rem_over_maxbound_q10_50_90": qs(
                np.where(maxb > 0, s_rem / np.maximum(maxb, 1e-12), 0.0)
            ),
        }
    # Router view (tier-1 rule): which fraction routes to the pruned path.
    tau1 = StreamEngine.MS_TIERS[0][0]
    lo, hi, cut, _, _ = _ms_prefix_prep(
        order, bounds, tws, ids, qidx, qn, tau1, eng.ms_exclude
    )
    tot = np.bincount(qidx, weights=(hi - lo).astype(np.float64),
                      minlength=qn)
    ph1 = np.bincount(qidx, weights=cut.astype(np.float64), minlength=qn)
    frac = np.where(tot > 0, ph1 / np.maximum(tot, 1.0), 1.0)
    routed = (tot >= StreamEngine.MS_ROUTE_MIN_WINDOWS) & (
        frac <= StreamEngine.MS_ROUTE_FRAC
    )
    out["routed_frac"] = round(float(routed.mean()), 4)
    out["windows_per_query_q10_50_90"] = [
        int(x) for x in np.quantile(tot, [0.1, 0.5, 0.9])
    ]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
