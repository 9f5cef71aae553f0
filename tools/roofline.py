"""Roofline: achieved HBM bytes/s of the served stream configs.

Measures device-only time of the jitted stream kernels (inputs pre-staged
on device, repeated block_until_ready) and reports bytes touched per
second against the chip's HBM peak, so optimization targets hardware
limits rather than the reference's CPU baseline (VERDICT r2 #9).

Two operating points:
- dense path (the <2M-doc serving default): window gather + flat
  scatter-add into the [Q, N] accumulator + hierarchical top-k;
- sparse path (the multi-million-doc default): bucketed window matrix
  gather + segmented sum + per-query top-k (no accumulator).

Usage:  python tools/roofline.py [--docs N ...] [--queries N]
        [--cache DIR]   (reuses bench.py --cache segments for big N)

Writes one line per config to stdout; paste into DESIGN.md's roofline
subsection.  v5e peak HBM BW is ~819 GB/s (public spec).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import synth_corpus_postings, synth_queries_fast  # noqa: E402


def _load_or_build(n_docs, vocab, avg_len, n_queries, cache):
    from vectorchord_bm25_tpu.index.sealed import (
        build_sealed_segment_from_postings,
    )
    from vectorchord_bm25_tpu.index.storage import load_segment, save_segment
    from vectorchord_bm25_tpu.text.intern import Query
    from vectorchord_bm25_tpu.utils.options import IndexOptions

    seg = queries = None
    if cache:
        tag = f"{n_docs}_{vocab}_{avg_len}"
        seg_path = os.path.join(cache, f"seg_{tag}.npz")
        meta_path = os.path.join(cache, f"meta_{tag}.json")
        q_path = os.path.join(cache, f"queries_{tag}_{n_queries}.npz")
        # A cached segment is ALWAYS reused, even when the exact query
        # cache file is absent (bench.py caches queries under
        # mix/count-specific names) — regenerating queries from the
        # segment is seconds, regenerating a multi-million-doc corpus is
        # an hour of host time.
        if all(os.path.exists(p) for p in (seg_path, meta_path)):
            with open(meta_path) as f:
                m = json.load(f)
            seg = load_segment(seg_path, IndexOptions(), m["n_docs"], m["sum_dl"])
            if os.path.exists(q_path):
                qz = np.load(q_path)
                qk, qoff = qz["keys"], qz["offsets"]
                queries = [
                    Query(keys=qk[qoff[i] : qoff[i + 1]])
                    for i in range(len(qoff) - 1)
                ]
    if seg is None:
        keys, doc_ids, tfs, doc_start = synth_corpus_postings(
            n_docs, vocab, avg_len
        )
        seg = build_sealed_segment_from_postings(
            keys, doc_ids, tfs, n_docs, doc_grouped=True
        )
        queries = synth_queries_fast(keys, doc_start, seg, n_queries)
    if queries is None:
        from bench import synth_queries_from_segment

        queries = synth_queries_from_segment(seg, n_queries, vocab)
    stream = None
    if cache:
        from vectorchord_bm25_tpu.index.stream import (
            build_stream_index,
            load_stream_index,
            save_stream_index,
        )

        sp = os.path.join(cache, f"stream_{tag}.npz")
        if os.path.exists(sp):
            stream = load_stream_index(sp)
        else:
            stream = build_stream_index(seg)
            save_stream_index(stream, sp)
    return seg, queries[:n_queries], stream


def _fetch(r):
    """Host-fetch every output leaf — the only TRUE sync over the axon
    device tunnel: jax.block_until_ready returns before execution there
    (measured: 20 identical 256 MB reductions 'complete' in 0.7 ms
    total), so timing loops synced by it report multiples of the HBM
    speed-of-light.  np.asarray forces the result bytes to the host."""
    import jax

    return [np.asarray(x) for x in jax.tree_util.tree_leaves(r)]


def _timeit(run, n_iter=20):
    """Per-dispatch device time with the tunnel fetch RTT cancelled:
    time 1 dispatch+fetch, then n_iter pipelined dispatches + 1 fetch;
    the difference divided by n_iter-1 is the marginal dispatch cost.
    `run(i)` takes the iteration index so callers can vary an input per
    iteration (defeats any identical-dispatch caching in the tunnel)."""
    _fetch(run(0))  # compile + warm
    t0 = time.perf_counter()
    _fetch(run(0))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = None
    for i in range(n_iter):
        r = run(i % 8)
    _fetch(r)
    tn = time.perf_counter() - t0
    return max((tn - t1) / max(n_iter - 1, 1), 1e-9)


def roofline_dense(seg, queries, k=16, stream=None):
    """Device-only time of one flat-dense dispatch over the whole batch
    (un-sub-batched: accumulator budget may split real dispatches; the
    roofline wants the raw kernel)."""
    import jax
    import jax.numpy as jnp

    from vectorchord_bm25_tpu.search.stream import (
        StreamEngine,
        _active_widths,
        _jitted_stream_dense,
    )
    from vectorchord_bm25_tpu.utils.buckets import bucket_pow2 as _bucket

    eng = StreamEngine(seg, stream=stream)
    n_docs = seg.n_docs
    # The flat int32 scatter requires n_qb*(n_docs+1) < 2^31 where n_qb
    # is the BUCKETED query count the jit pads up to (the engine
    # sub-batches by accumulator budget; the roofline must cap directly).
    qn = max(8, min(len(queries), 1 << 20))
    while _bucket(qn, 8) * (n_docs + 1) > 2**31 - 1 and qn > 8:
        qn = max(8, _bucket(qn, 8) // 2)
    queries = queries[:qn]
    qn = len(queries)
    (wsrc_all, starts, sizes), _ = eng._win_lists(queries)
    t = int(wsrc_all.size)
    tb = _bucket(max(t, 1), 128)
    wsrc = np.full(tb, eng._pad_win, np.int32)
    wsrc[:t] = wsrc_all
    wq = np.zeros(tb, np.int32)
    wq[:t] = np.repeat(np.arange(qn, dtype=np.int32), sizes)
    dw, tw = _active_widths(eng.stream.w_meta[wsrc_all])
    n_qb = _bucket(qn, 8)
    # Per-iteration distinct s1_eff tables (the fused per-doc score
    # table, search/stream.py): the tunnel may collapse byte-identical
    # repeated dispatches, so each timed iteration must be a distinct
    # computation (same shapes -> one compilation).
    fms = [eng.dev_s1bd * (1.0 + 1e-6 * i) for i in range(8)]
    ws_d, wq_d = jnp.asarray(wsrc), jnp.asarray(wq)

    def run(i):
        return _jitted_stream_dense()(
            eng.dev_words, fms[i],
            eng.dev_w_off, eng.dev_w_base, eng.dev_w_meta, eng.dev_w_s0,
            ws_d, wq_d, k=k, n_docs=n_docs, n_q=n_qb,
            dwidths=dw, twidths=tw,
        )

    dt = _timeit(run)
    # Bytes touched (HBM side): packed word gather (doc words always; tf
    # words when any tf width is nonzero), fused f32 s1_eff gather per
    # lane, accumulator memset + scatter read-modify-write, window meta.
    gather_b = tb * 128 * 4 * (2 if tw else 1)
    fn_gather = tb * 128 * 4
    acc_b = n_qb * (n_docs + 1) * 4 * 3
    meta_b = tb * 14
    total = gather_b + fn_gather + acc_b + meta_b
    dev = jax.devices()[0].platform
    print(
        f"dense @ {seg.n_docs} [{dev}]: {dt * 1e3:.2f} ms/dispatch "
        f"({qn} q, {t} windows) ~{total / 1e6:.0f} MB touched -> "
        f"{total / dt / 1e9:.0f} GB/s ({qn / dt:.0f} QPS device-only)"
    )
    return dt


def roofline_sparse(seg, queries, k=16, stream=None):
    """Device-only time of the sparse (sort-reduce) dispatch — the
    multi-million-doc serving default (no [Q, N] accumulator)."""
    import jax
    import jax.numpy as jnp

    from vectorchord_bm25_tpu.search.stream import (
        StreamEngine,
        _active_widths,
        _jitted_stream_sparse,
    )
    from vectorchord_bm25_tpu.utils.buckets import bucket_pow2 as _bucket

    eng = StreamEngine(seg, stream=stream, strategy="sparse")
    n_docs, qn = seg.n_docs, len(queries)
    lists, n_terms = eng._win_lists(queries)
    sub = np.arange(qn, dtype=np.int64)
    ids, src = eng._assemble(lists, sub)
    # One un-bucketed dispatch pads every query to the batch-max window
    # count; cap total lanes so big corpora don't OOM HBM (the served
    # path avoids this via cost buckets + sub-batching).
    LANE_BUDGET = 140_000_000
    q_keep = max(8, min(qn, LANE_BUDGET // max(ids.shape[1] * 128, 1)))
    if q_keep < qn:
        ids, qn = ids[:q_keep], q_keep
    dw, tw = _active_widths(eng.stream.w_meta[src])
    mt = int(max(1, n_terms.max(initial=1)))
    # Per-iteration distinct s1_eff tables (the fused per-doc score
    # table, search/stream.py): the tunnel may collapse byte-identical
    # repeated dispatches, so each timed iteration must be a distinct
    # computation (same shapes -> one compilation).
    fms = [eng.dev_s1bd * (1.0 + 1e-6 * i) for i in range(8)]
    ids_d = jnp.asarray(ids)
    kk = min(_bucket(k, 1), max(n_docs, 1))

    def run(i):
        return _jitted_stream_sparse()(
            eng.dev_words, fms[i],
            eng.dev_w_off, eng.dev_w_base, eng.dev_w_meta, eng.dev_w_s0,
            ids_d, k=kk, n_docs=n_docs,
            seg_steps=int(mt - 1).bit_length(), dwidths=dw, twidths=tw,
        )

    dt = _timeit(run)
    q, p_max = ids.shape
    lanes = q * p_max * 128
    # Gather + fused s1_eff gather + the [q, p*128] sort passes (the
    # segmented sum and lexsort re-read the lane matrix ~2x log passes;
    # count the 8 B (doc, score) pairs x 2 passes as a floor estimate).
    gather_b = lanes * 4 * (2 if tw else 1)
    fn_gather = lanes * 4
    sort_b = lanes * 8 * 2
    total = gather_b + fn_gather + sort_b
    dev = jax.devices()[0].platform
    print(
        f"sparse @ {seg.n_docs} [{dev}]: {dt * 1e3:.2f} ms/dispatch "
        f"({qn} q, [{q}, {p_max}] windows, {lanes / 1e6:.1f}M lanes) "
        f"~{total / 1e6:.0f} MB touched -> {total / dt / 1e9:.0f} GB/s "
        f"({qn / dt:.0f} QPS device-only)"
    )
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, nargs="*", default=[131072, 1 << 20])
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--sparse-queries", type=int, default=256)
    ap.add_argument("--vocab", type=int, default=50000)
    ap.add_argument("--avg-len", type=int, default=80)
    ap.add_argument("--cache", default=None)
    args = ap.parse_args()

    from vectorchord_bm25_tpu.utils.backend import ensure_live_backend
    from vectorchord_bm25_tpu.utils.compile_cache import enable_compile_cache

    ensure_live_backend()
    enable_compile_cache()

    for n in args.docs:
        seg, queries, stream = _load_or_build(
            n, args.vocab, args.avg_len, args.queries, args.cache
        )
        if n < 2_000_000:  # dense is the served path below 2M docs
            roofline_dense(seg, queries[: args.queries], stream=stream)
        roofline_sparse(
            seg, queries[: args.sparse_queries], stream=stream
        )


if __name__ == "__main__":
    main()
