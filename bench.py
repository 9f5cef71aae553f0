"""Benchmark: batched BM25 query throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference (VectorChord-BM25 running inside PostgreSQL)
publishes 28.38 QPS on trec-covid (reference README.md:389-394,
BASELINE.md).  We benchmark batched top-10 retrieval over a synthetic
corpus with trec-covid-like scale (128k docs, Zipf term distribution,
realistic df mix) and report queries/second; vs_baseline = QPS / 28.38.

Run: python bench.py  [--docs N] [--queries N] [--batch N]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _platform() -> str:
    """The live backend platform, recorded in every JSON line so a
    tunnel-outage CPU fallback is distinguishable from a real device
    measurement."""
    import jax

    return jax.devices()[0].platform


def synth_corpus(
    n_docs: int, vocab: int, avg_len: int, seed: int = 0, n_topics: int = 64
):
    """Synthetic corpus with realistic structure: Zipf term frequencies,
    log-normal doc lengths, and topical clustering (each doc draws most
    terms from its topic's vocabulary slice; docs are ordered by topic,
    like crawl/URL-ordered real corpora).  Topic clustering is what gives
    block-max pruning traction on real collections."""
    from vectorchord_bm25_tpu.text.intern import Document

    rng = np.random.default_rng(seed)
    shared = vocab // 5  # ids [0, shared) are corpus-wide common terms
    topic_sz = (vocab - shared) // n_topics
    lengths = np.maximum(
        4, (avg_len * rng.lognormal(0.0, 0.6, size=n_docs)).astype(np.int64)
    )
    topic_of = np.sort(rng.integers(0, n_topics, size=n_docs))  # topic-ordered
    docs = []
    for i in range(n_docs):
        n_terms = int(lengths[i])
        n_topical = int(n_terms * 0.6)
        common = rng.zipf(1.3, size=n_terms - n_topical) % shared
        topical = (
            shared
            + topic_of[i] * topic_sz
            + (rng.zipf(1.3, size=n_topical) % topic_sz)
        )
        ids = np.concatenate([common, topical])
        docs.append(Document.from_int_ids(ids.tolist()))
    return docs


def synth_corpus_postings(
    n_docs: int, vocab: int, avg_len: int, seed: int = 0, n_topics: int = 64
):
    """Vectorized corpus generator for large scales: returns flat
    (keys |S16, doc_ids, tfs) postings plus per-doc CSR offsets, with the
    same topical structure as synth_corpus but no per-doc Python loops."""
    rng = np.random.default_rng(seed)
    shared = vocab // 5
    topic_sz = (vocab - shared) // n_topics
    lengths = np.maximum(
        4, (avg_len * rng.lognormal(0.0, 0.6, size=n_docs)).astype(np.int64)
    )
    total = int(lengths.sum())
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    topic_of = np.sort(rng.integers(0, n_topics, size=n_docs))
    z = rng.zipf(1.3, size=total)
    is_shared = rng.random(total) < 0.4
    ids = np.where(
        is_shared,
        z % shared,
        shared + topic_of[doc_of] * topic_sz + (z % topic_sz),
    )
    # Dedup (doc, id) -> tf counts.
    order = np.lexsort((ids, doc_of))
    d_s, i_s = doc_of[order], ids[order]
    boundary = np.empty(total, dtype=bool)
    boundary[0] = True
    boundary[1:] = (d_s[1:] != d_s[:-1]) | (i_s[1:] != i_s[:-1])
    starts = np.flatnonzero(boundary)
    tfs = np.diff(np.append(starts, total)).astype(np.int64)
    u_docs = d_s[starts]
    u_ids = i_s[starts]
    # Encode int ids as 16-byte keys (big-endian in the first 4 bytes).
    keys_u8 = np.zeros((u_ids.size, 16), dtype=np.uint8)
    be = u_ids.astype(">u4").view(np.uint8).reshape(-1, 4)
    keys_u8[:, :4] = be
    keys = keys_u8.reshape(-1).view("S16")
    doc_start = np.zeros(n_docs + 1, dtype=np.int64)
    np.add.at(doc_start, u_docs + 1, 1)
    np.cumsum(doc_start, out=doc_start)
    return keys, u_docs, tfs, doc_start


def synth_queries_fast(
    keys, doc_start, segment, n_queries: int, terms: int = 4, seed: int = 1
):
    """Query sampling for the fast corpus: idf-weighted terms from random
    documents (same distribution as synth_queries)."""
    from vectorchord_bm25_tpu.text.intern import Query

    rng = np.random.default_rng(seed)
    n = segment.n_docs
    out = []
    for _ in range(n_queries):
        di = int(rng.integers(0, n))
        lo, hi = int(doc_start[di]), int(doc_start[di + 1])
        if hi - lo == 0:
            out.append(Query(keys=np.zeros(0, dtype="S16")))
            continue
        dkeys = keys[lo:hi]
        tids = segment.lookup_tokens(dkeys)
        dfs = np.where(tids >= 0, segment.token_df[np.maximum(tids, 0)], 1)
        w = np.log((n + 1.0) / (dfs + 0.5))
        w = np.maximum(w, 1e-6) ** 2
        w /= w.sum()
        m = min(terms, hi - lo)
        picks = rng.choice(hi - lo, size=m, replace=False, p=w)
        out.append(Query(keys=np.sort(dkeys[np.sort(picks)])))
    return out


def synth_queries_from_segment(
    segment, n_queries: int, vocab: int, terms: int = 4, seed: int = 1,
    n_topics: int = 64, mix: str = "informative",
):
    """Query sampling from the sealed segment alone — no corpus postings
    required, so a cached multi-million-doc segment can grow its query
    set without regenerating the corpus (hours on one host core).

    Matches synth_queries_fast's structure: an anchor topical term drawn
    df-weighted (appearing in a random doc), companions drawn
    df*idf^2-weighted from the SAME topic slice (the synthetic corpora
    place each topic's vocabulary in a contiguous id range, so query
    terms co-occur in documents like real keyword queries), plus one
    common distractor term half the time.

    mix='informative' (default): distractors drawn df*idf^2-weighted
    like synth_queries_fast — every term carries signal, the flat-
    impact worst case for skip-based pruning.  mix='heavy': EVERY
    query gets 1-2 distractors drawn df-weighted from the Zipf head —
    the huge-posting-list common-word case where the reference's WAND
    machinery (search.rs:151-280) earns its keep."""
    from vectorchord_bm25_tpu.text.intern import Query

    rng = np.random.default_rng(seed)
    keys = segment.token_keys
    u8 = keys.view(np.uint8).reshape(-1, 16)[:, :4].astype(np.uint32)
    ids = (u8[:, 0] << 24) | (u8[:, 1] << 16) | (u8[:, 2] << 8) | u8[:, 3]
    df = segment.token_df.astype(np.float64)
    n = segment.n_docs
    idf2 = np.log((n + 1.0) / (df + 0.5)) ** 2
    shared = vocab // 5
    topic_sz = (vocab - shared) // n_topics
    t_idx = np.flatnonzero(ids >= shared)
    c_idx = np.flatnonzero(ids < shared)
    topic_of = (ids[t_idx] - shared) // topic_sz
    t_start = np.searchsorted(topic_of, np.arange(n_topics + 1))
    p_anchor = df[t_idx] / df[t_idx].sum()
    w_top = np.maximum(df[t_idx] * idf2[t_idx], 1e-12)
    w_com = np.maximum(df[c_idx] * idf2[c_idx], 1e-12)
    heavy = mix == "heavy"
    anchors = rng.choice(t_idx.size, size=n_queries, p=p_anchor)
    commons = (
        c_idx[rng.choice(c_idx.size, size=n_queries, p=w_com / w_com.sum())]
        if c_idx.size
        else np.zeros(n_queries, dtype=np.int64)
    )
    p_head = df[c_idx] / df[c_idx].sum() if c_idx.size else None
    out = []
    for qi in range(n_queries):
        a = int(anchors[qi])
        t = int(topic_of[a])
        lo, hi = int(t_start[t]), int(t_start[t + 1])
        picks = [int(t_idx[a])]
        if heavy and c_idx.size:
            m_common = min(1 + int(rng.random() < 0.5), max(terms - 1, 1))
        elif c_idx.size and terms > 2 and rng.random() < 0.5:
            m_common = 1
        else:
            m_common = 0
        m_top = min(terms - 1 - m_common, hi - lo - 1)
        if m_top > 0:
            w = w_top[lo:hi].copy()
            w[a - lo] = 0.0
            s = w.sum()
            if s > 0:
                sel = rng.choice(hi - lo, size=m_top, replace=False, p=w / s)
                picks.extend(int(t_idx[lo + j]) for j in sel)
        if m_common:
            if heavy:
                sel = rng.choice(
                    c_idx.size, size=m_common, replace=False, p=p_head
                )
                picks.extend(int(c_idx[j]) for j in sel)
            else:
                picks.append(int(commons[qi]))
        out.append(Query(keys=np.sort(keys[np.asarray(picks)])))
    return out


def synth_queries(docs, segment, n_queries: int, terms: int = 4, seed: int = 1):
    """Realistic keyword queries: terms sampled from random documents,
    weighted by idf — users type informative words, so real query-term df
    distributions are idf-tilted relative to corpus frequency."""
    from vectorchord_bm25_tpu.text.intern import Query

    rng = np.random.default_rng(seed)
    n = segment.n_docs
    df_of = dict(zip(segment.token_keys.tolist(), segment.token_df.tolist()))
    out = []
    for _ in range(n_queries):
        doc = docs[int(rng.integers(0, len(docs)))]
        keys = doc.keys
        dfs = np.asarray([df_of.get(k, 1) for k in keys.tolist()], dtype=np.float64)
        w = np.log((n + 1.0) / (dfs + 0.5))
        w = np.maximum(w, 1e-6) ** 2  # sharpen toward informative terms
        w /= w.sum()
        m = min(terms, len(keys))
        picks = rng.choice(len(keys), size=m, replace=False, p=w)
        out.append(Query(keys=np.sort(keys[np.sort(picks)])))
    return out


def run_dataset_bench(args) -> None:
    """--dataset mode: QPS + NDCG@10 + recall@k on a BEIR-layout dataset
    (a real downloaded one, or 'synthetic:scifact' for the frozen offline
    generator — see vectorchord_bm25_tpu/data/synthetic.py for the recipe).
    """
    import sys

    from vectorchord_bm25_tpu.data.beir import load_beir
    from vectorchord_bm25_tpu.data.harness import (
        build_index,
        make_queries,
        oracle_rank_parity,
        run_dataset,
    )
    from vectorchord_bm25_tpu.data.synthetic import generate_beir_like

    shape = (
        args.dataset.split(":", 1)[1]
        if args.dataset.startswith("synthetic:")
        else None
    )
    if shape is not None and shape.startswith("msmarco"):
        # North-star scale: streamed corpus + out-of-core build
        # (data/stream_synth.py); the corpus never materializes in RAM.
        import os

        from vectorchord_bm25_tpu.data.harness import build_index_streaming
        from vectorchord_bm25_tpu.data.stream_synth import generate_streaming

        ds = generate_streaming(shape)
        index = None
        if args.cache:
            from vectorchord_bm25_tpu.index.storage import (
                open_index,
                save_index,
            )

            idx_dir = os.path.join(args.cache, f"dsidx_{shape}")
            if os.path.exists(os.path.join(idx_dir, "CURRENT")):
                index = open_index(idx_dir)
                print(f"loaded cached index from {idx_dir}",
                      file=sys.stderr)
        if index is None:
            index = build_index_streaming(ds, engine=args.engine)
            if args.cache:
                os.makedirs(idx_dir, exist_ok=True)
                save_index(index, idx_dir)
    else:
        if shape is not None:
            ds = generate_beir_like(shape)
        else:
            ds = load_beir(args.dataset)
        index = build_index(ds, engine=args.engine)
    queries = make_queries(ds, index)
    _, metrics, qps = run_dataset(
        ds, index, k=1000, batch=args.batch, queries=queries,
        rounds=args.rounds,
    )
    # Quality metrics need the k=1000 run above; the serving operating
    # point the baseline names is top-10 — time that too when asked.
    qps_at_k = None
    if args.k != 1000:
        _, _, qps_at_k = run_dataset(
            ds, index, k=args.k, batch=args.batch, queries=queries,
            rounds=args.rounds,
        )
    # Rank parity vs the float64 oracle; at multi-million-doc scale the
    # per-query scalar oracle is the cost, so cap the audited subset.
    if args.recall_sample is not None:
        psample = min(len(queries), args.recall_sample)
    elif ds.n_docs > 500_000:
        # The audit is serial: one device search + one f64 scalar oracle
        # scan per query — the oracle scan is the cost at scale, not the
        # engine (~0.5 s/query at 1M docs).
        psample = min(len(queries), 256)
    else:
        psample = len(queries)
    audit_error = None
    try:
        mismatches = oracle_rank_parity(
            ds, index, k=args.k, queries=queries[:psample]
        )
    except Exception as e:
        # The timed rounds above already succeeded; a device-tunnel
        # failure during the serial audit must not discard them — emit
        # the JSON line with the audit marked failed instead.  The
        # parity field stays numeric-or-null so consumers never see a
        # type change (ADVICE r4).
        mismatches = None
        audit_error = str(e)
    print(
        f"{ds.name}: {ds.n_docs} docs, {ds.n_queries} queries | "
        f"oracle rank-parity mismatches@{args.k}: {mismatches} "
        f"({psample} queries audited)"
        + (f" | audit_error: {audit_error}" if audit_error else ""),
        file=sys.stderr,
    )
    baseline = 28.38  # reference trec-covid QPS (README.md:389-394)
    line = {
        "metric": f"{ds.name}_qps_top1000_full_queryset",
        "value": round(qps, 2),
        "unit": "queries/s",
        "vs_baseline": round(qps / baseline, 2),
        "platform": _platform(),
        **metrics,
        "oracle_parity_mismatches": mismatches,
        "oracle_parity_audited": psample,
    }
    if qps_at_k is not None:
        line[f"qps_top{args.k}"] = round(qps_at_k, 2)
    if audit_error is not None:
        line["audit_error"] = audit_error
    print(json.dumps(line))


def run_growing_bench(args, seg, engine, batches) -> None:
    """--growing N: batched QPS through the facade's sealed+growing
    merge (one [Q, G] vectorized growing pass per batch, lexsort merge;
    search.rs:83-135 semantics), vs the sealed-only facade path."""
    import sys

    from vectorchord_bm25_tpu.index.bm25index import Bm25Index
    from vectorchord_bm25_tpu.text.intern import Document, random_seed
    from vectorchord_bm25_tpu.utils.options import IndexOptions

    index = Bm25Index(seg, random_seed(), IndexOptions(), engine=args.engine)
    index._engine = engine  # reuse the already-uploaded engine

    def qps_of():
        best = 0.0
        index.search_batch(batches[0], args.k)  # warmup/compile
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            n = 0
            fins = []
            for batch in batches:
                # Pipelined facade path: sealed + growing dispatches of
                # batch i overlap host prep / merge of batch i-1.
                fins.append(index.search_batch_async(batch, args.k))
                n += len(batch)
            for fin in fins:
                fin()
            best = max(best, n / (time.perf_counter() - t0))
        return best

    sealed_qps = qps_of()

    rng = np.random.default_rng(9)

    def rand_doc(j):
        n_terms = int(rng.integers(4, 2 * args.avg_len))
        ids = (rng.zipf(1.3, size=n_terms) % args.vocab).tolist()
        return Document.from_int_ids(ids), args.docs + j

    for j in range(args.growing):
        doc, pl = rand_doc(j)
        index.insert(doc, payload=pl)
    growing_qps = qps_of()

    interleaved_qps = None
    if args.growing_interleave:
        # Insert bursts BETWEEN served batches: the growing segment's
        # lazy device-engine rebuild lands on the serving path every
        # batch (index/growing.py device_engine; VERDICT r3 #8).
        m = args.growing_interleave
        best = 0.0
        for r in range(args.rounds):
            t0 = time.perf_counter()
            n = 0
            for bi, batch in enumerate(batches):
                for j in range(m):
                    doc, pl = rand_doc(
                        args.growing + (r * len(batches) + bi) * m + j
                    )
                    index.insert(doc, payload=pl)
                index.search_batch(batch, args.k)
                n += len(batch)
            best = max(best, n / (time.perf_counter() - t0))
        interleaved_qps = best

    print(
        f"sealed-only {sealed_qps:.1f} QPS -> +{args.growing} growing "
        f"{growing_qps:.1f} QPS ({growing_qps / sealed_qps:.2f}x)"
        + (
            f" -> interleaved(+{args.growing_interleave}/batch) "
            f"{interleaved_qps:.1f} QPS"
            if interleaved_qps is not None
            else ""
        ),
        file=sys.stderr,
    )
    line = {
        "metric": f"synthetic_{args.docs}_docs_growing_"
        f"{args.growing}_batched_qps_top{args.k}",
        "value": round(growing_qps, 2),
        "unit": "queries/s",
        "vs_baseline": round(growing_qps / 28.38, 2),
        "platform": _platform(),
        "sealed_only_qps": round(sealed_qps, 2),
        "growing_over_sealed": round(growing_qps / sealed_qps, 3),
    }
    if interleaved_qps is not None:
        line["interleaved_qps"] = round(interleaved_qps, 2)
        line["interleaved_over_growing"] = round(
            interleaved_qps / growing_qps, 3
        )
    print(json.dumps(line))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=131072)
    parser.add_argument("--vocab", type=int, default=50000)
    parser.add_argument("--avg-len", type=int, default=80)
    parser.add_argument("--queries", type=int, default=4096)
    parser.add_argument("--batch", type=int, default=4096)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--rounds", type=int, default=5)
    parser.add_argument(
        "--recall-sample",
        type=int,
        default=None,
        help="queries audited against the float64 oracle (default: all; "
        "capped at 256 beyond 2M docs — the scalar oracle scan is the "
        "cost there, not the engine)",
    )
    parser.add_argument(
        "--engine",
        choices=["exact", "blockmax", "hybrid", "stream"],
        # The default (driver-recorded) configuration is the
        # equal-index-memory one: StreamEngine serves from bit-packed
        # windows at < 1.0x the reference's bytes/posting (BASELINE.md's
        # constraint) and matches the 8 B/posting hybrid's throughput.
        default="stream",
    )
    parser.add_argument("--chunk", type=int, default=None)
    parser.add_argument(
        "--strategy",
        choices=["auto", "dense", "sparse", "maxscore"],
        default="auto",
        help="stream-engine reduction strategy (maxscore = impact-"
        "ordered window-prefix pruning with exact candidate rescore)",
    )
    parser.add_argument(
        "--posting-mode",
        choices=["impact", "tf"],
        default="impact",
        help="tf = 2 B/posting lossless equal-index-memory form "
        "(blockmax/hybrid engines)",
    )
    parser.add_argument(
        "--dataset",
        default=None,
        help="BEIR dataset dir, or synthetic:scifact / synthetic:scifact-mini"
        " / synthetic:msmarco (streamed 8.8M-doc out-of-core build)",
    )
    parser.add_argument(
        "--growing",
        type=int,
        default=0,
        help="insert N growing (unsealed) docs and serve batches through "
        "the facade's sealed+growing merge path (VERDICT r2 #3 evidence)",
    )
    parser.add_argument(
        "--growing-interleave",
        type=int,
        default=0,
        help="with --growing: also time batches with N inserts landing "
        "between every served batch (the lazy device-engine rebuild on "
        "the serving path)",
    )
    parser.add_argument(
        "--query-mix",
        choices=["informative", "heavy"],
        default="informative",
        help="query-term df mix: informative = every term carries signal "
        "(flat impacts, the worst case for skip-based pruning); heavy = "
        "every query carries 1-2 Zipf-head common terms (the huge-"
        "posting-list case the reference's WAND skipping targets, "
        "search.rs:151-280)",
    )
    parser.add_argument(
        "--cache",
        default=None,
        help="directory to save/load the built segment (the multi-"
        "million-doc synthetic corpora take an hour+ to generate on one "
        "host core; the reference-codec segment file loads in seconds)",
    )
    args = parser.parse_args()

    from vectorchord_bm25_tpu.utils.backend import ensure_live_backend
    from vectorchord_bm25_tpu.utils.compile_cache import enable_compile_cache

    # Tunnel-outage guard: never hang in backend init — fall back to the
    # CPU backend if a subprocess probe shows device init wedged.
    ensure_live_backend()
    enable_compile_cache()

    if args.dataset:
        run_dataset_bench(args)
        return

    from vectorchord_bm25_tpu.index.sealed import (
        build_sealed_segment_from_postings,
    )
    from vectorchord_bm25_tpu.search.blockmax import BlockMaxEngine
    from vectorchord_bm25_tpu.search.exact import ExactEngine
    from vectorchord_bm25_tpu.search.hybrid import HybridEngine
    from vectorchord_bm25_tpu.search.stream import StreamEngine

    seg = queries = None
    if args.cache:
        import os

        from vectorchord_bm25_tpu.index.storage import (
            load_segment,
            save_segment,
        )
        from vectorchord_bm25_tpu.text.intern import Query
        from vectorchord_bm25_tpu.utils.options import IndexOptions

        tag = f"{args.docs}_{args.vocab}_{args.avg_len}"
        seg_path = os.path.join(args.cache, f"seg_{tag}.npz")
        qtag = (
            f"{tag}_{args.queries}"
            if args.query_mix == "informative"
            else f"{tag}_{args.queries}_{args.query_mix}"
        )
        q_path = os.path.join(args.cache, f"queries_{qtag}.npz")
        meta_path = os.path.join(args.cache, f"meta_{tag}.json")
        if all(os.path.exists(p) for p in (seg_path, meta_path)):
            with open(meta_path) as f:
                m = json.load(f)
            seg = load_segment(
                seg_path, IndexOptions(), m["n_docs"], m["sum_dl"]
            )
            if os.path.exists(q_path):
                qz = np.load(q_path)
                qk, qoff = qz["keys"], qz["offsets"]
                queries = [
                    Query(keys=qk[qoff[i] : qoff[i + 1]])
                    for i in range(len(qoff) - 1)
                ]
            else:
                # Segment cached with a different query count: sample a
                # fresh query set from the segment alone (the corpus
                # postings are gone; regenerating them takes hours at
                # multi-million-doc scale on one host core).
                queries = synth_queries_from_segment(
                    seg, args.queries, args.vocab, mix=args.query_mix
                )
                qk = np.concatenate([q.keys for q in queries]).astype(
                    "S16"
                )
                qoff = np.zeros(len(queries) + 1, dtype=np.int64)
                np.cumsum(
                    [q.keys.size for q in queries], out=qoff[1:]
                )
                np.savez(q_path, keys=qk, offsets=qoff)
            print(f"loaded cached segment from {args.cache}",
                  file=__import__("sys").stderr)
    if seg is None:
        keys, doc_ids, tfs, doc_start = synth_corpus_postings(
            args.docs, args.vocab, args.avg_len
        )
        seg = build_sealed_segment_from_postings(
            keys, doc_ids, tfs, args.docs, doc_grouped=True
        )
        if args.query_mix == "informative":
            queries = synth_queries_fast(keys, doc_start, seg, args.queries)
        else:
            queries = synth_queries_from_segment(
                seg, args.queries, args.vocab, mix=args.query_mix
            )
        if args.cache:
            os.makedirs(args.cache, exist_ok=True)
            save_segment(seg, seg_path)
            qk = np.concatenate([q.keys for q in queries]).astype("S16")
            qoff = np.zeros(len(queries) + 1, dtype=np.int64)
            np.cumsum([q.keys.size for q in queries], out=qoff[1:])
            np.savez(q_path, keys=qk, offsets=qoff)
            with open(meta_path, "w") as f:
                json.dump(
                    {"n_docs": seg.n_docs, "sum_dl": int(seg.sum_dl)}, f
                )
    if args.engine == "blockmax":
        engine = BlockMaxEngine(
            seg, chunk=args.chunk, posting_mode=args.posting_mode
        )
    elif args.engine == "hybrid":
        if args.posting_mode == "tf":
            # The default heavy_mode='auto' routes everything away from
            # the lazy BlockMaxEngine, so the tf stream would never be
            # uploaded and the parity numbers would reflect the dense
            # arrays — the flag would silently be inert.
            import sys

            print(
                "--posting-mode tf is inert for engine=hybrid (the "
                "pruned engine is lazy); use --engine blockmax or "
                "--engine stream for equal-memory serving",
                file=sys.stderr,
            )
            raise SystemExit(2)
        engine = HybridEngine(
            seg, chunk=args.chunk, posting_mode=args.posting_mode
        )
    elif args.engine == "stream":
        stream = None
        if args.cache:
            import os

            from vectorchord_bm25_tpu.index.stream import (
                build_stream_index,
                load_stream_index,
                save_stream_index,
            )

            tag = f"{args.docs}_{args.vocab}_{args.avg_len}"
            sp = os.path.join(args.cache, f"stream_{tag}.npz")
            if os.path.exists(sp):
                stream = load_stream_index(sp)
                print(f"loaded cached stream index from {sp}",
                      file=__import__("sys").stderr)
            else:
                stream = build_stream_index(seg)
                save_stream_index(stream, sp)
        engine = StreamEngine(seg, stream=stream, strategy=args.strategy)
    else:
        engine = ExactEngine(seg)

    batches = [
        queries[i : i + args.batch] for i in range(0, len(queries), args.batch)
    ]
    batches = [b for b in batches if len(b) == args.batch]

    if args.growing:
        run_growing_bench(args, seg, engine, batches)
        return

    # Warmup (compile): one full untimed pass so EVERY cost-bucket shape
    # compiles before the timed rounds — warming only batches[0] left
    # round 1 paying per-bucket compilation, making qps_min an 8x
    # outlier at 8.4M docs (VERDICT r4 weak #2).  qps_min/qps_max now
    # measure run variance, not compilation.
    if hasattr(engine, "search_async"):
        for fin in [engine.search_async(b, args.k) for b in batches]:
            fin()
    else:
        for b in batches:
            engine.search(b, args.k)

    use_async = hasattr(engine, "search_async")
    qps_rounds = []
    ms_agg = None
    for rnd in range(args.rounds):
        t0 = time.perf_counter()
        total = 0
        if use_async:
            # Pipeline: dispatch every batch, then sync — host prep of
            # batch i+1 overlaps device compute/transfer of batch i.
            fins = []
            for batch in batches:
                fins.append(engine.search_async(batch, args.k))
                total += len(batch)
                # MaxScore pruning-work profile (set synchronously by
                # the dispatch when the pruned path served the batch);
                # accumulate over the first timed pass only.
                st = getattr(engine, "last_ms_stats", None)
                if rnd == 0 and st is not None:
                    if ms_agg is None:
                        ms_agg = {
                            "queries": 0,
                            "batch_queries": 0,
                            "routed_queries": 0,
                            "fallback_queries": 0,
                            "windows_total": 0,
                            "windows_phase1": 0,
                            "excluded_terms": 0,
                            "terms": 0,
                        }
                    ms_agg["queries"] += st["queries"]
                    ms_agg["batch_queries"] += st.get(
                        "batch_queries", st["queries"]
                    )
                    ms_agg["routed_queries"] += st.get(
                        "routed_queries", st["queries"]
                    )
                    ms_agg["fallback_queries"] += st["fallback_queries"]
                    for t in st["tiers"]:
                        for f in (
                            "windows_phase1",
                            "excluded_terms",
                            "terms",
                        ):
                            ms_agg[f] += t.get(f, 0)
                    if st["tiers"]:
                        # Tier 1 sees every active query's full spans.
                        ms_agg["windows_total"] += st["tiers"][0][
                            "windows_total"
                        ]
            for fin in fins:
                fin()
        else:
            for batch in batches:
                engine.search(batch, args.k)
                total += len(batch)
        dt = time.perf_counter() - t0
        qps_rounds.append(total / dt)
    qps_rounds.sort()
    best_qps = float(np.median(qps_rounds))

    # Recall@k vs the exhaustive float64 oracle (BASELINE.json's recall
    # metric) on the FULL query set — engines are exact by construction,
    # so this should print 1.0; reported to stderr to keep stdout one line.
    import sys as _sys

    from vectorchord_bm25_tpu.search.exact import oracle_topk

    from vectorchord_bm25_tpu.search.exact import oracle_scores

    # At multi-million-doc scale the per-query float64 oracle scan is
    # the cost: audit a capped prefix of the query set there.
    rs = args.recall_sample
    if rs is None:
        rs = 256 if args.docs > 2_000_000 else len(queries)
    audit = []
    taken = 0
    for b in batches:
        if taken >= rs:
            break
        # Trim to the cap: appending whole batches audited up to a full
        # batch (4096 queries at the default) regardless of the cap —
        # hours of serial f64 oracle scans at multi-million-doc scale.
        take = min(len(b), rs - taken)
        audit.append(b[:take])
        taken += take
    hits = 0
    total = 0
    tie_swaps = 0
    for batch in audit:
        _, ids_s, _ = engine.search(batch, args.k)
        for qi, query in enumerate(batch):
            o_scores, o_ids = oracle_topk(
                seg, query, args.k, dtype=np.float64
            )
            got = set(int(x) for x in ids_s[qi] if x >= 0)
            matched = got & set(int(x) for x in o_ids)
            missing = [int(x) for x in o_ids if int(x) not in got]
            if missing:
                # A k-boundary doc whose float64 score TIES the kth score
                # within float32 resolution may legitimately swap with an
                # equal-scored doc outside the oracle's top-k (the engine
                # scores in f32; accumulation order differs on TPU) —
                # count these separately from real misses.
                sc = oracle_scores(seg, query, dtype=np.float64)
                kth = float(o_scores[-1]) if o_scores.size else 0.0
                # ~2 f32 ulps of the kth score: only docs genuinely
                # indistinguishable from the boundary at the engine's
                # f32 precision are excused (ADVICE r2).
                tol = 2.0 * float(np.spacing(np.float32(abs(kth))))
                for d in missing:
                    if abs(sc[d] - kth) <= tol:
                        tie_swaps += 1
                        matched.add(d)
            hits += len(matched)
            total += len(o_ids)
    recall = hits / total if total else 1.0
    print(
        f"recall@{args.k} vs exhaustive oracle ({total} hits over "
        f"{sum(len(b) for b in audit)} audited queries): {recall:.4f} "
        f"({tie_swaps} f32-resolution boundary-tie swaps excused)",
        file=_sys.stderr,
    )

    # Equal-index-memory accounting: this engine's device-resident bytes
    # vs the reference's bit/byte-packed block format on the same postings
    # (BASELINE.md's equal-index-memory constraint).
    from vectorchord_bm25_tpu.utils.memparity import memory_parity_report

    parity = memory_parity_report(engine, seg)
    print(f"memory parity: {parity}", file=_sys.stderr)

    baseline = 28.38  # reference trec-covid QPS (README.md:389-394)
    line = {
        "metric": f"synthetic_{args.docs}_docs_batched_qps_top{args.k}",
        # Median of `rounds` timed passes (rounds 1-3 recorded
        # best-of-3; the min/max spread quantifies tunnel variance so
        # round-over-round deltas are interpretable — VERDICT r3 weak #1).
        "value": round(best_qps, 2),
        "unit": "queries/s",
        "vs_baseline": round(best_qps / baseline, 2),
        "platform": _platform(),
        "rounds": args.rounds,
        "batch": args.batch,
        "qps_min": round(qps_rounds[0], 2),
        "qps_max": round(qps_rounds[-1], 2),
        "recall_vs_oracle": round(recall, 4),
        "engine": args.engine,
        "strategy": args.strategy,
        "query_mix": args.query_mix,
        "device_bytes_per_posting": parity["device_bytes_per_posting"],
        "reference_bytes_per_posting": parity[
            "reference_bytes_per_posting"
        ],
        "memory_ratio_vs_reference": parity["ratio_vs_reference"],
    }
    if ms_agg is not None:
        if ms_agg["windows_total"]:
            line["ms_windows_phase1_frac"] = round(
                ms_agg["windows_phase1"] / ms_agg["windows_total"], 4
            )
        line["ms_fallback_queries"] = ms_agg["fallback_queries"]
        line["ms_certified_frac"] = round(
            1.0 - ms_agg["fallback_queries"] / max(1, ms_agg["queries"]),
            4,
        )
        line["ms_routed_frac"] = round(
            ms_agg["routed_queries"] / max(1, ms_agg["batch_queries"]), 4
        )
        line["ms_excluded_terms"] = ms_agg["excluded_terms"]
        line["ms_terms"] = ms_agg["terms"]
    print(json.dumps(line))


if __name__ == "__main__":
    main()
