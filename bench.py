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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=131072)
    parser.add_argument("--vocab", type=int, default=50000)
    parser.add_argument("--avg-len", type=int, default=80)
    parser.add_argument("--queries", type=int, default=256)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument(
        "--engine", choices=["exact", "blockmax", "hybrid"], default="blockmax"
    )
    parser.add_argument("--chunk", type=int, default=32)
    args = parser.parse_args()

    from vectorchord_bm25_tpu.index.sealed import build_sealed_segment
    from vectorchord_bm25_tpu.search.blockmax import BlockMaxEngine
    from vectorchord_bm25_tpu.search.exact import ExactEngine
    from vectorchord_bm25_tpu.search.hybrid import HybridEngine

    docs = synth_corpus(args.docs, args.vocab, args.avg_len)
    seg = build_sealed_segment(docs)
    if args.engine == "blockmax":
        engine = BlockMaxEngine(seg, chunk=args.chunk)
    elif args.engine == "hybrid":
        engine = HybridEngine(seg, chunk=args.chunk)
    else:
        engine = ExactEngine(seg)
    queries = synth_queries(docs, seg, args.queries)

    batches = [
        queries[i : i + args.batch] for i in range(0, len(queries), args.batch)
    ]
    batches = [b for b in batches if len(b) == args.batch]

    # Warmup (compile).
    engine.search(batches[0], args.k)

    best_qps = 0.0
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        total = 0
        for batch in batches:
            engine.search(batch, args.k)
            total += len(batch)
        dt = time.perf_counter() - t0
        best_qps = max(best_qps, total / dt)

    baseline = 28.38  # reference trec-covid QPS (README.md:389-394)
    print(
        json.dumps(
            {
                "metric": "synthetic_128k_docs_batched_qps_top10",
                "value": round(best_qps, 2),
                "unit": "queries/s",
                "vs_baseline": round(best_qps / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
