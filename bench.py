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


def synth_corpus(n_docs: int, vocab: int, avg_len: int, seed: int = 0):
    """Zipf-distributed synthetic corpus built directly as term vectors."""
    from vectorchord_bm25_tpu.text.intern import Document

    rng = np.random.default_rng(seed)
    # Zipf ranks: common terms have high df (like real text).
    lengths = np.maximum(4, rng.poisson(avg_len, size=n_docs))
    docs = []
    for i in range(n_docs):
        ids = rng.zipf(1.3, size=lengths[i]) % vocab
        keys, counts = np.unique(ids, return_counts=True)
        docs.append(Document.from_int_ids(np.repeat(keys, counts).tolist()))
    return docs


def synth_queries(n_queries: int, vocab: int, terms: int = 4, seed: int = 1):
    from vectorchord_bm25_tpu.text.intern import Query

    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_queries):
        ids = rng.zipf(1.3, size=terms) % vocab
        out.append(Query.from_int_ids(np.unique(ids).tolist()))
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
    args = parser.parse_args()

    from vectorchord_bm25_tpu.index.sealed import build_sealed_segment
    from vectorchord_bm25_tpu.search.exact import ExactEngine

    docs = synth_corpus(args.docs, args.vocab, args.avg_len)
    seg = build_sealed_segment(docs)
    engine = ExactEngine(seg)
    queries = synth_queries(args.queries, args.vocab)

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
