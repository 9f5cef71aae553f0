"""Dataset evaluation harness: BEIR dataset -> index -> run -> metrics.

Ties the loader (data/beir.py), the tokenizer/intern pipeline, the query
engines, and the metrics together — the standalone analog of the
reference's published benchmark protocol (BEIR datasets scored with
trec_eval metrics, reference README.md:385-402)."""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..index.bm25index import Bm25Index
from ..text.corpus import documents_from_texts
from ..text.intern import Query, random_seed
from ..text.tokenizer import tokenize_query
from ..utils.options import IndexOptions
from .beir import BeirDataset
from .metrics import evaluate_run

__all__ = [
    "build_index",
    "build_index_streaming",
    "make_queries",
    "run_dataset",
    "oracle_rank_parity",
]


def build_index(
    ds: BeirDataset,
    engine: str = "stream",
    options: Optional[IndexOptions] = None,
    seed: Optional[bytes] = None,
    shards: Optional[int] = None,
):
    """Index a BEIR corpus; payload i maps back to ds.doc_ids[i].

    shards: build a doc-sharded ShardedIndex over that many mesh devices
    instead of the single-chip facade (quality metrics on the mesh)."""
    seed = seed if seed is not None else random_seed()
    docs = documents_from_texts(seed, ds.doc_texts)
    if shards is not None:
        from ..parallel.shard import ShardedIndex

        return ShardedIndex.build(
            docs, shards, options=options, seed=seed, engine=engine
        )
    return Bm25Index.build(docs, options=options, seed=seed, engine=engine)


def build_index_streaming(
    ds,
    engine: str = "stream",
    options: Optional[IndexOptions] = None,
    seed: Optional[bytes] = None,
    n_workers: int = 4,
    spill_dir: Optional[str] = None,
    progress=None,
) -> Bm25Index:
    """Index a StreamingBeirDataset (data/stream_synth.py) through the
    bounded-memory out-of-core build — the corpus never materializes in
    RAM (the am_build.rs worker-scan analog at MS MARCO scale)."""
    from ..parallel.hostbuild import build_out_of_core

    seed = seed if seed is not None else random_seed()
    sealed = build_out_of_core(
        ds.source,
        seed,
        options=options,
        n_workers=n_workers,
        spill_dir=spill_dir,
        progress=progress,
        n_docs=ds.n_docs,
    )
    options = options or IndexOptions()
    return Bm25Index(sealed, seed, options, engine=engine)


def make_queries(ds: BeirDataset, index) -> List[Query]:
    return [
        Query.from_tokens(index.seed, tokenize_query(t)) for t in ds.query_texts
    ]


def run_dataset(
    ds: BeirDataset,
    index: Bm25Index,
    k: int = 1000,
    batch: int = 64,
    queries: Optional[List[Query]] = None,
    rounds: int = 1,
) -> Tuple[Dict[str, List[str]], Dict[str, float], float]:
    """Execute the full query set on the sealed engine (pipelined batches,
    the TPU serving path); returns (run, metrics, qps).

    run maps query_id -> ranked doc-id strings (best first, the pinned
    (score desc, doc asc) tie rule).  QPS is the best of `rounds` timed
    passes after a compile warmup.
    """
    queries = queries if queries is not None else make_queries(ds, index)
    # Single-chip facade exposes its engine; the sharded index IS the
    # engine (same (scores, ids, payloads) batch contract).
    engine = index.engine() if hasattr(index, "engine_kind") else index
    n = len(queries)
    # Pad to a whole number of fixed-size batches (jit cache stays warm).
    padded = list(queries)
    while len(padded) % batch:
        padded.append(queries[-1])
    batches = [padded[i : i + batch] for i in range(0, len(padded), batch)]

    engine.search(batches[0], k)  # warmup/compile
    use_async = hasattr(engine, "search_async")
    best_dt = float("inf")
    outs = None
    for _ in range(max(1, rounds)):
        t0 = time.perf_counter()
        if use_async:
            fins = [engine.search_async(b, k) for b in batches]
            outs = [fin() for fin in fins]
        else:
            outs = [engine.search(b, k) for b in batches]
        best_dt = min(best_dt, time.perf_counter() - t0)

    run: Dict[str, List[str]] = {}
    qi = 0
    for _, _, payloads in outs:
        for row in payloads:
            if qi >= n:
                break
            run[ds.query_ids[qi]] = [
                ds.doc_ids[int(p)] for p in row if p >= 0
            ]
            qi += 1
    metrics = evaluate_run(run, ds.qrels)
    return run, metrics, n / best_dt if best_dt > 0 else 0.0


def oracle_rank_parity(
    ds: BeirDataset,
    index: Bm25Index,
    k: int = 10,
    queries: Optional[List[Query]] = None,
) -> int:
    """SURVEY M2 check: engine top-k ranks must equal the scalar float64
    oracle's ranks (pinned (score desc, doc asc) tie rule) on the FULL
    query set.  Returns the number of mismatching queries (0 = parity).

    Scores within float32 resolution of each other count as ties: the
    engine scores in float32 exactly like the reference (bm25.rs idf/tf
    are f32, search.rs accumulates f32), so docs whose float64 scores
    differ below ~1e-6 relative are indistinguishable to BOTH engines and
    legitimately order by doc id.  A ranking is accepted if it matches
    either the float64 order or the tie-grouped order (groups of
    indistinguishable scores re-sorted doc-ascending).
    """
    from ..search.exact import oracle_scores, oracle_topk

    queries = queries if queries is not None else make_queries(ds, index)
    mismatches = 0
    seg = index.sealed
    rtol = 1e-6  # ~8 float32 ulps; real rank bugs differ far more
    for query in queries:
        try:
            hits = index.search(query, k=k)
        except Exception as e:  # pragma: no cover - tunnel-only path
            # The audit runs after the timed rounds; a transient device
            # tunnel error here (e.g. remote_compile connection reset)
            # must not discard a completed measurement. One retry after
            # a pause, then re-raise.  Gate on the transient transport
            # markers actually observed — a generic "INTERNAL" substring
            # also matched deterministic XLA compile errors, wasting the
            # 15 s sleep before re-raising (ADVICE r4).
            msg = str(e)
            transient = any(
                t in msg
                for t in (
                    "UNAVAILABLE",
                    "DEADLINE_EXCEEDED",
                    "connection reset",
                    "Connection reset",
                    "socket closed",
                    "stream terminated",
                    "remote_compile",
                )
            )
            if not transient:
                raise
            import time as _time

            _time.sleep(15.0)
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
        # Group adjacent scores within f32 resolution; doc-asc inside.
        groups = np.zeros(docs.size, dtype=np.int64)
        if docs.size > 1:
            new_group = (s[:-1] - s[1:]) > rtol * np.abs(s[:-1])
            groups[1:] = np.cumsum(new_group)
        canon_order = np.lexsort((docs, groups))
        expect_tied = [int(seg.doc_payload[i]) for i in docs[canon_order[:k]]]
        if got != expect_tied:
            mismatches += 1
    return mismatches
