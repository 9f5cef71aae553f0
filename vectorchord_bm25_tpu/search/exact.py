"""Exact batched BM25 search (engine v1) and the scoring oracle.

For each query, gathers *all* posting blocks of all query terms, scores
every posting on the VPU, scatter-adds into a per-query dense accumulator
and takes top-k.  Exact BM25, used as:

- the brute-force/oracle path (the reference's seqscan `<&>` ordering and
  the fuzz oracle, tests/fuzz:203-280);
- the growing-segment scoring path analog (search.rs:83-135);
- the rank-parity baseline for the pruned engine v2.

Semantics pinned to the reference:
- query terms absent from the token table contribute nothing
  (search.rs:54-62);
- only documents with score > 0 are returned (Results starts with
  threshold 0.0, search.rs:81);
- ties broken by doc slot ascending (our pinned deterministic rule;
  the reference's heap leaves ties unspecified).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..index.sealed import BLOCK, SealedSegment
from ..text.intern import Query
from .device import DeviceSegment

__all__ = ["ExactEngine", "oracle_scores", "oracle_topk"]


from ..utils.buckets import bucket_pow2 as _bucket


@functools.lru_cache(maxsize=1)
def _jitted_score_and_topk():
    import jax

    return jax.jit(_score_and_topk, static_argnames=("k", "n_docs"))


def _score_and_topk(
    block_docids,  # [B+1, 128] int32
    block_impact,  # [B+1, 128] float32 precomputed scores (pad = 0)
    doc_live,  # [N+1] float32
    blk_ids,  # [Q, P] int32 (pad = B)
    filter_mask,  # [N+1] float32 (1 keep)
    k: int,
    n_docs: int,
):
    """Impact-eager scoring (BM25S-style): the per-posting score was
    precomputed at build time, so scoring is gather + segment-sum."""
    import jax
    import jax.numpy as jnp

    d = block_docids[blk_ids]  # [Q, P, 128]
    sc = block_impact[blk_ids].astype(jnp.float32) * doc_live[d]

    def accumulate(docs_q, scores_q):
        acc = jnp.zeros(n_docs + 1, dtype=jnp.float32)
        return acc.at[docs_q.reshape(-1)].add(scores_q.reshape(-1))

    acc = jax.vmap(accumulate)(d, sc)  # [Q, N+1]
    acc = acc * filter_mask[None, :]
    acc = acc[:, :n_docs]
    masked = jnp.where(acc > 0.0, acc, -jnp.inf)
    scores, ids = jax.lax.top_k(masked, k)
    return scores, ids


class ExactEngine:
    """Batched exact search over one sealed segment.

    The dense per-query accumulator is [Q, n_docs] float32; to bound HBM,
    query batches are internally split so one dispatch's accumulator stays
    under `accumulator_budget` bytes (default 1 GiB).
    """

    def __init__(
        self,
        segment: SealedSegment,
        device=None,
        accumulator_budget: int = 1 << 30,
        impact_dtype: str = "float32",
    ):
        self.segment = segment
        self.dev = DeviceSegment.from_sealed(
            segment, device=device, impact_dtype=impact_dtype
        )
        self.accumulator_budget = accumulator_budget

    def set_deleted(self, deleted: np.ndarray) -> None:
        self.dev.set_deleted(deleted)

    def _prepare(self, queries: Sequence[Query]):
        """Host-side batch assembly: padded per-query block lists."""
        seg = self.segment
        q = len(queries)
        starts = seg.token_block_start
        block_lists = []
        for query in queries:
            ids = seg.lookup_tokens(query.keys)
            ids = ids[ids >= 0].astype(np.int64)
            if ids.size:
                los = starts[ids].astype(np.int64)
                his = starts[ids + 1].astype(np.int64)
                blocks = np.concatenate(
                    [np.arange(lo, hi, dtype=np.int64) for lo, hi in zip(los, his)]
                )
            else:
                blocks = np.zeros(0, dtype=np.int64)
            block_lists.append(blocks)

        p_max = _bucket(max((x.size for x in block_lists), default=1), 8)
        blk_ids = np.full((q, p_max), seg.n_blocks, dtype=np.int32)
        for i, blocks in enumerate(block_lists):
            if blocks.size:
                blk_ids[i, : blocks.size] = blocks
        return blk_ids

    def search_async(
        self,
        queries: Sequence[Query],
        k: int,
        filter_mask: Optional[np.ndarray] = None,
    ):
        """Dispatch a batch and return finalize() -> (scores, ids, payloads).

        The jit call returns immediately (JAX async dispatch); deferring
        the host sync to finalize() lets callers pipeline many batches —
        host prep of batch i+1 overlaps device compute and result
        transfer of batch i.
        """
        import jax.numpy as jnp

        if k <= 0:
            raise ValueError("number of needed rows is set to 0")
        dev = self.dev

        # Sub-batch so the [Q, N] accumulator fits the budget.
        q_cap = max(1, self.accumulator_budget // (4 * (dev.n_docs + 1)))
        if len(queries) > q_cap:
            fins = [
                self.search_async(list(queries)[i : i + q_cap], k, filter_mask)
                for i in range(0, len(queries), q_cap)
            ]

            def finalize_parts():
                parts = [f() for f in fins]
                return (
                    np.concatenate([p[0] for p in parts]),
                    np.concatenate([p[1] for p in parts]),
                    np.concatenate([p[2] for p in parts]),
                )

            return finalize_parts

        blk_ids = self._prepare(queries)

        if filter_mask is not None:
            fm = np.ones(dev.n_docs + 1, dtype=np.float32)
            fm[: dev.n_docs] = np.asarray(filter_mask, dtype=np.float32)
            fm_dev = jnp.asarray(fm)
        else:
            fm_dev = jnp.ones(dev.n_docs + 1, dtype=jnp.float32)

        kk = min(_bucket(k, 1), max(dev.n_docs, 1))
        scores_dev, ids_dev = _jitted_score_and_topk()(
            dev.block_docids,
            dev.block_impact,
            dev.doc_live,
            jnp.asarray(blk_ids),
            fm_dev,
            k=kk,
            n_docs=dev.n_docs,
        )

        def finalize():
            scores = np.asarray(scores_dev)[:, :k]
            ids = np.asarray(ids_dev, dtype=np.int64)[:, :k]
            if scores.shape[1] < k:
                # Fewer doc slots than k: pad back to the [Q, k] contract.
                pad = k - scores.shape[1]
                scores = np.pad(
                    scores, ((0, 0), (0, pad)), constant_values=-np.inf
                )
                ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
            valid = np.isfinite(scores)
            ids = np.where(valid, ids, -1)
            payloads = np.where(
                valid,
                np.asarray(dev.host.doc_payload)[np.maximum(ids, 0)],
                -1,
            )
            return scores, ids, payloads

        return finalize

    def search(
        self,
        queries: Sequence[Query],
        k: int,
        filter_mask: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Top-k for a batch of queries.

        Returns (scores [Q,k] f32, doc_slots [Q,k] i64, payloads [Q,k] i64);
        slots past the number of matching docs have score -inf, slot/payload -1.
        filter_mask: optional [n_docs] bool — True keeps the doc (prefilter
        semantics: applied before top-k so the threshold stays honest).
        """
        return self.search_async(queries, k, filter_mask)()


def oracle_scores(
    segment: SealedSegment,
    query: Query,
    deleted: Optional[np.ndarray] = None,
    dtype=np.float32,
) -> np.ndarray:
    """Dense per-doc BM25 scores, computed on host (float oracle).

    float64 gives the reference's host precision; float32 approximates the
    device engine (which gathers build-time float32 impacts) to ~1 ulp.
    """
    tables = segment.score_tables()
    ids = segment.lookup_tokens(query.keys)
    ids = ids[ids >= 0]
    acc = np.zeros(segment.n_docs, dtype=dtype)
    s0_all = segment.token_s0()
    for tid in ids:
        lo = int(segment.token_block_start[tid])
        hi = int(segment.token_block_start[tid + 1])
        docs = segment.block_docids[lo:hi].reshape(-1)
        tfs = segment.block_tfs[lo:hi].reshape(-1)
        mask = docs < segment.n_docs
        docs, tfs = docs[mask], tfs[mask]
        fn = segment.doc_fieldnorm[docs].astype(np.int64)
        s0 = dtype(s0_all[tid])
        t = tfs.astype(dtype)
        s1 = tables.s1_table[fn].astype(dtype)
        acc[docs] += (t * s0) / (t + s1)
    if deleted is not None:
        acc = np.where(deleted[: segment.n_docs], dtype(0), acc)
    return acc


def oracle_topk(
    segment: SealedSegment,
    query: Query,
    k: int,
    deleted: Optional[np.ndarray] = None,
    filter_mask: Optional[np.ndarray] = None,
    dtype=np.float32,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host top-k oracle with the pinned tie rule (score desc, doc asc)."""
    scores = oracle_scores(segment, query, deleted, dtype)
    if filter_mask is not None:
        scores = np.where(np.asarray(filter_mask, dtype=bool), scores, 0)
    keep = scores > 0
    docs = np.flatnonzero(keep)
    order = np.lexsort((docs, -scores[docs].astype(np.float64)))
    top = docs[order[:k]]
    return scores[top], top
