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


from ..utils.batchkeys import batch_lookup, group_positions
from ..utils.buckets import bucket_pow2 as _bucket

# JAX dispatch is async: nothing bounds how many executions sit in the
# device queue, and a pile-up of gather-heavy dispatches (hundreds of MB
# of transient HBM each) reliably crashed the TPU worker at
# [4096-query batches, 1M+ docs].  Dispatches whose estimated gather
# volume exceeds _LARGE_DISPATCH_BYTES are throttled to at most two in
# flight: the dispatcher blocks on the oldest before issuing another.
# Concurrent readers share the RW read lock, so the deque is guarded by
# a mutex; block_until_ready runs outside it (blocking while holding it
# would serialize independent dispatchers on device latency).
import threading
from collections import deque

_LARGE_DISPATCH_BYTES = 256 << 20
_large_inflight: "deque" = deque()
_large_inflight_mu = threading.Lock()


def _throttle_large(out, est_bytes: int):
    if est_bytes < _LARGE_DISPATCH_BYTES:
        return
    import jax

    while True:
        with _large_inflight_mu:
            if len(_large_inflight) < 2:
                _large_inflight.append(out)
                return
            oldest = _large_inflight.popleft()
        jax.block_until_ready(oldest)


@functools.lru_cache(maxsize=1)
def _jitted_score_and_topk():
    import jax

    return jax.jit(_score_and_topk, static_argnames=("k", "n_docs"))


@functools.lru_cache(maxsize=1)
def _jitted_score_and_topk_sparse():
    import jax

    return jax.jit(
        _score_and_topk_sparse, static_argnames=("k", "n_docs", "seg_steps")
    )


@functools.lru_cache(maxsize=1)
def _jitted_score_and_topk_compact():
    import jax

    return jax.jit(
        _score_and_topk_compact,
        static_argnames=("k", "n_docs", "range_size"),
    )


def _score_and_topk_compact(
    post_impact,  # [P] float32/bf16 precomputed scores (pad = 0)
    post_local,  # [P] uint8 range-relative doc ids
    tr_range,  # [M+1] int32 (pad slot M: INT_MAX)
    tr_start,  # [M+2] int32 (slots M, M+1 hold the total: pad len 0)
    doc_live,  # [N+1] float32
    filter_mask,  # [N+1] float32
    grp_ids,  # [Q, G] int32 per-query (term, range) group ids (pad = M)
    k: int,
    n_docs: int,
    range_size: int,
):
    """Exact scoring over the compact 5 B/posting flat arrays.

    Same contract as `_score_and_topk` but reading the range index's
    impact/local posting streams instead of the padded [B, 128] blocks —
    the equal-index-memory form (the reference reads bit-packed blocks,
    search.rs:498-518; we read byte-packed locals + impacts).  Groups are
    variable-length (<= range_size), gathered as fixed windows with a
    length mask, so dense terms cost ~1 lane per posting just like the
    block path.
    """
    import jax
    import jax.numpy as jnp

    q, g = grp_ids.shape
    rs = range_size

    start = tr_start[grp_ids]  # [Q, G]
    length = tr_start[grp_ids + 1] - start  # contiguous groups
    rngs = jnp.minimum(tr_range[grp_ids], jnp.int32((n_docs // rs) + 1))

    rs_iota = jax.lax.broadcasted_iota(jnp.int32, (q, g, rs), 2)
    gidx = start[..., None] + rs_iota  # [Q, G, RS]
    valid = rs_iota < length[..., None]
    sc = jnp.where(valid, post_impact[gidx].astype(jnp.float32), 0.0)
    doc = jnp.where(
        valid, rngs[..., None] * rs + post_local[gidx].astype(jnp.int32), n_docs
    )

    def accumulate(docs_q, scores_q):
        acc = jnp.zeros(n_docs + 1, dtype=jnp.float32)
        return acc.at[docs_q.reshape(-1)].add(scores_q.reshape(-1))

    acc = jax.vmap(accumulate)(doc, sc)  # [Q, N+1]
    # live/filter factors are per-doc, so they distribute over the sum.
    acc = acc * doc_live[None, :] * filter_mask[None, :]
    from ..ops.topk import dense_topk

    scores, ids = dense_topk(acc, k, n_docs)
    return scores, ids


def _score_and_topk(
    post_docid,  # [R+1, 128] int32 flat postings (pad row R, pad doc N)
    post_impact,  # [R+1, 128] f32/bf16 precomputed scores (pad = 0)
    doc_live,  # [N+1] float32
    win_row,  # [Q, P] int32 posting-row ids (pad = R)
    win_lo,  # [Q, P] int32 first live lane in the row window
    win_hi,  # [Q, P] int32 one-past-last live lane
    filter_mask,  # [N+1] float32 (1 keep)
    k: int,
    n_docs: int,
):
    """Impact-eager scoring (BM25S-style) over the zero-padding flat
    posting stream: each query term's contiguous span is gathered as
    masked 128-lane row windows (≤ 2 partial rows per term), so the
    gather moves ~1 lane per posting and the index stores no padding."""
    import jax
    import jax.numpy as jnp

    d = post_docid[win_row]  # [Q, P, 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 2)
    valid = (lane >= win_lo[..., None]) & (lane < win_hi[..., None])
    sc = jnp.where(
        valid, post_impact[win_row].astype(jnp.float32), 0.0
    ) * doc_live[d]

    def accumulate(docs_q, scores_q):
        acc = jnp.zeros(n_docs + 1, dtype=jnp.float32)
        return acc.at[docs_q.reshape(-1)].add(scores_q.reshape(-1))

    acc = jax.vmap(accumulate)(d, sc)  # [Q, N+1]
    acc = acc * filter_mask[None, :]
    from ..ops.topk import dense_topk

    scores, ids = dense_topk(acc, k, n_docs)
    return scores, ids


def _score_and_topk_sparse(
    post_docid,  # [R+1, 128] int32 flat postings (pad row R, pad doc N)
    post_impact,  # [R+1, 128] f32/bf16 precomputed scores (pad = 0)
    doc_live,  # [N+1] float32
    win_row,  # [Q, P] int32 posting-row ids (pad = R)
    win_lo,  # [Q, P] int32 first live lane in the row window
    win_hi,  # [Q, P] int32 one-past-last live lane
    filter_mask,  # [N+1] float32 (1 keep)
    k: int,
    n_docs: int,
    seg_steps: int,  # ceil(log2(max query terms)) — segment length bound
):
    """Sort-based exact scoring: cost ~ O(P log P), independent of n_docs.

    The dense accumulator path pays a scatter-add plus a corpus-wide
    top_k per query — both scale with n_docs (measured ~40 ms + ~36 ms
    for [32, 4M] on a v5e).  Here the gathered (doc, score) postings are
    instead sorted by doc id, duplicate docs (one posting per matching
    query term) are combined with a segmented Hillis-Steele shift-add
    (segments are at most 2^seg_steps long — a doc appears at most once
    per term), and top-k runs over the P-wide candidate lanes.  The
    analog of the reference's merge-join over per-term cursors
    (search.rs:151-280) — realized as one data-parallel sort instead of
    pointer chasing.

    Tie semantics: after the doc-ascending sort, candidate lanes are in
    global doc order, so lax.top_k's lowest-index tie break reproduces
    the pinned (score desc, doc asc) rule exactly.
    """
    import jax
    import jax.numpy as jnp

    d = post_docid[win_row]  # [Q, P, 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 2)
    valid = (lane >= win_lo[..., None]) & (lane < win_hi[..., None])
    sc = (
        jnp.where(valid, post_impact[win_row].astype(jnp.float32), 0.0)
        * doc_live[d]
        * filter_mask[d]
    )
    d = jnp.where(valid, d, n_docs)  # pads sort last

    q = d.shape[0]
    df = d.reshape(q, -1)
    sf = sc.reshape(q, -1)
    df, sf = jax.lax.sort((df, sf), dimension=1, num_keys=1)

    # Segmented inclusive scan: equal doc ids are contiguous after the
    # sort, so "same doc at distance sh" == "same segment".
    s = sf
    for i in range(seg_steps):
        sh = 1 << i
        zero_i = jnp.zeros((q, sh), dtype=df.dtype)
        zero_f = jnp.zeros((q, sh), dtype=s.dtype)
        same = jnp.concatenate([zero_i == 1, df[:, sh:] == df[:, :-sh]], axis=1)
        add = jnp.concatenate([zero_f, s[:, :-sh]], axis=1)
        s = s + jnp.where(same, add, 0.0)

    is_last = jnp.concatenate(
        [df[:, :-1] != df[:, 1:], jnp.ones((q, 1), dtype=bool)], axis=1
    )
    cand = jnp.where(is_last & (df < n_docs) & (s > 0.0), s, -jnp.inf)
    kk = min(k, cand.shape[1])
    scores, pos = jax.lax.top_k(cand, kk)
    ids = jnp.take_along_axis(df, pos, axis=1)
    if kk < k:
        pad = k - kk
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=0)
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
        compact: bool = False,
        share=None,
        strategy: str = "auto",
    ):
        """compact=True stores postings in the 5 B/posting flat form (the
        range index's impact/local streams) instead of the padded
        [B, 128] blocks — equal-index-memory mode.

        share: a BlockMaxEngine over the same segment; its device arrays
        (postings, range metadata, doc-live mask) are reused so a hybrid
        engine holds ONE copy of the index in HBM.  Implies compact.

        strategy: "dense" = scatter-add accumulator + hierarchical
        top-k (cost ~ n_docs per query); "sparse" = doc-sort +
        segmented-sum over gathered postings only (cost ~ postings,
        independent of n_docs); "auto" picks sparse on corpora past
        `SPARSE_MIN_DOCS` where the accumulator passes dominate
        (measured crossover on v5e, DESIGN.md).  Compact mode always
        uses its dense form.
        """
        if strategy not in ("auto", "dense", "sparse"):
            raise ValueError(f"unknown strategy {strategy!r}")
        self.strategy = strategy
        self.segment = segment
        self.accumulator_budget = accumulator_budget
        self.compact = bool(compact or share is not None)
        if share is not None:
            if share.segment is not segment:
                raise ValueError("share must wrap the same sealed segment")
            if share.dev_post_impact is None:
                raise ValueError(
                    "share requires a posting_mode='impact' BlockMaxEngine"
                )
            self.dev = share.dev
            self._ranges = share.ranges
            self.dev_post_impact = share.dev_post_impact
            self.dev_post_local = share.dev_post_local
            self.dev_tr_range = share.dev_tr_range
            self.dev_tr_start = share.dev_tr_start
        elif self.compact:
            import jax
            import jax.numpy as jnp

            from ..index.ranges import build_range_index

            def put(x, dtype=None):
                arr = jnp.asarray(x, dtype=dtype)
                return (
                    jax.device_put(arr, device) if device is not None else arr
                )

            self.dev = DeviceSegment.from_sealed(
                segment, device=device, with_blocks=False
            )
            ri = build_range_index(segment)
            self._ranges = ri
            int_max = np.int32(np.iinfo(np.int32).max)
            imp_dt = (
                jnp.bfloat16 if impact_dtype == "bfloat16" else jnp.float32
            )
            self.dev_post_impact = put(ri.post_impact, imp_dt)
            self.dev_post_local = put(ri.post_local)
            self.dev_tr_range = put(
                np.append(ri.tr_range, int_max).astype(np.int32)
            )
            total = (
                int(ri.tr_start[-1] + ri.tr_len[-1]) if ri.tr_len.size else 0
            )
            self.dev_tr_start = put(
                np.append(ri.tr_start, [total, total]).astype(np.int32)
            )
        else:
            self.dev = DeviceSegment.from_sealed(
                segment, device=device, impact_dtype=impact_dtype
            )
            self._ranges = None

    def set_deleted(self, deleted: np.ndarray) -> None:
        self.dev.set_deleted(deleted)

    def memory_report(self) -> dict:
        """Device-resident index bytes (the equal-index-memory metric)."""
        doc_tables = 4 * (self.segment.n_docs + 1)  # doc_live f32
        if self.compact:
            ri = self._ranges
            m1 = ri.tr_range.size + 1
            range_meta = (4 + 4) * m1 + 4  # tr_range + tr_start(+total)
            postings = (
                np.asarray(self.dev_post_impact).nbytes
                + ri.post_local.nbytes
            )
            total = postings + range_meta + doc_tables
            n_post = max(1, ri.post_local.size - ri.range_size)
            return {
                "postings": postings,
                "range_meta": range_meta,
                "doc_tables": doc_tables,
                "total": total,
                "bytes_per_posting": (postings + range_meta) / n_post,
            }
        pd = np.asarray(self.dev.post_docid)
        pi = np.asarray(self.dev.post_impact)
        postings = pd.nbytes + pi.nbytes
        total = postings + doc_tables
        n_post = max(1, int(self.segment.block_n.sum()))
        return {
            "postings": postings,
            "doc_tables": doc_tables,
            "total": total,
            "bytes_per_posting": postings / n_post,
        }

    def _grp_lists(self, queries: Sequence[Query]):
        """Batch-vectorized per-query (term, range) group ids (CSR slices
        of the range index, the compact analog of block lists).

        Returns (grps, starts, sizes): flat group ids grouped by query
        (query q owns [starts[q], starts[q+1]))."""
        seg = self.segment
        tts = self._ranges.token_tr_start
        qn = len(queries)
        empty = np.zeros(0, dtype=np.int64)
        ids, qidx = batch_lookup(seg.lookup_tokens, queries)
        if ids.size == 0:
            sizes = np.zeros(qn, dtype=np.int64)
            return empty, np.zeros(qn + 1, dtype=np.int64), sizes
        los = tts[ids].astype(np.int64)
        cnt = tts[ids + 1].astype(np.int64) - los
        total = int(cnt.sum())
        if total == 0:
            sizes = np.zeros(qn, dtype=np.int64)
            return empty, np.zeros(qn + 1, dtype=np.int64), sizes
        grps = np.repeat(los, cnt) + group_positions(cnt)
        q_of = np.repeat(qidx, cnt)
        sizes = np.bincount(q_of, minlength=qn).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(sizes)))
        return grps, starts, sizes

    def _assemble_compact(self, lists, sub: np.ndarray):
        """Pad the subset `sub`'s group lists to a bucketed [q, G]
        matrix (vectorized)."""
        grps, starts, sizes = lists
        ri = self._ranges
        m_pad = ri.tr_range.size  # the appended pad slot
        sub = np.asarray(sub, dtype=np.int64)
        sub_sizes = sizes[sub]
        q = sub.size
        g_max = _bucket(int(sub_sizes.max(initial=1)) or 1, 8)
        grp_ids = np.full((q, g_max), m_pad, dtype=np.int32)
        total = int(sub_sizes.sum())
        if total:
            pos = group_positions(sub_sizes)
            src = np.repeat(starts[sub], sub_sizes) + pos
            dst_q = np.repeat(np.arange(q, dtype=np.int64), sub_sizes)
            grp_ids[dst_q, pos] = grps[src]
        return grp_ids

    def _prepare_compact(self, queries: Sequence[Query]):
        """Host-side batch assembly (single bucket): padded per-query
        group-id lists."""
        return self._assemble_compact(
            self._grp_lists(queries), np.arange(len(queries))
        )

    #: "auto" strategy switches to the sparse sort path at this corpus
    #: size (measured on v5e: dense and sparse trade places around 1M
    #: docs run-to-run; sparse wins consistently from ~4M — 289 vs 235
    #: QPS at 4M, 128 vs 119 at 8.4M, DESIGN.md).
    SPARSE_MIN_DOCS = 1 << 21

    def _win_lists(self, queries: Sequence[Query]):
        """Batch-vectorized window computation: one searchsorted over the
        concatenated query keys, then a repeat/cumsum CSR expansion of
        every term span into 128-lane row windows — no per-query Python.

        Returns ((rows, lo, hi, starts, sizes), n_terms): flat window
        arrays grouped by query (query q owns [starts[q], starts[q+1])),
        per-query window counts, and per-query matched-term counts.
        """
        seg = self.segment
        csr = np.asarray(self.dev.token_flat_start)
        qn = len(queries)
        empty = np.zeros(0, dtype=np.int64)
        ids, qidx = batch_lookup(seg.lookup_tokens, queries)
        if ids.size == 0:
            sizes = np.zeros(qn, dtype=np.int64)
            starts = np.zeros(qn + 1, dtype=np.int64)
            return (empty, empty, empty, starts, sizes), np.zeros(
                qn, dtype=np.int64
            )
        n_terms = np.bincount(qidx, minlength=qn).astype(np.int64)

        s = csr[ids].astype(np.int64)
        e = csr[ids + 1].astype(np.int64)
        nz = e > s
        s, e, qidx = s[nz], e[nz], qidx[nz]
        r0 = s // BLOCK
        cnt = (e - 1) // BLOCK - r0 + 1
        total = int(cnt.sum())
        if total == 0:
            sizes = np.zeros(qn, dtype=np.int64)
            starts = np.zeros(qn + 1, dtype=np.int64)
            return (empty, empty, empty, starts, sizes), n_terms
        rows = np.repeat(r0, cnt) + group_positions(cnt)
        lo = np.maximum(np.repeat(s, cnt) - rows * BLOCK, 0)
        hi = np.minimum(np.repeat(e, cnt) - rows * BLOCK, BLOCK)
        q_of = np.repeat(qidx, cnt)  # ascending: queries stay grouped
        sizes = np.bincount(q_of, minlength=qn).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(sizes)))
        return (rows, lo, hi, starts, sizes), n_terms

    def _assemble_windows(self, wins, sub: np.ndarray):
        """Pad the subset `sub`'s windows to bucketed [q, P] matrices
        (vectorized scatter into the padded layout)."""
        rows, lo, hi, starts, sizes = wins
        sub = np.asarray(sub, dtype=np.int64)
        sub_sizes = sizes[sub]
        q = sub.size
        p_max = _bucket(int(sub_sizes.max(initial=1)) or 1, 8)
        win_row = np.full((q, p_max), self.dev.n_rows, dtype=np.int32)
        win_lo = np.zeros((q, p_max), dtype=np.int32)
        win_hi = np.zeros((q, p_max), dtype=np.int32)
        total = int(sub_sizes.sum())
        if total:
            pos = group_positions(sub_sizes)
            src = np.repeat(starts[sub], sub_sizes) + pos
            dst_q = np.repeat(np.arange(q, dtype=np.int64), sub_sizes)
            win_row[dst_q, pos] = rows[src]
            win_lo[dst_q, pos] = lo[src]
            win_hi[dst_q, pos] = hi[src]
        return win_row, win_lo, win_hi

    def _prepare(self, queries: Sequence[Query], with_terms: bool = False):
        """Host-side batch assembly (single bucket): padded per-query
        posting-row windows.

        with_terms=True additionally returns the max matched-term count
        in the batch (bounds the sparse path's segment lengths)."""
        wins, n_terms = self._win_lists(queries)
        win_row, win_lo, win_hi = self._assemble_windows(
            wins, np.arange(len(queries))
        )
        if with_terms:
            return win_row, win_lo, win_hi, int(max(1, n_terms.max(initial=1)))
        return win_row, win_lo, win_hi

    def search_async(
        self,
        queries: Sequence[Query],
        k: int,
        filter_mask: Optional[np.ndarray] = None,
    ):
        """Dispatch a batch and return finalize() -> (scores, ids, payloads).

        The jit calls return immediately (JAX async dispatch); deferring
        the host sync to finalize() lets callers pipeline many batches —
        host prep of batch i+1 overlaps device compute and result
        transfer of batch i.

        Queries are dispatched in COST BUCKETS (powers of 4 over their
        posting-window count) so padding is per bucket: on Zipf corpora
        the p99/p50 window-count ratio is ~20x, and one heavy-tail query
        must not inflate every query's gather/sort width.  Dense
        dispatches are additionally capped so the [q, N] accumulator
        stays under `accumulator_budget`.
        """
        import jax.numpy as jnp

        if k <= 0:
            raise ValueError("number of needed rows is set to 0")
        dev = self.dev
        queries = list(queries)
        qn = len(queries)
        use_sparse = not self.compact and (
            self.strategy == "sparse"
            or (
                self.strategy == "auto"
                and dev.n_docs >= self.SPARSE_MIN_DOCS
            )
        )

        if filter_mask is not None:
            fm = np.ones(dev.n_docs + 1, dtype=np.float32)
            fm[: dev.n_docs] = np.asarray(filter_mask, dtype=np.float32)
            fm_dev = jnp.asarray(fm)
        else:
            fm_dev = jnp.ones(dev.n_docs + 1, dtype=jnp.float32)

        kk = min(_bucket(k, 1), max(dev.n_docs, 1))

        n_terms = np.ones(qn, dtype=np.int64)
        if self.compact:
            lists = self._grp_lists(queries)
            sizes = lists[2]
        else:
            lists, n_terms = self._win_lists(queries)
            sizes = lists[4]

        # Bucket only when padding waste is material: splitting costs a
        # fixed dispatch overhead per bucket (~0.5 ms), worth paying only
        # when batch-max padding would gather far more dead lanes than
        # that (65536 windows ~ 64 MB of wasted gather traffic).
        bucket_of = np.zeros(qn, dtype=np.int64)
        waste = qn * int(sizes.max(initial=0)) - int(sizes.sum())
        if waste > 65536:
            b = 32
            while np.any(sizes > b):
                bucket_of[sizes > b] += 1
                b *= 4

        # The sparse path allocates no [q, N] accumulator; no cap needed.
        if use_sparse and not self.compact:
            q_cap = 1 << 30
        else:
            q_cap = max(1, self.accumulator_budget // (4 * (dev.n_docs + 1)))

        pending = []
        for bu in np.unique(bucket_of):
            bidx = np.flatnonzero(bucket_of == bu)
            # Besides the accumulator budget, cap each dispatch's gather
            # volume (q * P * 128 lanes): one dispatch materializes
            # ~8-12 B per lane, and very large batches of heavy queries
            # otherwise spike transient HBM by gigabytes (observed TPU
            # worker crashes at [4096-query batches, 1M docs]).
            p_bucket = max(1, _bucket(int(sizes[bidx].max(initial=1)), 8))
            lane_cap = max(1, (1 << 26) // (p_bucket * 128))
            step = max(1, min(q_cap, lane_cap))
            for i0 in range(0, bidx.size, step):
                sub = bidx[i0 : i0 + step]
                if self.compact:
                    grp_ids = self._assemble_compact(lists, sub)
                    out = _jitted_score_and_topk_compact()(
                        self.dev_post_impact,
                        self.dev_post_local,
                        self.dev_tr_range,
                        self.dev_tr_start,
                        dev.doc_live,
                        fm_dev,
                        jnp.asarray(grp_ids),
                        k=kk,
                        n_docs=dev.n_docs,
                        range_size=self._ranges.range_size,
                    )
                elif use_sparse:
                    wr, wl, wh = self._assemble_windows(lists, sub)
                    mt = int(max(1, n_terms[sub].max(initial=1)))
                    out = _jitted_score_and_topk_sparse()(
                        dev.post_docid,
                        dev.post_impact,
                        dev.doc_live,
                        jnp.asarray(wr),
                        jnp.asarray(wl),
                        jnp.asarray(wh),
                        fm_dev,
                        k=kk,
                        n_docs=dev.n_docs,
                        seg_steps=int(mt - 1).bit_length(),
                    )
                else:
                    wr, wl, wh = self._assemble_windows(lists, sub)
                    out = _jitted_score_and_topk()(
                        dev.post_docid,
                        dev.post_impact,
                        dev.doc_live,
                        jnp.asarray(wr),
                        jnp.asarray(wl),
                        jnp.asarray(wh),
                        fm_dev,
                        k=kk,
                        n_docs=dev.n_docs,
                    )
                _throttle_large(out, sub.size * p_bucket * 128 * 8)
                pending.append((sub, out))

        payload_arr = np.asarray(dev.host.doc_payload)

        def finalize():
            scores = np.full((qn, k), -np.inf, dtype=np.float32)
            ids = np.full((qn, k), -1, dtype=np.int64)
            payloads = np.full((qn, k), -1, dtype=np.int64)
            for sub, (s_dev, i_dev) in pending:
                s = np.asarray(s_dev)[:, :k]
                i = np.asarray(i_dev, dtype=np.int64)[:, :k]
                if s.shape[1] < k:
                    # Fewer doc slots than k: pad to the [q, k] contract.
                    pad = k - s.shape[1]
                    s = np.pad(
                        s, ((0, 0), (0, pad)), constant_values=-np.inf
                    )
                    i = np.pad(i, ((0, 0), (0, pad)), constant_values=-1)
                valid = np.isfinite(s)
                i = np.where(valid, i, -1)
                p = np.where(valid, payload_arr[np.maximum(i, 0)], -1)
                scores[sub], ids[sub], payloads[sub] = s, i, p
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
    from ..utils.scorepack import pack_score

    scores = oracle_scores(segment, query, deleted, dtype)
    if filter_mask is not None:
        scores = np.where(np.asarray(filter_mask, dtype=bool), scores, 0)
    keep = scores > 0
    docs = np.flatnonzero(keep)
    # Sort keys are the reference's total-order score packing (the Score
    # heap key, crates/score/src/lib.rs:32-66): pack(-s) ascends as s
    # descends, with none of float-compare's NaN/-0 pitfalls.
    order = np.lexsort((docs, pack_score(-scores[docs].astype(np.float64))))
    top = docs[order[:k]]
    return scores[top], top
