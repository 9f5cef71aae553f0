"""Block-Max pruned batched search (engine v2).

The vectorized equivalent of the reference's Block-WeakAnd main loop
(search.rs:151-280).  Where the reference serially picks a pivot from a
cursor heap and tests Σ block upper bounds against the top-k threshold,
this engine:

1. scatter-adds each query term's per-range max scores into a dense
   [n_ranges] upper-bound vector (Σ_t max_score(t, range) — the batched
   analog of "sum of block upper bounds at the pivot");
2. in a lax.while_loop, takes the C highest-bound unprocessed ranges,
   exact-scores *all* their postings with fixed-size masked window
   gathers, merges into the running top-k with a lexicographic
   (score desc, doc asc) sort, and raises the threshold;
3. stops when no remaining range's bound exceeds the threshold — every
   skipped range provably contains no top-k document, so the result is
   the exact top-k (the same conservative-pruning guarantee as the
   reference's seek/skip dance).

All index metadata (flat postings + per-(term, range) CSR) is resident in
device HBM; a query batch ships only its [Q, T] term ids, so the
host↔device path stays off the critical loop.  All shapes are static; the
data-dependent part is only the trip count of the while_loop.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np

from ..index.ranges import RangeIndex, build_range_index
from ..index.sealed import SealedSegment
from ..text.intern import Query
from .device import DeviceSegment

__all__ = ["BlockMaxEngine"]

_INT_MAX = np.int32(np.iinfo(np.int32).max)


from ..utils.buckets import bucket_pow2 as _bucket


def _blockmax_kernel(
    post_impact,  # [P] float32 precomputed per-posting scores (pad = 0)
    post_local,  # [P] uint8 range-relative doc ids
    doc_live,  # [N+1] float32
    filter_mask,  # [N+1] float32
    tr_range,  # [M+1] int32 (pad slot: INT_MAX)
    tr_start,  # [M+2] int32 (groups are contiguous in the posting
    #            stream, so tr_start[g+1] - tr_start[g] is the group
    #            length — lengths never ship to the device; slots M and
    #            M+1 both hold the total so the pad group has length 0)
    tr_ub,  # [M+1] float32
    token_tr_start,  # [V+2] int32 CSR
    q_tid,  # [Q, T] int32 (pad = V, the null term)
    post_tf=None,  # [P] u8/u16 term frequencies (posting_mode="tf")
    doc_fn=None,  # [N+1] u8 fieldnorms (posting_mode="tf")
    s1_table=None,  # [256] float32 (posting_mode="tf")
    q_s0=None,  # [Q, T] float32 per-term s0 (posting_mode="tf")
    *,
    k: int,
    chunk: int,
    lmax: int,
    range_size: int,
    n_ranges: int,
    n_docs: int,
    max_rounds: int,
    use_pallas: bool,
    posting_mode: str = "impact",
):
    import jax
    import jax.numpy as jnp

    q, t = q_tid.shape
    rs = range_size
    c = chunk
    m_pad = tr_range.shape[0] - 1  # index of the pad slot

    # Gather each query term's (range, span, ub) window from the CSR.
    base = token_tr_start[q_tid]  # [Q, T]
    count = token_tr_start[q_tid + 1] - base
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (q, t, lmax), 2)
    widx = jnp.minimum(base[..., None] + l_iota, m_pad)
    lmask = l_iota < count[..., None]
    qt_range = jnp.where(lmask, tr_range[widx], _INT_MAX)  # ascending per (q,t)
    qt_start = jnp.where(lmask, tr_start[widx], 0)
    qt_len = jnp.where(lmask, tr_start[widx + 1] - tr_start[widx], 0)
    qt_ub = jnp.where(lmask, tr_ub[widx], 0.0)

    # Phase 1: dense per-range upper bounds (Σ over terms).
    flat_r = qt_range.reshape(q, t * lmax)
    flat_u = qt_ub.reshape(q, t * lmax)
    safe_r = jnp.where(flat_r == _INT_MAX, n_ranges, flat_r)

    def scatter_ub(ranges_q, ub_q):
        acc = jnp.zeros(n_ranges + 1, dtype=jnp.float32)
        return acc.at[ranges_q].add(ub_q)

    ub_work = jax.vmap(scatter_ub)(safe_r, flat_u)[:, :n_ranges]  # [Q, R]
    # Conservative float safety: the per-term bound pad (~1e-6 relative,
    # ranges.py) covers small term counts; scale the summed bound by the
    # worst-case float32 error of a T-term accumulation so pruning stays
    # provably safe for wide queries too.
    ub_work = ub_work * np.float32(1.0 + (t + 2) * 1.2e-7)

    topk_s0 = jnp.full((q, k), -jnp.inf, dtype=jnp.float32)
    topk_d0 = jnp.full((q, k), _INT_MAX, dtype=jnp.int32)

    rs_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, rs), 3)

    def threshold(topk_s):
        kth = topk_s[:, k - 1]
        return jnp.maximum(kth, 0.0)  # score>0 rule: threshold starts at 0

    def cond(state):
        ub_work, topk_s, topk_d, rounds = state
        return jnp.logical_and(
            rounds < max_rounds,
            jnp.any(jnp.max(ub_work, axis=1) > threshold(topk_s)),
        )

    def body(state):
        ub_work, topk_s, topk_d, rounds = state
        cand_ub, cand_r = jax.lax.top_k(ub_work, c)  # [Q, C]
        ub_next = jax.vmap(
            lambda w, r: w.at[r].set(-jnp.inf)
        )(ub_work, cand_r)

        # A chunk can be partially refilled with already-processed (-inf)
        # ranges once few unprocessed ones remain — they must not be
        # rescored (duplicates in the top-k otherwise).  Ranges at or
        # below the current threshold cannot contribute either.
        cand_ok = cand_ub > threshold(topk_s)[:, None]  # [Q, C]

        # Locate each (query term, candidate range) posting span.
        def locate(qt_range_q, cand_q):
            def per_term(ranges_t):
                i = jnp.searchsorted(ranges_t, cand_q)
                return jnp.minimum(i, lmax - 1)

            return jax.vmap(per_term)(qt_range_q)  # [T, C]

        idx = jax.vmap(locate)(qt_range, cand_r)  # [Q, T, C]
        hit_r = jnp.take_along_axis(qt_range, idx, axis=2)
        found = (hit_r == cand_r[:, None, :]) & cand_ok[:, None, :]
        start = jnp.where(found, jnp.take_along_axis(qt_start, idx, axis=2), 0)
        length = jnp.where(found, jnp.take_along_axis(qt_len, idx, axis=2), 0)

        if use_pallas:
            # Fused Pallas kernel: the per-range accumulation becomes a
            # one-hot MXU matmul (ops/score_kernel.py).
            # use_pallas == "interpret" runs the kernel in interpreter
            # mode (CPU test coverage).
            from ..ops.score_kernel import fused_range_scores

            acc = fused_range_scores(
                post_impact, post_local, start, length,
                rs=rs, interpret=use_pallas == "interpret",
            )  # [Q, C, RS]
        else:
            # XLA path: gather posting windows [Q, T, C, RS] and
            # scatter-add into per-range accumulators.
            gidx = start[..., None] + rs_iota  # [Q, T, C, RS]
            valid = rs_iota < length[..., None]
            local = post_local[gidx].astype(jnp.int32)
            if posting_mode == "tf":
                # 2 B/posting lossless form: reconstruct the impact on
                # the VPU from (tf, fieldnorm) exactly like the
                # reference's per-posting Cache.evaluate
                # (bm25.rs:334-359): score = tf*s0 / (tf + s1[fn]).
                tval = jnp.where(
                    valid, post_tf[gidx].astype(jnp.float32), 0.0
                )
                doc_l = jnp.minimum(
                    cand_r[:, None, :, None] * rs + local, n_docs
                )
                fnv = doc_fn[doc_l].astype(jnp.int32)
                s0q = q_s0[:, :, None, None]
                sc = (tval * s0q) / (tval + s1_table[fnv])
            else:
                # Impact-eager: per-posting scores precomputed at build
                # (no table lookups or divisions at query time).
                sc = jnp.where(
                    valid, post_impact[gidx].astype(jnp.float32), 0.0
                )
            qi = jax.lax.broadcasted_iota(jnp.int32, (q, t, c, rs), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (q, t, c, rs), 2)
            acc = jnp.zeros((q, c, rs), dtype=jnp.float32)
            acc = acc.at[qi, ci, local].add(sc)

        # Candidate docs; deleted/filtered docs are masked on the
        # accumulated per-doc scores (the factors are per-doc, so they
        # distribute over the per-term sum).
        cand_docs = cand_r[:, :, None] * rs + jax.lax.broadcasted_iota(
            jnp.int32, (q, c, rs), 2
        )
        cand_docs_c = jnp.minimum(cand_docs, n_docs)
        acc = acc * doc_live[cand_docs_c] * filter_mask[cand_docs_c]
        flat_s = acc.reshape(q, c * rs)
        flat_d = cand_docs.reshape(q, c * rs)
        ok = (flat_s > 0.0) & (flat_d < n_docs)
        flat_s = jnp.where(ok, flat_s, -jnp.inf)
        flat_d = jnp.where(ok, flat_d, _INT_MAX)

        # Merge with the running top-k via a lexicographic (-score, doc)
        # sort — candidates arrive in upper-bound order, not doc order, so
        # a tie-unaware top_k here would break the pinned
        # (score desc, doc asc) rule at the k boundary.
        all_s = jnp.concatenate([topk_s, flat_s], axis=1)
        all_d = jnp.concatenate([topk_d, flat_d], axis=1)
        neg, d_sorted = jax.lax.sort((-all_s, all_d), num_keys=2)
        return ub_next, -neg[:, :k], d_sorted[:, :k], rounds + 1

    ub_work, topk_s, topk_d, rounds = jax.lax.while_loop(
        cond, body, (ub_work, topk_s0, topk_d0, jnp.int32(0))
    )
    return topk_s, topk_d, rounds


@functools.lru_cache(maxsize=1)
def _jitted_kernel():
    import jax

    return jax.jit(
        _blockmax_kernel,
        static_argnames=(
            "k", "chunk", "lmax", "range_size", "n_ranges", "n_docs",
            "max_rounds", "use_pallas", "posting_mode",
        ),
    )


def _rangescan_kernel(
    post_impact,  # [P] float32 precomputed per-posting scores (pad = 0)
    post_local,  # [P] uint8 range-relative doc ids
    doc_live,  # [N+1] float32
    filter_mask,  # [N+1] float32
    tr_range,  # [M+1] int32 (pad slot: INT_MAX)
    tr_start,  # [M+2] int32
    token_tr_start,  # [V+2] int32 CSR
    q_tid,  # [Q, T] int32 (pad = V)
    *,
    k: int,
    chunk: int,
    lmax: int,
    range_size: int,
    n_ranges: int,
    n_docs: int,
    use_pallas: bool,
):
    """Exhaustive range-aligned scoring (no pruning): sweeps ALL ranges
    in fixed chunks inside a fori_loop.  Per chunk it locates each
    (term, range) posting span via searchsorted over the term's sorted
    range list, accumulates the chunk's [Q, C, RS] scores with the
    one-hot MXU kernel (ops/score_kernel.py) — a contiguous write, no
    [Q, N] scatter — and lays the result into the accumulator with a
    dynamic_update_slice.  Exhaustive => exact; final top-k is
    ops.topk.dense_topk.

    Measured on v5e at 4M docs this loses to handing heavy queries to
    the exact engine (11.7 s vs 0.54 s for 14 heavy queries — the
    one-hot kernel's small-matmul grid is latency-bound and the
    window gather materializes [rows, T*RS] in HBM), so HybridEngine's
    "auto" heavy mode prefers "exact"; this path stays as an explicit
    `heavy_mode="rangescan"` option and as the scatter-free reference
    for future kernel work.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.score_kernel import fused_range_scores
    from ..ops.topk import dense_topk

    q, t = q_tid.shape
    rs = range_size
    c = chunk
    n_chunks = -(-n_ranges // c)
    m_pad = tr_range.shape[0] - 1

    base = token_tr_start[q_tid]  # [Q, T]
    count = token_tr_start[q_tid + 1] - base
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (q, t, lmax), 2)
    widx = jnp.minimum(base[..., None] + l_iota, m_pad)
    lmask = l_iota < count[..., None]
    qt_range = jnp.where(lmask, tr_range[widx], _INT_MAX)
    qt_start = jnp.where(lmask, tr_start[widx], 0)
    qt_len = jnp.where(lmask, tr_start[widx + 1] - tr_start[widx], 0)

    rs_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, rs), 3)

    def body(ci, acc):
        cand_r = ci * c + jax.lax.broadcasted_iota(jnp.int32, (q, c), 1)

        def locate(qt_range_q, cand_q):
            def per_term(ranges_t):
                i = jnp.searchsorted(ranges_t, cand_q)
                return jnp.minimum(i, lmax - 1)

            return jax.vmap(per_term)(qt_range_q)  # [T, C]

        idx = jax.vmap(locate)(qt_range, cand_r)  # [Q, T, C]
        hit_r = jnp.take_along_axis(qt_range, idx, axis=2)
        found = hit_r == cand_r[:, None, :]
        start = jnp.where(
            found, jnp.take_along_axis(qt_start, idx, axis=2), 0
        )
        length = jnp.where(
            found, jnp.take_along_axis(qt_len, idx, axis=2), 0
        )

        if use_pallas:
            part = fused_range_scores(
                post_impact, post_local, start, length,
                rs=rs, interpret=use_pallas == "interpret",
            )  # [Q, C, RS]
        else:
            gidx = start[..., None] + rs_iota  # [Q, T, C, RS]
            valid = rs_iota < length[..., None]
            local = post_local[gidx].astype(jnp.int32)
            sc = jnp.where(
                valid, post_impact[gidx].astype(jnp.float32), 0.0
            )
            qi = jax.lax.broadcasted_iota(jnp.int32, (q, t, c, rs), 0)
            cidx = jax.lax.broadcasted_iota(jnp.int32, (q, t, c, rs), 2)
            part = jnp.zeros((q, c, rs), dtype=jnp.float32)
            part = part.at[qi, cidx, local].add(sc)

        return jax.lax.dynamic_update_slice(
            acc, part.reshape(q, c * rs), (0, ci * c * rs)
        )

    acc = jnp.zeros((q, n_chunks * c * rs), dtype=jnp.float32)
    acc = jax.lax.fori_loop(0, n_chunks, body, acc)
    acc = acc[:, :n_docs] * doc_live[:n_docs] * filter_mask[:n_docs]
    return dense_topk(acc, k, n_docs)


@functools.lru_cache(maxsize=1)
def _jitted_rangescan():
    import jax

    return jax.jit(
        _rangescan_kernel,
        static_argnames=(
            "k", "chunk", "lmax", "range_size", "n_ranges", "n_docs",
            "use_pallas",
        ),
    )


class BlockMaxEngine:
    """Batched Block-Max pruned search over one sealed segment."""

    def __init__(
        self,
        segment: SealedSegment,
        range_index: Optional[RangeIndex] = None,
        chunk: Optional[int] = None,
        device=None,
        use_pallas: Optional[bool] = None,
        impact_dtype: str = "float32",
        posting_mode: str = "impact",
    ):
        """posting_mode:
        - "impact": precomputed per-posting f32/bf16 scores (5/3 B per
          posting; fastest — no query-time math).
        - "tf": equal-index-memory form, 2 B/posting lossless — u8 tf
          (u16 auto-fallback if any tf > 255) + u8 range-local doc id;
          the impact is reconstructed on the VPU per posting, matching
          the reference's decompress-and-score loop (search.rs:498-518,
          bm25.rs:334-359).
        """
        import jax
        import jax.numpy as jnp

        from ..ops.score_kernel import pallas_available

        def put(x, dtype=None):
            arr = jnp.asarray(x, dtype=dtype)
            return jax.device_put(arr, device) if device is not None else arr

        if posting_mode not in ("impact", "tf"):
            raise ValueError(f"unknown posting_mode {posting_mode!r}")
        self.posting_mode = posting_mode
        self.impact_dtype = impact_dtype
        self.segment = segment
        self.ranges = range_index or build_range_index(segment)
        if chunk is None:
            # Scale-aware: keep the worst-case round count bounded while
            # not over-gathering on small corpora.
            chunk = min(256, max(32, self.ranges.n_ranges // 64))
        self.chunk = chunk
        if posting_mode == "tf":
            use_pallas = False  # the fused kernel reads impacts
        self.use_pallas = (
            pallas_available() if use_pallas is None else use_pallas
        )
        # Pruned engine needs only the doc tables, not the [B, 128] block
        # arrays (its postings live in the compact flat arrays).
        self.dev = DeviceSegment.from_sealed(
            segment, device=device, with_blocks=False
        )

        ri = self.ranges
        v = segment.n_tokens
        if ri.post_impact.size >= 2**31 or ri.token_tr_start[-1] >= 2**31:
            raise ValueError(
                "index exceeds int32 posting/group addressing (2^31); "
                "shard the corpus across devices"
            )
        # CSR with null-term entry (token id V: empty window) + pad slot M.
        tts = np.zeros(v + 2, dtype=np.int32)
        tts[: v + 1] = ri.token_tr_start
        tts[v + 1] = tts[v]
        if posting_mode == "tf":
            tf_max = (
                int(segment.block_tfs.max()) if segment.n_blocks else 0
            )
            if tf_max > 0xFFFF:
                raise ValueError(
                    f"posting_mode='tf' stores term frequencies in at "
                    f"most 16 bits (max tf here: {tf_max}); use "
                    f"posting_mode='impact'"
                )
            tf_dt = np.uint8 if tf_max <= 0xFF else np.uint16
            self.dev_post_impact = None
            self.dev_post_tf = put(ri.post_tf.astype(tf_dt))
            fn_pad = np.zeros(segment.n_docs + 1, dtype=np.uint8)
            fn_pad[: segment.n_docs] = segment.doc_fieldnorm
            self.dev_doc_fn = put(fn_pad)
            self.dev_s1 = put(
                segment.score_tables().s1_table.astype(np.float32)
            )
            s0_host = np.zeros(segment.n_tokens + 1, dtype=np.float32)
            s0_host[: segment.n_tokens] = segment.token_s0()
            self._s0_host = s0_host  # null term V scores 0
        else:
            imp_dt = (
                jnp.bfloat16 if impact_dtype == "bfloat16" else jnp.float32
            )
            self.dev_post_impact = put(ri.post_impact, imp_dt)
            self.dev_post_tf = None
            self.dev_doc_fn = None
            self.dev_s1 = None
            self._s0_host = None
        self.dev_post_local = put(ri.post_local)
        self.dev_tr_range = put(
            np.append(ri.tr_range, _INT_MAX).astype(np.int32)
        )
        # Group lengths are derived on device as tr_start diffs (groups
        # are contiguous); slots M and M+1 hold the total so the pad
        # group reads length 0.
        total = (
            int(ri.tr_start[-1] + ri.tr_len[-1]) if ri.tr_len.size else 0
        )
        self.dev_tr_start = put(
            np.append(ri.tr_start, [total, total]).astype(np.int32)
        )
        ub = np.append(ri.tr_ub, 0.0).astype(np.float32)
        if impact_dtype == "bfloat16":
            # bf16 round-to-nearest can raise a posting's stored impact by
            # up to 2^-8 relative; pruning bounds must cover that.
            ub = ub * np.float32(1.0 + 2.0**-7)
        self.dev_tr_ub = put(ub)
        self.dev_token_tr_start = put(tts)
        # Per-term L (for the lmax bucket).
        self._term_l = np.diff(ri.token_tr_start)

    def set_deleted(self, deleted: np.ndarray) -> None:
        self.dev.set_deleted(deleted)

    def memory_report(self) -> dict:
        """Device-resident index bytes (the equal-index-memory metric).

        Counts exactly what this engine uploads: the impact/local posting
        streams, the per-(term, range) metadata (+ pad slots), the int32
        CSR, and the doc-live mask."""
        ri = self.ranges
        doc_tables = 4 * (self.segment.n_docs + 1)  # doc_live f32
        m1 = ri.tr_range.size + 1  # + pad slot
        # tr_range/start/ub (+ the extra total slot of tr_start); group
        # lengths are derived on device from start diffs.
        range_meta = (4 + 4 + 4) * m1 + 4
        csr = 4 * (self.segment.n_tokens + 2)
        if self.posting_mode == "tf":
            postings = (
                np.asarray(self.dev_post_tf).nbytes + ri.post_local.nbytes
            )
            doc_tables += self.segment.n_docs + 1  # fieldnorms u8
        else:
            postings = (
                np.asarray(self.dev_post_impact).nbytes
                + ri.post_local.nbytes
            )
        total = postings + range_meta + csr + doc_tables
        return {
            "postings": postings,
            "range_meta": range_meta,
            "token_csr": csr,
            "doc_tables": doc_tables,
            "total": total,
            "bytes_per_posting": (postings + range_meta)
            / max(1, ri.post_local.size - ri.range_size),
        }

    def _prepare(self, queries: Sequence[Query]):
        """Host prep: only term-id lookup (one vectorized searchsorted
        over the concatenated batch keys); everything else is on device."""
        from ..utils.batchkeys import batch_lookup, group_positions

        seg = self.segment
        qn = len(queries)
        ids, qidx = batch_lookup(seg.lookup_tokens, queries)
        if ids.size == 0:
            # Match the non-empty path's minimum buckets so the jit
            # cache is shared with normal batches.
            return np.full((qn, 4), seg.n_tokens, dtype=np.int32), 8
        sizes = np.bincount(qidx, minlength=qn).astype(np.int64)
        t_max = _bucket(int(sizes.max(initial=1)) or 1, 4)
        q_tid = np.full((qn, t_max), seg.n_tokens, dtype=np.int32)
        q_tid[qidx, group_positions(sizes)] = ids
        l_needed = int(self._term_l[ids].max())
        return q_tid, _bucket(max(1, l_needed), 8)

    def search_async(
        self,
        queries: Sequence[Query],
        k: int,
        filter_mask: Optional[np.ndarray] = None,
        chunk: Optional[int] = None,
    ):
        """Dispatch and return finalize() -> (scores, ids, payloads)
        (JAX async dispatch; see ExactEngine.search_async)."""
        import jax.numpy as jnp

        if k <= 0:
            raise ValueError("number of needed rows is set to 0")
        chunk = self.chunk if chunk is None else chunk
        dev = self.dev
        ri = self.ranges
        q_tid, lmax = self._prepare(queries)

        if filter_mask is not None:
            fm = np.ones(dev.n_docs + 1, dtype=np.float32)
            fm[: dev.n_docs] = np.asarray(filter_mask, dtype=np.float32)
            fm_dev = jnp.asarray(fm)
        else:
            fm_dev = jnp.ones(dev.n_docs + 1, dtype=jnp.float32)

        kk = min(_bucket(k, 1), max(dev.n_docs, 1))
        max_rounds = -(-ri.n_ranges // chunk) + 1
        if self.posting_mode == "tf":
            q_s0 = jnp.asarray(self._s0_host[np.minimum(
                q_tid, self.segment.n_tokens
            )])
        else:
            q_s0 = None
        scores, ids, rounds = _jitted_kernel()(
            self.dev_post_impact,
            self.dev_post_local,
            dev.doc_live,
            fm_dev,
            self.dev_tr_range,
            self.dev_tr_start,
            self.dev_tr_ub,
            self.dev_token_tr_start,
            jnp.asarray(q_tid),
            self.dev_post_tf,
            self.dev_doc_fn,
            self.dev_s1,
            q_s0,
            k=kk,
            chunk=min(chunk, ri.n_ranges),
            lmax=lmax,
            range_size=ri.range_size,
            n_ranges=ri.n_ranges,
            n_docs=dev.n_docs,
            max_rounds=max_rounds,
            use_pallas=self.use_pallas,
            posting_mode=self.posting_mode,
        )
        scores_dev, ids_dev, rounds_dev = scores, ids, rounds

        def finalize():
            self.last_rounds = int(rounds_dev)
            scores = np.asarray(scores_dev)[:, :k]
            ids = np.asarray(ids_dev, dtype=np.int64)[:, :k]
            if scores.shape[1] < k:
                # Fewer doc slots than k: pad back to the [Q, k] contract.
                pad = k - scores.shape[1]
                scores = np.pad(
                    scores, ((0, 0), (0, pad)), constant_values=-np.inf
                )
                ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
            valid = np.isfinite(scores) & (ids < self.segment.n_docs) & (ids >= 0)
            ids = np.where(valid, ids, -1)
            payloads = np.where(
                valid, self.segment.doc_payload[np.maximum(ids, 0)], -1
            )
            return np.where(valid, scores, -np.inf), ids, payloads

        return finalize

    def search_rangescan_async(
        self,
        queries: Sequence[Query],
        k: int,
        filter_mask: Optional[np.ndarray] = None,
    ):
        """Exhaustive range-sweep scoring (no pruning, no scatter) —
        the heavy-query path: see _rangescan_kernel.  Exact results,
        identical contract to search_async."""
        import jax.numpy as jnp

        if k <= 0:
            raise ValueError("number of needed rows is set to 0")
        if self.posting_mode != "impact":
            raise ValueError(
                "rangescan reads precomputed impacts; use "
                "posting_mode='impact'"
            )
        dev = self.dev
        ri = self.ranges
        q_tid, lmax = self._prepare(queries)

        if filter_mask is not None:
            fm = np.ones(dev.n_docs + 1, dtype=np.float32)
            fm[: dev.n_docs] = np.asarray(filter_mask, dtype=np.float32)
            fm_dev = jnp.asarray(fm)
        else:
            fm_dev = jnp.ones(dev.n_docs + 1, dtype=jnp.float32)

        kk = min(_bucket(k, 1), max(dev.n_docs, 1))
        # Chunk so one chunk's materialized working set stays ~128 MB:
        # the XLA path holds gidx i32 + local i32 + sc f32 per lane
        # (~12 B), Q*T*C*RS lanes.  Round DOWN to a power of two so the
        # cap is honest.
        qn, t = q_tid.shape
        budget = max(64, (128 << 20) // max(1, qn * t * ri.range_size * 12))
        chunk = 1 << (int(budget).bit_length() - 1)
        chunk = int(min(chunk, ri.n_ranges))
        scores_dev, ids_dev = _jitted_rangescan()(
            self.dev_post_impact,
            self.dev_post_local,
            dev.doc_live,
            fm_dev,
            self.dev_tr_range,
            self.dev_tr_start,
            self.dev_token_tr_start,
            jnp.asarray(q_tid),
            k=kk,
            chunk=chunk,
            lmax=lmax,
            range_size=ri.range_size,
            n_ranges=ri.n_ranges,
            n_docs=dev.n_docs,
            use_pallas=self.use_pallas,
        )

        def finalize():
            scores = np.asarray(scores_dev)[:, :k]
            ids = np.asarray(ids_dev, dtype=np.int64)[:, :k]
            if scores.shape[1] < k:
                pad = k - scores.shape[1]
                scores = np.pad(
                    scores, ((0, 0), (0, pad)), constant_values=-np.inf
                )
                ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
            valid = (
                np.isfinite(scores)
                & (ids < self.segment.n_docs)
                & (ids >= 0)
            )
            ids = np.where(valid, ids, -1)
            payloads = np.where(
                valid, self.segment.doc_payload[np.maximum(ids, 0)], -1
            )
            return np.where(valid, scores, -np.inf), ids, payloads

        return finalize

    def search(
        self,
        queries: Sequence[Query],
        k: int,
        filter_mask: Optional[np.ndarray] = None,
        chunk: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Exact top-k via block-max pruning.

        Same result contract as ExactEngine.search (scores desc, doc slots,
        payloads; -inf/-1 padding).  `chunk` overrides the per-round
        candidate count — setting it at or above every query's total range
        count turns the search into a single-round scan with no threshold
        iteration (the light-query fast path).
        """
        return self.search_async(queries, k, filter_mask, chunk)()
