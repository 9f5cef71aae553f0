"""Exact batched search over the delta-compressed posting stream.

The equal-index-memory engine: postings stay compressed in HBM
(index/stream.py, ~1-2 B/posting vs the reference's ~1.8 B/posting
block format) and every query kernel decompresses the windows it
gathers *in registers* — the TPU analog of the reference's
decompress-on-seek into a fixed [u32;128] buffer
(/root/reference/crates/bm25/src/search.rs:498-518,
compression.rs:15-34).

Per window the kernel:

1. gathers 32 u32 words of doc data and 32 words of tf data (uniform
   shapes — window lengths are capped so len*bits <= 1024 both sides);
2. extracts each lane's value with a dynamic-width in-word shift
   (bit position = lane * bits; widths divide 32, so values never
   straddle words) and reconstructs doc ids with a masked lane cumsum
   anchored at the window's base doc;
3. reconstructs each posting's score as tf*s0/(tf + s1_eff[doc]) —
   the reference's per-posting Cache.evaluate (bm25.rs:334-359) — from
   ONE fused per-doc table: s1_eff[d] = s1_table[fieldnorm[d]] with
   +inf for deleted/filtered docs, so their scores collapse to exactly
   0.0 without separate masks.  Folding the fieldnorm lookup, the s1
   lookup, and the filter gather into a single [N+1] f32 gather is the
   measured difference between 51 ns and 14 ns per posting lane on a
   v5e (three dependent random gathers -> one);
4. feeds the (doc, score) lanes to the same exact reductions as the
   uncompressed engine: dense scatter-add + hierarchical top-k, or the
   doc-sort + segmented-sum sparse path at multi-million-doc scale.

Results are exactly the float32 oracle's (same IEEE expression as
oracle_scores(dtype=float32)); the pinned (score desc, doc asc) tie
rule is preserved by both reduction paths.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np

from ..index.sealed import SealedSegment
from ..index.stream import StreamIndex, build_stream_index
from ..text.intern import Query
from ..utils.batchkeys import batch_lookup, group_positions
from ..utils.buckets import bucket_pow2 as _bucket
from .exact import _throttle_large

__all__ = ["StreamEngine"]


@functools.lru_cache(maxsize=1)
def _jitted_stream_dense():
    import jax

    return jax.jit(
        _stream_dense,
        static_argnames=("k", "n_docs", "n_q", "dwidths", "twidths"),
    )


@functools.lru_cache(maxsize=1)
def _jitted_stream_sparse():
    import jax

    return jax.jit(
        _stream_sparse,
        static_argnames=("k", "n_docs", "seg_steps", "dwidths", "twidths"),
    )


@functools.lru_cache(maxsize=1)
def _jitted_stream_rescore():
    import jax

    return jax.jit(
        _stream_rescore,
        static_argnames=("k", "n_docs", "bs_steps", "dwidths", "twidths"),
    )


def _ms_prefix_prep(
    order, bounds, tws, ids, qidx, qn, tau_frac, exclude_frac
):
    """Host-side MaxScore phase-1 prefix selection (shared by the
    single-chip engine and the sharded mesh path).

    order/bounds: impact-descending window permutation per term and its
    (f64) bounds; tws: token -> window-span starts; ids/qidx: matched
    term ids and their query index; qn: query count.

    Returns (lo, hi, cut, s_rem, excl): per-term window spans into the
    impact-ordered table, the per-term prefix length (windows with
    bound >= tau_frac * query-max-bound, zeroed for excluded terms),
    the per-query certification remainder S = Σ next-window bounds,
    and the excluded-term mask.
    """
    lo = tws[ids].astype(np.int64)
    hi = tws[ids + 1].astype(np.int64)

    maxb = np.zeros(qn, dtype=np.float64)
    np.maximum.at(maxb, qidx, bounds[lo])
    tau = (maxb * tau_frac)[qidx]
    # Count of (descending) bounds >= tau in each [lo, hi) span.
    l, r = lo.copy(), hi.copy()
    for _ in range(int(np.max(hi - lo, initial=1)).bit_length() + 1):
        m = (l + r) >> 1
        go = (m < r) & (bounds[np.minimum(m, bounds.size - 1)] >= tau)
        l = np.where(go, m + 1, l)
        r = np.where(go, r, m)
    cut = l - lo
    # Term-level exclusion (the MaxScore essential-set rule): window
    # maxima within a common term are nearly flat on Zipf corpora, so
    # the tau prefix is all-or-nothing there — the only lever that
    # skips a common term's (huge) posting span in phase 1 is dropping
    # the WHOLE term.  Per query, exclude terms ascending by term bound
    # while the inclusive excluded mass stays under
    # exclude_frac * maxb; certification keeps the result exact and
    # excluded terms still contribute exactly in the candidate rescore
    # (search.rs:151-280's skip machinery actually skipping the
    # common-term lists).
    excl = np.zeros(qidx.size, dtype=bool)
    if exclude_frac > 0.0:
        tb = bounds[lo]
        t_order = np.lexsort((tb, qidx))
        tb_s = tb[t_order]
        q_s = qidx[t_order]
        cg = np.concatenate(([0.0], np.cumsum(tb_s)))
        qstart_s = np.concatenate(
            ([0], np.cumsum(np.bincount(q_s, minlength=qn)))
        )
        incl = cg[1:] - cg[qstart_s[q_s]]
        excl[t_order] = incl < exclude_frac * maxb[q_s]
        cut = np.where(excl, 0, cut)
    rem = np.where(
        cut < hi - lo,
        bounds[np.minimum(lo + cut, bounds.size - 1)],
        0.0,
    )
    s_rem = np.zeros(qn, dtype=np.float64)
    np.add.at(s_rem, qidx, rem)
    return lo, hi, cut, s_rem, excl


def _ms_certify(kth_exact, last, s_rem):
    """Exact-theta certification (shared single-chip / sharded): the k
    rescored docs exist with these exact scores, so kth_exact is a
    valid lower bound on the true kth score.  A doc never seen in
    phase 1 scores at most s_rem; a doc that fell out of the phase-1
    pool scores at most last + s_rem.  A few f32 ulps of slack keep
    the comparison conservative.  Returns (fail_unseen, fail_pool)."""
    eps = 4.0 * np.spacing(
        np.abs(kth_exact).astype(np.float32)
    ).astype(np.float64)
    fail_unseen = ~np.isfinite(kth_exact) | (s_rem >= kth_exact - eps)
    fail_pool = np.isfinite(last) & (last + s_rem >= kth_exact - eps)
    return fail_unseen, fail_pool


def _active_widths(meta: np.ndarray):
    """Static (doc, tf) width classes present in a dispatch's window
    metadata — the kernel specializes to exactly these (pad windows are
    meta 0 and masked dead, so width 0 is dropped)."""
    u = np.unique(meta)
    dw = tuple(sorted({int(b) for b in np.unique((u >> 8) & 0x1F)} - {0}))
    tw = tuple(sorted({int(b) for b in np.unique((u >> 16) & 0x1F)} - {0}))
    return dw or (8,), tw


def _unpack_and_score(
    words,  # [S] uint32 interleaved doc-delta + tf stream
    s1_eff,  # [N+1] float32 s1[fieldnorm], +inf = deleted/filtered/pad
    win_off,  # [Q, P] int32 word offsets (pad -> zero tail)
    win_base,  # [Q, P] int32 first doc id
    win_meta,  # [Q, P] u16 len | dclass<<8 | tclass<<10 (pad: 0)
    win_s0,  # [Q, P] float32 term s0
    n_docs: int,
    dwidths=(2, 4, 8, 16),
    twidths=(2, 4, 8, 16),
):
    """Decompress gathered windows and score every posting.

    Returns (doc [Q, P, 128] int32 with pad = n_docs, sc [Q, P, 128]
    float32 with dead/deleted/filtered lanes = exactly 0.0).  The
    fieldnorm, deleted bit, and filter all ride ONE [N+1] gather:
    s1_eff[d] is +inf for any non-scoring doc, and tf*s0/(tf+inf) is
    IEEE +0.0 — the fused gather is 3.6x faster than the three chained
    per-lane gathers it replaces (fieldnorm, s1 table, filter mask).

    dwidths/twidths: the width classes present in THIS dispatch (static;
    from _active_widths).  The kernel unpacks only those: the dominant
    single-width dispatch compiles to one static unpack with no selects,
    and an all-tf-1 dispatch skips the tf stream gather entirely.
    """
    import jax
    import jax.numpy as jnp

    q, p = win_off.shape
    iota32 = jnp.arange(32, dtype=jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (q, p, 128), 2)

    meta = win_meta.astype(jnp.int32)
    length = meta & 0xFF
    dbits = jnp.int32(2) << ((meta >> 8) & 3)
    tclass = (meta >> 10) & 7
    tfbits = jnp.where(tclass == 0, 0, jnp.int32(1) << tclass)
    live = lane < length[..., None]

    def unpack_static(words, b):
        # Static-width unpack: lane l reads word l//(32//b) shifted by
        # (l % (32//b))*b — with b static this is a repeat + constant
        # shift vector, pure VPU work (no dynamic gather).
        vper = 32 // b
        nwords = (128 + vper - 1) // vper
        rep = jnp.repeat(words[..., :nwords], vper, axis=-1)[..., :128]
        if rep.shape[-1] < 128:
            rep = jnp.concatenate(
                [
                    rep,
                    jnp.zeros(
                        (q, p, 128 - rep.shape[-1]), dtype=rep.dtype
                    ),
                ],
                axis=-1,
            )
        sh = jnp.asarray(
            (np.arange(128) % vper) * b, dtype=jnp.uint32
        )
        return jnp.right_shift(rep, sh) & jnp.uint32((1 << b) - 1)

    def extract(words, bits, widths):
        # words [Q, P, 32] uint32; bits [Q, P]; widths static non-zero.
        # Unpack at each active width, select per window — no dynamic
        # gathers; garbage from the default width is masked by callers
        # (dead lanes / tfbits==0 select).
        r = unpack_static(words, widths[-1])
        for b in widths[:-1]:
            r = jnp.where(
                (bits == b)[..., None], unpack_static(words, b), r
            )
        return r.astype(jnp.int32)

    dw32 = words[win_off[..., None] + iota32]  # [Q, P, 32] u32
    delta = extract(dw32, dbits, dwidths)
    delta = jnp.where(live & (lane > 0), delta, 0)
    doc = win_base[..., None] + jnp.cumsum(delta, axis=-1)
    doc = jnp.where(live, doc, n_docs)

    if twidths:
        # The window's tf words follow its doc words in the stream.
        toff = win_off + ((length * dbits + 31) >> 5)
        tw32 = words[toff[..., None] + iota32]
        tfv = extract(tw32, tfbits, twidths)
        tf = jnp.where((tfbits == 0)[..., None], 1, tfv).astype(
            jnp.float32
        )
    else:
        # Every window in this dispatch is all-tf-1: skip the stream.
        tf = jnp.ones((q, p, 128), dtype=jnp.float32)

    # Dead lanes carry doc = n_docs whose s1_eff is +inf, so their
    # (possibly garbage, but finite) tf yields exactly 0.0 — no mask.
    s1v = s1_eff[doc]
    sc = (tf * win_s0[..., None]) / (tf + s1v)
    return doc, sc


def _stream_dense(
    words, s1_eff,
    w_off, w_base, w_meta, w_s0,  # [W+1] HBM-resident tables
    wsrc,  # [T] int32 window ids (pad = W: the zero-length pad window)
    wq,  # [T] int32 query index per window (pad -> 0: scores are 0)
    k: int,
    n_docs: int,
    n_q: int,
    dwidths=(2, 4, 8, 16),
    twidths=(2, 4, 8, 16),
):
    """Flat dense reduction: every window of the whole sub-batch rides
    one [T, 128] decompress + one scatter-add into the [n_q, N+1]
    accumulator — no per-query padding, and the only per-dispatch host
    transfer is (wsrc, wq): 8 B per window.  Per-window metadata is
    gathered from the device-resident tables (the SummaryTuple-array
    analog, tuples.rs:900-971).  Filter + deleted ride s1_eff, so
    filtered docs accumulate exactly 0.0 — no [n_q, N] mask pass."""
    import jax.numpy as jnp

    doc, sc = _unpack_and_score(
        words, s1_eff,
        w_off[wsrc][:, None],
        w_base[wsrc][:, None], w_meta[wsrc][:, None],
        w_s0[wsrc][:, None], n_docs,
        dwidths, twidths,
    )  # [T, 1, 128]
    t = wsrc.shape[0]
    # Flat int32 scatter (callers guarantee n_q*(n_docs+1) < 2^31):
    # dead/pad lanes carry doc = n_docs and score 0, landing harmlessly
    # in their query's pad column.
    idx = wq[:, None] * jnp.int32(n_docs + 1) + doc.reshape(t, 128)
    acc = jnp.zeros(n_q * (n_docs + 1), dtype=jnp.float32)
    acc = acc.at[idx.reshape(-1)].add(sc.reshape(-1))
    acc = acc.reshape(n_q, n_docs + 1)
    from ..ops.topk import dense_topk

    return dense_topk(acc, k, n_docs)


def _stream_sparse(
    words, s1_eff,
    w_off, w_base, w_meta, w_s0,  # [W+1] HBM-resident tables
    wsrc,  # [Q, P] int32 window ids (pad = W)
    k: int,
    n_docs: int,
    seg_steps: int,
    dwidths=(2, 4, 8, 16),
    twidths=(2, 4, 8, 16),
):
    """Sort-based exact reduction (cost ~ postings, independent of
    n_docs) — identical post-gather algorithm to
    exact._score_and_topk_sparse, fed by the decompressor.  Filter +
    deleted ride s1_eff: filtered lanes score exactly 0.0 and fall out
    at the s > 0 candidate cut, with no per-lane filter gather."""
    import jax
    import jax.numpy as jnp

    doc, sc = _unpack_and_score(
        words, s1_eff,
        w_off[wsrc], w_base[wsrc], w_meta[wsrc],
        w_s0[wsrc], n_docs,
        dwidths, twidths,
    )

    q = doc.shape[0]
    df = doc.reshape(q, -1)
    sf = sc.reshape(q, -1)
    df, sf = jax.lax.sort((df, sf), dimension=1, num_keys=1)

    s = sf
    for i in range(seg_steps):
        sh = 1 << i
        zero_i = jnp.zeros((q, sh), dtype=df.dtype)
        zero_f = jnp.zeros((q, sh), dtype=s.dtype)
        same = jnp.concatenate(
            [zero_i == 1, df[:, sh:] == df[:, :-sh]], axis=1
        )
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
        scores = jnp.pad(
            scores, ((0, 0), (0, pad)), constant_values=-jnp.inf
        )
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=0)
    return scores, ids


def _stream_rescore(
    words, s1_eff,
    w_off, w_base, w_meta, w_s0,  # [W+1] HBM-resident tables
    cand,  # [Q, C] int32 candidate doc ids (pad = n_docs)
    t_lo, t_hi,  # [Q, T] int32 window spans per query term (orig order)
    k: int,
    n_docs: int,
    bs_steps: int,
    dwidths=(2, 4, 8, 16),
    twidths=(2, 4, 8, 16),
):
    """Exact re-scoring of candidate docs (MaxScore phase 2).

    For each (query, term, candidate): binary-search the term's
    doc-ascending window span for the window whose base covers the
    candidate (the TruncatedTapeReader seek analog, search.rs:177-229),
    decompress it, and pick the candidate's posting if present.  Scores
    are Σ-over-terms of the same per-posting expression as phase 1;
    ties break (score desc, doc asc)."""
    import jax
    import jax.numpy as jnp

    q, c = cand.shape
    t = t_lo.shape[1]
    w_pad = w_off.shape[0] - 1

    # Last window with base <= cand in [lo, hi) — 0 iterations when the
    # span is empty (l stays lo; valid = False).
    l = jnp.broadcast_to(t_lo[:, :, None], (q, t, c))
    r = jnp.broadcast_to(t_hi[:, :, None], (q, t, c))
    cb = cand[:, None, :]
    for _ in range(bs_steps):
        m = (l + r) >> 1
        go = (m < r) & (w_base[jnp.minimum(m, w_pad)] <= cb)
        l = jnp.where(go, m + 1, l)
        r = jnp.where(go, r, m)
    valid = l > t_lo[:, :, None]
    wi = jnp.where(valid, l - 1, w_pad).reshape(q, t * c)

    doc, sc = _unpack_and_score(
        words, s1_eff,
        w_off[wi], w_base[wi], w_meta[wi], w_s0[wi], n_docs,
        dwidths, twidths,
    )  # [Q, T*C, 128]
    cb_flat = jnp.broadcast_to(cand[:, None, :], (q, t, c)).reshape(
        q, t * c
    )
    contrib = jnp.sum(
        jnp.where(doc == cb_flat[..., None], sc, 0.0), axis=-1
    )  # [Q, T*C]
    scores = jnp.sum(contrib.reshape(q, t, c), axis=1)  # [Q, C]

    # Filtered/deleted candidates scored exactly 0.0 via s1_eff.
    keep = (cand < n_docs) & (scores > 0.0)
    scores = jnp.where(keep, scores, -jnp.inf)
    sort_ids = jnp.where(keep, cand, jnp.int32(np.iinfo(np.int32).max))
    neg, ids = jax.lax.sort((-scores, sort_ids), num_keys=2)
    kk = min(k, c)
    scores, ids = -neg[:, :kk], ids[:, :kk]
    ids = jnp.where(jnp.isfinite(scores), ids, 0)
    if kk < k:
        scores = jnp.pad(
            scores, ((0, 0), (0, k - kk)), constant_values=-jnp.inf
        )
        ids = jnp.pad(ids, ((0, 0), (0, k - kk)))
    return scores, ids


class StreamEngine:
    """Batched exact search serving from the compressed stream.

    Drop-in interface parity with ExactEngine (search / search_async /
    set_deleted / memory_report); HBM cost ~1-2 B/posting + 2 B/doc.
    """

    #: "auto" strategy switches to the sparse sort path at this corpus
    #: size (same measured crossover as ExactEngine, DESIGN.md).
    SPARSE_MIN_DOCS = 1 << 21

    def __init__(
        self,
        segment: SealedSegment,
        stream: Optional[StreamIndex] = None,
        device=None,
        accumulator_budget: int = 1 << 30,
        strategy: str = "auto",
        global_stats=None,
        ms_exclude: float = 0.5,
    ):
        if strategy not in ("auto", "dense", "sparse", "maxscore"):
            raise ValueError(f"unknown strategy {strategy!r}")
        if not 0.0 <= ms_exclude < 1.0:
            raise ValueError("ms_exclude must be in [0, 1)")
        import jax
        import jax.numpy as jnp

        self.strategy = strategy
        self.ms_exclude = float(ms_exclude)
        self._ms = None  # lazy impact-desc window order (MaxScore)
        #: work profile of the last maxscore dispatch (None before one):
        #: windows_total/windows_phase1, excluded_terms, fallback_queries
        #: — platform-independent pruning-effectiveness metrics.
        self.last_ms_stats = None
        self.segment = segment
        self.accumulator_budget = accumulator_budget
        self.stream = stream or build_stream_index(
            segment, global_stats=global_stats
        )
        si = self.stream

        def put(x, dtype=None):
            arr = jnp.asarray(x, dtype=dtype)
            return jax.device_put(arr, device) if device is not None else arr

        self.dev_words = put(si.words)
        self._doc_fn_host = si.doc_fn.copy()
        # Fused per-doc score table: s1[fieldnorm[d]], +inf for deleted
        # docs and the pad slot.  ONE per-lane gather replaces the
        # fieldnorm + s1-table + filter-mask gather chain (3.6x on the
        # unpack+score stage, measured at 1M docs on a v5e).
        self._put = put
        self.dev_s1bd = put(self._s1_by_doc_host())
        # Pad window: the zero tail (len 0, offset in-range).
        self._pad_off = np.int32(si.words.size - 64)
        # Per-window metadata lives in HBM (the SummaryTuple-array
        # analog, 14 B/window); dispatches ship only window ids.  Entry
        # W is the pad window: length 0, in-range offset.
        self._pad_win = np.int32(si.n_windows)
        self.dev_w_off = put(
            np.append(si.w_off4, self._pad_off).astype(np.int32)
        )
        self.dev_w_base = put(np.append(si.w_base, 0).astype(np.int32))
        self.dev_w_meta = put(
            np.append(si.w_meta16(), 0).astype(np.uint16)
        )
        self.dev_w_s0 = put(np.append(si.w_s0, 0.0).astype(np.float32))
        self.n_docs = si.n_docs

    def _s1_by_doc_host(self) -> np.ndarray:
        """[N+1] float32 s1[fieldnorm[d]] with +inf at deleted docs and
        the pad slot (doc_fn bit 8 = deleted, index/stream.py)."""
        fn = self._doc_fn_host
        return np.where(
            fn < 256,
            self.stream.s1_table[fn & 0xFF],
            np.inf,
        ).astype(np.float32)

    def set_deleted(self, deleted: np.ndarray) -> None:
        """Set/clear the deleted bit in the fieldnorm table (the
        scoring-time bitmap; the reference flips DocumentTuple.deleted,
        bulkdelete.rs:79-111)."""
        from ..index.stream import _DELETED_BIT

        n = self.n_docs
        fn = self.stream.doc_fn.copy()
        d = np.asarray(deleted, dtype=bool)[:n]
        fn[:n] = np.where(d, fn[:n] | _DELETED_BIT, fn[:n] & 0xFF)
        self._doc_fn_host = fn
        self.dev_s1bd = self._put(self._s1_by_doc_host())

    def _s1_eff(self, filter_mask: Optional[np.ndarray]):
        """Per-dispatch effective score table: dev_s1bd with filtered
        docs forced to +inf (scores collapse to exactly 0.0).  One
        [N+1] device pass per batch, not a per-lane gather."""
        if filter_mask is None:
            return self.dev_s1bd
        import jax.numpy as jnp

        fm = np.ones(self.n_docs + 1, dtype=np.float32)
        fm[: self.n_docs] = np.asarray(filter_mask, dtype=np.float32)
        return jnp.where(
            jnp.asarray(fm) > 0.0, self.dev_s1bd, jnp.inf
        )

    def memory_report(self) -> dict:
        """Device-resident index bytes (equal-index-memory metric)."""
        db = self.stream.device_bytes()
        wmeta = sum(
            int(t.nbytes)
            for t in (
                self.dev_w_off,
                self.dev_w_base,
                self.dev_w_meta,
                self.dev_w_s0,
            )
        )
        # The engine serves from the fused [N+1] f32 s1-by-doc table
        # (4 B/doc) instead of the u16 fieldnorm + 1 KB s1 table.
        doc_tables = int(self.dev_s1bd.nbytes)
        total = db["postings"] + doc_tables + wmeta
        return {
            "postings": db["postings"],
            "doc_tables": doc_tables,
            "s1_table": 0,
            # 14 B per window: the reference's SummaryTuple costs 24 B
            # per 128-posting block (tuples.rs:900-971) and is counted
            # on its side of the parity report too.
            "window_meta": wmeta,
            "total": total,
            "bytes_per_posting": (db["postings"] + wmeta)
            / max(1, self.stream.n_postings),
        }

    def _win_lists(self, queries: Sequence[Query]):
        """Vectorized per-query window-id lists (CSR slices of the
        stream's window table) + per-query matched-term counts."""
        si = self.stream
        seg = self.segment
        tws = si.token_w_start
        qn = len(queries)
        empty = np.zeros(0, dtype=np.int64)
        ids, qidx = batch_lookup(seg.lookup_tokens, queries)
        if ids.size == 0:
            sizes = np.zeros(qn, dtype=np.int64)
            return (empty, np.zeros(qn + 1, dtype=np.int64), sizes), np.zeros(
                qn, dtype=np.int64
            )
        n_terms = np.bincount(qidx, minlength=qn).astype(np.int64)
        los = tws[ids]
        cnt = tws[ids + 1] - los
        total = int(cnt.sum())
        if total == 0:
            sizes = np.zeros(qn, dtype=np.int64)
            return (empty, np.zeros(qn + 1, dtype=np.int64), sizes), n_terms
        wsrc = np.repeat(los, cnt) + group_positions(cnt)
        q_of = np.repeat(qidx, cnt)
        sizes = np.bincount(q_of, minlength=qn).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(sizes)))
        return (wsrc, starts, sizes), n_terms

    def _assemble(self, lists, sub: np.ndarray):
        """Pad the subset's window-id lists to a bucketed [q, P] matrix
        (sparse path; metadata is gathered device-side)."""
        wsrc, starts, sizes = lists
        sub = np.asarray(sub, dtype=np.int64)
        sub_sizes = sizes[sub]
        q = sub.size
        p_max = _bucket(int(sub_sizes.max(initial=1)) or 1, 8)
        ids = np.full((q, p_max), self._pad_win, dtype=np.int32)
        total = int(sub_sizes.sum())
        src = None
        if total:
            pos = group_positions(sub_sizes)
            src = wsrc[np.repeat(starts[sub], sub_sizes) + pos]
            dst_q = np.repeat(np.arange(q, dtype=np.int64), sub_sizes)
            ids[dst_q, pos] = src
        return ids, src

    def _maxscore_tables(self):
        """Impact-descending window order within each term + its bounds
        (f64, conservatively padded at build) — the MaxScore analog of
        the reference's per-term wand pair ordering (TokenTuple)."""
        if self._ms is None:
            si = self.stream
            order = np.lexsort((-si.w_maximp, si.w_token)).astype(
                np.int64
            )
            self._ms = (order, si.w_maximp[order].astype(np.float64))
        return self._ms

    #: Certification tiers for strategy='maxscore': (tau_frac,
    #: pool_min, exclude_override).  Tier 1 is the cheap pass; queries
    #: it cannot certify retry on tier 2 with a lower impact threshold
    #: (smaller s_rem) and a deeper partial pool (smaller pool-
    #: truncation bound) before the exhaustive fallback — still far
    #: cheaper than scoring every posting for the retried queries.
    MS_TIERS = ((0.5, 512, None), (0.25, 2048, 0.0))
    #: Per-query routing thresholds for strategy='auto' at scale.  A
    #: query goes to the pruned path only when the tier-1 bound
    #: structure predicts enough skippable work to beat the exhaustive
    #: sparse scan: measured at 8.4M docs (artifacts/
    #: bench_8m_{sparse,maxscore}_r04.json), 4-term similar-idf
    #: informative queries keep 70% of their windows through the
    #: phase-1 prefix and the pruned path runs 2.4x SLOWER than
    #: exhaustive-sparse — pruning must be predicted profitable per
    #: query, never assumed from corpus size.
    MS_ROUTE_FRAC = 0.35
    MS_ROUTE_MIN_WINDOWS = 256
    #: 'auto' routes to the pruned path only at k <= this.  The pruned
    #: path's cost grows with k (certification needs the kth EXACT
    #: score, so pools sort ~16x more entries at k=1000) while its
    #: traction shrinks (a deep kth score is a low threshold the
    #: bounds rarely clear): measured at 8.4M docs, k=1000, routing
    #: LOSES 2.3x on the informative mix (29.15 QPS routed vs 66.56
    #: exhaustive, artifacts/bench_8m_{auto,sparse}_k1000_r05.json)
    #: and is at best break-even on the heavy mix (3.08 vs ~3.3),
    #: while at k=10 it WINS both mixes (DESIGN.md round-5 table).
    #: 128 covers the top-10/top-100 serving regime the win is
    #: measured in; explicit strategy='maxscore' still serves any
    #: k <= MS_MAX_K pruned.
    MS_ROUTE_MAX_K = 128
    #: Deepest k the pruned path serves (the reference's WAND serves
    #: any LIMIT, gucs.rs caps bm25.limit at 65535; the partial pool
    #: here must hold ~16k candidates, so k=1000 north-star retrieval
    #: fits with the 16384-entry pool and anything deeper serves
    #: exhaustively).  VERDICT r3 #5.
    MS_MAX_K = 1024
    #: Partial-pool ceiling (entries per query per tier).
    MS_POOL_CAP = 16384

    def _ms_route(self, queries):
        """Predicted-work router for strategy='auto' at scale: True for
        queries the pruned path should serve.

        Cost model: the pruned path pays ~frac x the exhaustive window
        scan plus fixed rescore/pool overhead, so it wins only when the
        tier-1 prefix keeps a small fraction of a LARGE window set —
        i.e. the query carries common terms whose flat low bounds the
        exclusion rule can drop (the case the reference's WAND skip
        machinery targets, search.rs:151-280).  Selective queries
        (small window sets) and flat-impact informative queries route
        to the exhaustive sparse scan, which is already near the HBM
        roofline for them."""
        qn = len(queries)
        ids, qidx = batch_lookup(self.segment.lookup_tokens, queries)
        if ids.size == 0:
            return np.zeros(qn, dtype=bool)
        order, bounds = self._maxscore_tables()
        tws = self.stream.token_w_start
        tau_frac, _, excl_over = self.MS_TIERS[0]
        lo, hi, cut, _, _ = _ms_prefix_prep(
            order, bounds, tws, ids, qidx, qn, tau_frac,
            self.ms_exclude if excl_over is None else excl_over,
        )
        tot = np.bincount(
            qidx, weights=(hi - lo).astype(np.float64), minlength=qn
        )
        ph1 = np.bincount(
            qidx, weights=cut.astype(np.float64), minlength=qn
        )
        frac = np.where(tot > 0, ph1 / np.maximum(tot, 1.0), 1.0)
        return (tot >= self.MS_ROUTE_MIN_WINDOWS) & (
            frac <= self.MS_ROUTE_FRAC
        )

    def _maxscore_phase(self, queries, k, s1_eff, n_terms):
        """Tiered two-phase pruned exact top-k (strategy='maxscore').

        Each tier scores only each term's highest-bound windows
        (bound >= tau_frac * max-bound); any doc outside that prefix
        can add at most S = Σ-per-term next-window bounds, so after the
        exact rescore of the surviving candidates, the kth exact score
        certifies the result (see _ms_tier).  Queries a tier cannot
        certify retry on the next (lower tau, deeper pool); queries no
        tier certifies are returned for the exhaustive fallback.

        Returns (pending entries for finalize, fallback query indices).
        """
        qn = len(queries)
        ids, qidx = batch_lookup(self.segment.lookup_tokens, queries)
        if ids.size == 0:
            return [], np.zeros(0, dtype=np.int64)
        pending = []
        active = np.arange(qn, dtype=np.int64)
        tiers = []
        for tau_frac, pool_min, excl_over in self.MS_TIERS:
            if active.size == qn:
                t_ids, t_qidx, t_n = ids, qidx, n_terms
            else:
                amask = np.zeros(qn, dtype=bool)
                amask[active] = True
                sel = amask[qidx]
                remap = np.full(qn, -1, dtype=np.int64)
                remap[active] = np.arange(active.size)
                t_ids = ids[sel]
                t_qidx = remap[qidx[sel]]
                t_n = n_terms[active]
            tier_pending, tier_fb, tstats = self._ms_tier(
                t_ids, t_qidx, active.size, k, s1_eff, t_n,
                tau_frac, pool_min,
                self.ms_exclude if excl_over is None else excl_over,
            )
            for qs_local, data in tier_pending:
                pending.append((active[qs_local], data))
            tiers.append(tstats)
            active = active[tier_fb]
            if active.size == 0:
                break
        self.last_ms_stats = {
            "queries": qn,
            "tiers": tiers,
            "fallback_queries": int(active.size),
        }
        return pending, active

    def _ms_tier(
        self, ids, qidx, qn, k, s1_eff, n_terms, tau_frac, pool_min,
        exclude_frac,
    ):
        """One MaxScore certification tier over a query subset (local
        indices 0..qn): phase-1 prefix scoring, candidate selection,
        exact rescore, exact-theta certification.

        Returns (pending entries in local indices, local fallback
        indices, stats dict).
        """
        import jax.numpy as jnp

        si = self.stream
        n_docs = self.n_docs
        order, bounds = self._maxscore_tables()
        tws = si.token_w_start
        lo, hi, cut, s_rem, excl = _ms_prefix_prep(
            order, bounds, tws, ids, qidx, qn, tau_frac, exclude_frac
        )
        stats = {
            "queries": qn,
            "tau_frac": tau_frac,
            "windows_total": int((hi - lo).sum()),
            "windows_phase1": int(cut.sum()),
            "excluded_terms": int(excl.sum()),
            "terms": int(qidx.size),
        }

        # Phase 1: the prefix windows through the sparse reduction with
        # a C-wide result pool.
        wsrc = order[np.repeat(lo, cut) + group_positions(cut)]
        q_of = np.repeat(qidx, cut)
        sizes = np.bincount(q_of, minlength=qn).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(sizes)))
        lists = (wsrc, starts, sizes)
        # Pool depth is the certification lever: the pool-truncation
        # bound (last + s_rem < kth_exact) is what fails on heavy
        # queries when the pool is shallow — 128 deep, 83/128 heavy
        # queries fell back; the kept-partial floor `last` drops fast
        # with depth on Zipf partials.  [Q, c_pool] transfer + the
        # wider device sort are cheap next to window scoring.
        c_pool = int(min(_bucket(max(16 * k, pool_min), 1), self.MS_POOL_CAP))
        p1 = []
        p_bucket = max(1, _bucket(int(sizes.max(initial=1)), 8))
        lane_cap = max(1, (1 << 26) // (p_bucket * 128))
        for i0 in range(0, qn, lane_cap):
            sub = np.arange(i0, min(qn, i0 + lane_cap))
            mat, src = self._assemble(lists, sub)
            dw, tw = _active_widths(
                si.w_meta[src]
                if src is not None
                else np.zeros(1, dtype=np.int32)
            )
            mt = int(max(1, n_terms[sub].max(initial=1)))
            out = _jitted_stream_sparse()(
                self.dev_words, s1_eff,
                self.dev_w_off, self.dev_w_base, self.dev_w_meta,
                self.dev_w_s0,
                jnp.asarray(mat),
                k=c_pool, n_docs=n_docs,
                seg_steps=int(mt - 1).bit_length(),
                dwidths=dw, twidths=tw,
            )
            p1.append((sub, out))
        sp = np.full((qn, c_pool), -np.inf, dtype=np.float32)
        ip = np.full((qn, c_pool), n_docs, dtype=np.int64)
        for sub, (s_d, i_d) in p1:
            s = np.asarray(s_d)
            i = np.asarray(i_d, dtype=np.int64)
            sp[sub, : s.shape[1]] = s
            ip[sub, : i.shape[1]] = np.where(np.isfinite(s), i, n_docs)

        theta = sp[:, k - 1].astype(np.float64)
        last = sp[:, -1].astype(np.float64)
        # Queries with fewer than k finite partials cannot form a
        # selection threshold; everything else proceeds to the rescore,
        # and the safety certification happens AFTER it against the kth
        # EXACT score (see below) — certifying against the partial
        # theta forced 60-75% of common-term-heavy queries into the
        # exhaustive fallback, because partials lack exactly the
        # common-term mass that s_rem charges for.
        hopeless = ~np.isfinite(theta)
        ok = np.flatnonzero(~hopeless)
        fallback = np.flatnonzero(hopeless)
        stats["fallback_queries"] = int(fallback.size)
        if ok.size == 0:
            return [], fallback, stats

        # Candidates: partial + S could reach the kth partial (a few
        # f32 ulps of slack keep the set a superset under rounding).
        th = theta[ok]
        th_pad = th - 4.0 * np.spacing(
            np.abs(th).astype(np.float32)
        ).astype(np.float64)
        mask = np.isfinite(sp[ok]) & (
            sp[ok].astype(np.float64) + s_rem[ok, None]
            >= th_pad[:, None]
        )
        cand_ids = np.where(mask, ip[ok], n_docs)
        cand_ids.sort(axis=1)
        c_pad = int(_bucket(max(int(mask.sum(1).max(initial=1)), k), 16))
        if c_pad <= cand_ids.shape[1]:
            cand = cand_ids[:, :c_pad]
        else:
            cand = np.pad(
                cand_ids,
                ((0, 0), (0, c_pad - cand_ids.shape[1])),
                constant_values=n_docs,
            )
        cand = cand.astype(np.int32)

        # Per-(query, term) window spans in the original doc-ascending
        # order for the rescore's binary search.
        qstart = np.concatenate(
            ([0], np.cumsum(np.bincount(qidx, minlength=qn)))
        )
        tpos = np.arange(qidx.size, dtype=np.int64) - qstart[qidx]
        row = np.full(qn, -1, dtype=np.int64)
        row[ok] = np.arange(ok.size)
        selp = row[qidx] >= 0
        tmax = int(_bucket(int(n_terms[ok].max(initial=1)), 2))
        t_lo = np.zeros((ok.size, tmax), dtype=np.int32)
        t_hi = np.zeros((ok.size, tmax), dtype=np.int32)
        t_lo[row[qidx[selp]], tpos[selp]] = lo[selp]
        t_hi[row[qidx[selp]], tpos[selp]] = hi[selp]
        bs_steps = int(np.max(hi - lo, initial=1)).bit_length() + 1

        stats["candidate_pad"] = int(c_pad)
        outs = []
        lane_cap2 = max(1, (1 << 26) // (tmax * c_pad * 128))
        for i0 in range(0, ok.size, lane_cap2):
            s2 = slice(i0, min(ok.size, i0 + lane_cap2))
            out = _jitted_stream_rescore()(
                self.dev_words, s1_eff,
                self.dev_w_off, self.dev_w_base, self.dev_w_meta,
                self.dev_w_s0,
                jnp.asarray(cand[s2]),
                jnp.asarray(t_lo[s2]),
                jnp.asarray(t_hi[s2]),
                k=k, n_docs=n_docs, bs_steps=bs_steps,
            )
            outs.append((s2, out))
        res_s = np.full((ok.size, k), -np.inf, dtype=np.float32)
        res_i = np.zeros((ok.size, k), dtype=np.int64)
        for s2, (s_d, i_d) in outs:
            res_s[s2] = np.asarray(s_d)[:, :k]
            res_i[s2] = np.asarray(i_d, dtype=np.int64)[:, :k]

        # Exact-theta certification (see _ms_certify): unlike the
        # partial theta, kth_exact includes the excluded/tail terms'
        # contributions; unselected pool docs had
        # partial + s_rem < theta <= kth_exact.
        kth_exact = res_s[:, k - 1].astype(np.float64)
        fail_unseen, fail_pool = _ms_certify(
            kth_exact, last[ok], s_rem[ok]
        )
        stats["cert_fail_unseen"] = int(fail_unseen.sum())
        stats["cert_fail_pool"] = int((fail_pool & ~fail_unseen).sum())
        safe = ~(fail_unseen | fail_pool)
        certified = np.flatnonzero(safe)
        # Sorted: the next tier's prefix prep assumes query-ascending
        # term lists (tpos/qstart scatter); concatenating hopeless +
        # cert-failed indices unsorted corrupted the retry's term-span
        # matrices whenever both classes were non-empty.
        fallback = np.sort(
            np.concatenate([fallback, ok[np.flatnonzero(~safe)]])
        )
        stats["fallback_queries"] = int(fallback.size)
        pending = []
        if certified.size:
            pending.append(
                (ok[certified], (res_s[certified], res_i[certified]))
            )
        return pending, fallback, stats

    def search_async(
        self,
        queries: Sequence[Query],
        k: int,
        filter_mask: Optional[np.ndarray] = None,
    ):
        """Dispatch a batch and return finalize() -> (scores, ids,
        payloads) — same contract, bucketing, and budget caps as
        ExactEngine.search_async."""
        import jax.numpy as jnp

        if k <= 0:
            raise ValueError("number of needed rows is set to 0")
        # Per-dispatch profile: cleared up front so a reader after this
        # call never sees a previous dispatch's stats.
        self.last_ms_stats = None
        queries = list(queries)
        qn = len(queries)
        n_docs = self.n_docs
        # Strategy routing.  'maxscore' forces every query through the
        # pruned path (k > MS_MAX_K exceeds the partial-pool design and
        # serves exhaustively).  At multi-million-doc scale 'auto'
        # routes PER QUERY: only queries whose tier-1 bound structure
        # predicts profitable skipping go through the pruned path
        # (_ms_route; measured at 8.4M the pruned path is 2.4x slower
        # than exhaustive-sparse on informative queries — DESIGN.md
        # round-4 measurement); the rest take the exhaustive sparse
        # scan, as do per-query certification fallbacks.
        at_scale = n_docs >= self.SPARSE_MIN_DOCS
        ms_sel = None
        if k <= self.MS_MAX_K:
            if self.strategy == "maxscore":
                ms_sel = np.arange(qn, dtype=np.int64)
            elif (
                self.strategy == "auto"
                and at_scale
                and k <= self.MS_ROUTE_MAX_K
            ):
                ms_sel = np.flatnonzero(self._ms_route(queries))
        use_sparse = ms_sel is None and (
            self.strategy in ("sparse", "maxscore")
            or (self.strategy == "auto" and at_scale)
        )

        s1_eff = self._s1_eff(filter_mask)

        kk = min(_bucket(k, 1), max(n_docs, 1))

        lists, n_terms = self._win_lists(queries)
        wsrc_all, starts, sizes = lists
        si = self.stream

        tables = (
            self.dev_w_off,
            self.dev_w_base,
            self.dev_w_meta,
            self.dev_w_s0,
        )
        pending = []
        sparse_sel = np.arange(qn, dtype=np.int64)
        if ms_sel is not None:
            if ms_sel.size:
                sub_q = (
                    queries
                    if ms_sel.size == qn
                    else [queries[i] for i in ms_sel]
                )
                ms_pending, fb_local = self._maxscore_phase(
                    sub_q, k, s1_eff, n_terms[ms_sel]
                )
                for qs_local, data in ms_pending:
                    pending.append((ms_sel[qs_local], data))
                not_routed = np.setdiff1d(
                    sparse_sel, ms_sel, assume_unique=True
                )
                sparse_sel = np.sort(
                    np.concatenate([not_routed, ms_sel[fb_local]])
                )
            stats = self.last_ms_stats or {
                "queries": 0,
                "tiers": [],
                "fallback_queries": 0,
            }
            stats["batch_queries"] = qn
            stats["routed_queries"] = int(ms_sel.size)
            self.last_ms_stats = stats
            use_sparse = sparse_sel.size > 0

        if not use_sparse and ms_sel is None:
            # Flat dense dispatch: contiguous query chunks bounded by the
            # accumulator budget and a window-lane cap; per-dispatch host
            # transfer is 8 B per window (ids only).
            q_cap = max(1, self.accumulator_budget // (4 * (n_docs + 1)))
            while q_cap * (n_docs + 1) >= 1 << 31:  # int32 flat scatter
                q_cap //= 2
            t_cap = 1 << 19  # 67M decompressed lanes per dispatch
            q0 = 0
            while q0 < qn:
                q1 = min(qn, q0 + q_cap)
                if starts[q1] - starts[q0] > t_cap:
                    q1 = int(
                        np.searchsorted(
                            starts, starts[q0] + t_cap, side="right"
                        )
                        - 1
                    )
                    q1 = max(q1, q0 + 1)
                t0, t1 = int(starts[q0]), int(starts[q1])
                ws = wsrc_all[t0:t1]
                t = t1 - t0
                tb = _bucket(max(t, 1), 128)
                wsrc = np.full(tb, self._pad_win, dtype=np.int32)
                wsrc[:t] = ws
                wq = np.zeros(tb, dtype=np.int32)
                if t:
                    wq[:t] = np.repeat(
                        np.arange(q1 - q0, dtype=np.int32),
                        sizes[q0:q1],
                    )
                n_qb = _bucket(q1 - q0, 8)
                dw, tw = _active_widths(
                    si.w_meta[ws] if t else np.zeros(1, dtype=np.int32)
                )
                out = _jitted_stream_dense()(
                    self.dev_words,
                    s1_eff,
                    *tables,
                    jnp.asarray(wsrc),
                    jnp.asarray(wq),
                    k=kk,
                    n_docs=n_docs,
                    n_q=n_qb,
                    dwidths=dw,
                    twidths=tw,
                )
                _throttle_large(out, tb * 128 * 8)
                pending.append((np.arange(q0, q1), out))
                q0 = q1
        elif use_sparse:
            sel = sparse_sel
            ssz = sizes[sel]
            bucket_of = np.zeros(sel.size, dtype=np.int64)
            waste = sel.size * int(ssz.max(initial=0)) - int(ssz.sum())
            if waste > 65536:
                b = 32
                while np.any(ssz > b):
                    bucket_of[ssz > b] += 1
                    b *= 4
            for bu in np.unique(bucket_of):
                bidx = sel[np.flatnonzero(bucket_of == bu)]
                p_bucket = max(
                    1, _bucket(int(sizes[bidx].max(initial=1)), 8)
                )
                lane_cap = max(1, (1 << 26) // (p_bucket * 128))
                for i0 in range(0, bidx.size, lane_cap):
                    sub = bidx[i0 : i0 + lane_cap]
                    ids, src = self._assemble(lists, sub)
                    dw, tw = _active_widths(
                        si.w_meta[src]
                        if src is not None
                        else np.zeros(1, dtype=np.int32)
                    )
                    mt = int(max(1, n_terms[sub].max(initial=1)))
                    out = _jitted_stream_sparse()(
                        self.dev_words,
                        s1_eff,
                        *tables,
                        jnp.asarray(ids),
                        k=kk,
                        n_docs=n_docs,
                        seg_steps=int(mt - 1).bit_length(),
                        dwidths=dw,
                        twidths=tw,
                    )
                    _throttle_large(out, sub.size * p_bucket * 128 * 8)
                    pending.append((sub, out))

        payload_arr = np.asarray(self.segment.doc_payload)

        def finalize():
            scores = np.full((qn, k), -np.inf, dtype=np.float32)
            ids = np.full((qn, k), -1, dtype=np.int64)
            payloads = np.full((qn, k), -1, dtype=np.int64)
            for sub, (s_dev, i_dev) in pending:
                # Dense rows are pow2-bucketed; drop the padding rows.
                s = np.asarray(s_dev)[: sub.size, :k]
                i = np.asarray(i_dev, dtype=np.int64)[: sub.size, :k]
                if s.shape[1] < k:
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
        """Top-k for a batch of queries (contract: ExactEngine.search)."""
        return self.search_async(queries, k, filter_mask)()
