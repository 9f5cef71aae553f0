"""Delta-compressed posting stream: the equal-index-memory layout.

The reference serves queries directly from bit/byte-packed 128-posting
blocks, decompressing each block on seek into a fixed buffer
(/root/reference/crates/bm25/src/compression.rs:36-136,
search.rs:498-518).  This module is the TPU-native equivalent: postings
are stored as byte-width-adaptive doc-id deltas plus term frequencies,
and the query kernels decompress them *in registers* — a uniform word
gather, static byte/halfword extraction, and a masked lane cumsum
anchored at a per-window base doc id.  No decompressed copy of the
index ever exists in HBM.

Layout
------
Each term's (doc-ascending) postings are cut into WINDOWS of at most
128 postings.  Per window:

- doc deltas are stored at a per-window byte width ``wd`` of 1 or 2
  (chosen from the window's largest delta); wd=2 windows hold at most
  64 postings so every window's doc data fits 32 u32 words (128 B) —
  the kernels always gather exactly 32 words per window;
- the window's first doc id is kept as an uncompressed 32-bit base
  (lane 0's stored delta is 0 and never read), so windows are
  independently decodable — the SummaryTuple-style re-anchoring that
  lets the engine jump into the middle of a posting list;
- term frequencies are stored at width ``wtf`` of 0 (every tf in the
  window is 1 — the dominant case — so nothing is stored), 1, or 2
  bytes (2 only on corpora with tf > 255, per-corpus static);
- deltas larger than 65535 force a window split (the next window
  re-anchors), so u16 always suffices.

Scores are reconstructed on the VPU per posting as
``tf * s0 / (tf + s1[fieldnorm])`` — the reference's per-posting
``Cache.evaluate`` (bm25.rs:334-359) — with the term's s0 shipped per
window by the host and the 256-entry s1 table resident in VMEM.
Everything is lossless: ranks are exactly the float32 oracle's.

Memory: ~1.1 B/posting doc side + ~0-1 B/posting tf side on typical
corpora, plus 2 B/doc (fieldnorm u16 with a deleted bit) — below the
reference's ~1.8 B/posting block format plus 8 B/doc DocumentTuple
(utils/memparity.py accounting).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from .sealed import SealedSegment

__all__ = ["StreamIndex", "build_stream_index", "WINDOW"]

WINDOW = 128  # max postings per window (64 at wd=2); = reference BLOCK

# Sub-chunk granularity: windows are assembled from 64-posting halves so
# a u16 window never needs more than 32 words of doc data.
_SUB = 64

_DELETED_BIT = np.uint16(1 << 8)  # doc_fn bit 8 = deleted


@dataclass
class StreamIndex:
    """Host-side compressed stream + per-window metadata over one
    sealed segment.  Device uploads happen in search.stream."""

    n_docs: int
    n_tokens: int
    n_postings: int
    tf_width: int  # corpus-level tf storage width class: 1 or 2 bytes

    # Byte streams (u32-word aligned; 32 words of zero tail padding).
    doc_words: np.ndarray  # [Sd] uint32
    tf_words: np.ndarray  # [St] uint32

    # Per-window metadata ([W] entries, term-major, doc-ascending).
    w_token: np.ndarray  # [W] int32
    w_base: np.ndarray  # [W] int32 first doc id
    w_len: np.ndarray  # [W] int32 (1..=128; <=64 when wd=2)
    w_wd: np.ndarray  # [W] uint8 in {1, 2}
    w_wtf: np.ndarray  # [W] uint8 in {0, tf_width}
    w_doff4: np.ndarray  # [W] int32 word offset into doc_words
    w_toff4: np.ndarray  # [W] int32 word offset into tf_words
    w_s0: np.ndarray  # [W] float32 term s0 = idf*(k1+1)
    w_maximp: np.ndarray  # [W] float32 max posting impact (MaxScore bound)

    # CSR: token id -> window span.
    token_w_start: np.ndarray  # [V+1] int64

    # Doc table: fieldnorm | deleted bit (uploaded as-is).
    doc_fn: np.ndarray  # [N+1] uint16 (pad slot N: deleted)

    # Per-token max single-posting impact (term upper bound for
    # MaxScore term ordering; the TokenTuple wand pair analog).
    token_maximp: np.ndarray  # [V] float32

    s1_table: np.ndarray  # [256] float32

    # Packed per-window meta for fast host prep: len | wd<<8 | wtf<<12.
    w_meta: np.ndarray = None  # [W] int32

    def __post_init__(self):
        if self.w_meta is None:
            self.w_meta = (
                self.w_len.astype(np.int32)
                | (self.w_wd.astype(np.int32) << 8)
                | (self.w_wtf.astype(np.int32) << 12)
            )

    @property
    def n_windows(self) -> int:
        return int(self.w_len.size)

    def device_bytes(self) -> dict:
        """What the engine keeps resident in HBM (equal-index-memory
        accounting; host copies of the same arrays are build/mutation
        state, mirroring the reference's on-disk segment)."""
        postings = self.doc_words.nbytes + self.tf_words.nbytes
        doc_tables = self.doc_fn.nbytes
        return {
            "postings": postings,
            "doc_tables": doc_tables,
            "s1_table": self.s1_table.nbytes,
            "total": postings + doc_tables + self.s1_table.nbytes,
            "bytes_per_posting": postings / max(1, self.n_postings),
        }

    def decode_window(self, w: int) -> Tuple[np.ndarray, np.ndarray]:
        """Host reference decoder (tests / lookups): (docs, tfs) of
        window w — must round-trip the sealed segment's postings."""
        ln = int(self.w_len[w])
        wd = int(self.w_wd[w])
        wtf = int(self.w_wtf[w])
        db = self.doc_words.view(np.uint8)[
            4 * int(self.w_doff4[w]) : 4 * int(self.w_doff4[w]) + ln * wd
        ]
        deltas = (
            db.astype(np.int64)
            if wd == 1
            else db.view(np.uint16).astype(np.int64)
        )
        deltas = deltas.copy()
        deltas[0] = 0
        docs = int(self.w_base[w]) + np.cumsum(deltas)
        if wtf == 0:
            tfs = np.ones(ln, dtype=np.int64)
        else:
            tb = self.tf_words.view(np.uint8)[
                4 * int(self.w_toff4[w]) : 4 * int(self.w_toff4[w])
                + ln * wtf
            ]
            tfs = (
                tb.astype(np.int64)
                if wtf == 1
                else tb.view(np.uint16).astype(np.int64)
            )
        return docs, tfs


def _word_pad(nbytes: np.ndarray) -> np.ndarray:
    """Round byte extents up to whole u32 words."""
    return (nbytes + 3) // 4


def build_stream_index(
    seg: SealedSegment, global_stats: Optional[tuple] = None
) -> StreamIndex:
    """Derive the compressed stream from a sealed segment (vectorized).

    global_stats: optional (n_docs_total, sum_dl_total, token_s0 [V])
    so doc-sharded segments bake global idf/avgdl into s0/s1 exactly as
    the other engines do (parallel builds compute statistics globally,
    reference am_build.rs:353-527).
    """
    from ..models.scoring import ScoreTables

    if global_stats is not None:
        n_total, sum_dl_total, s0 = global_stats
        tables = ScoreTables.create(
            seg.options.k1, seg.options.b, n_total, sum_dl_total
        )
        s0 = np.asarray(s0, dtype=np.float64)
    else:
        tables = seg.score_tables()
        s0 = seg.token_s0()
    s1_table = tables.s1_table.astype(np.float32)

    n = seg.n_docs
    v = seg.n_tokens
    tok, doc, tfv = seg.postings()
    p = int(tok.size)

    doc_fn = np.full(n + 1, _DELETED_BIT, dtype=np.uint16)
    doc_fn[:n] = seg.doc_fieldnorm.astype(np.uint16)

    if p == 0:
        return StreamIndex(
            n_docs=n,
            n_tokens=v,
            n_postings=0,
            tf_width=1,
            doc_words=np.zeros(32, dtype=np.uint32),
            tf_words=np.zeros(32, dtype=np.uint32),
            w_token=np.zeros(0, dtype=np.int32),
            w_base=np.zeros(0, dtype=np.int32),
            w_len=np.zeros(0, dtype=np.int32),
            w_wd=np.zeros(0, dtype=np.uint8),
            w_wtf=np.zeros(0, dtype=np.uint8),
            w_doff4=np.zeros(0, dtype=np.int32),
            w_toff4=np.zeros(0, dtype=np.int32),
            w_s0=np.zeros(0, dtype=np.float32),
            w_maximp=np.zeros(0, dtype=np.float32),
            token_w_start=np.zeros(v + 1, dtype=np.int64),
            doc_fn=doc_fn,
            token_maximp=np.zeros(v, dtype=np.float32),
            s1_table=s1_table,
        )

    doc64 = doc.astype(np.int64)
    tf64 = tfv.astype(np.int64)
    tf_max = int(tf64.max())
    if tf_max > 0xFFFF:
        raise ValueError(
            f"stream layout stores term frequencies in at most 16 bits "
            f"(max tf here: {tf_max})"
        )
    tf_width = 1 if tf_max <= 0xFF else 2

    # Deltas to the previous posting within a term (term starts: 0).
    term_start = np.empty(p, dtype=bool)
    term_start[0] = True
    term_start[1:] = tok[1:] != tok[:-1]
    delta = np.zeros(p, dtype=np.int64)
    delta[1:] = doc64[1:] - doc64[:-1]
    delta[term_start] = 0

    # Runs: maximal spans whose interior deltas fit u16 (a larger gap
    # re-anchors — the next window stores the doc id absolutely).
    run_start = term_start | (delta > 0xFFFF)
    run_first = np.flatnonzero(run_start)
    pos_in_run = np.arange(p, dtype=np.int64) - np.repeat(
        run_first, np.diff(np.append(run_first, p))
    )

    # 64-posting sub-chunks within runs.
    sub_start = run_start | (pos_in_run % _SUB == 0)
    sub_first = np.flatnonzero(sub_start)
    n_sub = sub_first.size
    sub_len = np.diff(np.append(sub_first, p))
    sub_of = np.cumsum(sub_start) - 1

    # Width decision inputs: per sub-chunk, the max INTERIOR delta
    # (excluding the sub-chunk's first posting, whose delta is only
    # used when the sub-chunk is merged into the previous one) and the
    # first ("linking") delta.
    d_tail = delta.copy()
    d_tail[sub_first] = 0
    sub_maxin = np.maximum.reduceat(d_tail, sub_first)
    sub_link = delta[sub_first]
    sub_is_run_start = run_start[sub_first]

    # Pair even sub-chunks (within their run) with their successor into
    # one 128-posting u8 window when all deltas involved fit a byte.
    run_of_sub = np.cumsum(sub_is_run_start) - 1
    sub_idx_in_run = np.arange(n_sub, dtype=np.int64) - np.repeat(
        np.flatnonzero(sub_is_run_start),
        np.diff(np.append(np.flatnonzero(sub_is_run_start), n_sub)),
    )
    even = sub_idx_in_run % 2 == 0
    has_next = np.zeros(n_sub, dtype=bool)
    has_next[:-1] = run_of_sub[:-1] == run_of_sub[1:]
    merge = np.zeros(n_sub, dtype=bool)
    cand = even & has_next
    nxt = np.flatnonzero(cand) + 1
    merge[cand] = (
        (sub_maxin[cand] <= 0xFF)
        & (sub_link[nxt] <= 0xFF)
        & (sub_maxin[nxt] <= 0xFF)
    )
    if tf_width == 2:
        # The kernels gather exactly 32 u32 words of tf data per
        # window; a 128-posting window at wtf=2 would need 64.  Merge
        # only when both halves are all-tf-1 (wtf=0, nothing stored).
        sub_tfmax = np.maximum.reduceat(tf64, sub_first)
        merge[cand] &= (sub_tfmax[cand] <= 1) & (sub_tfmax[nxt] <= 1)
    # A sub-chunk is a window start unless it is merged into the
    # previous (even) one.
    absorbed = np.zeros(n_sub, dtype=bool)
    absorbed[1:] = merge[:-1]
    win_start_sub = ~absorbed

    win_sub_first = np.flatnonzero(win_start_sub)
    n_win = win_sub_first.size
    # Per-window posting span.
    w_first = sub_first[win_sub_first]
    w_len = np.diff(np.append(w_first, p)).astype(np.int64)
    # Window width: u8 iff merged pair (by construction all-byte) or a
    # single sub-chunk whose interior deltas fit a byte.
    w_merged = merge[win_sub_first]
    w_wd = np.where(
        w_merged | (sub_maxin[win_sub_first] <= 0xFF), 1, 2
    ).astype(np.uint8)
    assert int(w_len.max()) <= WINDOW
    assert int(w_len[w_wd == 2].max(initial=0)) <= _SUB

    # tf width per window: 0 iff every tf in the window is 1.
    w_tfmax = np.maximum.reduceat(tf64, w_first)
    w_wtf = np.where(w_tfmax <= 1, 0, tf_width).astype(np.uint8)
    # Every window's tf data must fit the kernels' 32-word gather.
    assert int(w_len[w_wtf == 2].max(initial=0)) <= _SUB

    # Byte layout (4-aligned per window).
    doc_words_per_w = _word_pad(w_len * w_wd.astype(np.int64))
    tf_words_per_w = _word_pad(w_len * w_wtf.astype(np.int64))
    w_doff4 = np.zeros(n_win, dtype=np.int64)
    np.cumsum(doc_words_per_w[:-1], out=w_doff4[1:])
    w_toff4 = np.zeros(n_win, dtype=np.int64)
    np.cumsum(tf_words_per_w[:-1], out=w_toff4[1:])
    sd_words = int(doc_words_per_w.sum()) + 32
    st_words = int(tf_words_per_w.sum()) + 32
    if 4 * sd_words >= 2**31 or 4 * st_words >= 2**31:
        raise ValueError(
            "stream exceeds int32 byte addressing (2 GiB); shard the "
            "corpus across devices"
        )

    doc_words = np.zeros(sd_words, dtype=np.uint32)
    tf_words = np.zeros(st_words, dtype=np.uint32)
    doc_u8 = doc_words.view(np.uint8)
    tf_u8 = tf_words.view(np.uint8)

    # Stored deltas: window lane 0 holds 0 (the base anchors it).
    win_start_post = sub_start & win_start_sub[sub_of]
    win_of = np.cumsum(win_start_post) - 1  # window id per posting
    lane = np.arange(p, dtype=np.int64) - w_first[win_of]
    d_store = delta.copy()
    d_store[lane == 0] = 0

    pos = 4 * w_doff4[win_of] + lane * w_wd[win_of]
    m1 = w_wd[win_of] == 1
    doc_u8[pos[m1]] = d_store[m1].astype(np.uint8)
    m2 = ~m1
    if np.any(m2):
        doc_words.view(np.uint16)[(pos[m2] // 2)] = d_store[m2].astype(
            np.uint16
        )

    tpos = 4 * w_toff4[win_of] + lane * w_wtf[win_of]
    t1 = w_wtf[win_of] == 1
    tf_u8[tpos[t1]] = tf64[t1].astype(np.uint8)
    t2 = w_wtf[win_of] == 2
    if np.any(t2):
        tf_words.view(np.uint16)[(tpos[t2] // 2)] = tf64[t2].astype(
            np.uint16
        )

    # Per-window metadata.
    w_token = tok[w_first].astype(np.int32)
    w_base = doc64[w_first].astype(np.int32)
    s0f = s0.astype(np.float64)
    w_s0 = s0f[w_token].astype(np.float32)

    # Exact per-posting impacts (float64 -> f32 max) for MaxScore
    # bounds: bound must dominate the device's f32 arithmetic, so pad
    # by a few ulps like ranges.py does.
    fn = seg.doc_fieldnorm[doc64].astype(np.int64)
    imp = (tf64.astype(np.float64) * s0f[tok]) / (
        tf64 + tables.s1_table[fn]
    )
    w_maximp = np.maximum.reduceat(imp, w_first)
    w_maximp = np.nextafter(
        (w_maximp * (1.0 + 1e-6)).astype(np.float32), np.float32(np.inf)
    )
    token_maximp = np.zeros(v, dtype=np.float32)
    tstarts = np.flatnonzero(term_start)
    t_max = np.maximum.reduceat(imp, tstarts)
    t_max = np.nextafter(
        (t_max * (1.0 + 1e-6)).astype(np.float32), np.float32(np.inf)
    )
    token_maximp[tok[tstarts]] = t_max

    # CSR token -> windows (windows are term-major by construction).
    token_w_start = np.zeros(v + 1, dtype=np.int64)
    np.add.at(token_w_start, w_token.astype(np.int64) + 1, 1)
    np.cumsum(token_w_start, out=token_w_start)

    return StreamIndex(
        n_docs=n,
        n_tokens=v,
        n_postings=p,
        tf_width=tf_width,
        doc_words=doc_words,
        tf_words=tf_words,
        w_token=w_token,
        w_base=w_base,
        w_len=w_len.astype(np.int32),
        w_wd=w_wd,
        w_wtf=w_wtf,
        w_doff4=w_doff4.astype(np.int32),
        w_toff4=w_toff4.astype(np.int32),
        w_s0=w_s0,
        w_maximp=w_maximp,
        token_w_start=token_w_start,
        doc_fn=doc_fn,
        token_maximp=token_maximp,
        s1_table=s1_table,
    )
