"""Device-resident view of a sealed segment.

Uploads the sealed segment's structure-of-arrays to device HBM with
sentinel rows appended so padded gathers are branch-free:

- doc slot `n_docs` is the pad doc (fieldnorm 0, dead);
- block id `n_blocks` is the pad block (all pad docs, tf 0);
- token id `n_tokens` is the null term (df 0, s0 0, no blocks).

All scoring tables are float32 on device (host math stays float64).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..index.sealed import BLOCK, SealedSegment

__all__ = ["DeviceSegment"]


@dataclass
class DeviceSegment:
    """jnp views of one sealed segment (+ scoring tables)."""

    n_docs: int
    n_tokens: int
    n_blocks: int
    k1: float
    b: float
    avgdl: float

    # [N+1] arrays (last row = pad doc).
    doc_fieldnorm: object  # int32
    doc_live: object  # float32 (1.0 live, 0.0 deleted/pad)
    doc_payload: object  # int64 (pad = -1)

    # [B+1, 128] arrays (last row = pad block).
    block_docids: object  # int32
    block_tfs: object  # int32
    block_impact: object  # float32 precomputed per-posting scores (pad = 0)

    # [B+1] block metadata.
    block_min_doc: object  # int32
    block_max_doc: object  # int32
    block_ub: object  # float32 upper bound per block (pad = 0)

    # [V+1] token tables (last row = null term).
    token_s0: object  # float32
    token_ub: object  # float32 token-level upper bound
    token_block_start: object  # int32 CSR [V+2]

    # [256] shared fieldnorm table.
    s1_table: object  # float32

    host: SealedSegment = None

    @classmethod
    def from_sealed(
        cls,
        seg: SealedSegment,
        deleted: Optional[np.ndarray] = None,
        device=None,
        with_blocks: bool = True,
    ) -> "DeviceSegment":
        """with_blocks=False skips uploading the [B, 128] block arrays
        (engines that read the compact flat postings don't need them)."""
        import jax.numpy as jnp

        n, v, b = seg.n_docs, seg.n_tokens, seg.n_blocks
        if not with_blocks:
            b = 0
        tables = seg.score_tables()

        doc_fn = np.zeros(n + 1, dtype=np.int32)
        doc_fn[:n] = seg.doc_fieldnorm
        live = np.ones(n + 1, dtype=np.float32)
        live[n] = 0.0
        if deleted is not None:
            live[:n] = np.where(deleted[:n], 0.0, 1.0)
        payload = np.full(n + 1, -1, dtype=np.int64)
        payload[:n] = seg.doc_payload

        bd = np.full((b + 1, BLOCK), n, dtype=np.int32)
        bt = np.zeros((b + 1, BLOCK), dtype=np.int32)
        bi = np.zeros((b + 1, BLOCK), dtype=np.float32)
        bmin = np.full(b + 1, np.iinfo(np.int32).max, dtype=np.int32)
        bmax = np.full(b + 1, np.iinfo(np.int32).max, dtype=np.int32)
        if b:
            bd[:b] = seg.block_docids
            bt[:b] = seg.block_tfs
            bi[:b] = seg.block_impacts()
            bmin[:b] = seg.block_min_doc
            bmax[:b] = seg.block_max_doc

        s0_full = np.zeros(v + 1, dtype=np.float64)
        if v:
            s0_full[:v] = seg.token_s0()

        # Upper bounds: score of the stored max-impact pair, per token and
        # per block (Cursor::new / seek_block, search.rs:363, 426-429).
        def _ub(s0, fn, tfv):
            t = tfv.astype(np.float64)
            s1 = tables.s1_table[fn.astype(np.int64)]
            with np.errstate(invalid="ignore"):
                out = np.where(t > 0, (t * s0) / np.maximum(t + s1, 1e-30), 0.0)
            return out

        token_ub = np.zeros(v + 1, dtype=np.float64)
        block_ub = np.zeros(b + 1, dtype=np.float64)
        if v:
            token_ub[:v] = _ub(s0_full[:v], seg.token_wand_fn, seg.token_wand_tf)
        if b:
            block_token = np.repeat(
                np.arange(v, dtype=np.int64), np.diff(seg.token_block_start)
            )
            block_ub[:b] = _ub(
                s0_full[block_token], seg.block_wand_fn, seg.block_wand_tf
            )

        tbs = np.zeros(v + 2, dtype=np.int32)
        tbs[: v + 1] = seg.token_block_start
        tbs[v + 1] = tbs[v]  # null term: empty block range

        def put(x):
            import jax

            arr = jnp.asarray(x)
            return jax.device_put(arr, device) if device is not None else arr

        return cls(
            n_docs=n,
            n_tokens=v,
            n_blocks=b,
            k1=seg.options.k1,
            b=seg.options.b,
            avgdl=seg.avgdl,
            doc_fieldnorm=put(doc_fn),
            doc_live=put(live),
            doc_payload=put(payload),
            block_docids=put(bd),
            block_tfs=put(bt),
            block_impact=put(bi),
            block_min_doc=put(bmin),
            block_max_doc=put(bmax),
            block_ub=put(block_ub.astype(np.float32)),
            token_s0=put(s0_full.astype(np.float32)),
            token_ub=put(token_ub.astype(np.float32)),
            token_block_start=put(tbs),
            s1_table=put(tables.s1_table.astype(np.float32)),
            host=seg,
        )

    def set_deleted(self, deleted: np.ndarray) -> None:
        """Refresh the live mask after deletes (bitmap consulted at scoring)."""
        import jax.numpy as jnp

        n = self.n_docs
        live = np.ones(n + 1, dtype=np.float32)
        live[n] = 0.0
        live[:n] = np.where(deleted[:n], 0.0, 1.0)
        self.doc_live = jnp.asarray(live)
