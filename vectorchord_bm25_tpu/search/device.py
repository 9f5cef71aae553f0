"""Device-resident view of a sealed segment.

Uploads the arrays the query engines actually touch, with sentinel rows
appended so padded gathers are branch-free:

- doc slot `n_docs` is the pad doc (dead);
- posting row `n_rows` is the pad row (all pad docs, impact 0).

Scoring is impact-eager (per-posting scores precomputed at build time),
so no scoring tables ship to the device.  Postings are stored as the
FLAT (token, doc)-ordered stream reshaped to [rows, 128] — zero padding
between terms (8 B/posting at f32 impacts, 6 at bf16), unlike the
per-token 128-blocks whose partial tails would pad rare terms up to
128x.  A term's postings are a contiguous span of the flat stream
(CSR offsets = Σ df), gathered as masked row windows.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..index.sealed import BLOCK, SealedSegment

__all__ = ["DeviceSegment"]


@dataclass
class DeviceSegment:
    """jnp views of one sealed segment."""

    n_docs: int
    n_tokens: int
    n_rows: int  # posting rows (128 lanes each), excluding the pad row

    doc_live: object  # [N+1] float32 (1.0 live, 0.0 deleted/pad)
    post_docid: object  # [R+1, 128] int32 flat postings (pad = N)
    post_impact: object  # [R+1, 128] f32/bf16 precomputed scores (pad = 0)
    token_flat_start: object = None  # host [V+1] int64 CSR into postings

    host: SealedSegment = None

    @classmethod
    def from_sealed(
        cls,
        seg: SealedSegment,
        deleted: Optional[np.ndarray] = None,
        device=None,
        with_blocks: bool = True,
        impact_dtype: str = "float32",
        global_stats=None,
    ) -> "DeviceSegment":
        """with_blocks=False skips uploading the posting rows (the pruned
        engine reads its own compact flat postings instead).
        impact_dtype="bfloat16" drops impact memory to 2 B/posting at
        ~0.4% relative score rounding (rank ties may reorder).
        global_stats: (N, Σdl, token_s0) for doc-sharded segments."""
        import jax
        import jax.numpy as jnp

        n, v = seg.n_docs, seg.n_tokens

        live = np.ones(n + 1, dtype=np.float32)
        live[n] = 0.0
        if deleted is not None:
            live[:n] = np.where(deleted[:n], 0.0, 1.0)

        if with_blocks:
            docid, impact, csr = seg.flat_impact_postings(
                global_stats=global_stats
            )
            total = docid.size
            rows = -(-max(total, 1) // BLOCK)
            pd = np.full(((rows + 1) * BLOCK,), n, dtype=np.int32)
            pi = np.zeros(((rows + 1) * BLOCK,), dtype=np.float32)
            pd[:total] = docid
            pi[:total] = impact
            pd = pd.reshape(rows + 1, BLOCK)
            pi = pi.reshape(rows + 1, BLOCK)
        else:
            rows = 0
            csr = None
            pd = np.full((1, BLOCK), n, dtype=np.int32)
            pi = np.zeros((1, BLOCK), dtype=np.float32)

        def put(x, dtype=None):
            arr = jnp.asarray(x, dtype=dtype)
            return jax.device_put(arr, device) if device is not None else arr

        imp_dt = jnp.bfloat16 if impact_dtype == "bfloat16" else jnp.float32
        return cls(
            n_docs=n,
            n_tokens=v,
            n_rows=rows,
            doc_live=put(live),
            post_docid=put(pd),
            post_impact=put(pi, imp_dt),
            token_flat_start=csr,
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
