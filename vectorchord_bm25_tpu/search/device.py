"""Device-resident view of a sealed segment.

Uploads the arrays the query engines actually touch, with sentinel rows
appended so padded gathers are branch-free:

- doc slot `n_docs` is the pad doc (dead);
- block id `n_blocks` is the pad block (all pad docs, impact 0).

Scoring is impact-eager (per-posting scores precomputed at build time,
`SealedSegment.block_impacts`), so no scoring tables ship to the device.
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
    n_blocks: int

    doc_live: object  # [N+1] float32 (1.0 live, 0.0 deleted/pad)
    block_docids: object  # [B+1, 128] int32 (pad = N)
    block_impact: object  # [B+1, 128] float32 precomputed scores (pad = 0)

    host: SealedSegment = None

    @classmethod
    def from_sealed(
        cls,
        seg: SealedSegment,
        deleted: Optional[np.ndarray] = None,
        device=None,
        with_blocks: bool = True,
        impact_dtype: str = "float32",
    ) -> "DeviceSegment":
        """with_blocks=False skips uploading the [B, 128] block arrays
        (the pruned engine reads the compact flat postings instead).
        impact_dtype="bfloat16" halves impact memory at ~0.4% relative
        score rounding (rank ties may reorder)."""
        import jax
        import jax.numpy as jnp

        n, v, b = seg.n_docs, seg.n_tokens, seg.n_blocks
        if not with_blocks:
            b = 0

        live = np.ones(n + 1, dtype=np.float32)
        live[n] = 0.0
        if deleted is not None:
            live[:n] = np.where(deleted[:n], 0.0, 1.0)

        bd = np.full((b + 1, BLOCK), n, dtype=np.int32)
        bi = np.zeros((b + 1, BLOCK), dtype=np.float32)
        if b:
            bd[:b] = seg.block_docids
            bi[:b] = seg.block_impacts()

        def put(x, dtype=None):
            arr = jnp.asarray(x, dtype=dtype)
            return jax.device_put(arr, device) if device is not None else arr

        imp_dt = jnp.bfloat16 if impact_dtype == "bfloat16" else jnp.float32
        return cls(
            n_docs=n,
            n_tokens=v,
            n_blocks=b,
            doc_live=put(live),
            block_docids=put(bd),
            block_impact=put(bi, imp_dt),
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
