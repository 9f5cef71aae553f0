"""Hybrid engine: cost-based routing between exact and pruned search.

The exact engine touches every posting of every query term — unbeatable
for selective queries (small Σ df) where there is nothing to skip, and
fully fused in one dispatch.  The Block-Max engine caps the worst case
for heavy queries (common terms, Σ df ~ corpus size) by pruning ranges
against the top-k threshold, at the cost of serial refinement rounds.

This router estimates each query's cost as Σ df over its terms and sends
cheap queries to the exact engine and expensive ones to the pruned
engine — batched separately so both run in their best regime.  The
reference has no analog (its serial WAND adapts naturally per query);
this is the batched-TPU equivalent of that adaptivity.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ..index.ranges import RangeIndex
from ..index.sealed import SealedSegment
from ..text.intern import Query
from .blockmax import BlockMaxEngine
from .exact import ExactEngine

__all__ = ["HybridEngine"]


class HybridEngine:
    """Routes queries by estimated posting volume.

    route_threshold: queries whose terms' total df exceeds this fraction
    of the corpus go to the pruned engine.
    """

    def __init__(
        self,
        segment: SealedSegment,
        range_index: Optional[RangeIndex] = None,
        route_threshold: float = 0.10,
        chunk: Optional[int] = None,
        device=None,
        use_pallas: Optional[bool] = None,
    ):
        self.segment = segment
        self.exact = ExactEngine(segment, device=device)
        self.blockmax = BlockMaxEngine(
            segment,
            range_index,
            chunk=chunk,
            device=device,
            use_pallas=use_pallas,
        )
        self.route_threshold = route_threshold

    def set_deleted(self, deleted: np.ndarray) -> None:
        self.exact.set_deleted(deleted)
        self.blockmax.set_deleted(deleted)

    def memory_report(self) -> dict:
        return self.blockmax.memory_report()

    def _route(self, queries: Sequence[Query]) -> np.ndarray:
        """True = heavy (pruned engine)."""
        seg = self.segment
        budget = max(1.0, self.route_threshold * seg.n_docs)
        heavy = np.zeros(len(queries), dtype=bool)
        for i, query in enumerate(queries):
            ids = seg.lookup_tokens(query.keys)
            ids = ids[ids >= 0]
            total = int(seg.token_df[ids].sum()) if ids.size else 0
            heavy[i] = total > budget
        return heavy

    def search(
        self,
        queries: Sequence[Query],
        k: int,
        filter_mask: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        if k <= 0:
            raise ValueError("number of needed rows is set to 0")
        queries = list(queries)
        heavy = self._route(queries)
        qn = len(queries)
        scores = np.full((qn, k), -np.inf, dtype=np.float32)
        ids = np.full((qn, k), -1, dtype=np.int64)
        payloads = np.full((qn, k), -1, dtype=np.int64)

        light_idx = np.flatnonzero(~heavy)
        heavy_idx = np.flatnonzero(heavy)
        if light_idx.size:
            s, i, p = self.exact.search(
                [queries[j] for j in light_idx], k, filter_mask
            )
            scores[light_idx], ids[light_idx], payloads[light_idx] = s, i, p
        if heavy_idx.size:
            s, i, p = self.blockmax.search(
                [queries[j] for j in heavy_idx], k, filter_mask
            )
            scores[heavy_idx], ids[heavy_idx], payloads[heavy_idx] = s, i, p
        return scores, ids, payloads
