"""Growing segment: append-only buffer for freshly inserted documents.

The reference appends inserted docs to a growing page chain scored by a
brute-force pass during every search (crates/bm25/src/insert.rs,
search.rs:83-135) until `maintain` merges them into the sealed segment.

Semantics pinned to the reference:

- growing docs are scored against the *sealed* segment's statistics
  (df, N, avgdl): the token list used by the brute-force pass comes from
  the sealed token table (search.rs:53-79), so terms that only exist in
  growing documents contribute nothing until the next maintain;
- the original (key, tf) vectors are retained so maintain can relabel and
  re-flush them (maintain.rs:167-255).

Host representation: a CSR of (sealed-term-id, tf) postings per growing
doc (term id -1 for sealed-unknown terms) plus the original Documents.
Scoring is a vectorized numpy pass (the growing segment stays small by
design — maintain seals it).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..models.fieldnorm import length_to_fieldnorm
from ..text.intern import Document, Query
from .sealed import SealedSegment

__all__ = ["GrowingSegment"]


class GrowingSegment:
    def __init__(self, sealed: SealedSegment):
        self.sealed = sealed
        self.documents: List[Document] = []
        self.payloads: List[int] = []
        self.deleted: List[bool] = []
        self.fieldnorms: List[int] = []
        # CSR postings against the sealed token table.
        self._tid: List[np.ndarray] = []
        self._tf: List[np.ndarray] = []
        # Flattened tid-sorted posting cache for the batched scorer;
        # rebuilt lazily after inserts (deletes don't touch it — the
        # delete bitmap is applied at scoring time).
        self._flat = None

    def __len__(self) -> int:
        return len(self.documents)

    @property
    def n_live(self) -> int:
        return sum(not d for d in self.deleted)

    def insert(self, document: Document, payload: int) -> int:
        """Append one document (insert.rs:23-78 analog); returns its slot."""
        tids = self.sealed.lookup_tokens(document.keys)
        self.documents.append(document)
        self.payloads.append(int(payload))
        self.deleted.append(False)
        self.fieldnorms.append(int(length_to_fieldnorm(document.length())))
        self._tid.append(tids.astype(np.int64))
        self._tf.append(document.values.astype(np.int64))
        self._flat = None
        return len(self.documents) - 1

    def bulkdelete(self, predicate) -> int:
        """Mark growing docs whose payload matches (bulkdelete.rs:40-77)."""
        from .bm25index import _eval_predicate

        mask = _eval_predicate(
            predicate, np.asarray(self.payloads, dtype=np.int64)
        )
        return self.apply_delete_mask(mask)

    def apply_delete_mask(self, mask: np.ndarray) -> int:
        """Flip delete bits for live docs under a boolean mask; returns count."""
        count = 0
        for i in np.flatnonzero(mask):
            if not self.deleted[i]:
                self.deleted[i] = True
                count += 1
        return count

    def score(
        self,
        query: Query,
        filter_fn=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Brute-force scores for all live growing docs against the query.

        Returns (scores float64 [G], payloads int64 [G]); scores use the
        sealed segment's Cache tables (search.rs:83-135 semantics).
        Deleted / filtered docs score 0 (and are thus excluded by the
        score > 0 rule).  Vectorized over the flattened posting arrays.
        """
        g = len(self.documents)
        scores = np.zeros(g, dtype=np.float64)
        if g == 0:
            return scores, np.zeros(0, dtype=np.int64)

        seg = self.sealed
        q_tids = seg.lookup_tokens(query.keys)
        q_tids = np.sort(q_tids[q_tids >= 0])
        if q_tids.size:
            tables = seg.score_tables()
            s0_all = seg.token_s0()
            tids = (
                np.concatenate(self._tid)
                if self._tid
                else np.zeros(0, dtype=np.int64)
            )
            tfs = (
                np.concatenate(self._tf)
                if self._tf
                else np.zeros(0, dtype=np.int64)
            )
            doc_of = np.repeat(
                np.arange(g, dtype=np.int64),
                [t.size for t in self._tid],
            )
            # Postings whose sealed term id is in the query's set.
            pos = np.searchsorted(q_tids, tids)
            pos = np.minimum(pos, q_tids.size - 1)
            hit = (tids >= 0) & (q_tids[pos] == tids)
            if np.any(hit):
                h_doc = doc_of[hit]
                h_tid = tids[hit]
                h_tf = tfs[hit].astype(np.float64)
                fn = np.asarray(self.fieldnorms, dtype=np.int64)[h_doc]
                s1 = tables.s1_table[fn]
                contrib = (h_tf * s0_all[h_tid]) / (h_tf + s1)
                np.add.at(scores, h_doc, contrib)
            dead = np.asarray(self.deleted, dtype=bool)
            scores[dead] = 0.0
            if filter_fn is not None:
                from .bm25index import _eval_predicate

                keep = _eval_predicate(
                    filter_fn, np.asarray(self.payloads, dtype=np.int64)
                )
                scores[~keep] = 0.0
        return scores, np.asarray(self.payloads, dtype=np.int64)

    def _flat_postings(self):
        """(tid_sorted, impact_sorted, doc_of_sorted): the growing CSR
        flattened once, tid-sorted for searchsorted term slicing, with
        per-posting impacts precomputed from the sealed Cache tables —
        rebuilt only after inserts, NOT per search call."""
        if self._flat is None:
            seg = self.sealed
            if self._tid:
                tids = np.concatenate(self._tid)
                tfs = np.concatenate(self._tf).astype(np.float64)
                doc_of = np.repeat(
                    np.arange(len(self._tid), dtype=np.int64),
                    [t.size for t in self._tid],
                )
            else:
                tids = np.zeros(0, dtype=np.int64)
                tfs = np.zeros(0, dtype=np.float64)
                doc_of = np.zeros(0, dtype=np.int64)
            known = tids >= 0
            tids, tfs, doc_of = tids[known], tfs[known], doc_of[known]
            order = np.argsort(tids, kind="stable")
            tids, tfs, doc_of = tids[order], tfs[order], doc_of[order]
            if tids.size:
                tables = seg.score_tables()
                s0 = seg.token_s0()
                fn = np.asarray(self.fieldnorms, dtype=np.int64)[doc_of]
                impact = (tfs * s0[tids]) / (tfs + tables.s1_table[fn])
            else:
                impact = np.zeros(0, dtype=np.float64)
            self._flat = (tids, impact, doc_of)
        return self._flat

    def score_batch(self, queries) -> np.ndarray:
        """Scores for a whole query batch in one vectorized pass.

        Returns [Q, G] float64; deleted docs score 0 (the score > 0 rule
        excludes them downstream).  Semantics identical to per-query
        `score` (sealed statistics, sealed-known terms only) but cost is
        one searchsorted over the flat posting array per batch instead
        of Q re-concatenations (search.rs:83-135 merges per query; our
        hot path is 4096-query batches).
        """
        from ..utils.batchkeys import batch_lookup, group_positions

        qn = len(queries)
        g = len(self.documents)
        scores = np.zeros((qn, g), dtype=np.float64)
        if g == 0 or qn == 0:
            return scores
        tids, impact, doc_of = self._flat_postings()
        if tids.size == 0:
            return scores
        ids, qidx = batch_lookup(self.sealed.lookup_tokens, queries)
        if ids.size == 0:
            return scores
        lo = np.searchsorted(tids, ids, side="left")
        hi = np.searchsorted(tids, ids, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return scores
        src = np.repeat(lo, cnt) + group_positions(cnt)
        q_of = np.repeat(qidx, cnt)
        np.add.at(scores, (q_of, doc_of[src]), impact[src])
        dead = np.asarray(self.deleted, dtype=bool)
        if dead.any():
            scores[:, dead] = 0.0
        return scores

    def live_documents(self) -> List[Tuple[int, Document]]:
        """(payload, document) pairs of live docs, in insertion order
        (maintain pass C ordering, maintain.rs:167-255)."""
        return [
            (self.payloads[i], self.documents[i])
            for i in range(len(self.documents))
            if not self.deleted[i]
        ]
