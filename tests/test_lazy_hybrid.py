"""Lazy-engine and routing regression guards for HybridEngine.

Pins the review findings: a default hybrid must not upload the pruned
engine's arrays unless a path actually needs them, memory_report must
not allocate, and OOV-only queries must not trigger the lazy build.
"""

import numpy as np
import pytest

from vectorchord_bm25_tpu.index.sealed import build_sealed_segment
from vectorchord_bm25_tpu.search.hybrid import HybridEngine
from vectorchord_bm25_tpu.text.intern import Query
from vectorchord_bm25_tpu.utils.batchkeys import batch_lookup, group_positions

from test_sealed import make_docs


def _engine(rng, n_docs=120, vocab=10, **kw):
    docs = make_docs(rng, n_docs, vocab=vocab)
    return build_sealed_segment(docs), HybridEngine(
        build_sealed_segment(docs), **kw
    )


def test_default_search_never_builds_blockmax(rng):
    docs = make_docs(rng, 150, vocab=8)
    seg = build_sealed_segment(docs)
    h = HybridEngine(seg)  # heavy_mode auto -> exact
    queries = [
        Query.from_int_ids(rng.integers(0, 8, size=3).tolist())
        for _ in range(8)
    ] + [Query.from_int_ids([999999]), Query(keys=np.zeros(0, dtype="S16"))]
    h.search(queries, 5)
    assert h._blockmax is None  # pruned arrays never uploaded


def test_memory_report_does_not_construct(rng):
    docs = make_docs(rng, 80, vocab=6)
    seg = build_sealed_segment(docs)
    h = HybridEngine(seg)
    rep = h.memory_report()
    assert rep.get("projected") is True
    assert h._exact is None and h._blockmax is None
    # After a search the report reflects the real upload.
    h.search([Query.from_int_ids([1])], 3)
    rep2 = h.memory_report()
    assert "projected" not in rep2
    # The projection matched the real dense upload exactly.
    assert rep["total"] == rep2["total"]


def test_pruned_mode_builds_blockmax_on_demand(rng):
    docs = make_docs(rng, 100, vocab=4)  # tiny vocab -> heavy queries
    seg = build_sealed_segment(docs)
    h = HybridEngine(seg, heavy_mode="pruned")
    h.search([Query.from_int_ids([0, 1])], 5)
    assert h._blockmax is not None


def test_set_deleted_before_lazy_build_applies(rng):
    docs = make_docs(rng, 60, vocab=4)
    seg = build_sealed_segment(docs)
    h = HybridEngine(seg, heavy_mode="pruned")
    deleted = np.zeros(len(docs), dtype=bool)
    deleted[:30] = True
    h.set_deleted(deleted)  # neither engine constructed yet
    s, ids, _ = h.search([Query.from_int_ids([0, 1, 2])], 10)
    for d in ids[0][ids[0] >= 0]:
        assert not deleted[d]


def test_batch_lookup_matches_per_query(rng):
    docs = make_docs(rng, 90, vocab=12)
    seg = build_sealed_segment(docs)
    queries = [
        Query.from_int_ids(rng.integers(0, 20, size=4).tolist())
        for _ in range(9)
    ] + [Query(keys=np.zeros(0, dtype="S16"))]
    ids, qidx = batch_lookup(seg.lookup_tokens, queries)
    for qi, q in enumerate(queries):
        expect = seg.lookup_tokens(q.keys)
        expect = expect[expect >= 0]
        got = ids[qidx == qi]
        np.testing.assert_array_equal(np.sort(got), np.sort(expect))


def test_group_positions():
    np.testing.assert_array_equal(
        group_positions(np.array([3, 0, 2])), [0, 1, 2, 0, 1]
    )
    assert group_positions(np.array([], dtype=np.int64)).size == 0
