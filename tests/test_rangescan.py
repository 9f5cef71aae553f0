"""Exhaustive range-scan path (heavy-query strategy) vs the dense oracle.

search_rangescan_async must reproduce ExactEngine results exactly up to
f32 ulps — it is an exhaustive scorer, no pruning involved.
"""

import numpy as np
import pytest

from vectorchord_bm25_tpu.index.sealed import build_sealed_segment
from vectorchord_bm25_tpu.search.blockmax import BlockMaxEngine
from vectorchord_bm25_tpu.search.exact import ExactEngine
from vectorchord_bm25_tpu.search.hybrid import HybridEngine
from vectorchord_bm25_tpu.text.intern import Document, Query

from test_sealed import make_docs


def _parity(dense, fin, queries, k):
    s_d, i_d, p_d = dense.search(queries, k)
    s_r, i_r, p_r = fin()
    np.testing.assert_array_equal(i_r >= 0, i_d >= 0)
    np.testing.assert_allclose(s_r, s_d, rtol=1e-5, atol=1e-6)
    for qi in range(len(queries)):
        for j in range(k):
            if i_r[qi, j] != i_d[qi, j] and i_d[qi, j] >= 0:
                assert abs(s_r[qi, j] - s_d[qi, j]) <= 1e-6 * max(
                    1e-9, abs(s_d[qi, j])
                )
    np.testing.assert_array_equal(p_r >= 0, p_d >= 0)


@pytest.mark.parametrize("n_docs,vocab", [(300, 8), (900, 30)])
def test_rangescan_matches_dense(rng, n_docs, vocab):
    docs = make_docs(rng, n_docs, vocab=vocab)
    seg = build_sealed_segment(docs)
    dense = ExactEngine(seg, strategy="dense")
    bm = BlockMaxEngine(seg)  # CPU: use_pallas False -> XLA scatter path
    queries = [
        Query.from_int_ids(rng.integers(0, vocab, size=3).tolist())
        for _ in range(12)
    ]
    _parity(dense, bm.search_rangescan_async(queries, 10), queries, 10)


def test_rangescan_pallas_interpret(rng):
    docs = make_docs(rng, 200, vocab=6)
    seg = build_sealed_segment(docs)
    dense = ExactEngine(seg, strategy="dense")
    bm = BlockMaxEngine(seg, use_pallas="interpret")
    queries = [Query.from_int_ids([0, 1, 2]), Query.from_int_ids([3, 4])]
    _parity(dense, bm.search_rangescan_async(queries, 8), queries, 8)


def test_rangescan_filter_and_deleted(rng):
    docs = make_docs(rng, 250, vocab=6)
    seg = build_sealed_segment(docs)
    dense = ExactEngine(seg, strategy="dense")
    bm = BlockMaxEngine(seg)
    deleted = np.zeros(len(docs), dtype=bool)
    deleted[rng.integers(0, len(docs), size=60)] = True
    dense.set_deleted(deleted)
    bm.set_deleted(deleted)
    fmask = rng.random(len(docs)) < 0.5
    queries = [
        Query.from_int_ids(rng.integers(0, 6, size=3).tolist())
        for _ in range(6)
    ]
    s_d, i_d, _ = dense.search(queries, 10, filter_mask=fmask)
    s_r, i_r, _ = bm.search_rangescan_async(queries, 10, fmask)()
    np.testing.assert_allclose(s_r, s_d, rtol=1e-5, atol=1e-6)
    live = ~deleted & fmask
    for qi in range(len(queries)):
        for d in i_r[qi][i_r[qi] >= 0]:
            assert live[d]


def test_rangescan_missing_terms_and_empty(rng):
    docs = make_docs(rng, 100, vocab=5)
    seg = build_sealed_segment(docs)
    bm = BlockMaxEngine(seg)
    s, i, p = bm.search_rangescan_async(
        [Query.from_int_ids([99999]), Query(keys=np.zeros(0, dtype="S16"))], 5
    )()
    assert np.all(i == -1)
    assert np.all(p == -1)


def test_rangescan_rejects_tf_mode(rng):
    docs = make_docs(rng, 60, vocab=5)
    seg = build_sealed_segment(docs)
    bm = BlockMaxEngine(seg, posting_mode="tf")
    with pytest.raises(ValueError, match="impact"):
        bm.search_rangescan_async([Query.from_int_ids([1])], 5)


def test_hybrid_heavy_mode_rangescan(rng):
    # Force rangescan for the heavy group and compare whole-batch output
    # against a pruned-mode hybrid.
    docs = make_docs(rng, 400, vocab=5)  # tiny vocab => heavy queries
    seg = build_sealed_segment(docs)
    h_pruned = HybridEngine(seg, heavy_mode="pruned")
    queries = [
        Query.from_int_ids(rng.integers(0, 5, size=3).tolist())
        for _ in range(10)
    ]
    s_p, i_p, _ = h_pruned.search(queries, 10)
    for mode in ("rangescan", "exact"):
        h = HybridEngine(seg, heavy_mode=mode)
        s_m, i_m, _ = h.search(queries, 10)
        np.testing.assert_allclose(s_m, s_p, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(i_m >= 0, i_p >= 0)
