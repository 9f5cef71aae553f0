"""Sparse (sort + segmented-sum) exact strategy vs the dense path.

strategy="sparse" must reproduce the dense engine's results exactly up
to f32 accumulation-order ulps: same hit sets, same ranks up to exact
score ties, deletes and filter masks honored, pads handled.
"""

import numpy as np
import pytest

from vectorchord_bm25_tpu.index.sealed import build_sealed_segment
from vectorchord_bm25_tpu.search.exact import ExactEngine, oracle_topk
from vectorchord_bm25_tpu.text.intern import Document, Query

from test_sealed import make_docs


def _engines(seg):
    return ExactEngine(seg, strategy="dense"), ExactEngine(
        seg, strategy="sparse"
    )


def _assert_parity(seg, dense, sparse, queries, k):
    s_d, i_d, p_d = dense.search(queries, k)
    s_s, i_s, p_s = sparse.search(queries, k)
    np.testing.assert_array_equal(i_s >= 0, i_d >= 0)
    np.testing.assert_allclose(s_s, s_d, rtol=1e-5, atol=1e-6)
    for qi in range(len(queries)):
        for j in range(k):
            if i_s[qi, j] != i_d[qi, j] and i_d[qi, j] >= 0:
                # only exact f32 ties may reorder
                assert abs(s_s[qi, j] - s_d[qi, j]) <= 1e-6 * abs(
                    s_d[qi, j]
                ), (qi, j, i_s[qi, j], i_d[qi, j])


@pytest.mark.parametrize("n_docs,vocab,terms", [(200, 12, 3), (500, 40, 6)])
def test_sparse_matches_dense(rng, n_docs, vocab, terms):
    docs = make_docs(rng, n_docs, vocab=vocab)
    seg = build_sealed_segment(docs)
    dense, sparse = _engines(seg)
    queries = [
        Query.from_int_ids(rng.integers(0, vocab, size=terms).tolist())
        for _ in range(16)
    ]
    _assert_parity(seg, dense, sparse, queries, 10)


def test_sparse_heavy_duplicate_docs(rng):
    # Every doc matches every query term: maximal segment lengths.
    docs = [
        Document.from_int_ids([0, 1, 2, 3, 4, 5, 6, 7] * (1 + i % 3))
        for i in range(64)
    ]
    seg = build_sealed_segment(docs)
    dense, sparse = _engines(seg)
    queries = [Query.from_int_ids([0, 1, 2, 3, 4, 5, 6, 7])]
    _assert_parity(seg, dense, sparse, queries, 20)


def test_sparse_missing_and_empty_queries(rng):
    docs = make_docs(rng, 50, vocab=8)
    seg = build_sealed_segment(docs)
    _, sparse = _engines(seg)
    s, i, p = sparse.search(
        [Query.from_int_ids([999999]), Query(keys=np.zeros(0, dtype="S16"))], 5
    )
    assert np.all(i == -1)
    assert np.all(p == -1)


def test_sparse_deleted_and_filter(rng):
    docs = make_docs(rng, 120, vocab=6)
    seg = build_sealed_segment(docs)
    dense, sparse = _engines(seg)
    deleted = np.zeros(len(docs), dtype=bool)
    deleted[rng.integers(0, len(docs), size=30)] = True
    dense.set_deleted(deleted)
    sparse.set_deleted(deleted)
    fmask = rng.random(len(docs)) < 0.5
    queries = [
        Query.from_int_ids(rng.integers(0, 6, size=3).tolist())
        for _ in range(8)
    ]
    s_d, i_d, _ = dense.search(queries, 10, filter_mask=fmask)
    s_s, i_s, _ = sparse.search(queries, 10, filter_mask=fmask)
    np.testing.assert_allclose(s_s, s_d, rtol=1e-5, atol=1e-6)
    live = ~deleted & fmask
    for qi in range(len(queries)):
        for d in i_s[qi][i_s[qi] >= 0]:
            assert live[d]


def test_sparse_vs_oracle_ranks(rng):
    docs = make_docs(rng, 300, vocab=25)
    seg = build_sealed_segment(docs)
    _, sparse = _engines(seg)
    queries = [
        Query.from_int_ids(rng.integers(0, 25, size=4).tolist())
        for _ in range(12)
    ]
    scores, ids, _ = sparse.search(queries, 10)
    for qi, q in enumerate(queries):
        o_scores, o_ids = oracle_topk(seg, q, 10)
        got = ids[qi][ids[qi] >= 0]
        assert len(got) == len(o_ids)
        for j, (g, e) in enumerate(zip(got, o_ids)):
            if g != e:
                assert abs(scores[qi][j] - o_scores[j]) < 1e-4


def test_sparse_single_term_no_steps(rng):
    docs = make_docs(rng, 80, vocab=5)
    seg = build_sealed_segment(docs)
    dense, sparse = _engines(seg)
    _assert_parity(seg, dense, sparse, [Query.from_int_ids([2])], 10)


def test_auto_strategy_threshold(rng):
    docs = make_docs(rng, 30, vocab=5)
    seg = build_sealed_segment(docs)
    eng = ExactEngine(seg)  # auto
    assert eng.strategy == "auto"
    # Small corpus: auto stays dense (SPARSE_MIN_DOCS is ~1M); search
    # still works end to end.
    s, i, _ = eng.search([Query.from_int_ids([1, 2])], 5)
    assert s.shape == (1, 5)
