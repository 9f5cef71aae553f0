"""Hybrid router correctness: identical results to the exact engine."""

import numpy as np

from vectorchord_bm25_tpu.index.sealed import build_sealed_segment
from vectorchord_bm25_tpu.search.exact import ExactEngine
from vectorchord_bm25_tpu.search.hybrid import HybridEngine
from vectorchord_bm25_tpu.text.intern import Document, Query

from test_exact import rank_match
from test_sealed import make_docs


def test_hybrid_matches_exact(rng):
    # Corpus with a very common term (0) and rare ones so the router
    # actually splits the batch.
    docs = make_docs(rng, 400, vocab=40)
    for i in range(0, 400, 2):
        docs[i] = Document.from_int_ids(
            [0] + rng.integers(1, 40, size=5).tolist()
        )
    # A few docs carry genuinely rare terms.
    docs[3] = Document.from_int_ids([1000, 1001])
    docs[7] = Document.from_int_ids([1000, 2])
    seg = build_sealed_segment(docs)
    exact = ExactEngine(seg)
    hybrid = HybridEngine(seg, route_threshold=0.10, chunk=8)

    queries = [
        Query.from_int_ids([0]),  # heavy: df ~ half the corpus
        Query.from_int_ids([0, 17]),  # heavy
        Query.from_int_ids([1000]),  # light: df = 2 -> one-shot
        Query.from_int_ids([1000, 1001]),  # light -> one-shot
    ]
    strategy, ranges = hybrid._route(queries)
    # Heavy queries take the iterative pruned path; selective ones don't.
    assert strategy.tolist()[:2] == [2, 2]
    assert all(s != 2 for s in strategy.tolist()[2:])
    # With a forced one-shot cap, selective queries one-shot instead, and
    # results are identical.
    hybrid_os = HybridEngine(seg, route_threshold=0.10, oneshot_cap=64)
    strategy2, _ = hybrid_os._route(queries)
    assert strategy2.tolist()[2:] == [0, 0]
    s1_, i1, p1 = hybrid_os.search(queries, 15)
    s0_, i0, p0 = hybrid.search(queries, 15)
    np.testing.assert_array_equal(i0, i1)

    s1_, i1, p1 = exact.search(queries, 15)
    s2_, i2, p2 = hybrid.search(queries, 15)
    for qi in range(len(queries)):
        g1, g2 = i1[qi][i1[qi] >= 0], i2[qi][i2[qi] >= 0]
        assert len(g1) == len(g2)
        rank_match(g2, g1, s2_[qi][: len(g2)], s1_[qi][: len(g1)])


def test_hybrid_deletes_and_filter(rng):
    docs = make_docs(rng, 100, vocab=6)
    seg = build_sealed_segment(docs)
    hybrid = HybridEngine(seg, route_threshold=0.01, chunk=4)  # all heavy
    exact = ExactEngine(seg)
    deleted = np.zeros(100, dtype=bool)
    deleted[:30] = True
    hybrid.set_deleted(deleted)
    exact.set_deleted(deleted)
    mask = np.zeros(100, dtype=bool)
    mask[40:] = True
    q = [Query.from_int_ids([0, 1])]
    s1_, i1, _ = exact.search(q, 10, filter_mask=mask)
    s2_, i2, _ = hybrid.search(q, 10, filter_mask=mask)
    g1, g2 = i1[0][i1[0] >= 0], i2[0][i2[0] >= 0]
    assert len(g1) == len(g2)
    rank_match(g2, g1, s2_[0][: len(g2)], s1_[0][: len(g1)])
