"""Prefilter vs post-filter semantics (the reference's prefilter reloption,
tests/sqllogictest/prefilter.slt behavior)."""

import numpy as np

from vectorchord_bm25_tpu.index.bm25index import Bm25Index
from vectorchord_bm25_tpu.text.intern import Document, Query
from vectorchord_bm25_tpu.utils.options import SearchOptions, SessionConfig

from test_sealed import make_docs


def test_prefilter_keeps_threshold_honest(rng):
    # Corpus where the best-scoring docs fail the filter: prefilter must
    # surface k *matching* docs; post-filter returns fewer.
    docs = []
    for i in range(100):
        # Even docs: short (high score); odd docs: long (low score).
        extra = [] if i % 2 == 0 else rng.integers(10, 50, size=30).tolist()
        docs.append(Document.from_int_ids([0] + extra))
    q = Query.from_int_ids([0])
    only_odd = lambda p: p % 2 == 1

    pre = Bm25Index.build(
        docs, search_options=SearchOptions(prefilter=True)
    )
    hits_pre = pre.search(q, k=10, filter_fn=only_odd)
    assert len(hits_pre) == 10
    assert all(h.payload % 2 == 1 for h in hits_pre)

    post = Bm25Index.build(
        docs, search_options=SearchOptions(prefilter=False)
    )
    hits_post = post.search(q, k=10, filter_fn=only_odd)
    # All top-10 unfiltered hits are even (short) docs -> all filtered out.
    assert len(hits_post) == 0


def test_enable_scan_off_uses_brute_force(rng):
    # bm25.enable_scan = off routes through the exact brute-force path;
    # results match the index scan up to float ties.
    docs = make_docs(rng, 80, vocab=6)
    index = Bm25Index.build(docs)
    q = Query.from_int_ids([0, 1])
    on = index.search(q, k=10)
    off = index.search(q, k=10, session=SessionConfig(enable_scan=False))
    assert {h.payload for h in on} == {h.payload for h in off}
    for a, b in zip(on, off):
        assert abs(a.score - b.score) < 1e-4


def test_session_override(rng):
    docs = make_docs(rng, 50, vocab=4)
    index = Bm25Index.build(
        docs, search_options=SearchOptions(prefilter=False)
    )
    q = Query.from_int_ids([0])
    session = SessionConfig(prefilter=True)
    hits = index.search(q, k=5, filter_fn=lambda p: p >= 25, session=session)
    assert all(h.payload >= 25 for h in hits)
