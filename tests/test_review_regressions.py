"""Regression tests for self-review findings."""

import numpy as np
import pytest

from vectorchord_bm25_tpu.index.ranges import build_range_index
from vectorchord_bm25_tpu.index.sealed import (
    build_sealed_segment,
    build_sealed_segment_from_postings,
)
from vectorchord_bm25_tpu.search.blockmax import BlockMaxEngine
from vectorchord_bm25_tpu.search.exact import ExactEngine
from vectorchord_bm25_tpu.search.hybrid import HybridEngine
from vectorchord_bm25_tpu.text.intern import Document, Query


def test_k_exceeds_n_docs_pads_to_contract():
    # kk clamps to n_docs inside the kernel; the finalize must pad back
    # to [Q, k] (crashed HybridEngine.finalize before).
    docs = [Document.from_int_ids([1]) for _ in range(5)]
    seg = build_sealed_segment(docs)
    for engine in (ExactEngine(seg), BlockMaxEngine(seg), HybridEngine(seg)):
        s, i, p = engine.search([Query.from_int_ids([1])], 10)
        assert s.shape == (1, 10) and i.shape == (1, 10)
        assert (i[0] >= 0).sum() == 5
        assert np.all(i[0][5:] == -1)


def test_blockmax_tie_rule_across_ranges():
    # Identical scores in different ranges where the higher-doc range has
    # the larger upper bound: the merge must still break ties doc-asc.
    docs = [Document.from_int_ids([7]) for _ in range(6)]
    docs.append(Document.from_int_ids([7, 7]))  # raises the later range's ub
    seg = build_sealed_segment(docs)
    ri = build_range_index(seg, range_size=4)
    v1 = ExactEngine(seg)
    v2 = BlockMaxEngine(seg, ri, chunk=1)
    q = [Query.from_int_ids([7])]
    _, i1, _ = v1.search(q, 3)
    _, i2, _ = v2.search(q, 3)
    assert i1[0].tolist() == i2[0].tolist()


def test_doc_grouped_fallback_on_unordered_groups():
    # doc_grouped=True with non-ascending doc groups must not silently
    # corrupt the index (the builder falls back to the full lexsort).
    keys = np.asarray([b"a", b"a", b"b"], dtype="S16")
    docs = np.asarray([5, 2, 5], dtype=np.int64)
    tfs = np.asarray([1, 2, 3], dtype=np.int64)
    seg = build_sealed_segment_from_postings(
        keys, docs, tfs, 10, doc_grouped=True
    )
    tok, doc, tfv = seg.postings()
    # (key, doc) sorted: a@2, a@5, b@5.
    assert doc.tolist() == [2, 5, 5]
    assert tfv.tolist() == [2, 1, 3]
    blocks = seg.token_blocks(0)
    assert int(seg.block_min_doc[blocks[0]]) == 2
    assert int(seg.block_max_doc[blocks[0]]) == 5


def test_memory_report_counts_engine_uploads():
    docs = [Document.from_int_ids([1, 2, 3]) for _ in range(50)]
    seg = build_sealed_segment(docs)
    eng = BlockMaxEngine(seg)
    rep = eng.memory_report()
    ri = eng.ranges
    assert rep["postings"] == ri.post_impact.nbytes + ri.post_local.nbytes
    assert rep["total"] == (
        rep["postings"] + rep["range_meta"] + rep["token_csr"]
        + rep["doc_tables"]
    )


def test_throttle_large_thread_safe():
    # _large_inflight is shared mutable state reachable from concurrent
    # readers (searches hold the RW lock shared). The old
    # len-check-then-popleft had no mutex: threads could both pass the
    # check, drain the deque, and raise IndexError from popleft on
    # empty. Hammer it from many threads and assert no exceptions and a
    # bounded in-flight set.
    import threading

    from vectorchord_bm25_tpu.search import exact as exact_mod

    errors = []
    big = exact_mod._LARGE_DISPATCH_BYTES + 1

    class FakeOut:
        def block_until_ready(self):
            return self

    def worker():
        try:
            for _ in range(300):
                exact_mod._throttle_large(FakeOut(), big)
                assert len(exact_mod._large_inflight) <= 2 + 8
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    with exact_mod._large_inflight_mu:
        exact_mod._large_inflight.clear()
