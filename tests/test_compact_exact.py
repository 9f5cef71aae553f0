"""Equal-index-memory mode: compact exact engine + memory parity.

The compact exact engine reads the range index's 5 B/posting flat
impact/local streams (the byte-packed analog of the reference's
compressed block reads, search.rs:498-518) and must return exactly the
dense engine's results.  Memory reports must show the compact form at or
under the reference's block-format budget (compression.rs:36-136).
"""

import numpy as np
import pytest

from vectorchord_bm25_tpu.index.sealed import build_sealed_segment
from vectorchord_bm25_tpu.search.blockmax import BlockMaxEngine
from vectorchord_bm25_tpu.search.exact import ExactEngine
from vectorchord_bm25_tpu.search.hybrid import HybridEngine
from vectorchord_bm25_tpu.text.intern import Document, Query
from vectorchord_bm25_tpu.utils.memparity import (
    memory_parity_report,
    reference_format_bytes,
)

from test_exact import rank_match
from test_sealed import make_docs


class TestCompactExact:
    @pytest.mark.parametrize("n_docs,vocab", [(200, 20), (500, 8), (64, 100)])
    def test_matches_dense_engine(self, rng, n_docs, vocab):
        docs = make_docs(rng, n_docs, vocab=vocab)
        seg = build_sealed_segment(docs)
        dense = ExactEngine(seg)
        compact = ExactEngine(seg, compact=True)
        queries = [
            Query.from_int_ids(rng.integers(0, vocab, size=3).tolist())
            for _ in range(6)
        ]
        for k in (1, 10):
            s1_, i1, p1 = dense.search(queries, k)
            s2_, i2, p2 = compact.search(queries, k)
            for qi in range(len(queries)):
                g1 = i1[qi][i1[qi] >= 0]
                g2 = i2[qi][i2[qi] >= 0]
                assert len(g1) == len(g2), f"q{qi} k={k}"
                rank_match(g2, g1, s2_[qi][: len(g2)], s1_[qi][: len(g1)])
                np.testing.assert_allclose(
                    s2_[qi][: len(g2)], s1_[qi][: len(g1)], rtol=1e-5
                )

    def test_deletes_and_filters(self, rng):
        docs = make_docs(rng, 300, vocab=15)
        seg = build_sealed_segment(docs)
        dense = ExactEngine(seg)
        compact = ExactEngine(seg, compact=True)
        deleted = rng.random(300) < 0.3
        dense.set_deleted(deleted)
        compact.set_deleted(deleted)
        fmask = rng.random(300) < 0.5
        queries = [
            Query.from_int_ids(rng.integers(0, 15, size=4).tolist())
            for _ in range(4)
        ]
        s1_, i1, _ = dense.search(queries, 10, filter_mask=fmask)
        s2_, i2, _ = compact.search(queries, 10, filter_mask=fmask)
        np.testing.assert_array_equal(i1 >= 0, i2 >= 0)
        for qi in range(len(queries)):
            g = i1[qi] >= 0
            rank_match(i2[qi][g], i1[qi][g], s2_[qi][g], s1_[qi][g])

    def test_share_from_blockmax(self, rng):
        docs = make_docs(rng, 200, vocab=12)
        seg = build_sealed_segment(docs)
        bm = BlockMaxEngine(seg)
        shared = ExactEngine(seg, share=bm)
        assert shared.dev is bm.dev
        assert shared.dev_post_impact is bm.dev_post_impact
        standalone = ExactEngine(seg)
        queries = [
            Query.from_int_ids(rng.integers(0, 12, size=3).tolist())
            for _ in range(4)
        ]
        s1_, i1, _ = standalone.search(queries, 10)
        s2_, i2, _ = shared.search(queries, 10)
        np.testing.assert_array_equal(i1 >= 0, i2 >= 0)
        for qi in range(len(queries)):
            g = i1[qi] >= 0
            rank_match(i2[qi][g], i1[qi][g], s2_[qi][g], s1_[qi][g])

    def test_share_wrong_segment_errors(self, rng):
        docs = make_docs(rng, 50, vocab=6)
        seg_a = build_sealed_segment(docs)
        seg_b = build_sealed_segment(docs)
        bm = BlockMaxEngine(seg_a)
        with pytest.raises(ValueError, match="same sealed segment"):
            ExactEngine(seg_b, share=bm)

    def test_hybrid_shares_one_copy(self, rng):
        docs = make_docs(rng, 400, vocab=10)
        seg = build_sealed_segment(docs)
        hyb = HybridEngine(
            seg, route_threshold=100.0, memory_mode="compact"
        )  # force dense route, shared arrays
        queries = [
            Query.from_int_ids(rng.integers(0, 10, size=3).tolist())
            for _ in range(4)
        ]
        s, i, p = hyb.search(queries, 10)
        assert hyb._exact is not None, "dense route should have been taken"
        assert hyb._exact.dev is hyb.blockmax.dev
        # Delete mask set once propagates to both strategies.
        deleted = np.zeros(400, dtype=bool)
        live_ids = i[0][i[0] >= 0]
        assert live_ids.size
        deleted[live_ids[0]] = True
        hyb.set_deleted(deleted)
        s2, i2, _ = hyb.search(queries, 10)
        assert live_ids[0] not in set(i2[0].tolist())
        bm = BlockMaxEngine(seg)
        bm.set_deleted(deleted)
        s3, i3, _ = bm.search(queries, 10)
        np.testing.assert_array_equal(i2 >= 0, i3 >= 0)


class TestMemoryParity:
    def test_reference_format_tiny(self):
        # One doc {term: tf=1}: one partial block; doc delta from min = 0
        # (0 bits -> 0 bytes), tf = 1 (1 bit -> 1 byte), + 2 metadata
        # bytes; 24 B summary, 32 B token, 8 B document.
        doc = Document.from_int_ids([7])
        seg = build_sealed_segment([doc])
        ref = reference_format_bytes(seg)
        assert ref["blocks"] == 3
        assert ref["summaries"] == 24
        assert ref["tokens"] == 32
        assert ref["documents"] == 8
        assert ref["total"] == 67
        assert ref["postings"] == 1

    def test_compact_beats_dense_and_tracks_reference(self, rng):
        docs = make_docs(rng, 2000, vocab=50)
        seg = build_sealed_segment(docs)
        dense = ExactEngine(seg)
        compact = ExactEngine(seg, compact=True)
        d_rep = dense.memory_report()
        c_rep = compact.memory_report()
        assert c_rep["total"] < d_rep["total"]
        # Flat form: 5 B/posting + group metadata.
        assert c_rep["bytes_per_posting"] < 8.0
        ref = reference_format_bytes(seg)
        assert ref["total"] > 0
        parity = memory_parity_report(compact, seg)
        assert parity["device_bytes"] == c_rep["total"]
        assert parity["reference_bytes"] == ref["total"]
        assert parity["ratio_vs_reference"] > 0

    def test_engines_all_report(self, rng):
        docs = make_docs(rng, 300, vocab=20)
        seg = build_sealed_segment(docs)
        for engine in (
            ExactEngine(seg),
            ExactEngine(seg, compact=True),
            BlockMaxEngine(seg),
            HybridEngine(seg),
        ):
            rep = engine.memory_report()
            assert rep["total"] > 0
            assert rep["bytes_per_posting"] > 0
