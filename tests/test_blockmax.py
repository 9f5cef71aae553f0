"""Engine v2 (Block-Max pruned) must return exactly engine v1's results.

The sealed-only index-vs-oracle parity check (SURVEY.md §7 M3): pruning is
conservative, so ranks and scores must match the exact engine bit-for-bit
up to float ties.
"""

import numpy as np
import pytest

from vectorchord_bm25_tpu.index.ranges import build_range_index
from vectorchord_bm25_tpu.index.sealed import build_sealed_segment
from vectorchord_bm25_tpu.search.blockmax import BlockMaxEngine
from vectorchord_bm25_tpu.search.exact import ExactEngine
from vectorchord_bm25_tpu.text.intern import Document, Query

from test_exact import rank_match
from test_sealed import make_docs


class TestRangeIndex:
    def test_structure(self, rng):
        docs = make_docs(rng, 300, vocab=10)
        seg = build_sealed_segment(docs)
        ri = build_range_index(seg, range_size=64)
        assert ri.n_ranges == -(-300 // 64)
        # Every (term, range) group: postings within the range, ub is max.
        tok, doc, tfv = seg.postings()
        for g in range(ri.tr_range.size):
            lo, n = int(ri.tr_start[g]), int(ri.tr_len[g])
            r = int(ri.tr_range[g])
            span_docs = ri.post_docid[lo : lo + n]
            assert np.all(span_docs // 64 == r)
            assert np.all(np.diff(span_docs) > 0)
        # CSR covers all groups.
        assert ri.token_tr_start[-1] == ri.tr_range.size

    def test_ub_is_upper_bound(self, rng):
        docs = make_docs(rng, 200, vocab=8)
        seg = build_sealed_segment(docs)
        ri = build_range_index(seg)
        tables = seg.score_tables()
        s0 = seg.token_s0()
        tok, doc, tfv = seg.postings()
        group = np.searchsorted(ri.tr_start, np.arange(tok.size), side="right") - 1
        fn = seg.doc_fieldnorm[doc].astype(np.int64)
        t32 = tfv.astype(np.float32)
        s0f = s0.astype(np.float32)
        s1f = tables.s1_table.astype(np.float32)
        scores32 = (t32 * s0f[tok]) / (t32 + s1f[fn])
        assert np.all(scores32 <= ri.tr_ub[group] + 1e-12)


class TestBlockMaxEngine:
    @pytest.mark.parametrize(
        "n_docs,vocab,range_size",
        [(200, 20, 64), (500, 8, 128), (64, 100, 32), (1000, 30, 128)],
    )
    def test_matches_exact_engine(self, rng, n_docs, vocab, range_size):
        docs = make_docs(rng, n_docs, vocab=vocab)
        seg = build_sealed_segment(docs)
        ri = build_range_index(seg, range_size=range_size)
        v1 = ExactEngine(seg)
        v2 = BlockMaxEngine(seg, ri, chunk=4)
        queries = [
            Query.from_int_ids(rng.integers(0, vocab, size=3).tolist())
            for _ in range(6)
        ]
        for k in (1, 10):
            s1_, i1, p1 = v1.search(queries, k)
            s2_, i2, p2 = v2.search(queries, k)
            for qi in range(len(queries)):
                g1 = i1[qi][i1[qi] >= 0]
                g2 = i2[qi][i2[qi] >= 0]
                assert len(g1) == len(g2), f"q{qi} k={k}"
                rank_match(g2, g1, s2_[qi][: len(g2)], s1_[qi][: len(g1)])
                np.testing.assert_allclose(
                    s2_[qi][: len(g2)], s1_[qi][: len(g1)], rtol=1e-5
                )

    def test_pruning_skips_work(self, rng):
        # Skewed corpus: one rare high-idf term; most ranges should be
        # skipped for a rare-term query.
        docs = make_docs(rng, 2000, vocab=5)
        docs[37] = Document.from_int_ids([0, 999])  # rare term 999
        seg = build_sealed_segment(docs)
        ri = build_range_index(seg, range_size=64)
        v2 = BlockMaxEngine(seg, ri, chunk=2)
        v2.search([Query.from_int_ids([999])], 5)
        total_chunks = -(-ri.n_ranges // 2)
        assert v2.last_rounds < total_chunks / 2, (
            f"rounds {v2.last_rounds} vs {total_chunks} chunks"
        )

    def test_deleted_and_filter(self, rng):
        docs = make_docs(rng, 300, vocab=6)
        seg = build_sealed_segment(docs)
        v1 = ExactEngine(seg)
        v2 = BlockMaxEngine(seg)
        deleted = np.zeros(300, dtype=bool)
        deleted[::2] = True
        v1.set_deleted(deleted)
        v2.set_deleted(deleted)
        mask = np.zeros(300, dtype=bool)
        mask[100:] = True
        q = [Query.from_int_ids([0, 1])]
        s1_, i1, _ = v1.search(q, 15, filter_mask=mask)
        s2_, i2, _ = v2.search(q, 15, filter_mask=mask)
        g1, g2 = i1[0][i1[0] >= 0], i2[0][i2[0] >= 0]
        assert len(g1) == len(g2)
        rank_match(g2, g1, s2_[0][: len(g2)], s1_[0][: len(g1)])

    def test_pallas_path_matches(self, rng):
        # The fused Pallas kernel path (interpret mode on CPU) must agree
        # with the XLA path and the exact engine.
        docs = make_docs(rng, 300, vocab=12)
        seg = build_sealed_segment(docs)
        ri = build_range_index(seg, range_size=128)
        v1 = ExactEngine(seg)
        v2p = BlockMaxEngine(seg, ri, chunk=4, use_pallas="interpret")
        queries = [
            Query.from_int_ids(rng.integers(0, 12, size=3).tolist())
            for _ in range(3)
        ]
        s1_, i1, _ = v1.search(queries, 10)
        s2_, i2, _ = v2p.search(queries, 10)
        for qi in range(len(queries)):
            g1, g2 = i1[qi][i1[qi] >= 0], i2[qi][i2[qi] >= 0]
            assert len(g1) == len(g2)
            rank_match(g2, g1, s2_[qi][: len(g2)], s1_[qi][: len(g1)])

    def test_missing_and_empty(self, rng):
        docs = make_docs(rng, 50, vocab=5)
        seg = build_sealed_segment(docs)
        v2 = BlockMaxEngine(seg)
        s, i, p = v2.search([Query.from_int_ids([999999])], 5)
        assert np.all(i == -1)
        with pytest.raises(ValueError):
            v2.search([Query.from_int_ids([0])], 0)

    def test_multiblock_terms(self, rng):
        # Terms spanning many ranges with multi-posting ranges.
        docs = make_docs(rng, 600, vocab=3, max_len=8)
        seg = build_sealed_segment(docs)
        v1 = ExactEngine(seg)
        v2 = BlockMaxEngine(seg, build_range_index(seg, range_size=32), chunk=8)
        q = [Query.from_int_ids([0, 1, 2])]
        s1_, i1, _ = v1.search(q, 25)
        s2_, i2, _ = v2.search(q, 25)
        g1, g2 = i1[0][i1[0] >= 0], i2[0][i2[0] >= 0]
        assert len(g1) == len(g2)
        rank_match(g2, g1, s2_[0][: len(g2)], s1_[0][: len(g1)])


class TestTfPostingMode:
    """posting_mode="tf": 2 B/posting lossless form — impacts rebuilt on
    device from (tf, fieldnorm), matching the reference's per-posting
    Cache.evaluate (bm25.rs:334-359)."""

    @pytest.mark.parametrize("n_docs,vocab", [(300, 20), (500, 8)])
    def test_matches_impact_mode(self, rng, n_docs, vocab):
        docs = make_docs(rng, n_docs, vocab=vocab)
        seg = build_sealed_segment(docs)
        imp = BlockMaxEngine(seg, chunk=4)
        tfm = BlockMaxEngine(seg, chunk=4, posting_mode="tf")
        queries = [
            Query.from_int_ids(rng.integers(0, vocab, size=3).tolist())
            for _ in range(6)
        ]
        for k in (1, 10):
            s1_, i1, _ = imp.search(queries, k)
            s2_, i2, _ = tfm.search(queries, k)
            for qi in range(len(queries)):
                g1 = i1[qi][i1[qi] >= 0]
                g2 = i2[qi][i2[qi] >= 0]
                assert len(g1) == len(g2), f"q{qi} k={k}"
                rank_match(g2, g1, s2_[qi][: len(g2)], s1_[qi][: len(g1)])
                np.testing.assert_allclose(
                    s2_[qi][: len(g2)], s1_[qi][: len(g1)], rtol=1e-5
                )

    def test_deletes_and_filters(self, rng):
        docs = make_docs(rng, 200, vocab=10)
        seg = build_sealed_segment(docs)
        imp = BlockMaxEngine(seg)
        tfm = BlockMaxEngine(seg, posting_mode="tf")
        deleted = rng.random(200) < 0.25
        imp.set_deleted(deleted)
        tfm.set_deleted(deleted)
        fmask = rng.random(200) < 0.5
        queries = [Query.from_int_ids([0, 1, 2])]
        s1_, i1, _ = imp.search(queries, 10, filter_mask=fmask)
        s2_, i2, _ = tfm.search(queries, 10, filter_mask=fmask)
        np.testing.assert_array_equal(i1 >= 0, i2 >= 0)
        rank_match(i2[0], i1[0], s2_[0], s1_[0])

    def test_u16_fallback_when_tf_overflows_u8(self):
        from vectorchord_bm25_tpu.text.intern import Document

        def doc(pairs):
            return Document(
                keys=np.asarray([k for k, _ in pairs], dtype="S16"),
                values=np.asarray([v for _, v in pairs], dtype=np.uint32),
            )

        docs = [
            doc([(b"aaa", 300), (b"bbb", 2)]),
            doc([(b"aaa", 1)]),
            doc([(b"bbb", 5)]),
        ]
        seg = build_sealed_segment(docs)
        tfm = BlockMaxEngine(seg, posting_mode="tf")
        assert np.asarray(tfm.dev_post_tf).dtype == np.uint16
        exact = ExactEngine(seg)
        q = Query(keys=np.asarray([b"aaa", b"bbb"], dtype="S16"))
        s1_, i1, _ = exact.search([q], 3)
        s2_, i2, _ = tfm.search([q], 3)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1_, s2_, rtol=1e-5)

    def test_memory_two_bytes_per_posting(self, rng):
        docs = make_docs(rng, 2000, vocab=50)
        seg = build_sealed_segment(docs)
        imp = BlockMaxEngine(seg)
        tfm = BlockMaxEngine(seg, posting_mode="tf")
        r_imp = imp.memory_report()
        r_tf = tfm.memory_report()
        n_post = int(seg.block_n.sum())
        # 2 B/posting (+ pad tail) vs 5 B/posting.
        assert r_tf["postings"] <= 2 * (n_post + 512)
        assert r_tf["postings"] < r_imp["postings"] / 2
        assert r_tf["total"] < r_imp["total"]
