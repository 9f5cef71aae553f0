"""Tests for the delta-compressed stream layout and StreamEngine.

The stream is the equal-index-memory serving form (index/stream.py,
search/stream.py): these tests pin (a) lossless round-trip of the
compression, (b) engine-vs-oracle rank parity on random corpora with
big doc gaps / large tfs / deletes / filters, (c) the memory accounting
that bench.py reports against the reference block format.
"""

import numpy as np
import pytest

from vectorchord_bm25_tpu.index.sealed import (
    build_sealed_segment,
    build_sealed_segment_from_postings,
)
from vectorchord_bm25_tpu.index.stream import build_stream_index
from vectorchord_bm25_tpu.search.exact import ExactEngine, oracle_topk
from vectorchord_bm25_tpu.search.stream import StreamEngine
from vectorchord_bm25_tpu.text.intern import Query

from test_sealed import make_docs


def random_segment(rng, n_docs, vocab, n_post, tf_hi=3):
    tok = rng.integers(0, vocab, n_post)
    doc = rng.integers(0, n_docs, n_post)
    tf = rng.integers(1, tf_hi + 1, n_post)
    u, idx = np.unique(tok * n_docs + doc, return_index=True)
    tok, doc, tf = u // n_docs, u % n_docs, tf[idx]
    keys_u8 = np.zeros((tok.size, 16), dtype=np.uint8)
    keys_u8[:, :4] = tok.astype(">u4").view(np.uint8).reshape(-1, 4)
    keys = keys_u8.reshape(-1).view("S16")
    order = np.lexsort((tok, doc))
    return build_sealed_segment_from_postings(
        keys[order], doc[order], tf[order], n_docs, doc_grouped=True
    )


class TestStreamIndex:
    @pytest.mark.parametrize(
        "n_docs,vocab,n_post,tf_hi",
        [(500, 40, 4000, 3), (5000, 300, 15000, 400), (80000, 30, 5000, 2)],
    )
    def test_round_trip(self, rng, n_docs, vocab, n_post, tf_hi):
        """Decoding every window must reproduce the sealed postings
        exactly (lossless compression)."""
        seg = random_segment(rng, n_docs, vocab, n_post, tf_hi)
        si = build_stream_index(seg)
        stok, sdoc, stf = seg.postings()
        toks, docs, tfs = [], [], []
        for w in range(si.n_windows):
            d, t = si.decode_window(w)
            toks.append(np.full(d.size, si.w_token[w]))
            docs.append(d)
            tfs.append(t)
        assert np.array_equal(np.concatenate(toks), stok)
        assert np.array_equal(np.concatenate(docs), sdoc)
        assert np.array_equal(np.concatenate(tfs), stf)
        assert int(si.w_len.max()) <= 128
        # Every window must fit the kernels' fixed 32-word gather.
        wl = si.w_len.astype(np.int64)
        assert int((wl * si.w_dbits).max(initial=0)) <= 1024
        assert int((wl * si.w_tfbits).max(initial=0)) <= 1024
        # The kernels fetch 32 contiguous words per window (off + iota),
        # so every window's doc-word offset AND its derived tf-word
        # offset must sit >= 32 words from the stream end — guaranteed
        # by the builder's 64-word zero tail.
        if si.n_windows:
            toff = si.w_off4.astype(np.int64) + (
                (wl * si.w_dbits + 31) >> 5
            )
            assert int(toff.max()) + 32 <= si.words.size

    def test_window_bounds_dominate_impacts(self, rng):
        """w_maximp must upper-bound every posting impact in the window
        (MaxScore pruning relies on it)."""
        seg = random_segment(rng, 2000, 60, 8000, tf_hi=7)
        si = build_stream_index(seg)
        s0 = seg.token_s0()
        s1 = seg.score_tables().s1_table
        for w in rng.choice(si.n_windows, size=min(64, si.n_windows), replace=False):
            d, t = si.decode_window(int(w))
            fn = seg.doc_fieldnorm[d].astype(np.int64)
            imp = (t * s0[si.w_token[w]]) / (t + s1[fn])
            assert float(imp.max()) <= float(si.w_maximp[w])
        tmax = si.token_maximp
        for tid in rng.choice(seg.n_tokens, size=20, replace=False):
            lo, hi = si.token_w_start[tid], si.token_w_start[tid + 1]
            if hi > lo:
                assert float(si.w_maximp[lo:hi].max()) <= float(
                    tmax[tid]
                ) * (1 + 1e-6)

    def test_empty_segment(self):
        seg = build_sealed_segment([])
        si = build_stream_index(seg)
        assert si.n_windows == 0 and si.n_postings == 0


class TestStreamEngine:
    @pytest.mark.parametrize("strategy", ["dense", "sparse", "maxscore"])
    def test_vs_oracle(self, rng, strategy):
        seg = random_segment(rng, 3000, 80, 30000, tf_hi=5)
        engine = StreamEngine(seg, strategy=strategy)
        queries = [
            Query.from_int_ids(rng.integers(0, 90, size=4).tolist())
            for _ in range(32)
        ]
        k = 10
        scores, ids, payloads = engine.search(queries, k)
        for qi, q in enumerate(queries):
            e_scores, e_ids = oracle_topk(seg, q, k, dtype=np.float32)
            got = ids[qi][ids[qi] >= 0]
            assert np.array_equal(got, e_ids), qi
            np.testing.assert_allclose(
                scores[qi][: e_ids.size], e_scores, rtol=2e-6
            )
            # Payload contract: valid slots carry the doc payload.
            assert np.array_equal(
                payloads[qi][: e_ids.size], seg.doc_payload[e_ids]
            )

    def test_vs_exact_engine(self, rng):
        """Stream results == uncompressed ExactEngine results bit-for-bit
        on ids (both implement the f32 oracle ordering)."""
        docs = make_docs(rng, 400, vocab=50)
        seg = build_sealed_segment(docs)
        se = StreamEngine(seg, strategy="dense")
        ee = ExactEngine(seg)
        queries = [
            Query.from_int_ids(rng.integers(0, 55, size=3).tolist())
            for _ in range(16)
        ]
        s1, i1, _ = se.search(queries, 10)
        s2, i2, _ = ee.search(queries, 10)
        assert np.array_equal(i1, i2)
        np.testing.assert_allclose(
            np.where(np.isfinite(s1), s1, 0),
            np.where(np.isfinite(s2), s2, 0),
            rtol=2e-6,
        )

    def test_big_gaps_and_tf16(self, rng):
        """Sparse terms spanning 100k+ docs (u16 windows + re-anchoring
        splits) and tf > 255 (u16 tf stream)."""
        n_docs = 200_000
        # one rare term appearing every ~37k docs, one mid, one dense run
        doc_a = np.arange(0, n_docs, 37_111, dtype=np.int64)
        doc_b = np.arange(0, n_docs, 301, dtype=np.int64)
        doc_c = np.arange(5_000, 5_600, dtype=np.int64)
        tok = np.concatenate(
            [np.zeros_like(doc_a), np.ones_like(doc_b), np.full_like(doc_c, 2)]
        )
        doc = np.concatenate([doc_a, doc_b, doc_c])
        tf = np.concatenate(
            [
                np.full_like(doc_a, 300),  # forces tf_width=2
                np.ones_like(doc_b),
                rng.integers(1, 5, doc_c.size),
            ]
        )
        keys_u8 = np.zeros((tok.size, 16), dtype=np.uint8)
        keys_u8[:, :4] = tok.astype(">u4").view(np.uint8).reshape(-1, 4)
        keys = keys_u8.reshape(-1).view("S16")
        seg = build_sealed_segment_from_postings(
            keys, doc, tf, n_docs, presorted=True
        )
        si = build_stream_index(seg)
        assert si.tf_width == 2
        engine = StreamEngine(seg, stream=si, strategy="dense")
        queries = [Query.from_int_ids([0, 1, 2])]
        scores, ids, _ = engine.search(queries, 10)
        e_scores, e_ids = oracle_topk(seg, queries[0], 10, dtype=np.float32)
        assert np.array_equal(ids[0][ids[0] >= 0], e_ids)

    def test_deletes_and_filter(self, rng):
        seg = random_segment(rng, 1000, 40, 8000)
        engine = StreamEngine(seg, strategy="dense")
        deleted = rng.random(1000) < 0.3
        engine.set_deleted(deleted)
        fmask = rng.random(1000) < 0.5
        queries = [
            Query.from_int_ids(rng.integers(0, 45, size=4).tolist())
            for _ in range(8)
        ]
        scores, ids, _ = engine.search(queries, 10, filter_mask=fmask)
        for qi, q in enumerate(queries):
            e_scores, e_ids = oracle_topk(
                seg, q, 10, deleted=deleted, filter_mask=fmask,
                dtype=np.float32,
            )
            assert np.array_equal(ids[qi][ids[qi] >= 0], e_ids), qi
        # un-delete restores
        engine.set_deleted(np.zeros(1000, dtype=bool))
        scores, ids, _ = engine.search(queries, 10)
        for qi, q in enumerate(queries):
            _, e_ids = oracle_topk(seg, q, 10, dtype=np.float32)
            assert np.array_equal(ids[qi][ids[qi] >= 0], e_ids), qi

    def test_memory_below_reference(self, rng):
        """On a clustered Zipf-ish corpus the stream must beat the
        reference's block-format bytes (the north-star constraint)."""
        from bench import synth_corpus_postings
        from vectorchord_bm25_tpu.utils.memparity import (
            memory_parity_report,
            reference_format_bytes,
        )

        keys, doc_ids, tfs, _ = synth_corpus_postings(16384, 8000, 60)
        seg = build_sealed_segment_from_postings(
            keys, doc_ids, tfs, 16384, doc_grouped=True
        )
        engine = StreamEngine(seg)
        rep = memory_parity_report(engine, seg)
        assert rep["ratio_vs_reference"] <= 1.0, rep
        ref = reference_format_bytes(seg)
        assert engine.memory_report()["total"] < ref["total"]

    def test_oov_and_empty_queries(self, rng):
        seg = random_segment(rng, 200, 20, 1000)
        engine = StreamEngine(seg)
        queries = [
            Query.from_int_ids([99999]),
            Query(keys=np.zeros(0, dtype="S16")),
            Query.from_int_ids([0, 1]),
        ]
        scores, ids, _ = engine.search(queries, 5)
        assert np.all(ids[0] == -1) and np.all(ids[1] == -1)
        _, e_ids = oracle_topk(seg, queries[2], 5, dtype=np.float32)
        assert np.array_equal(ids[2][ids[2] >= 0], e_ids)
        with pytest.raises(ValueError):
            engine.search(queries, 0)


class TestStreamIndexCache:
    def test_save_load_roundtrip_serves_identically(self, rng, tmp_path):
        """The cached stream (save_stream_index/load_stream_index) must
        reproduce the built stream bit-for-bit — benches reuse it to
        skip the multi-minute rebuild at multi-million-doc scale."""
        from vectorchord_bm25_tpu.index.stream import (
            _STREAM_ARRAYS,
            build_stream_index,
            load_stream_index,
            save_stream_index,
        )

        seg = random_segment(rng, 3000, 80, 900, tf_hi=6)
        si = build_stream_index(seg)
        p = str(tmp_path / "stream.npz")
        save_stream_index(si, p)
        back = load_stream_index(p)
        for f in _STREAM_ARRAYS:
            np.testing.assert_array_equal(
                getattr(si, f), getattr(back, f), err_msg=f
            )
        assert (si.n_docs, si.n_tokens, si.n_postings, si.tf_width) == (
            back.n_docs, back.n_tokens, back.n_postings, back.tf_width
        )
        queries = [
            Query.from_int_ids(rng.integers(0, 80, size=3).tolist())
            for _ in range(8)
        ]
        s1, i1, _ = StreamEngine(seg, stream=si).search(queries, 10)
        s2, i2, _ = StreamEngine(seg, stream=back).search(queries, 10)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(s1, s2)


class TestMaxScore:
    """strategy='maxscore': impact-ordered window-prefix pruning with
    exact candidate rescoring (the MaxScore/Block-Max analog of
    search.rs:151-280's skip machinery, serving from the stream)."""

    def test_pruned_equals_oracle_with_mutation_surface(self, rng):
        seg = random_segment(rng, 4000, 100, 900, tf_hi=8)
        ms = StreamEngine(seg, strategy="maxscore")
        ex = StreamEngine(seg, strategy="sparse")
        queries = [
            Query.from_int_ids(
                rng.integers(0, 900, size=int(rng.integers(1, 7))).tolist()
            )
            for _ in range(48)
        ]
        for k in (1, 10, 100):
            s_m, i_m, _ = ms.search(queries, k)
            s_e, i_e, _ = ex.search(queries, k)
            assert np.array_equal(i_m, i_e), k
            np.testing.assert_array_equal(
                np.isfinite(s_m), np.isfinite(s_e)
            )
            f = np.isfinite(s_m)
            np.testing.assert_allclose(s_m[f], s_e[f], rtol=2e-6)
        # deletes + prefilter keep the bounds conservative
        deleted = rng.random(4000) < 0.5
        ms.set_deleted(deleted)
        ex.set_deleted(deleted)
        fmask = (rng.random(4000) < 0.5).astype(np.float32)
        s_m, i_m, _ = ms.search(queries, 10, filter_mask=fmask)
        s_e, i_e, _ = ex.search(queries, 10, filter_mask=fmask)
        assert np.array_equal(i_m, i_e)

    def test_tiered_certification_on_common_term_queries(self, rng):
        """Queries mixing very common terms (huge posting lists, flat
        window maxima) with selective ones are the reference's WAND
        worst case (search.rs:151-280).  The tiered certification
        (MS_TIERS) must certify nearly all of them — scoring a small
        fraction of the matched windows — instead of falling back to
        the exhaustive path, and results must match the oracle."""
        from bench import synth_corpus_postings

        n = 65536
        keys, doc_ids, tfs, _ = synth_corpus_postings(n, 20000, 60)
        seg = build_sealed_segment_from_postings(
            keys, doc_ids, tfs, n, doc_grouped=True
        )
        # 2 common (Zipf head) + 2 mid/tail terms per query.
        queries = [
            Query.from_int_ids(
                np.unique(
                    np.concatenate(
                        [
                            rng.integers(0, 16, size=1),
                            rng.integers(16, 200, size=1),
                            rng.integers(200, 20000, size=2),
                        ]
                    )
                ).tolist()
            )
            for _ in range(32)
        ]
        ms = StreamEngine(seg, strategy="maxscore")
        ex = StreamEngine(seg, strategy="sparse")
        s_m, i_m, _ = ms.search(queries, 10)
        s_e, i_e, _ = ex.search(queries, 10)
        assert np.array_equal(i_m, i_e)
        st = ms.last_ms_stats
        assert st["fallback_queries"] <= 2, st
        t1 = st["tiers"][0]
        # Tier 1 must prune hard (common-term spans skipped).
        assert t1["windows_phase1"] < 0.3 * t1["windows_total"], t1
        # The retry tier (when any query needed it) also prunes.
        for t in st["tiers"][1:]:
            assert t["windows_phase1"] <= 0.6 * t["windows_total"], t
        # Deep-k (north-star recall@1000 regime): the 16384-entry pool
        # serves k=1000 pruned and exact (VERDICT r3 #5).
        s_m, i_m, _ = ms.search(queries, 1000)
        s_e, i_e, _ = ex.search(queries, 1000)
        assert np.array_equal(i_m, i_e)
        assert ms.last_ms_stats is not None

    def test_auto_routes_per_query_at_scale(self, rng, monkeypatch):
        """strategy='auto' at scale routes PER QUERY: only queries
        whose tier-1 bound structure predicts profitable skipping take
        the pruned path (_ms_route), the rest the exhaustive sparse
        scan — measured at 8.4M the pruned path is 2.4x slower on
        informative queries (DESIGN.md round 4), so corpus size alone
        must not force it.  Results are oracle-exact at every router
        setting, including both extremes."""
        from bench import synth_corpus_postings

        n = 32768
        keys, doc_ids, tfs, _ = synth_corpus_postings(n, 10000, 50)
        seg = build_sealed_segment_from_postings(
            keys, doc_ids, tfs, n, doc_grouped=True
        )
        # Mixed workload: common-term-heavy + selective queries.
        queries = [
            Query.from_int_ids(
                np.unique(
                    np.concatenate(
                        [
                            rng.integers(0, 12, size=2),
                            rng.integers(200, 10000, size=2),
                        ]
                    )
                ).tolist()
            )
            for _ in range(12)
        ] + [
            Query.from_int_ids(
                rng.integers(200, 10000, size=4).tolist()
            )
            for _ in range(12)
        ]
        monkeypatch.setattr(StreamEngine, "SPARSE_MIN_DOCS", 1000)
        ex = StreamEngine(seg, strategy="sparse")
        s_e, i_e, _ = ex.search(queries, 10)
        auto = StreamEngine(seg, strategy="auto")
        s_a, i_a, _ = auto.search(queries, 10)
        assert np.array_equal(i_a, i_e)
        st = auto.last_ms_stats
        assert st is not None and st["batch_queries"] == len(queries)
        assert 0 <= st["routed_queries"] <= len(queries)
        # Router extremes must both stay exact: route everything...
        monkeypatch.setattr(StreamEngine, "MS_ROUTE_FRAC", 1.0)
        monkeypatch.setattr(StreamEngine, "MS_ROUTE_MIN_WINDOWS", 0)
        allms = StreamEngine(seg, strategy="auto")
        s_1, i_1, _ = allms.search(queries, 10)
        assert np.array_equal(i_1, i_e)
        assert allms.last_ms_stats["routed_queries"] == len(queries)
        # ... and route nothing (pure exhaustive sparse).
        monkeypatch.setattr(StreamEngine, "MS_ROUTE_FRAC", -1.0)
        noms = StreamEngine(seg, strategy="auto")
        s_0, i_0, _ = noms.search(queries, 10)
        assert np.array_equal(i_0, i_e)
        assert noms.last_ms_stats["routed_queries"] == 0
        # k > MS_MAX_K still serves exhaustively (no pruned-path stats).
        monkeypatch.setattr(StreamEngine, "MS_ROUTE_FRAC", 0.35)
        auto2 = StreamEngine(seg, strategy="auto")
        s_a2, i_a2, _ = auto2.search(queries, 1500)
        assert auto2.last_ms_stats is None
        s_e2, i_e2, _ = ex.search(queries, 1500)
        assert np.array_equal(i_a2, i_e2)
        # Deep k within the pool bound (MS_ROUTE_MAX_K < k <= MS_MAX_K):
        # 'auto' must NOT route — measured at 8.4M/k=1000 routing loses
        # 2.3x (artifacts/bench_8m_{auto,sparse}_k1000_r05.json) — but
        # explicit strategy='maxscore' still serves it pruned.
        k_deep = StreamEngine.MS_ROUTE_MAX_K + 1
        auto3 = StreamEngine(seg, strategy="auto")
        s_a3, i_a3, _ = auto3.search(queries, k_deep)
        assert auto3.last_ms_stats is None
        s_e3, i_e3, _ = ex.search(queries, k_deep)
        assert np.array_equal(i_a3, i_e3)

    def test_k_above_pool_falls_back(self, rng):
        # k > MS_MAX_K (1024) routes every query through the exhaustive
        # path; k in (128, MS_MAX_K] — the north-star recall@1000
        # regime — serves pruned with the deeper pool (VERDICT r3 #5).
        seg = random_segment(rng, 2000, 40, 200, tf_hi=3)
        ms = StreamEngine(seg, strategy="maxscore")
        ex = StreamEngine(seg, strategy="sparse")
        queries = [
            Query.from_int_ids(rng.integers(0, 200, size=3).tolist())
            for _ in range(8)
        ]
        for k in (300, 1000, 2000):
            ms.last_ms_stats = None
            s_m, i_m, _ = ms.search(queries, k)
            s_e, i_e, _ = ex.search(queries, k)
            assert np.array_equal(i_m, i_e), k
            if k <= StreamEngine.MS_MAX_K:
                assert ms.last_ms_stats is not None, k
            else:
                assert ms.last_ms_stats is None, k
