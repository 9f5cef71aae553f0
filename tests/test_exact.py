"""Tests for the exact batched engine v1 (M2) vs a scalar oracle.

The scalar oracle below is an independent, loop-based BM25 implementation
(formulas straight from the reference, computed in float64) — the analog
of the reference's seqscan oracle used by its fuzz harness
(tests/fuzz:203-280).
"""

import numpy as np
import pytest

from vectorchord_bm25_tpu.index.sealed import build_sealed_segment
from vectorchord_bm25_tpu.models.fieldnorm import length_to_fieldnorm
from vectorchord_bm25_tpu.models.scoring import idf, tf as tf_score
from vectorchord_bm25_tpu.search.exact import ExactEngine, oracle_topk
from vectorchord_bm25_tpu.text.intern import Document, Query
from vectorchord_bm25_tpu.utils.options import IndexOptions

from test_sealed import make_docs


def scalar_scores(docs, query, options, deleted=None):
    """Independent loop-based scorer: returns dense per-doc float64 scores."""
    n = len(docs)
    lengths = [d.length() for d in docs]
    sum_dl = sum(lengths)
    avgdl = sum_dl / n
    df = {}
    for d in docs:
        for k in np.asarray(d.keys, dtype="S16"):
            df[k] = df.get(k, 0) + 1
    out = np.zeros(n, dtype=np.float64)
    for i, d in enumerate(docs):
        if deleted is not None and deleted[i]:
            continue
        fn = length_to_fieldnorm(lengths[i])
        terms = {
            k: int(v) for k, v in zip(np.asarray(d.keys, dtype="S16"), d.values)
        }
        for qk in np.asarray(query.keys, dtype="S16"):
            if qk in terms and qk in df:
                out[i] += idf(n, df[qk]) * tf_score(
                    int(fn), terms[qk], options.k1, options.b, avgdl
                )
    return out


def scalar_topk(docs, query, k, options, deleted=None):
    scores = scalar_scores(docs, query, options, deleted)
    docs_pos = np.flatnonzero(scores > 0)
    order = np.lexsort((docs_pos, -scores[docs_pos]))
    top = docs_pos[order[:k]]
    return scores[top], top


def rank_match(got_ids, expect_ids, got_scores, expect_scores, tol=1e-4):
    """Ranks must match except where adjacent scores are float-tied."""
    assert len(got_ids) == len(expect_ids)
    for i, (g, e) in enumerate(zip(got_ids, expect_ids)):
        if g != e:
            # Allowed only if the scores are effectively tied.
            assert abs(got_scores[i] - expect_scores[i]) < tol, (
                f"rank {i}: got doc {g} ({got_scores[i]}) expected {e} "
                f"({expect_scores[i]})"
            )


class TestExactEngine:
    @pytest.mark.parametrize("n_docs,vocab", [(50, 20), (300, 10), (40, 200)])
    def test_vs_scalar_oracle(self, rng, n_docs, vocab):
        docs = make_docs(rng, n_docs, vocab=vocab)
        options = IndexOptions()
        seg = build_sealed_segment(docs, options=options)
        engine = ExactEngine(seg)
        queries = [
            Query.from_int_ids(rng.integers(0, vocab, size=3).tolist())
            for _ in range(8)
        ]
        k = 10
        scores, ids, payloads = engine.search(queries, k)
        for qi, q in enumerate(queries):
            e_scores, e_ids = scalar_topk(docs, q, k, options)
            got_valid = ids[qi][ids[qi] >= 0]
            assert len(got_valid) == len(e_ids)
            rank_match(
                got_valid,
                e_ids,
                scores[qi][: len(e_ids)],
                e_scores,
            )
            np.testing.assert_allclose(
                scores[qi][: len(e_ids)], e_scores, rtol=1e-5
            )

    def test_missing_terms_skipped(self, rng):
        docs = make_docs(rng, 20, vocab=10)
        seg = build_sealed_segment(docs)
        engine = ExactEngine(seg)
        # Query with one present and one absent term: absent contributes 0.
        q_both = Query.from_int_ids([0, 999999])
        q_present = Query.from_int_ids([0])
        s1, i1, _ = engine.search([q_both], 5)
        s2, i2, _ = engine.search([q_present], 5)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, rtol=1e-6)

    def test_all_terms_missing(self, rng):
        docs = make_docs(rng, 20, vocab=10)
        seg = build_sealed_segment(docs)
        engine = ExactEngine(seg)
        scores, ids, payloads = engine.search([Query.from_int_ids([999999])], 5)
        assert np.all(ids == -1)
        assert np.all(payloads == -1)

    def test_fewer_matches_than_k(self, rng):
        docs = [Document.from_int_ids([1]), Document.from_int_ids([2])]
        seg = build_sealed_segment(docs)
        engine = ExactEngine(seg)
        scores, ids, _ = engine.search([Query.from_int_ids([1])], 10)
        assert (ids[0] >= 0).sum() == 1
        assert ids[0][0] == 0

    def test_oracle_topk_matches_engine(self, rng):
        docs = make_docs(rng, 100, vocab=15)
        seg = build_sealed_segment(docs)
        engine = ExactEngine(seg)
        q = Query.from_int_ids([1, 2, 3])
        scores, ids, _ = engine.search([q], 10)
        o_scores, o_ids = oracle_topk(seg, q, 10)
        got = ids[0][ids[0] >= 0]
        rank_match(got, o_ids, scores[0][: len(o_ids)], o_scores)

    def test_filter_mask_prefilter(self, rng):
        docs = make_docs(rng, 100, vocab=5)
        seg = build_sealed_segment(docs)
        engine = ExactEngine(seg)
        q = Query.from_int_ids([0, 1])
        mask = np.zeros(100, dtype=bool)
        mask[::3] = True  # keep every third doc
        scores, ids, _ = engine.search([q], 10, filter_mask=mask)
        valid = ids[0][ids[0] >= 0]
        assert np.all(valid % 3 == 0)
        # Prefilter semantics: same as scoring only the masked corpus.
        o_scores, o_ids = oracle_topk(seg, q, 10, filter_mask=mask)
        rank_match(valid, o_ids, scores[0][: len(o_ids)], o_scores)

    def test_payload_mapping(self, rng):
        docs = make_docs(rng, 10, vocab=3)
        payloads = (np.arange(10) * 7 + 1000).tolist()
        seg = build_sealed_segment(docs, payloads=payloads)
        engine = ExactEngine(seg)
        scores, ids, got_payloads = engine.search([Query.from_int_ids([0])], 5)
        for slot, payload in zip(ids[0], got_payloads[0]):
            if slot >= 0:
                assert payload == payloads[slot]
            else:
                assert payload == -1

    def test_deleted_docs_excluded(self, rng):
        docs = make_docs(rng, 50, vocab=5)
        seg = build_sealed_segment(docs)
        engine = ExactEngine(seg)
        deleted = np.zeros(50, dtype=bool)
        deleted[:25] = True
        engine.set_deleted(deleted)
        q = Query.from_int_ids([0, 1, 2])
        scores, ids, _ = engine.search([q], 20)
        valid = ids[0][ids[0] >= 0]
        assert np.all(valid >= 25)
        e_scores, e_ids = scalar_topk(docs, q, 20, seg.options, deleted=deleted)
        rank_match(valid, e_ids, scores[0][: len(e_ids)], e_scores)

    def test_k_zero_rejected(self, rng):
        docs = make_docs(rng, 5)
        engine = ExactEngine(build_sealed_segment(docs))
        with pytest.raises(ValueError, match="number of needed rows"):
            engine.search([Query.from_int_ids([0])], 0)

    def test_tie_break_doc_asc(self):
        # Identical docs => identical scores => doc slot ascending.
        docs = [Document.from_int_ids([7]) for _ in range(5)]
        seg = build_sealed_segment(docs)
        engine = ExactEngine(seg)
        scores, ids, _ = engine.search([Query.from_int_ids([7])], 5)
        assert ids[0].tolist() == [0, 1, 2, 3, 4]
        assert len(set(np.asarray(scores[0]).tolist())) == 1
