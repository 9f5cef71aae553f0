"""Tests for the sealed-segment builder (M1)."""

import numpy as np
import pytest

from vectorchord_bm25_tpu.index.sealed import BLOCK, build_sealed_segment
from vectorchord_bm25_tpu.models.fieldnorm import length_to_fieldnorm
from vectorchord_bm25_tpu.models.scoring import tf as tf_score
from vectorchord_bm25_tpu.text.intern import Document, Query
from vectorchord_bm25_tpu.utils.options import IndexOptions


def make_docs(rng, n_docs, vocab=50, max_len=30):
    """Random documents over a small integer vocabulary."""
    docs = []
    for _ in range(n_docs):
        n_terms = int(rng.integers(1, max_len))
        ids = rng.integers(0, vocab, size=n_terms)
        docs.append(Document.from_int_ids(ids.tolist()))
    return docs


class TestBuilder:
    def test_empty(self):
        seg = build_sealed_segment([])
        assert seg.n_docs == 0
        assert seg.n_tokens == 0

    def test_stats(self, rng):
        docs = make_docs(rng, 20)
        seg = build_sealed_segment(docs)
        assert seg.n_docs == 20
        assert seg.sum_dl == sum(d.length() for d in docs)
        expect_fns = [length_to_fieldnorm(d.length()) for d in docs]
        assert seg.doc_fieldnorm.tolist() == expect_fns

    def test_postings_roundtrip(self, rng):
        docs = make_docs(rng, 30, vocab=20)
        seg = build_sealed_segment(docs)
        tok, doc, tfv = seg.postings()
        # Rebuild the per-doc term vectors and compare.
        rebuilt = {}
        for t, d, v in zip(tok, doc, tfv):
            rebuilt.setdefault(int(d), {})[seg.token_keys[t]] = int(v)
        for i, d in enumerate(docs):
            got = rebuilt.get(i, {})
            expect = {
                k: int(v)
                for k, v in zip(np.asarray(d.keys, dtype="S16"), d.values)
            }
            assert got == expect, f"doc {i}"

    def test_df_and_block_structure(self, rng):
        docs = make_docs(rng, 300, vocab=5)  # force multi-block tokens
        seg = build_sealed_segment(docs)
        for t in range(seg.n_tokens):
            df = int(seg.token_df[t])
            blocks = seg.token_blocks(t)
            assert len(blocks) == -(-df // BLOCK)
            total = 0
            prev_max = -1
            for b in blocks:
                n = int(seg.block_n[b])
                total += n
                docids = seg.block_docids[b][:n]
                assert np.all(np.diff(docids) > 0)  # strictly increasing
                assert int(seg.block_min_doc[b]) == docids[0]
                assert int(seg.block_max_doc[b]) == docids[-1]
                assert docids[0] > prev_max  # blocks ordered, disjoint
                prev_max = int(docids[-1])
                # padding
                assert np.all(seg.block_docids[b][n:] == seg.n_docs)
                assert np.all(seg.block_tfs[b][n:] == 0)
            assert total == df

    def test_wand_max_impact(self, rng):
        docs = make_docs(rng, 100, vocab=10)
        opts = IndexOptions(k1=1.4, b=0.6)
        seg = build_sealed_segment(docs, options=opts)
        avgdl = seg.avgdl
        for t in range(seg.n_tokens):
            # Scalar recomputation: max tf-score over the token's postings.
            best = -1.0
            best_pair = None
            for b in seg.token_blocks(t):
                n = int(seg.block_n[b])
                block_best = -1.0
                block_pair = None
                for i in range(n):
                    d = int(seg.block_docids[b][i])
                    v = int(seg.block_tfs[b][i])
                    fn = int(seg.doc_fieldnorm[d])
                    s = tf_score(fn, v, opts.k1, opts.b, avgdl)
                    if s > block_best:
                        block_best = s
                        block_pair = (fn, v)
                assert (
                    int(seg.block_wand_fn[b]),
                    int(seg.block_wand_tf[b]),
                ) == block_pair
                if block_best > best:
                    best = block_best
                    best_pair = block_pair
            assert (int(seg.token_wand_fn[t]), int(seg.token_wand_tf[t])) == best_pair

    def test_lookup_tokens(self, rng):
        docs = make_docs(rng, 10, vocab=10)
        seg = build_sealed_segment(docs)
        ids = seg.lookup_tokens(seg.token_keys)
        assert ids.tolist() == list(range(seg.n_tokens))
        q = Query.from_int_ids([10**6])  # absent token
        assert seg.lookup_tokens(q.keys).tolist() == [-1]

    def test_payloads(self, rng):
        docs = make_docs(rng, 5)
        payloads = [100, 200, 300, 400, 500]
        seg = build_sealed_segment(docs, payloads=payloads)
        assert seg.doc_payload.tolist() == payloads

    def test_docs_with_no_terms(self):
        empty = Document.from_pairs(b"\x00" * 32, [])
        full = Document.from_int_ids([1, 2])
        seg = build_sealed_segment([empty, full, empty])
        assert seg.n_docs == 3
        assert seg.n_tokens == 2
        assert seg.token_df.tolist() == [1, 1]
