"""Out-of-core multi-process build + bound queries + brute-force-all."""

import numpy as np
import pytest

from vectorchord_bm25_tpu.index.bm25index import Bm25Index, BoundQuery
from vectorchord_bm25_tpu.parallel.hostbuild import build_out_of_core
from vectorchord_bm25_tpu.text.corpus import documents_from_texts
from vectorchord_bm25_tpu.text.intern import Query, random_seed

from test_sealed import make_docs

TEXTS = [
    "PostgreSQL is a powerful database system",
    "full text search with ranking quality",
    "BM25 ranking for search engines",
    "the PostgreSQL community improves the database",
    "vector search and keyword search combine well",
    "index structures accelerate query processing",
    "compression reduces index memory footprint",
    "relevance scoring uses idf and term frequency",
] * 5  # 40 docs


class TestOutOfCoreBuild:
    @pytest.mark.parametrize("n_workers", [1, 3])
    def test_matches_in_memory_build(self, n_workers):
        seed = random_seed()
        oc = build_out_of_core(TEXTS, seed, n_workers=n_workers)
        docs = documents_from_texts(seed, TEXTS)
        from vectorchord_bm25_tpu.index.sealed import build_sealed_segment

        im = build_sealed_segment(docs)
        assert oc.n_docs == im.n_docs
        assert oc.sum_dl == im.sum_dl
        np.testing.assert_array_equal(oc.token_keys, im.token_keys)
        np.testing.assert_array_equal(oc.token_df, im.token_df)
        np.testing.assert_array_equal(oc.doc_fieldnorm, im.doc_fieldnorm)
        np.testing.assert_array_equal(oc.block_docids, im.block_docids)
        np.testing.assert_array_equal(oc.block_tfs, im.block_tfs)


class TestBoundQuery:
    def test_wrong_index_rejected(self, rng):
        docs = make_docs(rng, 10, vocab=5)
        a = Bm25Index.build(docs)
        b = Bm25Index.build(docs)
        qa = a.make_query(["token"])
        assert isinstance(qa, BoundQuery)
        a.search(qa, k=5)  # fine
        with pytest.raises(ValueError, match="another index"):
            b.search(qa, k=5)

    def test_bound_query_scores(self):
        seed = random_seed()
        docs = documents_from_texts(seed, TEXTS[:8])
        index = Bm25Index.build(docs, seed=seed)
        hits = index.search(index.make_query(["postgresql"]), k=5)
        assert len(hits) == 2


class TestSearchAll:
    def test_all_matches_returned(self, rng):
        docs = make_docs(rng, 100, vocab=4)
        index = Bm25Index.build(docs)
        q = Query.from_int_ids([0])
        all_hits = index.search_all(q)
        df = int(index.sealed.token_df[index.sealed.lookup_tokens(q.keys)[0]])
        assert len(all_hits) == df
        scores = [h.score for h in all_hits]
        assert scores == sorted(scores, reverse=True)
        # k=-1 routes to brute force.
        assert [h.payload for h in index.search(q, k=-1)] == [
            h.payload for h in all_hits
        ]

    def test_includes_growing(self, rng):
        docs = make_docs(rng, 10, vocab=4)
        index = Bm25Index.build(docs)
        from vectorchord_bm25_tpu.text.intern import Document

        index.insert(Document.from_int_ids([0, 0]), payload=777)
        hits = index.search_all(Query.from_int_ids([0]))
        assert any(h.payload == 777 for h in hits)
