"""Tokenizer tests + the README toy-corpus parity anchor.

The anchor (BASELINE.md): building the reference README's 10-document
corpus and querying "PostgreSQL" must return ids 8, 9, 4, 1, 7, 2 in that
exact order (reference tests/sqllogictest/indexing.slt) — only matching
docs, negated-score ascending.
"""

import pytest

from vectorchord_bm25_tpu.index.bm25index import Bm25Index
from vectorchord_bm25_tpu.text.intern import Document, Query, random_seed
from vectorchord_bm25_tpu.text.porter2 import stem
from vectorchord_bm25_tpu.text.tokenizer import STOPWORDS, tsvector

TOY_CORPUS = [
    "PostgreSQL is a powerful, open-source object-relational database system. It has over 15 years of active development.",
    "Full-text search is a technique for searching in plain-text documents or textual database fields. PostgreSQL supports this with tsvector.",
    "BM25 is a ranking function used by search engines to estimate the relevance of documents to a given search query.",
    "PostgreSQL provides many advanced features like full-text search, window functions, and more.",
    "Search and ranking in databases are important in building effective information retrieval systems.",
    "The BM25 ranking algorithm is derived from the probabilistic retrieval framework.",
    "Full-text search indexes documents to allow fast text queries. PostgreSQL supports this through its GIN and GiST indexes.",
    "The PostgreSQL community is active and regularly improves the database system.",
    "PostgreSQL supports both non-relational and relational data types.",
    "Effective search ranking algorithms, such as BM25, improve search results by understanding relevance.",
]


class TestPorter2:
    def test_known_stems(self):
        # Snowball English reference outputs.
        cases = {
            "flies": "fli",
            "dies": "die",
            "agreed": "agre",
            "national": "nation",
            "relational": "relat",
            "databases": "databas",
            "community": "communiti",
            "probabilistic": "probabilist",
            "retrieval": "retriev",
            "important": "import",
            "effective": "effect",
            "queries": "queri",
            "using": "use",
            "generously": "generous",
            "postgresql": "postgresql",
        }
        for word, expect in cases.items():
            assert stem(word) == expect, word

    def test_short_words_unchanged(self):
        assert stem("at") == "at"
        assert stem("be") == "be"


class TestTsvector:
    def test_stopwords_dropped(self):
        v = tsvector("the quick and the dead")
        assert "the" not in v and "and" not in v
        assert v == {"quick": 1, "dead": 1}

    def test_positions_counted(self):
        v = tsvector("search search searching")
        assert v["search"] == 3  # stemming merges 'searching'

    def test_hyphenated_compound(self):
        # PostgreSQL default parser: compound + parts, each fed through
        # english_stem (the whole compound is stemmed as one string, so
        # its regions span the full token).
        v = tsvector("object-relational")
        assert v == {"object-rel": 1, "object": 1, "relat": 1}
        assert tsvector("quick-brown fox") == {
            "quick-brown": 1,
            "quick": 1,
            "brown": 1,
            "fox": 1,
        }

    def test_numwords_kept(self):
        v = tsvector("over 15 years bm25")
        assert v["15"] == 1
        assert v["bm25"] == 1

    def test_position_cap(self):
        v = tsvector(" ".join(["word"] * 300))
        assert v["word"] == 256

    def test_email_url_version_kept_whole(self):
        # PostgreSQL's email/url/version token classes stay single lexemes.
        v = tsvector("mail me at bob@example.com about v1.2.3 or www.foo.org/docs")
        assert v["bob@example.com"] == 1
        assert v["1.2.3"] == 1
        assert any(k.startswith("www.foo.org") for k in v)

    def test_file_path_kept_whole(self):
        v = tsvector("see /usr/local/bin/tool for details")
        assert v["/usr/local/bin/tool"] == 1


class TestToyCorpusAnchor:
    def test_readme_ranking(self):
        seed = random_seed()
        docs = [Document.from_token_counts(seed, tsvector(t)) for t in TOY_CORPUS]
        index = Bm25Index.build(docs, payloads=list(range(1, 11)))
        q = Query.from_tokens(seed, tsvector("PostgreSQL").keys())
        hits = index.search(q, k=10)
        assert [h.payload for h in hits] == [8, 9, 4, 1, 7, 2]
        # Negated-score ascending == score descending.
        ops = [h.operator_score for h in hits]
        assert ops == sorted(ops)

    def test_anchor_stable_across_seeds_and_engines(self):
        for engine in ("exact", "blockmax"):
            seed = random_seed()
            docs = [
                Document.from_token_counts(seed, tsvector(t)) for t in TOY_CORPUS
            ]
            index = Bm25Index.build(
                docs, payloads=list(range(1, 11)), engine=engine
            )
            q = Query.from_tokens(seed, tsvector("PostgreSQL").keys())
            assert [h.payload for h in index.search(q, k=10)] == [8, 9, 4, 1, 7, 2]
