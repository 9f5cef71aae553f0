"""Dataset harness tests (VERDICT round-1 item 2, SURVEY M2).

- BEIR loader round-trip (the exact layout real datasets ship in);
- frozen-generator fingerprints (the offline stand-in is a pinned
  artifact: content drift fails here);
- NDCG/recall metric unit tests against hand-computed values;
- the M2 parity requirement: engine top-k ranks == scalar float64 oracle
  ranks on the FULL query set, for every engine.
"""

import numpy as np

import os as _os
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

import pytest

from vectorchord_bm25_tpu.data.beir import BeirDataset, load_beir
from vectorchord_bm25_tpu.data.harness import (
    build_index,
    make_queries,
    oracle_rank_parity,
    run_dataset,
)
from vectorchord_bm25_tpu.data.metrics import ndcg_at_k, recall_at_k
from vectorchord_bm25_tpu.data.synthetic import (
    dataset_fingerprint,
    generate_beir_like,
)


@pytest.fixture(scope="module")
def mini():
    return generate_beir_like("scifact-mini", seed=0)


class TestLoader:
    def test_roundtrip(self, mini, tmp_path):
        d = str(tmp_path / "ds")
        mini.save(d)
        back = load_beir(d)
        assert back.doc_ids == mini.doc_ids
        assert back.doc_texts == mini.doc_texts
        assert back.query_ids == mini.query_ids
        assert back.query_texts == mini.query_texts
        assert back.qrels == mini.qrels
        assert dataset_fingerprint(back) == dataset_fingerprint(mini)

    def test_title_concatenated(self, tmp_path):
        import json, os

        d = str(tmp_path / "ds")
        os.makedirs(os.path.join(d, "qrels"))
        with open(os.path.join(d, "corpus.jsonl"), "w") as f:
            f.write(json.dumps({"_id": "d1", "title": "A Title", "text": "body"}) + "\n")
        with open(os.path.join(d, "queries.jsonl"), "w") as f:
            f.write(json.dumps({"_id": "q1", "text": "title"}) + "\n")
        with open(os.path.join(d, "qrels", "test.tsv"), "w") as f:
            f.write("query-id\tcorpus-id\tscore\nq1\td1\t1\n")
        ds = load_beir(d)
        assert ds.doc_texts == ["A Title body"]
        assert ds.qrels == {"q1": {"d1": 1}}

    def test_handcrafted_beir_dir_end_to_end(self, tmp_path):
        """The networked-BEIR recipe (README): a directory laid out by
        an EXTERNAL tool (written by hand here, not via our own save)
        must drive load_beir -> build_index -> run_dataset to sane
        metrics — guards the recipe against layout drift and
        save/load-symmetric bugs (VERDICT r3 #9)."""
        import json

        d = tmp_path / "scifact-like"
        (d / "qrels").mkdir(parents=True)
        docs = [
            ("d1", "BM25 scoring", "bm25 ranks documents by term rarity"),
            ("d2", "", "postgres stores relational data"),
            ("d3", "Vector search", "vectors embed documents for ann"),
            ("d4", "", "bm25 uses idf and document length"),
            ("d5", "Databases", "postgres supports full text search"),
            ("d6", "", "unrelated cooking recipe with garlic"),
            ("d7", "", "another unrelated gardening note"),
            ("d8", "Ranking", "learning to rank reorders bm25 output"),
            ("d9", "", "sparse retrieval complements dense vectors"),
            ("d10", "", "term frequency saturates in bm25"),
        ]
        with open(d / "corpus.jsonl", "w") as f:
            for did, title, text in docs:
                f.write(
                    json.dumps({"_id": did, "title": title, "text": text})
                    + "\n"
                )
        with open(d / "queries.jsonl", "w") as f:
            f.write(json.dumps({"_id": "q1", "text": "bm25 ranking"}) + "\n")
            f.write(
                json.dumps({"_id": "q2", "text": "postgres text search"})
                + "\n"
            )
            f.write(
                json.dumps({"_id": "q3", "text": "not in qrels"}) + "\n"
            )
        with open(d / "qrels" / "test.tsv", "w") as f:
            f.write("query-id\tcorpus-id\tscore\n")
            f.write("q1\td1\t2\n")
            f.write("q1\td4\t1\n")
            f.write("q2\td5\t1\n")
        ds = load_beir(str(d))
        assert ds.n_docs == 10 and ds.n_queries == 2  # q3 filtered
        index = build_index(ds, engine="stream")
        _, metrics, _ = run_dataset(ds, index, k=10, batch=2)
        assert metrics["ndcg@10"] > 0.5
        assert metrics["recall@10"] == 1.0
        assert oracle_rank_parity(ds, index, k=10) == 0

    def test_queries_filtered_to_qrels_split(self, mini, tmp_path):
        d = str(tmp_path / "ds")
        mini.save(d)
        # Drop half the qrels rows -> loader keeps only covered queries.
        import os

        path = os.path.join(d, "qrels", "test.tsv")
        lines = open(path).read().splitlines()
        keep = lines[: 1 + (len(lines) - 1) // 2]
        open(path, "w").write("\n".join(keep) + "\n")
        back = load_beir(d)
        assert back.n_queries < mini.n_queries
        assert all(q in back.qrels for q in back.query_ids)


class TestFrozenFingerprints:
    def test_mini_fingerprint(self, mini):
        assert dataset_fingerprint(mini) == "01d0543143d5f9a1"

    def test_determinism(self):
        a = generate_beir_like("scifact-mini", seed=0)
        b = generate_beir_like("scifact-mini", seed=0)
        assert dataset_fingerprint(a) == dataset_fingerprint(b)
        c = generate_beir_like("scifact-mini", seed=1)
        assert dataset_fingerprint(c) != dataset_fingerprint(a)

    def test_scifact_shape(self):
        ds = generate_beir_like("scifact", seed=0)
        assert ds.n_docs == 5183  # real SciFact corpus size
        assert ds.n_queries == 300  # real SciFact test-query count
        assert dataset_fingerprint(ds) == "472319a39cebf7d9"


class TestMetrics:
    def test_ndcg_hand_computed(self):
        qrels = {"q": {"a": 2, "b": 1}}
        # run places b first (rel 1), a second (rel 2).
        run = {"q": ["b", "a", "x"]}
        dcg = (2**1 - 1) / np.log2(2) + (2**2 - 1) / np.log2(3)
        idcg = (2**2 - 1) / np.log2(2) + (2**1 - 1) / np.log2(3)
        assert ndcg_at_k(run, qrels, 10) == pytest.approx(dcg / idcg)

    def test_ndcg_perfect_is_one(self):
        qrels = {"q": {"a": 3, "b": 1}}
        assert ndcg_at_k({"q": ["a", "b"]}, qrels, 10) == pytest.approx(1.0)

    def test_ndcg_k_cutoff(self):
        qrels = {"q": {"a": 1}}
        assert ndcg_at_k({"q": ["x", "a"]}, qrels, 1) == 0.0

    def test_recall(self):
        qrels = {"q1": {"a": 1, "b": 1}, "q2": {"c": 1}}
        run = {"q1": ["a", "x"], "q2": ["x", "y"]}
        # q1: 1/2 recovered, q2: 0 -> mean 0.25
        assert recall_at_k(run, qrels, 2) == pytest.approx(0.25)
        assert recall_at_k(run, qrels, 1) == pytest.approx(0.25)

    def test_unjudged_queries_ignored(self):
        qrels = {"q1": {"a": 1}, "q2": {}}
        run = {"q1": ["a"]}
        assert ndcg_at_k(run, qrels, 10) == pytest.approx(1.0)
        assert recall_at_k(run, qrels, 10) == pytest.approx(1.0)


class TestM2Parity:
    """SURVEY M2: engine ranks == float64 oracle ranks, full query set."""

    @pytest.mark.parametrize("engine", ["exact", "blockmax", "hybrid"])
    def test_full_queryset_rank_parity(self, mini, engine):
        index = build_index(mini, engine=engine)
        assert oracle_rank_parity(mini, index, k=10) == 0

    def test_scifact_scale_rank_parity(self):
        # The full frozen SciFact-shaped dataset (5,183 docs, all 300
        # queries) — the SURVEY M2 requirement at real-dataset scale.
        ds = generate_beir_like("scifact", seed=0)
        index = build_index(ds, engine="hybrid")
        assert oracle_rank_parity(ds, index, k=10) == 0

    def test_quality_band(self, mini):
        index = build_index(mini, engine="hybrid")
        queries = make_queries(mini, index)
        _, metrics, qps = run_dataset(mini, index, k=600, queries=queries)
        # Non-trivial but strong BM25 quality on the frozen dataset.
        assert 0.55 <= metrics["ndcg@10"] <= 0.99
        assert metrics["recall@1000"] >= metrics["recall@100"] >= metrics["recall@10"]
        assert metrics["recall@1000"] >= 0.9
        assert qps > 0


class TestBenchDatasetMode:
    def test_bench_dataset_json_line(self):
        import json
        import os
        import subprocess
        import sys

        r = subprocess.run(
            [
                sys.executable, "bench.py", "--dataset", "synthetic:scifact-mini",
                "--batch", "32", "--rounds", "1",
            ],
            capture_output=True, text=True, cwd=_REPO_ROOT,
            env={**os.environ, "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": _REPO_ROOT},
            timeout=600,
        )
        assert r.returncode == 0, r.stderr
        line = r.stdout.strip().splitlines()[-1]
        rec = json.loads(line)
        assert rec["unit"] == "queries/s"
        assert rec["value"] > 0
        assert 0 < rec["ndcg@10"] <= 1
        assert rec["oracle_parity_mismatches"] == 0
        assert "recall@1000" in rec


class TestShardedDataset:
    def test_sharded_metrics_match_single_chip(self):
        import jax

        if len(jax.devices()) < 8:
            import pytest as _pytest

            _pytest.skip("needs 8 virtual devices")
        from vectorchord_bm25_tpu.data.harness import (
            build_index, make_queries, run_dataset,
        )
        from vectorchord_bm25_tpu.data.synthetic import generate_beir_like
        from vectorchord_bm25_tpu.text.intern import random_seed

        ds = generate_beir_like("scifact-mini")
        seed = random_seed()
        single = build_index(ds, engine="exact", seed=seed)
        sharded = build_index(ds, engine="exact", seed=seed, shards=8)
        queries = make_queries(ds, single)
        _, m1, _ = run_dataset(ds, single, k=50, batch=16, queries=queries)
        _, m2, _ = run_dataset(ds, sharded, k=50, batch=16, queries=queries)
        for key in m1:
            assert abs(m1[key] - m2[key]) < 1e-9, (key, m1[key], m2[key])
