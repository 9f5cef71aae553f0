"""Persistence round-trip + CLI end-to-end tests."""

import json
import subprocess
import sys

import numpy as np

import os as _os
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

import pytest

from vectorchord_bm25_tpu.index.bm25index import Bm25Index
from vectorchord_bm25_tpu.index.storage import load_index, save_index
from vectorchord_bm25_tpu.text.intern import Document, Query

from test_sealed import make_docs


class TestPersistence:
    def test_roundtrip(self, rng, tmp_path):
        docs = make_docs(rng, 40, vocab=10)
        index = Bm25Index.build(docs)
        index.insert(Document.from_int_ids([1, 2]), payload=500)
        index.insert(Document.from_int_ids([3]), payload=501)
        index.bulkdelete(lambda p: p == 5 or p == 501)

        d = str(tmp_path / "idx")
        save_index(index, d)
        loaded = load_index(d)

        assert loaded.sealed.n_docs == index.sealed.n_docs
        assert loaded.seed == index.seed
        assert np.array_equal(loaded.deleted, index.deleted)
        assert len(loaded.growing) == 2
        assert loaded.growing.deleted == [False, True]
        q = Query.from_int_ids([0, 1, 2, 3])
        a = [(h.payload, round(h.score, 5)) for h in index.search(q, k=20)]
        b = [(h.payload, round(h.score, 5)) for h in loaded.search(q, k=20)]
        assert a == b

    def test_version_check(self, rng, tmp_path):
        docs = make_docs(rng, 5, vocab=3)
        d = str(tmp_path / "idx")
        save_index(Bm25Index.build(docs), d)
        gen = open(f"{d}/CURRENT").read().strip()
        meta = json.load(open(f"{d}/{gen}/meta.json"))
        meta["version"] = 999
        json.dump(meta, open(f"{d}/{gen}/meta.json", "w"))
        with pytest.raises(ValueError, match="rebuild the index"):
            load_index(d)


class TestCli:
    def _run(self, *args):
        return subprocess.run(
            [sys.executable, "-m", "vectorchord_bm25_tpu.cli", *args],
            capture_output=True,
            text=True,
            cwd=_REPO_ROOT,
            env={
                **__import__("os").environ,
                "JAX_PLATFORMS": "cpu",
                "PYTHONPATH": _REPO_ROOT,
            },
            timeout=300,
        )

    def test_build_search_lifecycle(self, tmp_path):
        corpus = tmp_path / "corpus.jsonl"
        corpus.write_text(
            "\n".join(
                json.dumps({"id": i + 1, "text": t})
                for i, t in enumerate(
                    [
                        "PostgreSQL is a powerful database system",
                        "full text search with ranking",
                        "BM25 ranking for search engines",
                        "the PostgreSQL community improves the database",
                    ]
                )
            )
        )
        idx = str(tmp_path / "idx")
        r = self._run("build", "--input", str(corpus), "--index", idx)
        assert r.returncode == 0, r.stderr
        assert "built: 4 docs" in r.stdout

        r = self._run("search", "--index", idx, "--query", "postgresql database", "-k", "3")
        assert r.returncode == 0, r.stderr
        lines = [l for l in r.stdout.splitlines() if l]
        assert len(lines) >= 2
        top_payload = int(lines[0].split("\t")[1])
        assert top_payload in (1, 4)

        r = self._run("insert", "--index", idx, "--text",
                      "postgresql postgresql postgresql", "--payload", "99")
        assert r.returncode == 0, r.stderr
        r = self._run("search", "--index", idx, "--query", "postgresql", "-k", "5")
        assert "\t99\t" in r.stdout

        r = self._run("delete", "--index", idx, "--payload", "99")
        assert "deleted 1" in r.stdout
        r = self._run("maintain", "--index", idx)
        assert r.returncode == 0, r.stderr
        r = self._run("inspect", "--index", idx)
        info = json.loads(r.stdout)
        assert info["n_docs"] == 4
        assert info["growing_docs"] == 0
