"""Streaming out-of-core build: bounded-memory spill/merge/flush.

- the streaming flush must be bit-identical to the in-core vectorized
  flush for any chunk size (boundaries landing mid-run, mid-block);
- workers spill multiple bounded runs and cascades of merges reproduce
  the single-merge result;
- peak RSS of the whole record->segment path stays bounded by
  O(chunk) + segment, never O(corpus records) — checked in a subprocess
  under a hard address-space ceiling (the io.rs:69-98 discipline).
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from vectorchord_bm25_tpu.index.sealed import (
    build_sealed_segment,
    build_sealed_segment_from_postings,
)
from vectorchord_bm25_tpu.index.streamflush import (
    REC_DTYPE,
    build_sealed_segment_streaming,
)
from vectorchord_bm25_tpu.parallel import hostbuild
from vectorchord_bm25_tpu.parallel.hostbuild import build_out_of_core
from vectorchord_bm25_tpu.text.corpus import documents_from_texts
from vectorchord_bm25_tpu.text.intern import random_seed

from test_sealed import make_docs

_FIELDS = [
    "doc_fieldnorm", "doc_payload", "token_keys", "token_df",
    "token_wand_fn", "token_wand_tf", "token_block_start",
    "block_min_doc", "block_max_doc", "block_n",
    "block_wand_fn", "block_wand_tf", "block_docids", "block_tfs",
]


def _assert_identical(a, b):
    assert a.n_docs == b.n_docs and a.sum_dl == b.sum_dl
    for f in _FIELDS:
        np.testing.assert_array_equal(
            getattr(a, f), getattr(b, f), err_msg=f
        )


def _write_sorted_records(path, docs):
    """(key, doc)-sorted record file from Documents (the merge output)."""
    keys = np.concatenate([d.keys for d in docs])
    doc_of = np.repeat(
        np.arange(len(docs), dtype=np.int64),
        [len(d) for d in docs],
    )
    tfs = np.concatenate([d.values for d in docs]).astype(np.uint32)
    order = np.lexsort((doc_of, keys))
    rec = np.zeros(keys.size, dtype=REC_DTYPE)
    rec["key"] = keys[order]
    rec["doc"] = doc_of[order]
    rec["tf"] = tfs[order]
    rec.tofile(path)


class TestStreamingFlush:
    @pytest.mark.parametrize("chunk", [7, 100, 1_000_000])
    def test_bit_identical_to_incore(self, rng, tmp_path, chunk):
        docs = make_docs(rng, 300, vocab=40)
        path = str(tmp_path / "merged")
        _write_sorted_records(path, docs)
        streamed = build_sealed_segment_streaming(
            path, 300, chunk_postings=chunk
        )
        _assert_identical(streamed, build_sealed_segment(docs))

    def test_empty_and_no_postings(self, tmp_path):
        path = str(tmp_path / "merged")
        open(path, "wb").close()
        seg = build_sealed_segment_streaming(path, 5)
        assert seg.n_docs == 5 and seg.n_tokens == 0


class TestBoundedBuild:
    def test_multiple_runs_match_in_memory(self, tmp_path):
        texts = [
            f"token{i % 17} shared word{i % 5} filler text number {i}"
            for i in range(200)
        ]
        seed = random_seed()
        # ~tiny budget: forces many spilled runs per worker.
        oc = build_out_of_core(
            texts, seed, n_workers=2, run_budget=1024, flush_chunk=97
        )
        im = build_sealed_segment(documents_from_texts(seed, texts))
        _assert_identical(oc, im)

    def test_cascaded_merge(self, monkeypatch):
        texts = [f"alpha beta{i % 13} gamma{i % 7} delta" for i in range(150)]
        seed = random_seed()
        monkeypatch.setattr(hostbuild, "MERGE_FAN_IN", 2)
        oc = build_out_of_core(texts, seed, n_workers=3, run_budget=1024)
        im = build_sealed_segment(documents_from_texts(seed, texts))
        _assert_identical(oc, im)

    def test_callable_source(self):
        seed = random_seed()
        texts = [f"stream source doc{i % 11} word{i % 3}" for i in range(80)]
        oc = build_out_of_core(
            _source, seed, n_workers=1, n_docs=80, run_budget=2048
        )
        im = build_sealed_segment(documents_from_texts(seed, texts))
        _assert_identical(oc, im)


def _source(lo, hi):
    return [f"stream source doc{i % 11} word{i % 3}" for i in range(lo, hi)]


_RSS_SCRIPT = textwrap.dedent(
    """
    import resource, sys
    import numpy as np
    sys.path.insert(0, {repo!r})
    from vectorchord_bm25_tpu.index.streamflush import (
        REC_DTYPE, build_sealed_segment_streaming,
    )

    path, out = sys.argv[1], sys.argv[2]
    P = 12_000_000
    VOCAB = 20_000
    N_DOCS = 40_000
    # Write a (key, doc)-sorted record file incrementally: keys ascend
    # by construction (token-major), docs ascend within each token.
    rng = np.random.default_rng(0)
    per_tok = P // VOCAB
    chunk_toks = 500
    with open(path, "wb") as f:
        for t0 in range(0, VOCAB, chunk_toks):
            toks = np.arange(t0, min(t0 + chunk_toks, VOCAB))
            m = toks.size * per_tok
            tok_of = np.repeat(toks, per_tok)
            docs = rng.integers(0, N_DOCS, size=m, dtype=np.uint32)
            order = np.lexsort((docs, tok_of))  # sort docs within token
            rec = np.zeros(m, dtype=REC_DTYPE)
            kb = np.zeros((m, 16), dtype=np.uint8)
            kb[:, :4] = tok_of[order].astype(">u4").view(np.uint8).reshape(-1, 4)
            rec["key"] = kb.reshape(-1).view("S16")[:: 1]
            rec["doc"] = docs[order]
            rec["tf"] = 1 + (docs[order] % 7)
            # Dedup (token, doc) repeats to keep keys strictly grouped.
            keep = np.ones(m, dtype=bool)
            keep[1:] = ~(
                (rec["key"][1:] == rec["key"][:-1])
                & (rec["doc"][1:] == rec["doc"][:-1])
            )
            rec[keep].tofile(f)
    size_mb = __import__("os").path.getsize(path) / 2**20
    base_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    seg = build_sealed_segment_streaming(path, N_DOCS, chunk_postings=500_000)
    peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    seg_mb = seg.memory_bytes() / 2**20
    print(f"records={{size_mb:.0f}}MB segment={{seg_mb:.0f}}MB "
          f"base={{base_kb / 1024:.0f}}MB peak={{peak_kb / 1024:.0f}}MB")
    # Peak must be bounded by baseline + segment + O(chunk), far below
    # baseline + records + in-core flush temporaries (~3x records).
    budget_mb = base_kb / 1024 + seg_mb + 120
    assert peak_kb / 1024 < budget_mb, (peak_kb / 1024, budget_mb)
    assert peak_kb / 1024 < base_kb / 1024 + size_mb, "streamed worse than loading the file whole"
    """
)


class TestBoundedMemory:
    def test_rss_stays_bounded(self, tmp_path):
        """Flush a larger-than-chunk record file in a subprocess and pin
        peak RSS to O(segment + chunk), not O(records)."""
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        script = _RSS_SCRIPT.format(repo=repo)
        r = subprocess.run(
            [sys.executable, "-c", script, str(tmp_path / "rec"),
             str(tmp_path / "out")],
            capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        print(r.stdout.strip())
