"""Host-parallel, out-of-core index build.

The reference builds large indexes with Postgres parallel workers that
each heap-scan a corpus share, spill sorted (token, doc, tf) mapping runs
to disk, locally merge, and then k-way merge across workers with doc-id
offset rebasing before the single-threaded flush
(src/index/bm25/am/am_build.rs:353-746, crates/bm25/src/io.rs).

This module is that pipeline for the standalone framework:

- N worker processes tokenize + intern their corpus shard and spill
  sorted 24-byte mapping records (key[16] | doc u32 | tf u32) plus a
  records sidecar (doc lengths / payloads);
- runs are sorted in place and k-way merged with per-worker doc-id
  offsets through the native C++ merger (numpy fallback);
- the merged stream feeds `build_sealed_segment_from_postings`
  (presorted=True) — the flush analog.

Spill format matches crates/bm25/src/segment.rs's Mapping ordering
((key, doc) lexicographic), so runs produced here are mergeable by the
same machinery regardless of which worker wrote them.
"""

from __future__ import annotations

import os
import tempfile
from concurrent.futures import ProcessPoolExecutor
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..index.sealed import SealedSegment, build_sealed_segment_from_postings
from ..native import loader
from ..utils.options import IndexOptions

__all__ = ["build_out_of_core"]

_REC_DTYPE = np.dtype([("key", "S16"), ("doc", "<u4"), ("tf", "<u4")])


def _tokenize_shard(args) -> Tuple[str, np.ndarray, np.ndarray]:
    """Worker: tokenize + intern a shard, write one sorted mapping run.

    Returns (run_path, doc_lengths, payloads) for the shard.
    """
    (texts, payloads, seed, tokenizer_name, run_path) = args
    from ..text.corpus import document_from_counts
    from ..text.tokenizer import tsvector

    tokenizer = tsvector if tokenizer_name == "tsvector" else None
    if tokenizer is None:
        raise ValueError(f"unknown tokenizer {tokenizer_name!r}")

    keys_parts: List[np.ndarray] = []
    docs_parts: List[np.ndarray] = []
    tfs_parts: List[np.ndarray] = []
    lengths = np.zeros(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        doc = document_from_counts(seed, tokenizer(text))
        lengths[i] = doc.length()
        if len(doc):
            keys_parts.append(doc.keys)
            docs_parts.append(np.full(len(doc), i, dtype=np.uint32))
            tfs_parts.append(doc.values.astype(np.uint32))
    total = sum(p.size for p in keys_parts)
    rec = np.zeros(total, dtype=_REC_DTYPE)
    if total:
        rec["key"] = np.concatenate(keys_parts)
        rec["doc"] = np.concatenate(docs_parts)
        rec["tf"] = np.concatenate(tfs_parts)
    rec.tofile(run_path)
    # Sort the run in place: native fast path, numpy fallback.
    if not loader.sort_mappings_file(run_path):
        rec = np.fromfile(run_path, dtype=_REC_DTYPE)
        rec = rec[np.lexsort((rec["doc"], rec["key"]))]
        rec.tofile(run_path)
    return run_path, lengths, np.asarray(payloads, dtype=np.int64)


def _merge_runs(
    run_paths: Sequence[str], doc_offsets: Sequence[int], out_path: str
) -> None:
    if loader.merge_mappings(list(run_paths), list(doc_offsets), out_path):
        return
    # numpy fallback: concatenate with offsets, sort.
    parts = []
    for path, off in zip(run_paths, doc_offsets):
        rec = np.fromfile(path, dtype=_REC_DTYPE)
        rec["doc"] = rec["doc"] + np.uint32(off)
        parts.append(rec)
    merged = np.concatenate(parts) if parts else np.zeros(0, _REC_DTYPE)
    merged = merged[np.lexsort((merged["doc"], merged["key"]))]
    merged.tofile(out_path)


def build_out_of_core(
    texts: Sequence[str],
    seed: bytes,
    payloads: Optional[Sequence[int]] = None,
    options: Optional[IndexOptions] = None,
    n_workers: int = 4,
    spill_dir: Optional[str] = None,
    progress=None,
) -> SealedSegment:
    """Multi-process corpus build through disk-spilled sorted runs."""
    options = options or IndexOptions()
    n = len(texts)
    if payloads is None:
        payloads = np.arange(n, dtype=np.int64)
    payloads = np.asarray(payloads, dtype=np.int64)

    tmp_ctx = (
        tempfile.TemporaryDirectory() if spill_dir is None else None
    )
    workdir = tmp_ctx.name if tmp_ctx else spill_dir
    try:
        bounds = np.linspace(0, n, n_workers + 1).astype(np.int64)
        jobs = []
        for w in range(n_workers):
            lo, hi = int(bounds[w]), int(bounds[w + 1])
            jobs.append(
                (
                    list(texts[lo:hi]),
                    payloads[lo:hi],
                    seed,
                    "tsvector",
                    os.path.join(workdir, f"mappings.{w:03d}"),
                )
            )

        if n_workers == 1:
            results = [_tokenize_shard(jobs[0])]
        else:
            # Spawn (not fork): the parent may have live JAX threads, and
            # forking a multithreaded process can deadlock.
            import multiprocessing

            ctx = multiprocessing.get_context("spawn")
            with ProcessPoolExecutor(
                max_workers=n_workers, mp_context=ctx
            ) as pool:
                results = list(pool.map(_tokenize_shard, jobs))
        if progress is not None:
            progress("scan", n, n)

        # Doc-id offset rebasing: exclusive scan of shard sizes
        # (io.rs:244-282).
        shard_sizes = [len(r[1]) for r in results]
        offsets = np.cumsum([0] + shard_sizes)[:-1]
        all_lengths = np.concatenate([r[1] for r in results])
        all_payloads = np.concatenate([r[2] for r in results])

        merged_path = os.path.join(workdir, "merged")
        _merge_runs([r[0] for r in results], offsets.tolist(), merged_path)
        if progress is not None:
            progress("merge", n, n)

        merged = np.fromfile(merged_path, dtype=_REC_DTYPE)
        return build_sealed_segment_from_postings(
            merged["key"],
            merged["doc"].astype(np.int64),
            merged["tf"].astype(np.int64),
            n,
            payloads=all_payloads,
            options=options,
            progress=progress,
            presorted=True,
        )
    finally:
        if tmp_ctx:
            tmp_ctx.cleanup()
