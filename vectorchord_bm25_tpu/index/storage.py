"""Index persistence: save/load sealed segments and whole indexes.

The reference delegates durability to PostgreSQL WAL; the standalone
framework checkpoints the array-resident index to disk (SURVEY.md §5:
"checkpoint sealed segments to disk (orbax-style), growing buffer replay
log").  Format: one directory per index —

    meta.json            options, seed, stats, format version
    sealed.npz           all sealed-segment arrays
    growing.jsonl        replay log of growing-segment inserts
    deleted.npy          sealed delete bitmap

The format carries a magic + version and refuses to load mismatched
versions with a "rebuild the index" error, mirroring the reference's
on-disk versioning (tuples.rs:104-108).
"""

from __future__ import annotations

import base64
import json
import os
from typing import Optional

import numpy as np

from ..text.intern import WIDTH, Document
from ..utils.options import IndexOptions, SearchOptions
from .bm25index import Bm25Index
from .sealed import SealedSegment

MAGIC = "vcbm25-tpu"
VERSION = 1

__all__ = ["save_index", "load_index", "save_segment", "load_segment"]

_SEGMENT_FIELDS = [
    "doc_fieldnorm",
    "doc_payload",
    "token_keys",
    "token_df",
    "token_wand_fn",
    "token_wand_tf",
    "token_block_start",
    "block_min_doc",
    "block_max_doc",
    "block_n",
    "block_wand_fn",
    "block_wand_tf",
    "block_docids",
    "block_tfs",
]


def save_segment(seg: SealedSegment, path: str) -> None:
    arrays = {name: getattr(seg, name) for name in _SEGMENT_FIELDS}
    np.savez_compressed(path, **arrays)


def load_segment(path: str, options: IndexOptions, n_docs: int, sum_dl: int) -> SealedSegment:
    with np.load(path) as data:
        arrays = {name: data[name] for name in _SEGMENT_FIELDS}
    return SealedSegment(options=options, n_docs=n_docs, sum_dl=sum_dl, **arrays)


def save_index(index: Bm25Index, directory: str) -> None:
    os.makedirs(directory, exist_ok=True)
    meta = {
        "magic": MAGIC,
        "version": VERSION,
        "seed": base64.b64encode(index.seed).decode(),
        "options": {"k1": index.options.k1, "b": index.options.b},
        "search_options": {
            "limit": index.search_options.limit,
            "prefilter": index.search_options.prefilter,
        },
        "engine": index.engine_kind,
        "n_docs": index.sealed.n_docs,
        "sum_dl": index.sealed.sum_dl,
    }
    with open(os.path.join(directory, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    save_segment(index.sealed, os.path.join(directory, "sealed.npz"))
    np.save(os.path.join(directory, "deleted.npy"), index.deleted)
    # Growing segment: replay log of (payload, keys, values).
    with open(os.path.join(directory, "growing.jsonl"), "w") as f:
        for i, doc in enumerate(index.growing.documents):
            rec = {
                "payload": index.growing.payloads[i],
                "deleted": index.growing.deleted[i],
                "keys": base64.b64encode(doc.keys.tobytes()).decode(),
                "values": doc.values.tolist(),
            }
            f.write(json.dumps(rec) + "\n")


def load_index(directory: str) -> Bm25Index:
    with open(os.path.join(directory, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("magic") != MAGIC or meta.get("version") != VERSION:
        raise ValueError(
            f"on-disk index format mismatch (found "
            f"{meta.get('magic')}/{meta.get('version')}, expected "
            f"{MAGIC}/{VERSION}); rebuild the index"
        )
    options = IndexOptions(**meta["options"])
    search_options = SearchOptions(**meta["search_options"])
    seed = base64.b64decode(meta["seed"])
    sealed = load_segment(
        os.path.join(directory, "sealed.npz"),
        options,
        meta["n_docs"],
        meta["sum_dl"],
    )
    index = Bm25Index(
        sealed, seed, options, search_options,
        engine=meta.get("engine", "blockmax"),
    )
    index.deleted = np.load(os.path.join(directory, "deleted.npy"))
    growing_path = os.path.join(directory, "growing.jsonl")
    if os.path.exists(growing_path):
        with open(growing_path) as f:
            for line in f:
                rec = json.loads(line)
                keys = np.frombuffer(
                    base64.b64decode(rec["keys"]), dtype=f"S{WIDTH}"
                )
                doc = Document(
                    keys=keys.copy(),
                    values=np.asarray(rec["values"], dtype=np.uint32),
                )
                slot = index.growing.insert(doc, rec["payload"])
                if rec.get("deleted"):
                    index.growing.deleted[slot] = True
    return index
