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


def save_segment(seg: SealedSegment, path: str, compress: bool = True) -> None:
    """Write a sealed segment; with compress=True the [B, 128] block arrays
    are stored bit-packed (doc ids delta-coded from the block minimum, term
    frequencies plain — the BlockTuple codec policy, compression.rs:36-136)
    through the native codec with a numpy fallback."""
    arrays = {
        name: getattr(seg, name)
        for name in _SEGMENT_FIELDS
        if name not in ("block_docids", "block_tfs")
    }
    b = seg.n_blocks
    if compress and b:
        from ..native import loader
        from ..ops.bitpack import pack_u32_np

        # Delta bases: previous value convention = block min - 0? The
        # codec deltas from a caller-provided base; use each block's own
        # min doc (stored in block metadata) so deltas stay small.
        bases = seg.block_min_doc.astype(np.uint32)
        docids = seg.block_docids.astype(np.uint32)
        tfs = seg.block_tfs.astype(np.uint32)
        packed = loader.compress_blocks(docids, bases)
        if packed is None:
            # numpy fallback: per-block delta + pack.
            widths = np.zeros(b, dtype=np.uint32)
            chunks = []
            offsets = np.zeros(b + 1, dtype=np.int64)
            for i in range(b):
                deltas = np.diff(
                    np.concatenate([[bases[i]], docids[i]]).astype(np.uint64)
                ).astype(np.uint32)
                w = int(deltas.max()).bit_length() if deltas.max() else 0
                widths[i] = w
                c = pack_u32_np(deltas, w).view(np.uint8)
                chunks.append(c)
                offsets[i + 1] = offsets[i] + c.nbytes
            arrays["cd_bytes"] = (
                np.concatenate(chunks) if chunks else np.zeros(0, np.uint8)
            )
            arrays["cd_bits"] = widths
            arrays["cd_offsets"] = offsets
        else:
            data, widths, offsets = packed
            arrays["cd_bytes"] = data
            arrays["cd_bits"] = widths
            arrays["cd_offsets"] = offsets
        packed_t = loader.compress_blocks(tfs)
        if packed_t is None:
            widths = np.zeros(b, dtype=np.uint32)
            chunks = []
            offsets = np.zeros(b + 1, dtype=np.int64)
            for i in range(b):
                w = int(tfs[i].max()).bit_length() if tfs[i].max() else 0
                widths[i] = w
                c = pack_u32_np(tfs[i], w).view(np.uint8)
                chunks.append(c)
                offsets[i + 1] = offsets[i] + c.nbytes
            arrays["ct_bytes"] = (
                np.concatenate(chunks) if chunks else np.zeros(0, np.uint8)
            )
            arrays["ct_bits"] = widths
            arrays["ct_offsets"] = offsets
        else:
            data, widths, offsets = packed_t
            arrays["ct_bytes"] = data
            arrays["ct_bits"] = widths
            arrays["ct_offsets"] = offsets
    else:
        arrays["block_docids"] = seg.block_docids
        arrays["block_tfs"] = seg.block_tfs
    np.savez_compressed(path, **arrays)


def load_segment(path: str, options: IndexOptions, n_docs: int, sum_dl: int) -> SealedSegment:
    with np.load(path) as data:
        arrays = {
            name: data[name]
            for name in _SEGMENT_FIELDS
            if name in data.files
        }
        if "cd_bytes" in data.files:
            from ..native import loader
            from ..ops.bitpack import unpack_u32_np

            b = arrays["block_n"].size
            bases = arrays["block_min_doc"].astype(np.uint32)
            docids = loader.decompress_blocks(
                data["cd_bytes"], data["cd_bits"], data["cd_offsets"], bases
            )
            if docids is None:
                docids = np.zeros((b, 128), dtype=np.uint32)
                bb, off = data["cd_bytes"], data["cd_offsets"]
                for i in range(b):
                    words = np.frombuffer(
                        bb[off[i] : off[i + 1]].tobytes().ljust(
                            ((128 * int(data["cd_bits"][i]) + 31) // 32) * 4,
                            b"\x00",
                        ),
                        dtype=np.uint32,
                    )
                    deltas = unpack_u32_np(words, int(data["cd_bits"][i]), 128)
                    docids[i] = bases[i] + np.cumsum(
                        deltas.astype(np.uint64)
                    ).astype(np.uint32)
            tfs = loader.decompress_blocks(
                data["ct_bytes"], data["ct_bits"], data["ct_offsets"]
            )
            if tfs is None:
                tfs = np.zeros((b, 128), dtype=np.uint32)
                bb, off = data["ct_bytes"], data["ct_offsets"]
                for i in range(b):
                    words = np.frombuffer(
                        bb[off[i] : off[i + 1]].tobytes().ljust(
                            ((128 * int(data["ct_bits"][i]) + 31) // 32) * 4,
                            b"\x00",
                        ),
                        dtype=np.uint32,
                    )
                    tfs[i] = unpack_u32_np(words, int(data["ct_bits"][i]), 128)
            arrays["block_docids"] = docids.astype(np.int32)
            arrays["block_tfs"] = tfs.astype(np.int32)
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
