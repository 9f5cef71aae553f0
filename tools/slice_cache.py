"""Derive a smaller cached bench segment from a larger one by doc prefix.

The multi-million-doc synthetic corpora take an hour+ to generate on one
host core; a doc-prefix slice of an existing cached segment is the same
generator family (topical clustering is doc-contiguous, so a prefix keeps
the cluster structure) and costs minutes: decompress the cached blocks,
keep postings with doc_id < n, rebuild (stats recomputed exactly for the
sliced corpus), and write seg/meta/stream cache entries that
`bench.py --cache` / `tools/roofline.py --cache` pick up directly.

Usage: python tools/slice_cache.py --cache .benchcache \
           --src 8388608 --dst 4194304 [--vocab 50000] [--avg-len 80]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", required=True)
    ap.add_argument("--src", type=int, required=True)
    ap.add_argument("--dst", type=int, required=True)
    ap.add_argument("--vocab", type=int, default=50000)
    ap.add_argument("--avg-len", type=int, default=80)
    args = ap.parse_args()
    if args.dst >= args.src:
        raise SystemExit("--dst must be smaller than --src")

    from vectorchord_bm25_tpu.index.sealed import (
        build_sealed_segment_from_postings,
    )
    from vectorchord_bm25_tpu.index.storage import load_segment, save_segment
    from vectorchord_bm25_tpu.index.stream import (
        build_stream_index,
        save_stream_index,
    )
    from vectorchord_bm25_tpu.utils.options import IndexOptions

    src_tag = f"{args.src}_{args.vocab}_{args.avg_len}"
    dst_tag = f"{args.dst}_{args.vocab}_{args.avg_len}"
    with open(os.path.join(args.cache, f"meta_{src_tag}.json")) as f:
        m = json.load(f)
    t0 = time.time()
    seg = load_segment(
        os.path.join(args.cache, f"seg_{src_tag}.npz"),
        IndexOptions(),
        m["n_docs"],
        m["sum_dl"],
    )
    print(f"loaded src segment in {time.time() - t0:.0f}s", flush=True)

    # Flatten the [B, 128] blocks back to (token_id, doc, tf) postings in
    # (token, doc) order (blocks are doc-ascending within each token).
    # int32 throughout (docs/tfs are stored int32 in the blocks; token
    # ids fit int32 by the segment's own vocab bound) and intermediates
    # freed before the rebuild: at the 8.4M source (~670M postings) the
    # earlier int64 flatten held ~16 GB of transient host arrays on top
    # of the loaded segment (ADVICE r4).
    blocks_per_tok = np.diff(seg.token_block_start)
    blk_tok = np.repeat(
        np.arange(seg.token_keys.size, dtype=np.int32), blocks_per_tok
    )
    lane = np.arange(128, dtype=np.int32)[None, :]
    live = lane < seg.block_n[:, None]
    tok_ids = np.repeat(blk_tok, seg.block_n.astype(np.int64))
    del blk_tok
    docs = seg.block_docids[live]
    tfs = seg.block_tfs[live]
    del live, lane
    n_src = docs.size
    keep = docs < args.dst
    tok_ids, docs, tfs = tok_ids[keep], docs[keep], tfs[keep]
    del keep
    print(
        f"sliced {n_src} -> {docs.size} postings "
        f"({time.time() - t0:.0f}s)",
        flush=True,
    )

    out = build_sealed_segment_from_postings(
        None,
        docs,
        tfs,
        args.dst,
        presorted=True,
        token_ids=tok_ids,
        vocab_keys=seg.token_keys,
    )
    print(f"rebuilt segment ({time.time() - t0:.0f}s)", flush=True)
    save_segment(out, os.path.join(args.cache, f"seg_{dst_tag}.npz"))
    with open(os.path.join(args.cache, f"meta_{dst_tag}.json"), "w") as f:
        json.dump({"n_docs": out.n_docs, "sum_dl": out.sum_dl}, f)
    stream = build_stream_index(out)
    save_stream_index(
        stream, os.path.join(args.cache, f"stream_{dst_tag}.npz")
    )
    print(f"cached {dst_tag} ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
