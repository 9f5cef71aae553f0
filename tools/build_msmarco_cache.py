"""Build and cache the streamed synthetic MS MARCO index (8.84M docs).

The north-star-scale quality artifact (VERDICT r3 #2) needs the index
built once; `bench.py --dataset synthetic:msmarco --cache DIR` then
reloads it in seconds and runs the TPU eval.  The build itself is pure
host work (out-of-core spill sort, parallel/hostbuild.py), so this
script pins jax to the CPU backend and can run in the background while
the chip serves other measurements.

Usage:  python tools/build_msmarco_cache.py [shape] [cache_dir]
        (defaults: msmarco .benchcache)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    from vectorchord_bm25_tpu.data.harness import build_index_streaming
    from vectorchord_bm25_tpu.data.stream_synth import generate_streaming
    from vectorchord_bm25_tpu.index.storage import save_index

    shape = sys.argv[1] if len(sys.argv) > 1 else "msmarco"
    cache = sys.argv[2] if len(sys.argv) > 2 else ".benchcache"
    idx_dir = os.path.join(cache, f"dsidx_{shape}")
    if os.path.exists(os.path.join(idx_dir, "CURRENT")):
        print(f"already cached at {idx_dir}")
        return
    t0 = time.time()
    ds = generate_streaming(shape)
    print(
        f"{ds.name}: {ds.n_docs} docs, {ds.n_queries} queries; building",
        flush=True,
    )

    def progress(stage, done, total):
        print(f"[{time.time() - t0:7.0f}s] {stage} {done}/{total}", flush=True)

    index = build_index_streaming(ds, engine="stream", progress=progress)
    print(f"[{time.time() - t0:7.0f}s] built; saving to {idx_dir}", flush=True)
    os.makedirs(idx_dir, exist_ok=True)
    save_index(index, idx_dir)
    print(f"[{time.time() - t0:7.0f}s] done", flush=True)


if __name__ == "__main__":
    main()
