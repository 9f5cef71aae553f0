"""Device-side sharded index build (shard_map over the mesh).

The reference's parallel build fans the corpus out to Postgres DSM
workers that each sort their shard's (token, doc, tf) mappings and then
k-way merge with doc-id offset rebasing
(src/index/bm25/am/am_build.rs:353-527, crates/bm25/src/io.rs:244-282).
The TPU-native analog runs the expensive parts on the device mesh:

- the per-shard posting sort — the build's dominant cost — runs as ONE
  `lax.sort` per device inside shard_map (every shard sorts in parallel
  on its own chip, not serially on the host);
- 16-byte keys sort as two big-endian u64 columns (numeric order ==
  byte-lexicographic order, the same trick the host build uses), with
  doc id as a third sort key, so the device order is bit-identical to
  the host lexsort;
- global doc-id offsets are an exclusive scan of shard doc counts over
  the mesh axis (all_gather + cumsum, the psum-scan of SURVEY.md §2.8) —
  the DSM shared-counter analog;
- the global token table (union vocabulary, summed df) is a host
  exchange over the per-shard sorted key runs, exactly like the
  reference leader's merge of worker runs.

Block cutting / Wand metadata over each shard's sorted run stays the
vectorized numpy flush (index/sealed.py) — it is bandwidth-trivial next
to the sort and must run where the SealedSegment arrays live.
"""

from __future__ import annotations

import sys
from typing import List, Optional, Sequence

import numpy as np

from ..index.sealed import SealedSegment, build_sealed_segment_from_postings
from ..text.intern import WIDTH, Document
from ..utils.options import IndexOptions

__all__ = ["build_shards_on_device", "device_doc_offsets"]


def _keys_to_u64_cols(keys: np.ndarray):
    """16-byte keys -> (hi, lo) uint64 columns whose numeric order is the
    byte-lexicographic key order."""
    k2 = np.ascontiguousarray(keys.astype(f"S{WIDTH}")).view(np.uint64)
    k2 = k2.reshape(-1, 2)
    if sys.byteorder == "little":
        return k2[:, 0].byteswap(), k2[:, 1].byteswap()
    return k2[:, 0].copy(), k2[:, 1].copy()


def _u64_cols_to_keys(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    if sys.byteorder == "little":
        hi, lo = hi.byteswap(), lo.byteswap()
    out = np.empty((hi.size, 2), dtype=np.uint64)
    out[:, 0] = hi
    out[:, 1] = lo
    return out.reshape(-1).view(f"S{WIDTH}")


def device_doc_offsets(counts: np.ndarray, mesh, axis: str = "d"):
    """Exclusive scan of per-shard doc counts over the mesh axis — the
    doc-id offset rebasing of io.rs:244-282 as a device collective."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    d = counts.size

    def scan(c):
        allc = jax.lax.all_gather(c[0, 0], axis)  # [D]
        excl = jnp.cumsum(allc) - allc
        return excl[jax.lax.axis_index(axis)][None, None]

    fn = shard_map(
        scan,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=P(axis),
        check_vma=False,
    )
    dev_counts = jax.device_put(
        counts.reshape(d, 1).astype(np.int32),
        NamedSharding(mesh, P(axis, None)),
    )
    return np.asarray(jax.jit(fn)(dev_counts)).reshape(-1)


def build_shards_on_device(
    documents: Sequence[Document],
    bounds: np.ndarray,
    payloads: np.ndarray,
    options: IndexOptions,
    mesh=None,
    axis: str = "d",
) -> List[SealedSegment]:
    """Build one sealed segment per mesh device, sorting every shard's
    postings on its own device in parallel.  Bit-identical to the host
    per-shard build (ShardedIndex.build(device_build=False))."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n_shards = len(bounds) - 1
    if mesh is None:
        mesh = Mesh(np.array(jax.devices()[:n_shards]), (axis,))
    if n_shards != mesh.devices.size:
        raise ValueError("one shard per mesh device required")

    # Host scan phase (the worker heap-scan analog): flatten each shard's
    # (key, doc, tf) postings into u64-column form.
    shard_cols = []
    p_needed = 1
    for i in range(n_shards):
        lo_b, hi_b = int(bounds[i]), int(bounds[i + 1])
        docs = documents[lo_b:hi_b]
        counts = np.fromiter(
            (len(d) for d in docs), dtype=np.int64, count=len(docs)
        )
        total = int(counts.sum())
        if total:
            keys = np.concatenate([d.keys for d in docs]).astype(f"S{WIDTH}")
            tfs = np.concatenate([d.values for d in docs]).astype(np.uint32)
        else:
            keys = np.zeros(0, dtype=f"S{WIDTH}")
            tfs = np.zeros(0, dtype=np.uint32)
        doc_of = np.repeat(np.arange(len(docs), dtype=np.int32), counts)
        hi_col, lo_col = _keys_to_u64_cols(keys)
        shard_cols.append((hi_col, lo_col, doc_of, tfs, len(docs)))
        p_needed = max(p_needed, total)

    # Stack padded [D, P] columns; pad postings carry the maximal key so
    # the device sort pushes them to the tail.  The two u64 key columns
    # split into four u32 columns (TPUs have no native 64-bit sort; u32
    # column sorts are) — numeric order is preserved column-major.
    pmax = p_needed
    k32 = [
        np.full((n_shards, pmax), np.uint32(0xFFFFFFFF)) for _ in range(4)
    ]
    doc = np.full((n_shards, pmax), np.int32(np.iinfo(np.int32).max))
    tf = np.zeros((n_shards, pmax), dtype=np.uint32)
    for i, (h, l, d_, t, _) in enumerate(shard_cols):
        k32[0][i, : h.size] = (h >> np.uint64(32)).astype(np.uint32)
        k32[1][i, : h.size] = (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        k32[2][i, : l.size] = (l >> np.uint64(32)).astype(np.uint32)
        k32[3][i, : l.size] = (l & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        doc[i, : d_.size] = d_
        tf[i, : t.size] = t

    def shard_put(x):
        return jax.device_put(x, NamedSharding(mesh, P(axis, None)))

    def sort_shard(k0, k1, k2, k3, d_, t):
        # One vectorized sort per device: (key, doc) as five u32/i32 key
        # columns, tf carried — the per-worker sort_unstable of
        # io.rs:90-98.  (key, doc) pairs are unique so the order is total
        # and deterministic.
        return jax.lax.sort((k0, k1, k2, k3, d_, t), num_keys=5, dimension=-1)

    fn = shard_map(
        sort_shard,
        mesh=mesh,
        in_specs=tuple(P(axis) for _ in range(6)),
        out_specs=tuple(P(axis) for _ in range(6)),
        check_vma=False,
    )
    outs = jax.jit(fn)(*(shard_put(x) for x in (*k32, doc, tf)))
    outs = [np.asarray(o) for o in outs]
    s_hi = (outs[0].astype(np.uint64) << np.uint64(32)) | outs[1].astype(
        np.uint64
    )
    s_lo = (outs[2].astype(np.uint64) << np.uint64(32)) | outs[3].astype(
        np.uint64
    )
    s_doc, s_tf = outs[4], outs[5]

    # Device collective doc-offset scan; must agree with the host bounds
    # (the contiguous-shard invariant).
    counts = np.asarray([c[4] for c in shard_cols], dtype=np.int64)
    offsets = device_doc_offsets(counts, mesh, axis)
    expect = np.cumsum(counts) - counts
    if not np.array_equal(offsets, expect):
        raise AssertionError(
            f"device offset scan disagrees with host: {offsets} vs {expect}"
        )

    # Flush phase per shard (flush.rs analog): the sorted run feeds the
    # vectorized block-cutting pipeline directly.
    payloads = np.asarray(payloads, dtype=np.int64)
    shards = []
    for i, (h, l, d_, t, n_docs) in enumerate(shard_cols):
        total = h.size
        keys_sorted = _u64_cols_to_keys(s_hi[i, :total], s_lo[i, :total])
        lo_b = int(bounds[i])
        shards.append(
            build_sealed_segment_from_postings(
                keys_sorted,
                s_doc[i, :total].astype(np.int64),
                s_tf[i, :total].astype(np.int64),
                n_docs,
                payloads=payloads[lo_b : lo_b + n_docs],
                options=options,
                presorted=True,
            )
        )
    return shards
