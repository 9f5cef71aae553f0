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

__all__ = [
    "build_shards_on_device",
    "build_shards_on_device_from_postings",
    "device_doc_offsets",
]


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


def _documents_to_shard_cols(documents, bounds):
    """Host scan phase (the worker heap-scan analog): flatten each
    shard's (key, doc, tf) postings into u64-column form."""
    n_shards = len(bounds) - 1
    shard_cols = []
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
    return shard_cols


def _postings_to_shard_cols(keys, doc_ids, tfs, doc_start, bounds):
    """Shard columns from flat doc-grouped postings (the scale path —
    no per-document Python objects): slice the CSR at the shard bounds
    and rebase doc ids to shard-local."""
    n_shards = len(bounds) - 1
    keys = np.asarray(keys, dtype=f"S{WIDTH}")
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs)
    doc_start = np.asarray(doc_start, dtype=np.int64)
    shard_cols = []
    for i in range(n_shards):
        lo_b, hi_b = int(bounds[i]), int(bounds[i + 1])
        p0, p1 = int(doc_start[lo_b]), int(doc_start[hi_b])
        hi_col, lo_col = _keys_to_u64_cols(keys[p0:p1])
        shard_cols.append(
            (
                hi_col,
                lo_col,
                (doc_ids[p0:p1] - lo_b).astype(np.int32),
                tfs[p0:p1].astype(np.uint32),
                hi_b - lo_b,
            )
        )
    return shard_cols


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
    return _build_shards_from_cols(
        _documents_to_shard_cols(documents, bounds),
        bounds, payloads, options, mesh, axis,
    )


def build_shards_on_device_from_postings(
    keys, doc_ids, tfs, doc_start,
    bounds: np.ndarray,
    payloads: np.ndarray,
    options: IndexOptions,
    mesh=None,
    axis: str = "d",
) -> List[SealedSegment]:
    """build_shards_on_device for flat doc-grouped postings (keys [P]
    |S16, doc_ids [P], tfs [P], doc_start [N+1] CSR) — the
    heap-scan-free scale path used by large builds."""
    return _build_shards_from_cols(
        _postings_to_shard_cols(keys, doc_ids, tfs, doc_start, bounds),
        bounds, payloads, options, mesh, axis,
    )


def _build_shards_from_cols(
    shard_cols,
    bounds: np.ndarray,
    payloads: np.ndarray,
    options: IndexOptions,
    mesh=None,
    axis: str = "d",
) -> List[SealedSegment]:
    import jax
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n_shards = len(bounds) - 1
    if mesh is None:
        mesh = Mesh(np.array(jax.devices()[:n_shards]), (axis,))
    if n_shards != mesh.devices.size:
        raise ValueError("one shard per mesh device required")

    # Per-device staging: each shard's six padded [1, P] columns are
    # placed directly on its own device and assembled into the global
    # [D, P] sharded arrays — the host never materializes a dense
    # [D, Pmax] stack (O(max-shard) host staging instead of
    # O(devices x max-shard); am_build.rs workers likewise each hold
    # only their own run).  Pad postings carry the maximal key so the
    # device sort pushes them to the tail; the two u64 key columns split
    # into four u32 columns (TPUs have no native 64-bit sort; u32 column
    # sorts are) — numeric order is preserved column-major.
    from ..utils.buckets import bucket_pow2

    p_needed = max(max(c[0].size for c in shard_cols), 1)
    pmax = bucket_pow2(p_needed, 8)  # bucket: stable compile shapes
    devices = list(mesh.devices.flat)
    sharding = NamedSharding(mesh, P(axis, None))

    fills = (
        np.uint32(0xFFFFFFFF),
        np.uint32(0xFFFFFFFF),
        np.uint32(0xFFFFFFFF),
        np.uint32(0xFFFFFFFF),
        np.int32(np.iinfo(np.int32).max),
        np.uint32(0),
    )
    per_dev = [[] for _ in range(6)]
    for i, (h, l, d_, t, _) in enumerate(shard_cols):
        cols = (
            (h >> np.uint64(32)).astype(np.uint32),
            (h & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (l >> np.uint64(32)).astype(np.uint32),
            (l & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            d_.astype(np.int32),
            t.astype(np.uint32),
        )
        for j, (col, fill) in enumerate(zip(cols, fills)):
            row = np.full((1, pmax), fill)
            row[0, : col.size] = col
            per_dev[j].append(jax.device_put(row, devices[i]))
            del row

    def assemble(parts):
        return jax.make_array_from_single_device_arrays(
            (n_shards, pmax), sharding, parts
        )

    global_cols = [assemble(parts) for parts in per_dev]
    del per_dev

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
    outs_dev = jax.jit(fn)(*global_cols)
    del global_cols

    # Device collective doc-offset scan; must agree with the host bounds
    # (the contiguous-shard invariant).
    counts = np.asarray([c[4] for c in shard_cols], dtype=np.int64)
    offsets = device_doc_offsets(counts, mesh, axis)
    expect = np.cumsum(counts) - counts
    if not np.array_equal(offsets, expect):
        raise AssertionError(
            f"device offset scan disagrees with host: {offsets} vs {expect}"
        )

    # Flush phase per shard (flush.rs analog): pull each shard's sorted
    # run back one device at a time (host staging stays O(max-shard)),
    # trim the pad tail, and feed the vectorized block-cutting pipeline.
    shard_of_dev = {}
    for j in range(6):
        for sh in outs_dev[j].addressable_shards:
            shard_of_dev.setdefault(sh.index[0].start or 0, {})[j] = sh
    payloads = np.asarray(payloads, dtype=np.int64)
    shards = []
    for i, (h, l, d_, t, n_docs) in enumerate(shard_cols):
        total = h.size
        row = shard_of_dev[i]
        cols = [np.asarray(row[j].data).reshape(-1)[:total] for j in range(6)]
        s_hi = (cols[0].astype(np.uint64) << np.uint64(32)) | cols[1].astype(
            np.uint64
        )
        s_lo = (cols[2].astype(np.uint64) << np.uint64(32)) | cols[3].astype(
            np.uint64
        )
        keys_sorted = _u64_cols_to_keys(s_hi, s_lo)
        lo_b = int(bounds[i])
        shards.append(
            build_sealed_segment_from_postings(
                keys_sorted,
                cols[4].astype(np.int64),
                cols[5].astype(np.int64),
                n_docs,
                payloads=payloads[lo_b : lo_b + n_docs],
                options=options,
                presorted=True,
            )
        )
    return shards
