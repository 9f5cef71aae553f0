"""Multi-chip sharded index: doc-sharded build and search over a jax Mesh.

The reference's only parallel path is its data-parallel index build over
Postgres DSM workers (src/index/bm25/am/am_build.rs:353-527) and one
backend process per query.  The TPU-native design shards the *documents*
across devices (SURVEY.md §2.8):

- build: each device's corpus shard becomes an independent sealed segment
  (the per-worker external-sort run analog); global doc ids are
  shard-offset rebased exactly like the reference's k-way merge offset
  rebasing (crates/bm25/src/io.rs:244-282); BM25 statistics (N, Σdl,
  per-term df) are combined globally so idf/avgdl match a single-node
  build bit-for-bit.
- search: every device scores the replicated query batch against its doc
  shard, then the per-shard top-k candidates are all-gathered over the
  mesh axis and merged with a lexicographic (score desc, doc asc) sort —
  the psum-style top-k combine.

Device-side collectives ride ICI (all_gather inside shard_map); the host
only orchestrates.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..index.sealed import BLOCK, SealedSegment, build_sealed_segment
from ..models.scoring import ScoreTables, idf
from ..text.intern import WIDTH, Document, Query
from ..utils.options import IndexOptions

__all__ = ["ShardedIndex"]


from ..utils.buckets import bucket_pow2 as _bucket


@dataclass
class _ShardView:
    """Host-side per-shard lookup state."""

    segment: SealedSegment
    doc_offset: int
    # global token id -> local token id (-1 when the shard lacks the term)
    local_tid: np.ndarray


class ShardedIndex:
    """Doc-sharded BM25 index over an n-device mesh axis.

    Build: corpus split into contiguous shards; each shard is a sealed
    segment; global stats (N, Σdl, df) are merged so scoring matches the
    single-segment build exactly.
    """

    def __init__(
        self,
        shards: List[SealedSegment],
        options: IndexOptions,
        mesh=None,
        axis: str = "d",
        engine: str = "exact",
    ):
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh

        self.options = options
        self.axis = axis
        if mesh is None:
            devs = np.array(jax.devices()[: len(shards)])
            mesh = Mesh(devs, (axis,))
        self.mesh = mesh
        self.n_shards = len(shards)
        if self.n_shards != mesh.devices.size:
            raise ValueError("one shard per mesh device required")

        # Global stats (the reference's single jump tuple).
        self.n_docs = sum(s.n_docs for s in shards)
        self.sum_dl = sum(s.sum_dl for s in shards)
        offsets = np.cumsum([0] + [s.n_docs for s in shards])[:-1]

        # Global token table: union of shard vocabularies, df summed.
        all_keys = np.concatenate([s.token_keys for s in shards]).astype(
            f"S{WIDTH}"
        )
        self.token_keys = np.unique(all_keys)  # sorted unique
        vg = self.token_keys.size
        self.token_df = np.zeros(vg, dtype=np.int64)
        self.views: List[_ShardView] = []
        for s, off in zip(shards, offsets):
            gid = np.searchsorted(self.token_keys, s.token_keys)
            self.token_df[gid] += s.token_df
            local = np.full(vg, -1, dtype=np.int64)
            local[gid] = np.arange(s.n_tokens)
            self.views.append(
                _ShardView(segment=s, doc_offset=int(off), local_tid=local)
            )

        self.tables = ScoreTables.create(
            options.k1, options.b, self.n_docs, self.sum_dl
        )
        self.token_s0 = idf(self.n_docs, self.token_df) * (options.k1 + 1.0)

        if engine not in ("exact", "blockmax"):
            raise ValueError(f"unknown engine {engine!r}")
        self.engine = engine
        self._upload()
        if engine == "blockmax":
            self._upload_blockmax()

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        documents: Sequence[Document],
        n_shards: int,
        payloads: Optional[Sequence[int]] = None,
        options: Optional[IndexOptions] = None,
        mesh=None,
        engine: str = "exact",
    ) -> "ShardedIndex":
        """Data-parallel build: contiguous corpus shards, offset-rebased
        doc ids (io.rs:244-282 analog)."""
        options = options or IndexOptions()
        n = len(documents)
        if payloads is None:
            payloads = np.arange(n, dtype=np.int64)
        payloads = np.asarray(payloads, dtype=np.int64)
        bounds = np.linspace(0, n, n_shards + 1).astype(np.int64)
        shards = []
        for i in range(n_shards):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            shards.append(
                build_sealed_segment(
                    list(documents[lo:hi]),
                    payloads=payloads[lo:hi],
                    options=options,
                )
            )
        return cls(shards, options, mesh=mesh, engine=engine)

    # ------------------------------------------------------------------
    def _upload(self):
        """Stack per-shard arrays (padded to uniform shape) with a leading
        mesh dimension and place them sharded over the axis."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        shards = [v.segment for v in self.views]
        d = self.n_shards
        nmax = max(max((s.n_docs for s in shards), default=1), 1)
        bmax = max(max((s.n_blocks for s in shards), default=1), 1)

        doc_fn = np.zeros((d, nmax + 1), dtype=np.int32)
        doc_live = np.zeros((d, nmax + 1), dtype=np.float32)
        blk_docs = np.zeros((d, bmax + 1, BLOCK), dtype=np.int32)
        blk_impact = np.zeros((d, bmax + 1, BLOCK), dtype=np.float32)
        doc_offsets = np.zeros((d, 1), dtype=np.int32)
        n_local = np.zeros((d, 1), dtype=np.int32)

        for i, view in enumerate(self.views):
            s = view.segment
            n, b = s.n_docs, s.n_blocks
            doc_fn[i, :n] = s.doc_fieldnorm
            doc_live[i, :n] = 1.0
            # pad docs (slots >= n) stay dead; blocks padded with pad-doc n.
            blk_docs[i, :, :] = nmax  # beyond-local sentinel
            blk_docs[i, :b] = np.where(
                s.block_docids < n, s.block_docids, nmax
            )
            if b:
                # Impacts bake in GLOBAL statistics (idf over all shards).
                gid = np.searchsorted(self.token_keys, s.token_keys)
                blk_impact[i, :b] = s.block_impacts(
                    global_stats=(self.n_docs, self.sum_dl, self.token_s0[gid])
                )
            doc_offsets[i, 0] = view.doc_offset
            n_local[i, 0] = n

        # Host-side payload mapping (device returns global doc ids; payloads
        # stay int64 on host).
        self.global_payloads = np.concatenate(
            [v.segment.doc_payload for v in self.views]
        ) if self.n_docs else np.zeros(0, dtype=np.int64)

        def shard_put(x):
            return jax.device_put(
                x, NamedSharding(self.mesh, P(self.axis, *([None] * (x.ndim - 1))))
            )

        self._nmax = nmax
        self._bmax = bmax
        self.dev_doc_fn = shard_put(doc_fn)
        self.dev_doc_live = shard_put(doc_live)
        self.dev_blk_docs = shard_put(blk_docs)
        self.dev_blk_impact = shard_put(blk_impact)
        self.dev_doc_offsets = shard_put(doc_offsets)
        self.dev_n_local = shard_put(n_local)
        self.dev_s1 = jax.device_put(
            self.tables.s1_table.astype(np.float32)
        )  # replicated

    # ------------------------------------------------------------------
    def set_deleted(self, deleted: np.ndarray) -> None:
        """Refresh the live mask from a global-doc-id delete bitmap (the
        bulkdelete analog for the sharded index; consulted at scoring)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        deleted = np.asarray(deleted, dtype=bool)
        if deleted.shape != (self.n_docs,):
            raise ValueError("bitmap must cover all global doc ids")
        d = self.n_shards
        live = np.zeros((d, self._nmax + 1), dtype=np.float32)
        for i, view in enumerate(self.views):
            n = view.segment.n_docs
            off = view.doc_offset
            live[i, :n] = np.where(deleted[off : off + n], 0.0, 1.0)
        self.dev_doc_live = jax.device_put(
            live, NamedSharding(self.mesh, P(self.axis, None))
        )

    # ------------------------------------------------------------------
    def _upload_blockmax(self):
        """Stack per-shard range indexes (padded) for the pruned engine."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..index.ranges import build_range_index

        d = self.n_shards
        # Impacts must bake in GLOBAL statistics (idf over all shards).
        self._range_indexes = []
        for v in self.views:
            gid = np.searchsorted(self.token_keys, v.segment.token_keys)
            self._range_indexes.append(
                build_range_index(
                    v.segment,
                    global_stats=(
                        self.n_docs,
                        self.sum_dl,
                        self.token_s0[gid],
                    ),
                )
            )
        ris = self._range_indexes
        self._rs = ris[0].range_size
        rmax = -(-self._nmax // self._rs)
        self._rmax = max(rmax, 1)
        vmax = max(max((v.segment.n_tokens for v in self.views), default=1), 1)
        self._vmax = vmax
        pmax = max(ri.post_impact.size for ri in ris)
        mmax = max(ri.tr_range.size for ri in ris)

        impact = np.zeros((d, pmax), dtype=np.float32)
        local = np.zeros((d, pmax), dtype=np.uint8)
        tr_range = np.full((d, mmax + 1), np.iinfo(np.int32).max, np.int32)
        tr_start = np.zeros((d, mmax + 1), dtype=np.int32)
        tr_len = np.zeros((d, mmax + 1), dtype=np.int32)
        tr_ub = np.zeros((d, mmax + 1), dtype=np.float32)
        csr = np.zeros((d, vmax + 2), dtype=np.int32)
        term_l = np.zeros((d, vmax), dtype=np.int64)

        for i, (view, ri) in enumerate(zip(self.views, ris)):
            v = view.segment.n_tokens
            m = ri.tr_range.size
            impact[i, : ri.post_impact.size] = ri.post_impact
            local[i, : ri.post_local.size] = ri.post_local
            tr_range[i, :m] = ri.tr_range
            tr_start[i, :m] = ri.tr_start
            tr_len[i, :m] = ri.tr_len
            tr_ub[i, :m] = ri.tr_ub
            csr[i, : v + 1] = ri.token_tr_start
            csr[i, v + 1 :] = ri.token_tr_start[v]
            term_l[i, :v] = np.diff(ri.token_tr_start)
        self._term_l_shard = term_l

        def shard_put(x):
            return jax.device_put(
                x,
                NamedSharding(
                    self.mesh, P(self.axis, *([None] * (x.ndim - 1)))
                ),
            )

        self.dev_bm_impact = shard_put(impact)
        self.dev_bm_local = shard_put(local)
        self.dev_bm_tr_range = shard_put(tr_range)
        self.dev_bm_tr_start = shard_put(tr_start)
        self.dev_bm_tr_len = shard_put(tr_len)
        self.dev_bm_tr_ub = shard_put(tr_ub)
        self.dev_bm_csr = shard_put(csr)

    def _prepare_blockmax(self, queries: Sequence[Query]):
        """Per-shard local term ids for the pruned engine."""
        qn = len(queries)
        t_needed, l_needed = 1, 1
        per_shard = []
        for si, view in enumerate(self.views):
            ids_q = []
            for query in queries:
                seg = view.segment
                lids = seg.lookup_tokens(query.keys)
                lids = lids[lids >= 0].astype(np.int64)
                ids_q.append(lids)
                t_needed = max(t_needed, lids.size)
                if lids.size:
                    li = self._term_l_shard[si][lids]
                    l_needed = max(l_needed, int(li.max()))
            per_shard.append(ids_q)
        t_max = _bucket(t_needed, 4)
        q_tid = np.full(
            (self.n_shards, qn, t_max), self._vmax, dtype=np.int32
        )
        for si, ids_q in enumerate(per_shard):
            for qi, lids in enumerate(ids_q):
                q_tid[si, qi, : lids.size] = lids
        return q_tid, _bucket(l_needed, 8)

    @functools.lru_cache(maxsize=8)
    def _sharded_blockmax_fn(self, k: int, lmax: int, chunk: int):
        import jax
        import jax.numpy as jnp
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from ..search.blockmax import _blockmax_kernel

        axis = self.axis
        nmax = self._nmax
        rs = self._rs
        rmax = self._rmax
        max_rounds = -(-rmax // chunk) + 1

        def local_and_merge(
            impact, local, tr_range, tr_start, tr_len, tr_ub, csr,
            doc_live, doc_offset, q_tid_s,
        ):
            ones = jnp.ones(nmax + 1, dtype=jnp.float32)
            l_scores, l_ids, _ = _blockmax_kernel(
                impact[0],
                local[0],
                doc_live[0],
                ones,
                tr_range[0],
                tr_start[0],
                tr_len[0],
                tr_ub[0],
                csr[0],
                q_tid_s[0],
                k=k,
                chunk=chunk,
                lmax=lmax,
                range_size=rs,
                n_ranges=rmax,
                n_docs=nmax,
                max_rounds=max_rounds,
                use_pallas=False,
            )
            invalid = jnp.int32(np.iinfo(np.int32).max)
            g_ids = jnp.where(
                jnp.isfinite(l_scores), l_ids + doc_offset[0, 0], invalid
            )
            a_scores = jax.lax.all_gather(l_scores, axis)
            a_ids = jax.lax.all_gather(g_ids, axis)
            dd = a_scores.shape[0]
            c_scores = jnp.moveaxis(a_scores, 0, 1).reshape(-1, dd * k)
            c_ids = jnp.moveaxis(a_ids, 0, 1).reshape(-1, dd * k)
            neg, gid_s = jax.lax.sort((-c_scores, c_ids), num_keys=2)
            return -neg[:, :k], gid_s[:, :k]

        fn = shard_map(
            local_and_merge,
            mesh=self.mesh,
            in_specs=(
                P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                P(axis), P(axis), P(axis), P(axis),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    def _search_blockmax(self, queries: Sequence[Query], k: int):
        import jax.numpy as jnp

        q_tid, lmax = self._prepare_blockmax(queries)
        chunk = min(64, self._rmax)
        # Per-shard k must not be capped by the shard's doc count: the
        # merged global top-k needs k candidates per shard when available
        # (cap only by the per-round candidate pool).
        kk = min(_bucket(k, 1), chunk * self._rs)
        scores, gids = self._sharded_blockmax_fn(kk, lmax, chunk)(
            self.dev_bm_impact,
            self.dev_bm_local,
            self.dev_bm_tr_range,
            self.dev_bm_tr_start,
            self.dev_bm_tr_len,
            self.dev_bm_tr_ub,
            self.dev_bm_csr,
            self.dev_doc_live,
            self.dev_doc_offsets,
            jnp.asarray(q_tid),
        )
        return scores, gids

    # ------------------------------------------------------------------
    def _prepare(self, queries: Sequence[Query]):
        """Per-shard padded block lists for a replicated query batch."""
        q = len(queries)
        gids = []
        for query in queries:
            idxs = np.searchsorted(self.token_keys, query.keys)
            idxs = np.minimum(idxs, max(self.token_keys.size - 1, 0))
            if self.token_keys.size:
                found = self.token_keys[idxs] == query.keys
                gids.append(idxs[found].astype(np.int64))
            else:
                gids.append(np.zeros(0, dtype=np.int64))

        # Per-shard block lists referencing each shard's local blocks
        # (impact-eager scoring: no per-term tables needed).
        per_shard_blocks = []
        p_needed = 1
        for view in self.views:
            s = view.segment
            starts = s.token_block_start
            blocks_q = []
            for g in gids:
                lids = view.local_tid[g] if g.size else np.zeros(0, dtype=np.int64)
                lids = lids[lids >= 0]
                if lids.size:
                    los = starts[lids].astype(np.int64)
                    his = starts[lids + 1].astype(np.int64)
                    blocks = np.concatenate(
                        [np.arange(lo, hi) for lo, hi in zip(los, his)]
                    )
                else:
                    blocks = np.zeros(0, dtype=np.int64)
                blocks_q.append(blocks)
                p_needed = max(p_needed, blocks.size)
            per_shard_blocks.append(blocks_q)

        p_max = _bucket(p_needed, 8)
        blk_ids = np.full((self.n_shards, q, p_max), self._bmax, dtype=np.int32)
        for si in range(self.n_shards):
            for qi in range(q):
                blocks = per_shard_blocks[si][qi]
                if blocks.size:
                    blk_ids[si, qi, : blocks.size] = blocks
        return blk_ids

    # ------------------------------------------------------------------
    @functools.lru_cache(maxsize=8)
    def _sharded_search_fn(self, k: int):
        import jax
        import jax.numpy as jnp
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axis = self.axis
        nmax = self._nmax

        def local_and_merge(
            blk_docs,  # [1, Bm+1, 128]
            blk_impact,  # [1, Bm+1, 128] global-stats impacts
            doc_live,  # [1, Nm+1]
            doc_offset,  # [1, 1]
            blk_ids_s,  # [1, Q, P] per-shard local block ids
        ):
            blk_ids = blk_ids_s[0]
            bd = blk_docs[0]
            d = bd[blk_ids]  # [Q, P, 128]
            sc = blk_impact[0][blk_ids] * doc_live[0][d]

            def accumulate(docs_q, scores_q):
                acc = jnp.zeros(nmax + 1, dtype=jnp.float32)
                return acc.at[docs_q.reshape(-1)].add(scores_q.reshape(-1))

            acc = jax.vmap(accumulate)(d, sc)[:, :nmax]
            masked = jnp.where(acc > 0.0, acc, -jnp.inf)
            if k > nmax:
                # Small shards: pad so every shard still offers k
                # candidate slots to the global merge.
                masked = jnp.pad(
                    masked, ((0, 0), (0, k - nmax)),
                    constant_values=-jnp.inf,
                )
            l_scores, l_ids = jax.lax.top_k(masked, k)  # [Q, k]
            invalid = jnp.int32(np.iinfo(np.int32).max)
            g_ids = jnp.where(
                jnp.isfinite(l_scores),
                l_ids.astype(jnp.int32) + doc_offset[0, 0],
                invalid,
            )

            # Collective merge over the mesh axis: all-gather candidates,
            # lexicographic sort by (-score, global doc id) — the pinned
            # deterministic tie rule.
            a_scores = jax.lax.all_gather(l_scores, axis)  # [D, Q, k]
            a_ids = jax.lax.all_gather(g_ids, axis)
            dd = a_scores.shape[0]
            c_scores = jnp.moveaxis(a_scores, 0, 1).reshape(-1, dd * k)
            c_ids = jnp.moveaxis(a_ids, 0, 1).reshape(-1, dd * k)
            neg, gid_s = jax.lax.sort((-c_scores, c_ids), num_keys=2)
            return -neg[:, :k], gid_s[:, :k]

        fn = shard_map(
            local_and_merge,
            mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    def search(
        self, queries: Sequence[Query], k: int
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batched top-k over all shards; returns (scores, global doc ids,
        payloads) with the pinned (score desc, doc asc) tie rule."""
        import jax.numpy as jnp

        if k <= 0:
            raise ValueError("number of needed rows is set to 0")
        if self.engine == "blockmax":
            scores, gids = self._search_blockmax(queries, k)
        else:
            blk_ids = self._prepare(queries)
            kk = _bucket(k, 1)
            scores, gids = self._sharded_search_fn(kk)(
                self.dev_blk_docs,
                self.dev_blk_impact,
                self.dev_doc_live,
                self.dev_doc_offsets,
                jnp.asarray(blk_ids),
            )
        scores = np.asarray(scores)[:, :k]
        gids = np.asarray(gids, dtype=np.int64)[:, :k]
        valid = np.isfinite(scores) & (scores > 0) & (gids < self.n_docs)
        gids = np.where(valid, gids, -1)
        payloads = np.where(
            valid, self.global_payloads[np.maximum(gids, 0)], -1
        )
        return np.where(valid, scores, -np.inf), gids, payloads

    # ------------------------------------------------------------------
    def global_stats_step(self):
        """Device-side build step: psum-combine per-shard (N, Σdl) over the
        mesh (the DSM shared-stats analog) and return (N, Σdl, avgdl)."""
        import jax
        import jax.numpy as jnp
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axis = self.axis

        def step(n_local, doc_fn, doc_live):
            from ..models.fieldnorm import FIELDNORM_TO_LENGTH

            table = jnp.asarray(FIELDNORM_TO_LENGTH.astype(np.float64))
            # float64 under enable_x64: exact for lengths < 2^53.
            lengths = table[doc_fn[0]] * doc_live[0].astype(table.dtype)
            local_sum = jnp.sum(lengths)
            local_n = n_local[0, 0].astype(jnp.int32)
            total_n = jax.lax.psum(local_n, axis)
            total_dl = jax.lax.psum(local_sum, axis)
            return total_n, total_dl

        fn = shard_map(
            step,
            mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        with jax.enable_x64(True):
            n, sdl = jax.jit(fn)(
                self.dev_n_local, self.dev_doc_fn, self.dev_doc_live
            )
            n, sdl = int(n), int(sdl)
        return n, sdl, (sdl / n if n else 1.0)
