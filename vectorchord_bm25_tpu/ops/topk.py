"""Hierarchical exact top-k over dense per-doc score accumulators.

XLA's `lax.top_k` over a [Q, n_docs] accumulator is the dominant cost of
the dense scoring path at multi-million-doc scale (measured ~36 ms for
[32, 4M] on a v5e chip — ~14 GB/s effective, far below HBM speed).  This
op replaces it with a two-level reduction built on the Block-Max
argument the reference uses for postings (SURVEY.md §3.2,
/root/reference/crates/bm25/src/search.rs:151-280), applied to the
*accumulator* instead of posting lists:

1. partition the doc axis into contiguous blocks of L docs and take each
   block's max — one streaming pass at memory speed;
2. `top_k` over the [Q, n_docs/L] block maxima — every true top-k doc
   must live in one of the k max-ranked blocks (any block holding a
   top-k doc has max >= s_k, and at most k-1 disjoint blocks can hold a
   doc scoring strictly above s_k);
3. gather those k blocks' contents and `top_k` over the [Q, k*L] lanes.

Tie semantics stay exactly the pinned (score desc, doc asc) rule:
`lax.top_k` breaks ties by lowest index, block maxima are ordered by
block id = doc order (contiguous blocks), and the selected block ids are
re-sorted ascending before the gather so flat lane order remains global
doc order.
"""

from __future__ import annotations

__all__ = ["dense_topk"]


def dense_topk(acc, k: int, n_docs: int, block: int = 1024):
    """Exact top-k of `jnp.where(acc > 0, acc, -inf)` per row.

    acc: [Q, M] float32 accumulator with M >= n_docs; columns past
    n_docs must hold values <= 0 (they are excluded by the score > 0
    rule, search.rs:81).  Returns (scores [Q, k] f32 desc, ids [Q, k]
    i32); rows with fewer than k positive docs pad with -inf whose ids
    are meaningless (callers mask on isfinite).

    Falls back to single-stage `lax.top_k` when the hierarchy cannot
    win (small n_docs) or k exceeds the block count.
    """
    import jax
    import jax.numpy as jnp

    q, m = acc.shape
    t = m // block  # full blocks; the ragged tail is handled separately
    # Measured on v5e: at [32, 131k] the two are equal (2.8 vs 2.7 ms)
    # but the hierarchy's advantage scales with total elements — plain
    # top_k costs ~0.55 us/element, so a [492, 131k] batch pays ~35 ms
    # where the hierarchy pays ~8; from 1M docs it wins at any batch
    # (10.2 -> 3.2 ms at [32, 1M], 37.7 -> 8.3 at [32, 4M]).
    if n_docs < (1 << 17) or t < max(2 * k, 8):
        masked = jnp.where(acc[:, :n_docs] > 0.0, acc[:, :n_docs], -jnp.inf)
        return jax.lax.top_k(masked, k)

    neg_inf = jnp.float32(-jnp.inf)
    body = acc[:, : t * block]
    # Pass 1: per-block max with the score>0 mask fused into the reduce.
    blocks = body.reshape(q, t, block // 128, 128)
    blocks = jnp.where(blocks > 0.0, blocks, neg_inf)
    bmax = blocks.max(axis=2).max(axis=2)  # [Q, T]

    # The ragged tail [t*block, m) is one extra "block" whose lanes are
    # appended after the gathered full blocks (doc order preserved:
    # tail docs are the largest ids).
    tail = acc[:, t * block :]
    tail_doc = t * block + jnp.arange(m - t * block, dtype=jnp.int32)
    tail = jnp.where((tail > 0.0) & (tail_doc < n_docs), tail, neg_inf)

    # Pass 2: candidate blocks (ties -> lower block id = lower docs).
    _, bi = jax.lax.top_k(bmax, k)  # [Q, K]
    bi = jax.lax.sort(bi, dimension=1)  # ascending -> doc-ordered gather

    # Pass 3: gather candidates and reduce exactly.
    g = jnp.take_along_axis(
        body.reshape(q, t, block), bi[:, :, None], axis=1
    )  # [Q, K, L]
    flat = g.reshape(q, k * block)
    flat = jnp.where(flat > 0.0, flat, neg_inf)
    flat = jnp.concatenate([flat, tail], axis=1)
    scores, pos = jax.lax.top_k(flat, k)

    in_tail = pos >= k * block
    blk = jnp.take_along_axis(bi, jnp.minimum(pos // block, k - 1), axis=1)
    ids = jnp.where(
        in_tail,
        t * block + (pos - k * block),
        blk * block + pos % block,
    ).astype(jnp.int32)
    return scores, ids
