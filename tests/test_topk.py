"""dense_topk (hierarchical exact top-k) vs the single-stage reference.

The op must reproduce lax.top_k-over-masked-accumulator EXACTLY,
including the pinned tie rule (score desc, doc asc) and the score > 0
cutoff — it feeds every dense scoring path.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from vectorchord_bm25_tpu.ops.topk import dense_topk


def _reference(acc: np.ndarray, k: int, n_docs: int):
    out_s = np.full((acc.shape[0], k), -np.inf, dtype=np.float32)
    out_i = np.full((acc.shape[0], k), -1, dtype=np.int64)
    for qi in range(acc.shape[0]):
        row = acc[qi, :n_docs]
        docs = np.flatnonzero(row > 0)
        order = np.lexsort((docs, -row[docs].astype(np.float64)))
        top = docs[order[:k]]
        out_s[qi, : top.size] = row[top]
        out_i[qi, : top.size] = top
    return out_s, out_i


def _check(acc: np.ndarray, k: int, n_docs: int):
    got_s, got_i = dense_topk(jnp.asarray(acc), k, n_docs)
    got_s, got_i = np.asarray(got_s), np.asarray(got_i, dtype=np.int64)
    exp_s, exp_i = _reference(acc, k, n_docs)
    np.testing.assert_array_equal(got_s, exp_s)
    valid = np.isfinite(exp_s)
    np.testing.assert_array_equal(got_i[valid], exp_i[valid])


# Large enough to clear the small-corpus fallback: the hierarchy itself
# is exercised.
N_HIER = (1 << 17) + 777


def test_hierarchical_matches_reference_with_ties():
    rng = np.random.default_rng(0)
    # Discrete score levels force massive cross-block ties.
    acc = np.zeros((4, N_HIER + 1), dtype=np.float32)
    acc[:, :N_HIER] = rng.choice(
        np.array([0.0, 0.0, 1.0, 2.0, 3.0], dtype=np.float32),
        size=(4, N_HIER),
    )
    _check(acc, 10, N_HIER)


def test_tail_block_wins():
    # Top scores live in the ragged tail past the last full block.
    acc = np.zeros((2, N_HIER + 1), dtype=np.float32)
    acc[:, : N_HIER] = 0.5
    acc[0, N_HIER - 3 :] = 0.0
    acc[0, N_HIER - 5] = 9.0
    acc[1, N_HIER - 1] = 7.5
    _check(acc, 4, N_HIER)


def test_fewer_than_k_positive():
    acc = np.zeros((3, N_HIER + 1), dtype=np.float32)
    acc[0, 11] = 2.0
    acc[1, 5] = 1.0
    acc[1, N_HIER - 1] = 3.0
    # row 2: nothing positive
    _check(acc, 8, N_HIER)


def test_sentinel_column_excluded():
    # Column n_docs (the scatter sentinel) must never be returned even
    # if numeric noise leaves a positive value there.
    acc = np.zeros((1, N_HIER + 1), dtype=np.float32)
    acc[0, N_HIER] = 100.0
    acc[0, 7] = 1.0
    got_s, got_i = dense_topk(jnp.asarray(acc), 3, N_HIER)
    assert np.asarray(got_i)[0, 0] == 7
    assert np.isneginf(np.asarray(got_s)[0, 1:]).all()


def test_small_corpus_fallback_path():
    rng = np.random.default_rng(1)
    n = 5000
    acc = np.zeros((3, n + 1), dtype=np.float32)
    acc[:, :n] = rng.choice(
        np.array([0.0, 1.0, 2.0], dtype=np.float32), size=(3, n)
    )
    _check(acc, 7, n)


def test_random_dense_values():
    rng = np.random.default_rng(2)
    acc = np.zeros((2, N_HIER + 1), dtype=np.float32)
    acc[:, :N_HIER] = rng.random((2, N_HIER), dtype=np.float32) - 0.2
    _check(acc, 16, N_HIER)
