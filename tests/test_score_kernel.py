"""Pallas fused accumulation kernel vs numpy reference (interpret mode)."""

import numpy as np
import pytest

from vectorchord_bm25_tpu.ops.score_kernel import fused_range_scores


def numpy_reference(post_impact, post_local, starts, lens, rs):
    q, t_terms, c = starts.shape
    out = np.zeros((q, c, rs), dtype=np.float32)
    for qi in range(q):
        for ci in range(c):
            for ti in range(t_terms):
                st, ln = int(starts[qi, ti, ci]), int(lens[qi, ti, ci])
                for j in range(ln):
                    out[qi, ci, int(post_local[st + j])] += post_impact[st + j]
    return out


@pytest.mark.parametrize("q,t,c,rs", [(2, 3, 4, 128), (1, 1, 2, 128)])
def test_kernel_matches_reference(rng, q, t, c, rs):
    p = 4096
    post_local = rng.integers(0, rs, size=p).astype(np.uint8)
    post_impact = (rng.random(p) * 8).astype(np.float32)
    starts = rng.integers(0, p - rs, size=(q, t, c)).astype(np.int32)
    lens = rng.integers(0, rs + 1, size=(q, t, c)).astype(np.int32)

    got = np.asarray(
        fused_range_scores(
            post_impact, post_local, starts, lens, rs=rs, interpret=True
        )
    )
    expect = numpy_reference(post_impact, post_local, starts, lens, rs)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_zero_lengths(rng):
    p = 1024
    post_local = rng.integers(0, 128, size=p).astype(np.uint8)
    post_impact = (rng.random(p) * 8).astype(np.float32)
    starts = np.zeros((1, 2, 2), dtype=np.int32)
    lens = np.zeros((1, 2, 2), dtype=np.int32)
    out = np.asarray(
        fused_range_scores(
            post_impact, post_local, starts, lens, rs=128, interpret=True
        )
    )
    assert np.all(out == 0)
