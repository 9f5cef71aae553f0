"""Pallas fused scoring kernel vs numpy reference (interpret mode on CPU)."""

import numpy as np
import pytest

from vectorchord_bm25_tpu.ops.score_kernel import fused_range_scores


def numpy_reference(packed, s1_table, starts, lens, s0, rs):
    q, t_terms, c = starts.shape
    out = np.zeros((q, c, rs), dtype=np.float32)
    for qi in range(q):
        for ci in range(c):
            for ti in range(t_terms):
                st, ln = int(starts[qi, ti, ci]), int(lens[qi, ti, ci])
                for j in range(ln):
                    w = int(packed[st + j])
                    local = w & 0xFF
                    tf = (w >> 8) & 0xFFFF
                    fn = (w >> 24) & 0xFF
                    if tf == 0:
                        continue
                    s1 = np.float32(s1_table[fn])
                    sc = (
                        np.float32(tf) * np.float32(s0[qi, ti])
                    ) / (np.float32(tf) + s1)
                    out[qi, ci, local] += sc
    return out


@pytest.mark.parametrize("q,t,c,rs", [(2, 3, 4, 128), (1, 1, 2, 128)])
def test_kernel_matches_reference(rng, q, t, c, rs):
    p = 4096
    local = rng.integers(0, rs, size=p).astype(np.uint32)
    tf = rng.integers(0, 20, size=p).astype(np.uint32)
    fn = rng.integers(0, 256, size=p).astype(np.uint32)
    packed = (local | (tf << 8) | (fn << 24)).astype(np.uint32)
    s1_table = (rng.random(256).astype(np.float32) * 3 + 0.3).astype(np.float32)
    starts = rng.integers(0, p - rs, size=(q, t, c)).astype(np.int32)
    lens = rng.integers(0, rs + 1, size=(q, t, c)).astype(np.int32)
    s0 = (rng.random((q, t)) * 5).astype(np.float32)

    got = np.asarray(
        fused_range_scores(
            packed, s1_table, starts, lens, s0, rs=rs, interpret=True
        )
    )
    expect = numpy_reference(packed, s1_table, starts, lens, s0, rs)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_zero_lengths(rng):
    p = 1024
    packed = rng.integers(0, 2**31, size=p).astype(np.uint32)
    s1 = np.ones(256, dtype=np.float32)
    starts = np.zeros((1, 2, 2), dtype=np.int32)
    lens = np.zeros((1, 2, 2), dtype=np.int32)
    s0 = np.ones((1, 2), dtype=np.float32)
    out = np.asarray(
        fused_range_scores(packed, s1, starts, lens, s0, rs=128, interpret=True)
    )
    assert np.all(out == 0)
