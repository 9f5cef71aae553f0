"""bfloat16 impact storage: memory halves, rankings stay near-exact."""

import numpy as np
import pytest

from vectorchord_bm25_tpu.index.sealed import build_sealed_segment
from vectorchord_bm25_tpu.search.blockmax import BlockMaxEngine
from vectorchord_bm25_tpu.search.exact import ExactEngine
from vectorchord_bm25_tpu.text.intern import Query

from test_fuzz import edit_distance
from test_sealed import make_docs


@pytest.mark.parametrize("engine_cls", [ExactEngine, BlockMaxEngine])
def test_bf16_ranks_close_to_f32(rng, engine_cls):
    docs = make_docs(rng, 300, vocab=20)
    seg = build_sealed_segment(docs)
    f32 = engine_cls(seg)
    bf16 = engine_cls(seg, impact_dtype="bfloat16")
    queries = [
        Query.from_int_ids(rng.integers(0, 20, size=3).tolist())
        for _ in range(6)
    ]
    s1, i1, _ = f32.search(queries, 20)
    s2, i2, _ = bf16.search(queries, 20)
    for qi in range(len(queries)):
        g1 = [int(x) for x in i1[qi] if x >= 0]
        g2 = [int(x) for x in i2[qi] if x >= 0]
        assert len(g1) == len(g2)
        # bf16 rounding (~0.4% relative) may swap near-ties only.
        assert edit_distance(g1, g2) <= 6
        np.testing.assert_allclose(
            s2[qi][: len(g2)], s1[qi][: len(g1)], rtol=6e-3
        )


def test_bf16_device_bytes_halve(rng):
    import jax.numpy as jnp

    docs = make_docs(rng, 100, vocab=10)
    seg = build_sealed_segment(docs)
    bf16 = BlockMaxEngine(seg, impact_dtype="bfloat16")
    assert bf16.dev_post_impact.dtype == jnp.bfloat16
    f32 = BlockMaxEngine(seg)
    assert bf16.dev_post_impact.nbytes * 2 == f32.dev_post_impact.nbytes
