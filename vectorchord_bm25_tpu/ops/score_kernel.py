"""Pallas TPU kernel: fused in-range score accumulation.

The hot inner op of Block-Max search with impact-eager postings: each
posting's full BM25 contribution was precomputed at build time (BM25S
observation — query-side term frequency is ignored by the model), so
query scoring is gather + in-range accumulation.

XLA handles the irregular window *gather* well, but funnels the
per-range accumulation (slot = range-relative doc id) through a
conflict-prone scatter-add.  This kernel does that part in VMEM,
converting the scatter into a one-hot matmul on the MXU:

    acc[slots] += scores      ==>      acc += scores @ one_hot(local, RS)

Rows ((query, candidate-range) pairs) are processed in sublane groups of
8 so every block satisfies the TPU (8, 128) tiling rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_range_scores", "accumulate_rows", "pallas_available"]

_SUBLANES = 8


def pallas_available() -> bool:
    """True when running on a real TPU backend (kernel compiled); CPU test
    runs use interpret mode."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _kernel(rs: int, t_terms: int):
    from jax.experimental import pallas as pl

    def kernel(imp_ref, loc_ref, out_ref):
        iota_slots = jax.lax.broadcasted_iota(jnp.int32, (1, rs), 1)

        for i in range(_SUBLANES):
            acc = jnp.zeros((1, rs), dtype=jnp.float32)
            for t in range(t_terms):
                sc = imp_ref[i, t * rs : (t + 1) * rs].reshape(rs, 1)
                local = loc_ref[i, t * rs : (t + 1) * rs].reshape(rs, 1)
                # Scatter into range slots via one-hot matmul (exact: the
                # one-hot factor is 0/1, scores stay float32).
                onehot_loc = (local == iota_slots).astype(jnp.float32)
                acc = acc + jax.lax.dot_general(
                    sc,
                    onehot_loc,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [1,RS]
            out_ref[i, :] = acc[0, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("rs", "interpret"))
def accumulate_rows(imp_windows, loc_windows, *, rs, interpret=False):
    """imp_windows: [rows, T*RS] float32 (invalid lanes zeroed);
    loc_windows: [rows, T*RS] int32 range-relative slots; rows % 8 == 0.

    Returns [rows, RS] float32 accumulated scores."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, twrs = imp_windows.shape
    assert twrs % rs == 0 and rows % _SUBLANES == 0
    t_terms = twrs // rs
    grid_spec = pl.GridSpec(
        grid=(rows // _SUBLANES,),
        in_specs=[
            pl.BlockSpec(
                (_SUBLANES, twrs), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_SUBLANES, twrs), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (_SUBLANES, rs), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _kernel(rs, t_terms),
        out_shape=jax.ShapeDtypeStruct((rows, rs), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(imp_windows, loc_windows)


def fused_range_scores(
    post_impact,  # [P] float32 posting scores (pad = 0)
    post_local,  # [P] uint8 range-relative doc ids
    starts,  # [Q, T, C] int32 window starts (pad: any in-bounds index)
    lens,  # [Q, T, C] int32 window lengths (0 = inactive)
    *,
    rs: int,
    interpret: bool = False,
):
    """Returns [Q, C, RS] float32 per-(query, candidate, slot) scores.

    The irregular window gather (+ length masking) runs in XLA; the
    accumulation runs in the Pallas kernel.
    """
    q, t_terms, c = starts.shape
    rows = q * c
    rows_pad = -(-rows // _SUBLANES) * _SUBLANES

    # XLA gather + mask: [Q, C, T, RS] -> [rows, T*RS].
    st = jnp.moveaxis(starts, 1, 2)  # [Q, C, T]
    ln = jnp.moveaxis(lens, 1, 2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, rs), 3)
    idx = st[..., None] + lane
    valid = lane < ln[..., None]
    imp = jnp.where(valid, post_impact[idx].astype(jnp.float32), 0.0)
    loc = post_local[idx].astype(jnp.int32)
    imp_windows = imp.reshape(rows, t_terms * rs)
    loc_windows = loc.reshape(rows, t_terms * rs)
    if rows_pad != rows:
        pad = rows_pad - rows
        imp_windows = jnp.concatenate(
            [imp_windows, jnp.zeros((pad, t_terms * rs), imp_windows.dtype)]
        )
        loc_windows = jnp.concatenate(
            [loc_windows, jnp.zeros((pad, t_terms * rs), loc_windows.dtype)]
        )
    out = accumulate_rows(imp_windows, loc_windows, rs=rs, interpret=interpret)
    return out[:rows].reshape(q, c, rs)
