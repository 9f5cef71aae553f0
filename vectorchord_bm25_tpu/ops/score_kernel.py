"""Pallas TPU kernel: fused posting scoring + in-range accumulation.

The hot inner op of Block-Max search: given gathered posting windows
(one uint32 word per posting: local | tf16 << 8 | fn << 24, built at
index time), produce the [RS] per-doc score vector for each
(query, candidate range) row.

XLA handles the irregular window *gather* well (and masks out-of-span
lanes to zero words, so invalid postings carry tf=0), but its
formulation of the rest materializes [rows, T, RS] intermediates for
the fieldnorm->s1 table lookup and funnels the per-range accumulation
through a conflict-prone scatter-add.  This kernel does that part in
VMEM and converts both irregular accesses into MXU one-hot matmuls:

- the fieldnorm -> s1 lookup is one_hot(fn, 256) @ s1_table;
- the per-range scatter (slot = local doc id) is score @ one_hot(local, RS).

Rows are processed in sublane groups of 8 so every block satisfies the
TPU (8, 128) tiling rule.
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

    def kernel(win_ref, s0_ref, s1_ref, out_ref):
        iota256 = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
        iota_slots = jax.lax.broadcasted_iota(jnp.int32, (1, rs), 1)
        s1_col = s1_ref[:].reshape(256, 1)

        for i in range(_SUBLANES):
            acc = jnp.zeros((1, rs), dtype=jnp.float32)
            for t in range(t_terms):
                w = win_ref[i, t * rs : (t + 1) * rs].reshape(rs, 1)
                w = w.astype(jnp.int32)
                local = w & 0xFF
                tfv = (w >> 8) & 0xFFFF
                fn = (w >> 24) & 0xFF
                valid = tfv > 0  # out-of-span lanes were masked to 0 words

                # s1 lookup via one-hot matmul on the MXU.
                onehot_fn = (fn == iota256).astype(jnp.float32)  # [RS,256]
                s1 = jax.lax.dot_general(
                    onehot_fn,
                    s1_col,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [RS,1]

                tf_f = tfv.astype(jnp.float32)
                s0 = s0_ref[i, t]
                sc = jnp.where(valid, (tf_f * s0) / (tf_f + s1), 0.0)

                # Scatter into range slots via one-hot matmul.
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
def accumulate_rows(windows, s0, s1_table, *, rs, interpret=False):
    """windows: [rows, T*RS] uint32 (invalid lanes zeroed); s0: [rows, T];
    rows % 8 == 0.  Returns [rows, RS] float32 accumulated scores."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, twrs = windows.shape
    t_terms = s0.shape[1]
    assert twrs == t_terms * rs and rows % _SUBLANES == 0
    grid_spec = pl.GridSpec(
        grid=(rows // _SUBLANES,),
        in_specs=[
            pl.BlockSpec(
                (_SUBLANES, twrs), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_SUBLANES, t_terms), lambda g: (g, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # s1 table (full)
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
    )(windows, s0, s1_table)


def fused_range_scores(
    packed,  # [P] uint32 posting stream
    s1_table,  # [256] float32
    starts,  # [Q, T, C] int32 window starts (pad: any in-bounds index)
    lens,  # [Q, T, C] int32 window lengths (0 = inactive)
    s0,  # [Q, T] float32
    *,
    rs: int,
    interpret: bool = False,
):
    """Returns [Q, C, RS] float32 per-(query, candidate, slot) scores.

    The irregular window gather (+ length masking) runs in XLA; scoring +
    accumulation run in the Pallas kernel.
    """
    q, t_terms, c = starts.shape
    rows = q * c
    rows_pad = -(-rows // _SUBLANES) * _SUBLANES

    # XLA gather + mask: [Q, C, T, RS] -> [rows, T*RS].
    st = jnp.moveaxis(starts, 1, 2)  # [Q, C, T]
    ln = jnp.moveaxis(lens, 1, 2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, rs), 3)
    idx = st[..., None] + lane
    w = packed[idx]
    w = jnp.where(lane < ln[..., None], w, jnp.uint32(0))
    windows = w.reshape(rows, t_terms * rs)
    s0r = jnp.broadcast_to(s0[:, None, :], (q, c, t_terms)).reshape(
        rows, t_terms
    )
    if rows_pad != rows:
        pad = rows_pad - rows
        windows = jnp.concatenate(
            [windows, jnp.zeros((pad, t_terms * rs), windows.dtype)]
        )
        s0r = jnp.concatenate([s0r, jnp.zeros((pad, t_terms), s0r.dtype)])
    out = accumulate_rows(windows, s0r, s1_table, rs=rs, interpret=interpret)
    return out[:rows].reshape(q, c, rs)
