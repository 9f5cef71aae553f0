"""Device-side bit-unpacking (XLA) + numpy reference codec.

Complements the native host codecs (native/src/bitpack.cpp, the
crates/simd analog): blocks bit-packed on the host can be unpacked on
device with vectorized shifts — value i of width B lives at bit i*B of
the little-endian packed stream, so each value straddles at most two
32-bit words:

    lo = words[(i*B) >> 5] >> (i*B & 31)
    hi = words[(i*B) >> 5 + 1] << (32 - (i*B & 31))
    v  = (lo | hi) & ((1 << B) - 1)

All index/shift vectors are static for a given bitwidth, so XLA compiles
this to pure VPU code (no scatter/serial loops).  The numpy pack/unpack
pair is the portable fallback used by compressed on-disk segments when
the native library is absent.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

__all__ = [
    "pack_u32_np",
    "unpack_u32_np",
    "unpack_block_device",
]

BLOCK = 128


def pack_u32_np(values: np.ndarray, bits: int) -> np.ndarray:
    """Pack uint32 values at `bits` width into a little-endian uint32
    word stream (numpy fallback for the native codec)."""
    values = np.asarray(values, dtype=np.uint64)
    n = values.size
    if bits == 0:
        return np.zeros(0, dtype=np.uint32)
    total_bits = n * bits
    n_words = (total_bits + 31) // 32
    out = np.zeros(n_words + 1, dtype=np.uint64)  # +1 spill word
    bitpos = np.arange(n, dtype=np.uint64) * np.uint64(bits)
    word = (bitpos >> np.uint64(5)).astype(np.int64)
    off = bitpos & np.uint64(31)
    lo = (values << off) & np.uint64(0xFFFFFFFF)
    hi = values >> (np.uint64(32) - off)
    hi = np.where(off == 0, np.uint64(0), hi)
    np.bitwise_or.at(out, word, lo)
    np.bitwise_or.at(out, word + 1, hi)
    return out[:n_words].astype(np.uint32)


def unpack_u32_np(packed: np.ndarray, bits: int, count: int) -> np.ndarray:
    """Inverse of pack_u32_np."""
    if bits == 0:
        return np.zeros(count, dtype=np.uint32)
    words = np.zeros(packed.size + 1, dtype=np.uint64)
    words[: packed.size] = np.asarray(packed, dtype=np.uint64)
    bitpos = np.arange(count, dtype=np.uint64) * np.uint64(bits)
    word = (bitpos >> np.uint64(5)).astype(np.int64)
    off = bitpos & np.uint64(31)
    lo = words[word] >> off
    hi = words[word + 1] << (np.uint64(32) - off)
    hi = np.where(off == 0, np.uint64(0), hi)
    mask = np.uint64((1 << bits) - 1)
    return ((lo | hi) & mask).astype(np.uint32)


@functools.partial(jax.jit, static_argnames=("bits", "count"))
def unpack_block_device(packed, bits: int, count: int = BLOCK):
    """Unpack one bit-packed stream on device (vectorized shifts).

    packed: uint32 words (at least ceil(count*bits/32) + 1 entries —
    callers pad the stream with one spill word).
    """
    import jax.numpy as jnp

    if bits == 0:
        return jnp.zeros(count, dtype=jnp.uint32)
    bitpos = np.arange(count, dtype=np.int64) * bits
    word = jnp.asarray(bitpos // 32, dtype=jnp.int32)
    off = jnp.asarray(bitpos % 32, dtype=jnp.uint32)
    w = packed.astype(jnp.uint32)
    lo = w[word] >> off
    hi_shift = (np.uint32(32) - off).astype(jnp.uint32) % np.uint32(32)
    hi = jnp.where(off == 0, jnp.uint32(0), w[word + 1] << hi_shift)
    mask = jnp.uint32((1 << bits) - 1)
    return (lo | hi) & mask
