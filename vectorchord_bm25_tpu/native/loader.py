"""ctypes loader for the native C++ library (libvcbm25.so).

The native library provides the host-side hot paths that the reference
implements in Rust: blake3 keyed interning (crates/bm25/src/vector.rs),
the block compression codecs (crates/simd), and the external-sort merge
(crates/bm25/src/io.rs).  Everything has a pure-Python/numpy fallback, so
the framework works without a compiler; the loader returns None when the
library is absent and callers fall back.

Build with:  make -C vectorchord_bm25_tpu/native
"""

from __future__ import annotations

import ctypes
import functools
import os

_LIB_NAMES = ("libvcbm25.so",)


@functools.lru_cache(maxsize=1)
def _load():
    here = os.path.dirname(os.path.abspath(__file__))
    for name in _LIB_NAMES:
        path = os.path.join(here, name)
        if os.path.exists(path):
            try:
                return ctypes.CDLL(path)
            except OSError:
                return None
    return None


@functools.lru_cache(maxsize=1)
def blake3_keyed_hash16():
    """Returns fn(seed32: bytes, data: bytes) -> bytes16, or None."""
    lib = _load()
    if lib is None or not hasattr(lib, "vcbm25_blake3_keyed_hash16"):
        return None
    fn = lib.vcbm25_blake3_keyed_hash16
    fn.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_char_p,
    ]
    fn.restype = None

    def call(seed: bytes, data: bytes) -> bytes:
        out = ctypes.create_string_buffer(16)
        fn(seed, data, len(data), out)
        return out.raw

    return call


@functools.lru_cache(maxsize=1)
def library():
    """The raw CDLL handle (or None)."""
    return _load()
