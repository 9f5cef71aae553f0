"""Numpy bitpack codec + compressed segment storage round-trips."""

import numpy as np
import pytest

from vectorchord_bm25_tpu.index.sealed import build_sealed_segment
from vectorchord_bm25_tpu.index.storage import load_segment, save_segment
from vectorchord_bm25_tpu.native import loader
from vectorchord_bm25_tpu.ops.bitpack import pack_u32_np, unpack_u32_np
from vectorchord_bm25_tpu.utils.options import IndexOptions

from test_sealed import make_docs


class TestNumpyCodec:
    @pytest.mark.parametrize("bits", [0, 1, 3, 7, 8, 13, 20, 31, 32])
    def test_roundtrip(self, rng, bits):
        hi = 2**bits if bits < 32 else 2**32
        vals = rng.integers(0, hi, size=128, dtype=np.uint64).astype(np.uint32)
        if bits == 0:
            vals[:] = 0
        packed = pack_u32_np(vals, bits)
        out = unpack_u32_np(packed, bits, 128)
        np.testing.assert_array_equal(out, vals)

    def test_matches_native_layout(self, rng):
        if not loader.available():
            pytest.skip("native library not built")
        vals = rng.integers(0, 2**17, size=(4, 128)).astype(np.uint32)
        packed, bits, offsets = loader.compress_blocks(vals)  # unordered
        for i in range(4):
            chunk = packed[offsets[i] : offsets[i + 1]]
            words = np.frombuffer(
                chunk.tobytes().ljust(-(-chunk.size // 4) * 4, b"\x00"),
                dtype=np.uint32,
            )
            out = unpack_u32_np(words, int(bits[i]), 128)
            np.testing.assert_array_equal(out, vals[i])


class TestCompressedStorage:
    def _roundtrip(self, seg, tmp_path, compress):
        path = str(tmp_path / "seg.npz")
        save_segment(seg, path, compress=compress)
        back = load_segment(path, seg.options, seg.n_docs, seg.sum_dl)
        np.testing.assert_array_equal(back.block_docids, seg.block_docids)
        np.testing.assert_array_equal(back.block_tfs, seg.block_tfs)
        np.testing.assert_array_equal(back.token_keys, seg.token_keys)
        return path

    def test_compressed_roundtrip(self, rng, tmp_path):
        docs = make_docs(rng, 400, vocab=12)
        seg = build_sealed_segment(docs, options=IndexOptions())
        self._roundtrip(seg, tmp_path, compress=True)

    def test_uncompressed_roundtrip(self, rng, tmp_path):
        docs = make_docs(rng, 50, vocab=6)
        seg = build_sealed_segment(docs)
        self._roundtrip(seg, tmp_path, compress=False)

    def test_numpy_fallback_roundtrip(self, rng, tmp_path, monkeypatch):
        # Force the numpy codec paths on both save and load.
        monkeypatch.setattr(loader, "compress_blocks", lambda *a, **k: None)
        monkeypatch.setattr(loader, "decompress_blocks", lambda *a, **k: None)
        monkeypatch.setattr(loader, "bytepack_blocks", lambda *a, **k: None)
        monkeypatch.setattr(loader, "byteunpack_blocks", lambda *a, **k: None)
        docs = make_docs(rng, 300, vocab=8)
        seg = build_sealed_segment(docs)
        self._roundtrip(seg, tmp_path, compress=True)

    def test_cross_codec_compat(self, rng, tmp_path, monkeypatch):
        # Save with native, load with numpy fallback (same byte layout).
        if not loader.available():
            pytest.skip("native library not built")
        docs = make_docs(rng, 300, vocab=8)
        seg = build_sealed_segment(docs)
        path = str(tmp_path / "seg.npz")
        save_segment(seg, path, compress=True)
        monkeypatch.setattr(loader, "decompress_blocks", lambda *a, **k: None)
        monkeypatch.setattr(loader, "byteunpack_blocks", lambda *a, **k: None)
        back = load_segment(path, seg.options, seg.n_docs, seg.sum_dl)
        np.testing.assert_array_equal(back.block_docids, seg.block_docids)
        np.testing.assert_array_equal(back.block_tfs, seg.block_tfs)

    def test_partial_blocks_are_bytepacked(self, rng, tmp_path):
        # The reference byte-packs partial blocks and bit-packs full ones
        # (compression.rs:52-62); pin that the on-disk format does too and
        # that partial-block padding never reaches the disk.
        docs = make_docs(rng, 400, vocab=12)
        seg = build_sealed_segment(docs)
        assert (seg.block_n < 128).any() and (seg.block_n == 128).any()
        path = str(tmp_path / "seg.npz")
        save_segment(seg, path, compress=True)
        with np.load(path) as data:
            for key in ("fd_bytes", "ft_bytes", "pd_bytes", "pt_bytes"):
                assert key in data.files
            part = seg.block_n[seg.block_n < 128].astype(np.int64)
            # Byte-packed partial docids: at most 4 bytes per LIVE entry.
            assert data["pd_bytes"].size <= int(part.sum()) * 4
            widths = data["pd_widths"]
            assert widths.max() <= 4

    def test_loads_round1_layout(self, rng, tmp_path):
        # Round-1 checkpoints bit-packed every block including padding
        # (cd_*/ct_* keys); loading them must still work.
        from vectorchord_bm25_tpu.index.storage import (
            _SEGMENT_FIELDS,
            _bitpack_full,
        )

        docs = make_docs(rng, 300, vocab=8)
        seg = build_sealed_segment(docs)
        arrays = {
            name: getattr(seg, name)
            for name in _SEGMENT_FIELDS
            if name not in ("block_docids", "block_tfs")
        }
        d, w, o = _bitpack_full(
            seg.block_docids.astype(np.uint32),
            seg.block_min_doc.astype(np.uint32),
        )
        arrays["cd_bytes"], arrays["cd_bits"], arrays["cd_offsets"] = d, w, o
        d, w, o = _bitpack_full(seg.block_tfs.astype(np.uint32))
        arrays["ct_bytes"], arrays["ct_bits"], arrays["ct_offsets"] = d, w, o
        path = str(tmp_path / "legacy.npz")
        np.savez_compressed(path, **arrays)
        back = load_segment(path, seg.options, seg.n_docs, seg.sum_dl)
        np.testing.assert_array_equal(back.block_docids, seg.block_docids)
        np.testing.assert_array_equal(back.block_tfs, seg.block_tfs)

    def test_compression_shrinks(self, rng, tmp_path):
        import os

        docs = make_docs(rng, 2000, vocab=10)
        seg = build_sealed_segment(docs)
        p1 = str(tmp_path / "c.npz")
        p2 = str(tmp_path / "u.npz")
        save_segment(seg, p1, compress=True)
        save_segment(seg, p2, compress=False)
        assert os.path.getsize(p1) < os.path.getsize(p2)
