"""Native library tests: C++ vs Python cross-checks and codec round-trips."""

import os
import tempfile

import numpy as np
import pytest

from vectorchord_bm25_tpu.native import loader

pytestmark = pytest.mark.skipif(
    not loader.available(), reason="native library not built"
)


class TestBlake3Native:
    def test_cross_check_python(self):
        from vectorchord_bm25_tpu.text.blake3 import blake3_keyed_hash

        fn = loader.blake3_keyed_hash16()
        key = b"whats the Elvish word for friend"
        for n in [0, 1, 31, 63, 64, 65, 100, 1023, 1024, 1025, 2048, 4096, 5000]:
            data = bytes(i % 251 for i in range(n))
            assert fn(key, data) == blake3_keyed_hash(key, data, 32)[:16], n

    def test_intern_batch_matches_scalar(self):
        from vectorchord_bm25_tpu.text.intern import intern

        seed = b"\x42" * 32
        tokens = [
            b"cat", b"a" * 16, b"x\x00y", b"", b"fifteen-chars..",
            b"exactly16bytes!!", b"very long token " * 10,
        ]
        keys = loader.intern_batch(seed, tokens)
        assert keys is not None
        for i, tok in enumerate(tokens):
            assert keys[i].tobytes().ljust(16, b"\x00")[:16] == intern(seed, tok), tok


class TestBitpack:
    def test_ordered_roundtrip(self, rng):
        # Every bitwidth 0..=31-ish via scaled random sorted data
        # (mirrors the reference's codec round-trip unit tests,
        # bitpacking_u32_ordered.rs:239-259).
        for scale in [0, 1, 3, 100, 2**15, 2**25]:
            base = np.uint32(rng.integers(0, 1000))
            deltas = rng.integers(0, scale + 1, size=(4, 128)).astype(np.uint64)
            vals = (base + np.cumsum(deltas, axis=1)).astype(np.uint32)
            bases = np.full(4, base, dtype=np.uint32)
            packed, bits, offsets = loader.compress_blocks(vals, bases)
            out = loader.decompress_blocks(packed, bits, offsets, bases)
            np.testing.assert_array_equal(out, vals)
            # Packed size = 16 bytes per bit of width.
            assert offsets[-1] == int(np.sum(bits)) * 16

    def test_unordered_roundtrip(self, rng):
        vals = rng.integers(0, 2**20, size=(8, 128)).astype(np.uint32)
        packed, bits, offsets = loader.compress_blocks(vals)
        out = loader.decompress_blocks(packed, bits, offsets)
        np.testing.assert_array_equal(out, vals)

    def test_compression_ratio_realistic(self, rng):
        # Sorted doc ids with small gaps should compress far below 4 B/doc.
        docs = np.sort(rng.choice(100000, size=128 * 16, replace=False))
        vals = docs.reshape(16, 128).astype(np.uint32)
        bases = np.concatenate([[0], vals[:-1, -1]]).astype(np.uint32)
        packed, bits, offsets = loader.compress_blocks(vals, bases)
        assert offsets[-1] < vals.size * 2  # < 16 bits per doc id


class TestExtSort:
    def _write_records(self, path, keys, docs, tfs):
        rec = np.zeros(
            len(keys), dtype=[("key", "S16"), ("doc", "<u4"), ("tf", "<u4")]
        )
        rec["key"] = keys
        rec["doc"] = docs
        rec["tf"] = tfs
        rec.tofile(path)
        return rec

    def _read_records(self, path):
        return np.fromfile(
            path, dtype=[("key", "S16"), ("doc", "<u4"), ("tf", "<u4")]
        )

    def test_sort_file(self, rng, tmp_path):
        path = str(tmp_path / "run.bin")
        n = 1000
        keys = np.array(
            [f"tok{int(x):06d}".encode() for x in rng.integers(0, 50, n)],
            dtype="S16",
        )
        docs = rng.integers(0, 10000, n).astype(np.uint32)
        tfs = rng.integers(1, 5, n).astype(np.uint32)
        self._write_records(path, keys, docs, tfs)
        assert loader.sort_mappings_file(path)
        out = self._read_records(path)
        # (key, doc) sorted.
        pairs = list(zip(out["key"].tolist(), out["doc"].tolist()))
        assert pairs == sorted(pairs)
        assert len(out) == n

    def test_merge_with_offsets(self, rng, tmp_path):
        # Mirrors io.rs doc-id offset rebasing: per-worker runs merge into
        # one global doc-id space.
        runs, all_expected = [], []
        offsets = [0, 100, 250]
        for w in range(3):
            path = str(tmp_path / f"run{w}.bin")
            n = 50
            keys = np.array(
                [f"t{int(x):04d}".encode() for x in rng.integers(0, 20, n)],
                dtype="S16",
            )
            docs = np.sort(rng.integers(0, 100, n)).astype(np.uint32)
            tfs = np.full(n, w + 1, dtype=np.uint32)
            self._write_records(path, keys, docs, tfs)
            assert loader.sort_mappings_file(path)
            runs.append(path)
            for k, d, t in zip(keys, docs, tfs):
                all_expected.append((k, int(d) + offsets[w], int(t)))
        out_path = str(tmp_path / "merged.bin")
        assert loader.merge_mappings(runs, offsets, out_path)
        out = self._read_records(out_path)
        got = [
            (k, int(d), int(t))
            for k, d, t in zip(out["key"], out["doc"], out["tf"])
        ]
        assert got == sorted(all_expected, key=lambda r: (r[0], r[1], r[2])) or (
            sorted(got) == sorted(all_expected)
            and got == sorted(got, key=lambda r: (r[0], r[1]))
        )
