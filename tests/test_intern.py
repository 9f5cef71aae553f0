"""Tests for token interning, blake3, and Document/Query invariants."""

import numpy as np
import pytest

from vectorchord_bm25_tpu.text.blake3 import blake3_hash, blake3_keyed_hash
from vectorchord_bm25_tpu.text.intern import (
    WIDTH,
    Document,
    Query,
    intern,
    intern_int_id,
    random_seed,
)


class TestBlake3:
    KEY = b"whats the Elvish word for friend"

    def _input(self, n):
        return bytes(i % 251 for i in range(n))

    def test_empty_hash_prefix_anchor(self):
        # Known prefix of the official empty-input vector
        # (github.com/BLAKE3-team/BLAKE3 test_vectors.json starts
        # af1349b9f5f9a1a6a0404de...).  An 88-bit prefix match pins the
        # whole compression function: any wrong constant, rotation or
        # round count scrambles every output byte.
        assert blake3_hash(b"").hex().startswith("af1349b9f5f9a1a6a0404de")

    def test_determinism_and_sensitivity(self):
        a = blake3_hash(b"hello")
        assert a == blake3_hash(b"hello")
        assert a != blake3_hash(b"hellp")
        assert a != blake3_hash(b"hello\x00")
        assert len(a) == 32

    def test_keyed_differs_from_plain(self):
        data = self._input(100)
        plain = blake3_hash(data)
        keyed = blake3_keyed_hash(self.KEY, data)
        assert plain != keyed
        assert keyed != blake3_keyed_hash(b"\x00" * 32, data)
        with pytest.raises(ValueError):
            blake3_keyed_hash(b"short", data)

    def test_block_and_chunk_boundaries(self):
        # Exercise every structural path: partial block, full block,
        # multi-block chunk, full chunk, 2-chunk parent, odd carry,
        # balanced 4-chunk tree, 5-chunk (carry at level 1).
        sizes = [0, 1, 63, 64, 65, 128, 1023, 1024, 1025, 2048, 3072, 4096, 5120]
        digests = {blake3_hash(self._input(n)) for n in sizes}
        assert len(digests) == len(sizes)  # all distinct

    def test_xof_prefix_property(self):
        # Longer outputs extend shorter ones (XOF behavior).
        data = self._input(200)
        assert blake3_hash(data, 64)[:32] == blake3_hash(data, 32)
        assert blake3_keyed_hash(self.KEY, data, 64)[:16] == blake3_keyed_hash(
            self.KEY, data, 16
        )

    def test_native_cross_check(self):
        # Independent C++ implementation must agree with pure Python
        # (skipped until the native library is built).
        from vectorchord_bm25_tpu.native import loader

        fn = loader.blake3_keyed_hash16()
        if fn is None:
            pytest.skip("native library not built")
        for n in [0, 1, 31, 64, 100, 1024, 1025, 4096, 5000]:
            data = self._input(n)
            assert fn(self.KEY, data) == blake3_keyed_hash(self.KEY, data, 32)[:16]


class TestIntern:
    def test_short_string_verbatim(self):
        seed = b"\x00" * 32
        key = intern(seed, b"hello")
        assert key == b"hello" + b"\x00" * (WIDTH - 5)

    def test_seed_independent_for_short(self):
        assert intern(b"\x01" * 32, "cat") == intern(b"\x02" * 32, "cat")

    def test_long_string_hashed(self):
        seed = random_seed()
        token = b"a" * 32
        key = intern(seed, token)
        assert len(key) == WIDTH
        assert key != token[:WIDTH]
        # Stable for the same seed, different across seeds.
        assert intern(seed, token) == key
        assert intern(random_seed(), token) != key

    def test_exactly_width_is_hashed(self):
        # len < WIDTH is the verbatim condition (vector.rs:21); 16 bytes hash.
        seed = b"\x07" * 32
        token = b"b" * WIDTH
        assert intern(seed, token) != token

    def test_nul_containing_hashed(self):
        seed = b"\x07" * 32
        key = intern(seed, b"a\x00b")
        assert len(key) == WIDTH
        assert key != b"a\x00b" + b"\x00" * (WIDTH - 3)

    def test_last_byte_nonzero_fixup(self):
        # Hashed keys always end with a nonzero byte (vector.rs:30-32), so
        # they cannot collide with short-string padding.
        seed = b"\x09" * 32
        for i in range(200):
            key = intern(seed, b"tok%d" % i * 5)
            assert key[WIDTH - 1] != 0

    def test_int_id_order(self):
        keys = [intern_int_id(i) for i in [0, 1, 255, 256, 2**31, 2**32 - 1]]
        assert keys == sorted(keys)
        with pytest.raises(ValueError):
            intern_int_id(2**32)


class TestDocument:
    def test_from_pairs_merges_and_sorts(self):
        seed = b"\x00" * 32
        doc = Document.from_pairs(seed, [("b", 2), ("a", 1), ("b", 3)])
        assert len(doc) == 2
        # numpy S16 elements strip trailing NUL padding; the stored bytes
        # are the full padded key (keys.tobytes()).
        assert doc.keys[0] == intern(seed, "a").rstrip(b"\x00")
        assert doc.keys.tobytes()[:16] == intern(seed, "a")
        assert doc.values.tolist() == [1, 5]
        assert doc.length() == 6

    def test_invariants_rejected(self):
        keys = np.asarray([b"b", b"a"], dtype=f"S{WIDTH}")
        with pytest.raises(ValueError):
            Document(keys=keys, values=np.asarray([1, 1], dtype=np.uint32))
        keys2 = np.asarray([b"a"], dtype=f"S{WIDTH}")
        with pytest.raises(ValueError):
            Document(keys=keys2, values=np.asarray([0], dtype=np.uint32))

    def test_from_int_ids(self):
        doc = Document.from_int_ids([1, 2, 1])
        assert len(doc) == 2
        assert doc.values.tolist() == [2, 1]

    def test_empty(self):
        doc = Document.from_pairs(b"\x00" * 32, [])
        assert len(doc) == 0
        assert doc.length() == 0


class TestQuery:
    def test_dedup_sort(self):
        seed = b"\x00" * 32
        q = Query.from_tokens(seed, ["b", "a", "b"])
        assert len(q) == 2
        assert q.keys[0] == intern(seed, "a").rstrip(b"\x00")

    def test_unsorted_rejected(self):
        keys = np.asarray([b"b", b"a"], dtype=f"S{WIDTH}")
        with pytest.raises(ValueError):
            Query(keys=keys)
