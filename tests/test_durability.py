"""Durability tests: WAL recovery + atomic checkpoints (VERDICT item 7).

The reference gets crash safety from PostgreSQL's GenericXLog
(src/index/storage.rs:227-238): every acknowledged mutation survives a
crash, and a torn write never corrupts the previous state.  These tests
pin the same guarantees for the checkpoint + wal.log pair.
"""

import os

import numpy as np
import pytest

from vectorchord_bm25_tpu.index.bm25index import Bm25Index
from vectorchord_bm25_tpu.index.storage import (
    load_index,
    open_index,
    save_index,
)
from vectorchord_bm25_tpu.text.intern import Document, Query

from test_sealed import make_docs


def _ranked(index, q, k=20):
    return [(h.payload, round(h.score, 6)) for h in index.search(q, k=k)]


class TestWalRecovery:
    def test_acknowledged_mutations_survive_reload(self, rng, tmp_path):
        d = str(tmp_path / "idx")
        save_index(Bm25Index.build(make_docs(rng, 30, vocab=10)), d)

        # Mutate through the WAL-attached handle; never call save_index.
        index = open_index(d)
        index.insert(Document.from_int_ids([1, 2, 2]), payload=500)
        index.insert(Document.from_int_ids([3]), payload=501)
        index.bulkdelete(lambda p: p in (5, 501) if np.isscalar(p) else np.isin(p, [5, 501]))
        index.insert(Document.from_int_ids([0, 4]), payload=502)
        expected = _ranked(index, Query.from_int_ids([0, 1, 2, 3, 4]))

        # "Crash": reload from disk with no checkpoint taken.
        recovered = load_index(d)
        assert len(recovered.growing) == 3
        assert recovered.growing.deleted == [False, True, False]
        assert recovered.deleted[5]
        assert _ranked(recovered, Query.from_int_ids([0, 1, 2, 3, 4])) == expected

    def test_maintain_is_replayed(self, rng, tmp_path):
        d = str(tmp_path / "idx")
        save_index(Bm25Index.build(make_docs(rng, 20, vocab=8)), d)
        index = open_index(d)
        index.insert(Document.from_int_ids([1]), payload=900)
        index.bulkdelete_payloads([3, 7])
        index.maintain()
        index.insert(Document.from_int_ids([2]), payload=901)
        expected = _ranked(index, Query.from_int_ids([1, 2, 3]))

        recovered = load_index(d)
        assert recovered.sealed.n_docs == index.sealed.n_docs
        assert len(recovered.growing) == 1
        assert _ranked(recovered, Query.from_int_ids([1, 2, 3])) == expected

    def test_torn_wal_tail_is_ignored(self, rng, tmp_path):
        d = str(tmp_path / "idx")
        save_index(Bm25Index.build(make_docs(rng, 10, vocab=5)), d)
        index = open_index(d)
        index.insert(Document.from_int_ids([1]), payload=700)
        # Simulate a crash mid-append: garbage partial record, no newline.
        with open(os.path.join(d, "wal.log"), "ab") as f:
            f.write(b'{"op": "insert", "payl')
        recovered = load_index(d)
        assert len(recovered.growing) == 1  # acknowledged insert kept
        assert recovered.growing.payloads == [700]

    def test_checkpoint_truncates_wal(self, rng, tmp_path):
        d = str(tmp_path / "idx")
        save_index(Bm25Index.build(make_docs(rng, 10, vocab=5)), d)
        index = open_index(d)
        index.insert(Document.from_int_ids([1]), payload=700)
        assert os.path.getsize(os.path.join(d, "wal.log")) > 0
        save_index(index, d)
        assert os.path.getsize(os.path.join(d, "wal.log")) == 0
        recovered = load_index(d)
        assert len(recovered.growing) == 1  # from the checkpoint now
        # WAL handle still works after the reset.
        index.insert(Document.from_int_ids([2]), payload=701)
        assert len(load_index(d).growing) == 2


class TestAtomicCheckpoint:
    def test_crash_mid_save_preserves_previous_generation(self, rng, tmp_path, monkeypatch):
        d = str(tmp_path / "idx")
        index = Bm25Index.build(make_docs(rng, 25, vocab=8))
        save_index(index, d)
        before = _ranked(load_index(d), Query.from_int_ids([0, 1, 2]))

        # Crash while writing the new generation's files — before the
        # CURRENT pointer swap.
        import vectorchord_bm25_tpu.index.storage as storage

        def boom(index, gen_dir):
            with open(os.path.join(gen_dir, "meta.json"), "w") as f:
                f.write('{"partial": true')  # torn file
            raise RuntimeError("simulated crash mid-checkpoint")

        monkeypatch.setattr(storage, "_write_checkpoint_files", boom)
        index.bulkdelete_payloads([0])
        with pytest.raises(RuntimeError, match="simulated crash"):
            save_index(index, d)
        monkeypatch.undo()

        # The previous committed generation still loads, unchanged.
        recovered = load_index(d)
        assert _ranked(recovered, Query.from_int_ids([0, 1, 2])) == before

        # And a later successful save commits + GCs the stale dir.
        save_index(index, d)
        recovered = load_index(d)
        assert recovered.deleted[0]
        gens = [n for n in os.listdir(d) if n.startswith("gen-")]
        assert len(gens) == 1

    def test_generation_numbers_advance(self, rng, tmp_path):
        d = str(tmp_path / "idx")
        index = Bm25Index.build(make_docs(rng, 5, vocab=3))
        save_index(index, d)
        save_index(index, d)
        save_index(index, d)
        with open(os.path.join(d, "CURRENT")) as f:
            assert f.read().strip() == "gen-000003"
        gens = [n for n in os.listdir(d) if n.startswith("gen-")]
        assert gens == ["gen-000003"]
