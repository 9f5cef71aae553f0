"""Sharded-index capability parity: the full mutable surface on a mesh.

The single-chip Bm25Index (insert / bulkdelete / maintain / prefilter /
save-load) serves as the oracle: both indexes see the same operation
stream, and every search must agree — the sharded analog of the
reference's fuzz harness (tests/fuzz:203-280), extended to mutations per
VERDICT item 6.
"""

import os

import numpy as np
import pytest

from vectorchord_bm25_tpu.index.bm25index import Bm25Index
from vectorchord_bm25_tpu.index.storage import (
    load_sharded_index,
    open_sharded_index,
    save_sharded_index,
)
from vectorchord_bm25_tpu.parallel.shard import ShardedIndex
from vectorchord_bm25_tpu.text.intern import Document, Query
from vectorchord_bm25_tpu.utils.options import SearchOptions, SessionConfig

from test_exact import rank_match
from test_sealed import make_docs


@pytest.fixture(scope="module")
def mesh8():
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("d",))


def _oracle_hits(oracle: Bm25Index, query: Query, k: int, filter_fn=None):
    hits = oracle.search(query, k=k, filter_fn=filter_fn)
    return [h.payload for h in hits], [h.score for h in hits]


def _assert_matches_oracle(sharded, oracle, queries, k, filter_fn=None):
    scores, gids, payloads = sharded.search(
        queries, k, filter_fn=filter_fn
    )
    for qi, query in enumerate(queries):
        o_pay, o_scores = _oracle_hits(oracle, query, k, filter_fn)
        got = [int(p) for p in payloads[qi] if p >= 0]
        assert len(got) == len(o_pay), (qi, got, o_pay)
        rank_match(
            np.asarray(got),
            np.asarray(o_pay),
            scores[qi][: len(got)],
            np.asarray(o_scores, dtype=np.float32),
        )
        np.testing.assert_allclose(
            scores[qi][: len(got)], o_scores, rtol=2e-5
        )


class TestShardedMutation:
    def test_insert_visible_and_scored_globally(self, rng, mesh8):
        docs = make_docs(rng, 100, vocab=12)
        sharded = ShardedIndex.build(docs, 8, mesh=mesh8)
        oracle = Bm25Index.build(docs, engine="exact")
        new_doc = Document.from_int_ids([0, 1, 1, 2])
        sharded.insert(new_doc, payload=555)
        oracle.insert(new_doc, payload=555)
        queries = [Query.from_int_ids([0, 1]), Query.from_int_ids([2])]
        _assert_matches_oracle(sharded, oracle, queries, 20)
        assert sharded.n_live == 101

    def test_bulkdelete_predicate(self, rng, mesh8):
        docs = make_docs(rng, 120, vocab=10)
        sharded = ShardedIndex.build(docs, 8, mesh=mesh8)
        oracle = Bm25Index.build(docs, engine="exact")
        n1 = sharded.bulkdelete(lambda p: p % 3 == 0)
        n2 = oracle.bulkdelete(lambda p: p % 3 == 0)
        assert n1 == n2 > 0
        # Idempotent.
        assert sharded.bulkdelete(lambda p: p % 3 == 0) == 0
        queries = [
            Query.from_int_ids(rng.integers(0, 10, size=3).tolist())
            for _ in range(3)
        ]
        _assert_matches_oracle(sharded, oracle, queries, 15)

    def test_bulkdelete_payloads(self, rng, mesh8):
        docs = make_docs(rng, 60, vocab=8)
        sharded = ShardedIndex.build(docs, 8, mesh=mesh8)
        assert sharded.bulkdelete_payloads([5, 7, 11]) == 3
        _, gids, payloads = sharded.search([Query.from_int_ids([0, 1, 2])], 60)
        got = set(int(p) for p in payloads[0] if p >= 0)
        assert not ({5, 7, 11} & got)

    def test_maintain_relabels_and_preserves_results(self, rng, mesh8):
        docs = make_docs(rng, 90, vocab=10)
        sharded = ShardedIndex.build(docs, 8, mesh=mesh8, engine="blockmax")
        oracle = Bm25Index.build(docs, engine="exact")
        sharded.bulkdelete(lambda p: p % 4 == 1)
        oracle.bulkdelete(lambda p: p % 4 == 1)
        for j in range(5):
            d = Document.from_int_ids(
                rng.integers(0, 10, size=6).tolist()
            )
            sharded.insert(d, payload=1000 + j)
            oracle.insert(d, payload=1000 + j)
        sharded.maintain()
        oracle.maintain()
        assert len(sharded.growing) == 0
        assert not sharded.deleted.any()
        assert sharded.n_docs == oracle.sealed.n_docs
        queries = [
            Query.from_int_ids(rng.integers(0, 10, size=3).tolist())
            for _ in range(4)
        ]
        _assert_matches_oracle(sharded, oracle, queries, 20)

    def test_prefilter_vs_postfilter(self, rng, mesh8):
        docs = make_docs(rng, 80, vocab=6)
        sharded = ShardedIndex.build(docs, 8, mesh=mesh8)
        oracle = Bm25Index.build(
            docs, engine="exact",
            search_options=SearchOptions(prefilter=True),
        )
        sharded.search_options = SearchOptions(prefilter=True)
        flt = lambda p: p % 2 == 0
        queries = [Query.from_int_ids([0, 1])]
        # Prefilter: threshold honest — k results all passing the filter.
        _assert_matches_oracle(sharded, oracle, queries, 10, filter_fn=flt)
        # Post-filter: retrieve k unfiltered then filter (may return < k).
        sess = SessionConfig(prefilter=False)
        scores, gids, payloads = sharded.search(
            queries, 10, filter_fn=flt, session=sess
        )
        got = [int(p) for p in payloads[0] if p >= 0]
        assert all(p % 2 == 0 for p in got)
        o_hits = oracle.search(
            queries[0], k=10, filter_fn=flt, session=sess
        )
        assert got == [h.payload for h in o_hits]

    def test_brute_force_paths(self, rng, mesh8):
        docs = make_docs(rng, 50, vocab=5)
        sharded = ShardedIndex.build(docs, 8, mesh=mesh8)
        oracle = Bm25Index.build(docs, engine="exact")
        q = Query.from_int_ids([0, 1])
        # k = -1: every matching doc, best first (0.2.x bm25_limit = -1).
        scores, gids, payloads = sharded.search([q], -1)
        o_hits = oracle.search(q, k=-1)
        got = [int(p) for p in payloads[0] if p >= 0]
        assert got == [h.payload for h in o_hits]
        # enable_scan = off routes to brute force too.
        sess = SessionConfig(enable_scan=False)
        s2, g2, p2 = sharded.search([q], 7, session=sess)
        assert [int(x) for x in p2[0] if x >= 0] == got[:7]
        with pytest.raises(ValueError, match="needed rows"):
            sharded.search([q], 0)

    def test_hybrid_engine_matches_exact(self, rng, mesh8):
        docs = make_docs(rng, 300, vocab=25)
        exact = ShardedIndex.build(docs, 8, mesh=mesh8, engine="exact")
        hybrid = ShardedIndex.build(docs, 8, mesh=mesh8, engine="hybrid")
        queries = [
            Query.from_int_ids(rng.integers(0, 25, size=3).tolist())
            for _ in range(6)
        ]
        s1, i1, _ = exact.search(queries, 10)
        s2, i2, _ = hybrid.search(queries, 10)
        for qi in range(len(queries)):
            g1 = i1[qi][i1[qi] >= 0]
            g2 = i2[qi][i2[qi] >= 0]
            assert len(g1) == len(g2), qi
            rank_match(g2, g1, s2[qi][: len(g2)], s1[qi][: len(g1)])

    def test_evaluate_matches_single_chip(self, rng, mesh8):
        docs = make_docs(rng, 70, vocab=9)
        sharded = ShardedIndex.build(docs, 8, mesh=mesh8)
        oracle = Bm25Index.build(docs, engine="exact")
        d = docs[3]
        q = Query.from_int_ids([0, 1, 2])
        np.testing.assert_allclose(
            sharded.evaluate(d, q), oracle.evaluate(d, q), rtol=1e-12
        )
        assert sharded.operator_score(d, q) == -sharded.evaluate(d, q)

    def test_save_load_roundtrip(self, rng, mesh8, tmp_path):
        docs = make_docs(rng, 100, vocab=10)
        sharded = ShardedIndex.build(docs, 8, mesh=mesh8, engine="blockmax")
        sharded.bulkdelete(lambda p: p % 5 == 0)
        sharded.insert(Document.from_int_ids([1, 2, 3]), payload=777)
        save_sharded_index(sharded, str(tmp_path / "idx"))
        loaded = load_sharded_index(str(tmp_path / "idx"), mesh=mesh8)
        assert loaded.engine == "blockmax"
        assert loaded.seed == sharded.seed
        assert loaded.n_docs == sharded.n_docs
        assert np.array_equal(loaded.deleted, sharded.deleted)
        assert len(loaded.growing) == 1
        queries = [
            Query.from_int_ids(rng.integers(0, 10, size=3).tolist())
            for _ in range(3)
        ]
        s1, g1, p1 = sharded.search(queries, 10)
        s2, g2, p2 = loaded.search(queries, 10)
        np.testing.assert_array_equal(g1, g2)
        np.testing.assert_allclose(s1, s2, rtol=1e-6)

    def test_save_load_preserves_memory_modes(self, rng, mesh8, tmp_path):
        # posting_mode/memory_mode must round-trip through the sharded
        # checkpoint: a tf-mode (2 B/posting) index that silently
        # reloads as impact/fast has a very different HBM footprint.
        docs = make_docs(rng, 80, vocab=10)
        sharded = ShardedIndex.build(
            docs, 8, mesh=mesh8, engine="blockmax", posting_mode="tf"
        )
        d = str(tmp_path / "idx")
        save_sharded_index(sharded, d)
        loaded = load_sharded_index(d, mesh=mesh8)
        assert loaded.posting_mode == "tf"
        assert loaded.memory_mode == sharded.memory_mode
        q = [Query.from_int_ids([0, 1, 2])]
        s1, g1, _ = sharded.search(q, 10)
        s2, g2, _ = loaded.search(q, 10)
        np.testing.assert_array_equal(g1, g2)

    def test_wal_recovers_acknowledged_mutations(self, rng, mesh8, tmp_path):
        """Crash simulation: acknowledged mutations after the checkpoint
        are replayed from the sharded WAL (the GenericXLog analog)."""
        docs = make_docs(rng, 60, vocab=8)
        sharded = ShardedIndex.build(docs, 8, mesh=mesh8)
        d = str(tmp_path / "idx")
        save_sharded_index(sharded, d)
        live = open_sharded_index(d, mesh=mesh8)
        live.insert(Document.from_int_ids([0, 1, 2]), payload=900)
        live.bulkdelete_payloads([3, 4])
        live.maintain()
        live.insert(Document.from_int_ids([1, 1]), payload=901)
        q = Query.from_int_ids([0, 1])
        s1, g1, p1 = live.search([q], 60)
        # "Crash": reopen from disk without a checkpoint.
        recovered = open_sharded_index(d, mesh=mesh8)
        assert recovered.n_live == live.n_live
        s2, g2, p2 = recovered.search([q], 60)
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_allclose(s1, s2, rtol=1e-6)
        # Checkpoint truncates the WAL; state survives.
        save_sharded_index(recovered, d)
        assert os.path.getsize(os.path.join(d, "wal.log")) == 0
        again = open_sharded_index(d, mesh=mesh8)
        assert again.n_live == live.n_live

    def test_device_build_bit_identical(self, rng, mesh8):
        docs = make_docs(rng, 96, vocab=14)
        host = ShardedIndex.build(docs, 8, mesh=mesh8, device_build=False)
        dev = ShardedIndex.build(docs, 8, mesh=mesh8, device_build=True)
        for vh, vd in zip(host.views, dev.views):
            sh, sd = vh.segment, vd.segment
            assert sh.n_docs == sd.n_docs and sh.sum_dl == sd.sum_dl
            np.testing.assert_array_equal(sh.token_keys, sd.token_keys)
            np.testing.assert_array_equal(sh.token_df, sd.token_df)
            np.testing.assert_array_equal(sh.block_docids, sd.block_docids)
            np.testing.assert_array_equal(sh.block_tfs, sd.block_tfs)
            np.testing.assert_array_equal(sh.doc_fieldnorm, sd.doc_fieldnorm)
            np.testing.assert_array_equal(sh.block_wand_fn, sd.block_wand_fn)
            np.testing.assert_array_equal(sh.block_wand_tf, sd.block_wand_tf)

    def test_mutation_fuzz_vs_oracle(self, rng, mesh8):
        """Randomized insert/search/delete/maintain loop on the mesh; every
        search compared against the single-chip index (the reference fuzz
        harness shape, tests/fuzz:44-118)."""
        docs = make_docs(rng, 64, vocab=8)
        for engine in ("exact", "hybrid"):
            sharded = ShardedIndex.build(
                docs, 8, mesh=mesh8, engine=engine
            )
            oracle = Bm25Index.build(docs, engine="exact")
            next_payload = 1000
            for step in range(30):
                op = rng.choice(["insert", "insert", "search", "search",
                                 "search", "delete", "delete", "maintain"])
                if op == "insert":
                    d = Document.from_int_ids(
                        rng.integers(0, 8, size=int(rng.integers(1, 6))).tolist()
                    )
                    sharded.insert(d, payload=next_payload)
                    oracle.insert(d, payload=next_payload)
                    next_payload += 1
                elif op == "delete":
                    target = int(rng.integers(0, next_payload))
                    n1 = sharded.bulkdelete_payloads([target])
                    n2 = oracle.bulkdelete_payloads([target])
                    assert n1 == n2, (engine, step)
                elif op == "maintain":
                    sharded.maintain()
                    oracle.maintain()
                else:
                    q = Query.from_int_ids(
                        rng.integers(0, 8, size=2).tolist()
                    )
                    _assert_matches_oracle(
                        sharded, oracle, [q], int(rng.integers(1, 30))
                    )
            assert sharded.n_live == oracle.n_docs
