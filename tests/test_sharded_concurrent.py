"""Concurrent fuzz over the SHARDED index: threads doing insert/select/
delete with periodic maintain on the 8-device mesh, selects checked
against the brute-force oracle under the reference harness's lock
discipline (tests/fuzz run with N clients; SURVEY.md §4)."""

import threading

import numpy as np
import pytest

from vectorchord_bm25_tpu.parallel.shard import ShardedIndex
from vectorchord_bm25_tpu.text.intern import Query
from vectorchord_bm25_tpu.utils.rwlock import RWLock

from test_fuzz import Oracle, edit_distance, random_doc


@pytest.fixture(scope="module")
def mesh8():
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("d",))


def test_sharded_concurrent_fuzz(mesh8):
    vocab = 30
    n_initial = 64
    k = 12
    rng0 = np.random.default_rng(77)
    docs = [random_doc(rng0, vocab) for _ in range(n_initial)]
    index = ShardedIndex.build(docs, 8, mesh=mesh8, engine="hybrid")
    oracle = Oracle()
    for p, d in zip(range(n_initial), docs):
        oracle.insert(p, d)

    harness_lock = RWLock()
    payload_counter = [n_initial]
    counter_lock = threading.Lock()
    errors = []

    def worker(seed):
        rng = np.random.default_rng(seed)
        for _ in range(15):
            op = rng.choice(["insert", "select", "select", "delete"])
            try:
                if op == "insert":
                    with harness_lock.read():
                        with counter_lock:
                            payload = payload_counter[0]
                            payload_counter[0] += 1
                        d = random_doc(rng, vocab)
                        index.insert(d, payload)
                        oracle.insert(payload, d)
                elif op == "delete":
                    with harness_lock.read():
                        with counter_lock:
                            target = int(rng.integers(0, payload_counter[0]))
                        index.bulkdelete_payloads([target])
                        oracle.delete(lambda p: p == target)
                else:
                    with harness_lock.write():
                        terms = np.unique(
                            rng.integers(0, vocab, size=3)
                        ).tolist()
                        q = Query.from_int_ids(terms)
                        _, _, payloads = index.search([q], k)
                        got_p = [int(p) for p in payloads[0] if p >= 0]
                        expect = oracle.topk(index, q, k)
                        exp_p = [p for _, p in expect]
                        if edit_distance(got_p, exp_p) > 2:
                            errors.append(f"got {got_p} expect {exp_p}")
            except Exception as e:  # pragma: no cover
                errors.append(f"{op}: {type(e).__name__}: {e}")

    def vacuumer():
        for _ in range(2):
            with harness_lock.write():
                index.maintain()

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(3)]
    threads.append(threading.Thread(target=vacuumer))
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:3]

    # Final exact check after a last maintain.
    index.maintain()
    q = Query.from_int_ids(list(range(5)))
    _, _, payloads = index.search([q], 30)
    got = [int(p) for p in payloads[0] if p >= 0]
    expect = [p for _, p in oracle.topk(index, q, 30)]
    assert edit_distance(got, expect) <= 2
    assert index.n_live == len(oracle.docs)
