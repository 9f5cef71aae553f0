"""Randomized end-to-end fuzz harness: index vs brute-force oracle.

Mirror of the reference's correctness keystone (tests/fuzz:44-295):
random documents, then a random op stream {2x insert, 4x select,
3x delete, 1x vacuum}; every select compares the index's top-k against a
brute-force oracle over all live documents (the seqscan `<&>` path),
failing if the payload-sequence edit distance exceeds a small tolerance
(float ties); after a final maintain the comparison must be exact up to
score ties.

The oracle scores each live doc with `Bm25Index.evaluate` — the same
sealed-statistics semantics the index search path uses, exactly like the
reference's seqscan oracle (operators.rs -> evaluate.rs).
"""

import numpy as np
import pytest

from vectorchord_bm25_tpu.index.bm25index import Bm25Index
from vectorchord_bm25_tpu.text.intern import Document, Query


def edit_distance(a, b):
    """Levenshtein distance over payload sequences (tests/fuzz:283-295)."""
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev = dp[0]
        dp[0] = i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(
                dp[j] + 1,
                dp[j - 1] + 1,
                prev + (0 if a[i - 1] == b[j - 1] else 1),
            )
            prev = cur
    return dp[n]


class Oracle:
    """Brute-force mirror of the index state."""

    def __init__(self):
        self.docs = {}  # payload -> Document

    def insert(self, payload, doc):
        self.docs[payload] = doc

    def delete(self, predicate):
        self.docs = {p: d for p, d in self.docs.items() if not predicate(p)}

    def topk(self, index, query, k):
        scored = []
        for payload, doc in self.docs.items():
            s = index.evaluate(doc, query)
            if s > 0:
                scored.append((s, payload))
        scored.sort(key=lambda t: (-t[0], t[1]))
        return scored[:k]


def random_doc(rng, vocab):
    n = int(rng.integers(1, 20))
    return Document.from_int_ids(rng.integers(0, vocab, size=n).tolist())


@pytest.mark.parametrize(
    "seed,engine",
    [(1, "blockmax"), (2, "blockmax"), (3, "stream"), (4, "maxscore")],
)
def test_fuzz_index_vs_oracle(seed, engine):
    rng = np.random.default_rng(seed)
    vocab = 80
    n_initial = 150
    k = 20

    docs = [random_doc(rng, vocab) for _ in range(n_initial)]
    payloads = list(range(n_initial))
    if engine == "maxscore":
        # The pruned stream strategy under the full mutation stream.
        index = Bm25Index.build(
            docs, payloads=payloads, engine="stream",
            engine_options={"strategy": "maxscore"},
        )
    else:
        index = Bm25Index.build(docs, payloads=payloads, engine=engine)
    oracle = Oracle()
    for p, d in zip(payloads, docs):
        oracle.insert(p, d)
    next_payload = n_initial

    ops = rng.choice(
        ["insert"] * 2 + ["select"] * 4 + ["delete"] * 3 + ["vacuum"],
        size=120,
    )
    n_selects = 0
    for op in ops:
        if op == "insert":
            d = random_doc(rng, vocab)
            index.insert(d, next_payload)
            oracle.insert(next_payload, d)
            next_payload += 1
        elif op == "delete":
            target = int(rng.integers(0, next_payload))
            index.bulkdelete(lambda p: p == target)
            oracle.delete(lambda p: p == target)
        elif op == "vacuum":
            index.maintain()
        else:  # select
            n_selects += 1
            terms = rng.integers(0, vocab, size=int(rng.integers(1, 5)))
            q = Query.from_int_ids(np.unique(terms).tolist())
            got = [h.payload for h in index.search(q, k=k)]
            expect = [p for _, p in oracle.topk(index, q, k)]
            dist = edit_distance(got, expect)
            assert dist <= 2, (
                f"select #{n_selects}: edit distance {dist}\n"
                f"got:    {got}\nexpect: {expect}"
            )

    # Final vacuum: comparison should be exact (ties aside).
    index.maintain()
    q = Query.from_int_ids(list(range(5)))
    got = [h.payload for h in index.search(q, k=50)]
    expect = [p for _, p in oracle.topk(index, q, 50)]
    assert edit_distance(got, expect) <= 2
    assert set(got) == set(expect) or edit_distance(got, expect) <= 2
