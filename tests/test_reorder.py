"""Doc reordering: results unchanged (up to ties), pruning improves."""

import numpy as np

from vectorchord_bm25_tpu.index.bm25index import Bm25Index
from vectorchord_bm25_tpu.index.ranges import build_range_index
from vectorchord_bm25_tpu.index.reorder import reorder_documents
from vectorchord_bm25_tpu.index.sealed import build_sealed_segment
from vectorchord_bm25_tpu.search.blockmax import BlockMaxEngine
from vectorchord_bm25_tpu.text.intern import Query

from test_sealed import make_docs


def test_reorder_preserves_results(rng):
    docs = make_docs(rng, 200, vocab=15)
    q = Query.from_int_ids([0, 1, 2])
    base = Bm25Index.build(docs, engine="exact", reorder="none")
    expect = {(h.payload, round(h.score, 4)) for h in base.search(q, k=200)}
    for strategy in ("fieldnorm", "term"):
        index = Bm25Index.build(docs, engine="exact", reorder=strategy)
        got = {(h.payload, round(h.score, 4)) for h in index.search(q, k=200)}
        assert got == expect, strategy


def test_reorder_payload_mapping(rng):
    docs = make_docs(rng, 50, vocab=5)
    payloads = (np.arange(50) * 2 + 1).tolist()
    dr, pr = reorder_documents(docs, np.asarray(payloads), "fieldnorm")
    # Payloads travel with their documents.
    for d, p in zip(dr, pr):
        assert docs[(p - 1) // 2].length() == d.length()
    # Sorted by fieldnorm.
    lens = [d.length() for d in dr]
    from vectorchord_bm25_tpu.models.fieldnorm import length_to_fieldnorm

    fns = [int(length_to_fieldnorm(x)) for x in lens]
    assert fns == sorted(fns)


def test_reorder_improves_pruning(rng):
    # Mixed doc lengths; with fieldnorm reordering a rare-term query's
    # threshold rises fast and long-doc ranges prune.
    docs = make_docs(rng, 3000, vocab=8, max_len=40)
    q = Query.from_int_ids([0, 1])

    def rounds_for(reorder):
        ds = list(docs)
        payloads = np.arange(len(ds), dtype=np.int64)
        if reorder != "none":
            ds, payloads = reorder_documents(ds, payloads, reorder)
        seg = build_sealed_segment(ds, payloads=payloads)
        eng = BlockMaxEngine(seg, build_range_index(seg), chunk=4)
        eng.search([q], 10)
        return eng.last_rounds

    assert rounds_for("fieldnorm") <= rounds_for("none")
