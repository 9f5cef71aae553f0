"""Unit tests for the scoring core (M0).

Anchors (BASELINE.md): k1=1.2, b=0.75 defaults; idf = ln((N+1)/(df+0.5));
Lucene-style 256-level fieldnorm table identical to the reference's.
"""

import math

import numpy as np
import pytest

from vectorchord_bm25_tpu.models.fieldnorm import (
    FIELDNORM_TO_LENGTH,
    fieldnorm_to_length,
    length_to_fieldnorm,
)
from vectorchord_bm25_tpu.models.scoring import ScoreTables, bm25_score, idf, max_impact, tf
from vectorchord_bm25_tpu.utils.options import IndexOptions, SearchOptions, SessionConfig
from vectorchord_bm25_tpu.utils.scorepack import pack_score, unpack_score


class TestFieldnorm:
    def test_table_anchors(self):
        # Spot values cross-checked against the reference table
        # (crates/bm25/src/bm25.rs:15-272).
        assert FIELDNORM_TO_LENGTH[0] == 0
        assert FIELDNORM_TO_LENGTH[39] == 39
        assert FIELDNORM_TO_LENGTH[40] == 40
        assert FIELDNORM_TO_LENGTH[41] == 42
        assert FIELDNORM_TO_LENGTH[47] == 54
        assert FIELDNORM_TO_LENGTH[48] == 56
        assert FIELDNORM_TO_LENGTH[49] == 60
        assert FIELDNORM_TO_LENGTH[56] == 88
        assert FIELDNORM_TO_LENGTH[64] == 152
        assert FIELDNORM_TO_LENGTH[255] == 2_013_265_944

    def test_table_monotone(self):
        assert np.all(np.diff(FIELDNORM_TO_LENGTH) > 0)

    def test_roundtrip_floor(self):
        # length_to_fieldnorm is the floor inverse (bm25.rs:278-283).
        for b in range(256):
            assert length_to_fieldnorm(FIELDNORM_TO_LENGTH[b]) == b
        assert length_to_fieldnorm(41) == 40  # between 40 and 42 -> floor
        assert length_to_fieldnorm(55) == 47
        assert length_to_fieldnorm(2**31 - 1) == 255

    def test_vectorized(self):
        lens = np.array([0, 1, 41, 100, 10**9])
        fns = length_to_fieldnorm(lens)
        assert fns.dtype == np.uint8
        back = fieldnorm_to_length(fns)
        assert np.all(back <= lens)


class TestScoring:
    def test_idf(self):
        assert idf(10, 3) == pytest.approx(math.log(11.0 / 3.5))
        assert idf(1, 1) == pytest.approx(math.log(2.0 / 1.5))
        # idf is always positive since df <= N.
        ns = np.arange(1, 100)
        assert np.all(idf(ns, ns) > 0)

    def test_tf_formula(self):
        # tf = tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))  (bm25.rs:291-295)
        fn = length_to_fieldnorm(100)
        dl = float(fieldnorm_to_length(fn))
        k1, b, avgdl = 1.2, 0.75, 120.0
        expect = (3 * (k1 + 1)) / (3 + k1 * (1 - b + b * dl / avgdl))
        assert tf(fn, 3, k1, b, avgdl) == pytest.approx(expect, rel=1e-15)

    def test_tf_monotone_in_tf_saturating(self):
        fn = length_to_fieldnorm(50)
        vals = tf(fn, np.arange(1, 100), 1.2, 0.75, 50.0)
        assert np.all(np.diff(vals) > 0)
        assert vals[-1] < 1.2 + 1.0  # bounded by k1+1

    def test_cache_equivalence(self):
        # Cache s0/s1 factorization == direct idf*tf (bm25.rs:334-359).
        k1, b = 1.5, 0.6
        n_docs, sum_dl = 1000, 52341
        tables = ScoreTables.create(k1, b, n_docs, sum_dl)
        rng = np.random.default_rng(1)
        for _ in range(100):
            df = int(rng.integers(1, n_docs))
            fn = int(rng.integers(0, 256))
            t = int(rng.integers(1, 50))
            direct = bm25_score(n_docs, df, fn, t, k1, b, tables.avgdl)
            cached = tables.evaluate(tables.s0(df), fn, t)
            assert cached == pytest.approx(direct, rel=1e-12)

    def test_max_impact_first_max(self):
        # Wand keeps the first posting attaining the max tf-score
        # (strict < update, bm25.rs:311-318).
        fns = [10, 20, 10, 5]
        tfs = [3, 3, 3, 1]
        fn, t = max_impact(fns, tfs, 1.2, 0.75, 100.0)
        assert (fn, t) == (10, 3)  # fn=10 scores higher than fn=20; first wins

    def test_max_impact_empty(self):
        fn, t = max_impact([], [], 1.2, 0.75, 100.0)
        assert (fn, t) == (255, 0)


class TestScorePack:
    def test_order_preserving(self, rng):
        xs = np.concatenate(
            [
                rng.normal(size=1000),
                [0.0, -0.0, np.inf, -np.inf, 1e-300, -1e-300, 1e300, -1e300],
            ]
        )
        packed = pack_score(xs)
        order_f = np.argsort(xs, kind="stable")
        order_i = np.argsort(packed, kind="stable")
        # Total order on non-NaN floats matches i64 order (score/src/lib.rs).
        assert np.array_equal(xs[order_f], xs[order_i])

    def test_bijection(self, rng):
        xs = rng.normal(size=1000)
        assert np.array_equal(
            unpack_score(pack_score(xs)).view(np.int64), xs.view(np.int64)
        )
        for special in [0.0, -0.0, np.inf, -np.inf, np.nan]:
            rt = unpack_score(pack_score(special))
            assert np.float64(special).tobytes() == np.float64(rt).tobytes()


class TestOptions:
    def test_k1_b_ranges(self):
        IndexOptions()  # defaults valid
        IndexOptions(k1=2.0, b=0.0)
        with pytest.raises(ValueError):
            IndexOptions(k1=1.0)
        with pytest.raises(ValueError):
            IndexOptions(k1=2.5)
        with pytest.raises(ValueError):
            IndexOptions(b=1.5)

    def test_session_precedence(self):
        # Session value wins only when explicitly set (gucs.rs:113-145).
        per_index = SearchOptions(limit=50, prefilter=True)
        session = SessionConfig()
        assert session.resolve_limit(per_index) == 50
        assert session.resolve_prefilter(per_index) is True
        session.limit = 10
        session.prefilter = False
        assert session.resolve_limit(per_index) == 10
        assert session.resolve_prefilter(per_index) is False

    def test_limit_range(self):
        with pytest.raises(ValueError):
            SearchOptions(limit=70000)
