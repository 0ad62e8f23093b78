"""Unit contracts for functions/text.py scalar helpers (query-level
behavior is pinned by the oracle suite; these pin edge semantics)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


@pytest.mark.parametrize(
    "s,expected",
    [
        ("", 0.0),
        ("aaaa", 0.0),            # single symbol -> signed zero allowed
        ("ab", 1.0),              # two equiprobable symbols -> exactly 1 bit
        ("aabb", 1.0),
        ("abcd", 2.0),            # four equiprobable -> exactly 2 bits
        ("aabbc", 1.521928),      # -2*(0.4 log2 0.4) - 0.2 log2 0.2
    ],
)
def test_shannon_entropy_known_values(spark, s, expected):
    from cses2humio_spark.functions.text import shannon_entropy

    df = spark.createDataFrame([(s,)], "s string")
    got = df.select(F.round(shannon_entropy(F.col("s")), 6).alias("e")).collect()[0].e
    assert math.isclose(abs(got), abs(expected), abs_tol=1e-6), (s, got)


def test_shannon_entropy_bounds(spark):
    """0 <= H <= log2(alphabet size); uniform random-ish strings approach
    the upper bound — the DGA-detection signal."""
    from cses2humio_spark.functions.text import shannon_entropy

    rows = [("x" * 40,), ("abcabcabcabc",), ("q7f!kz0pW@3m",)]
    df = spark.createDataFrame(rows, "s string")
    out = df.select(
        F.col("s"),
        shannon_entropy(F.col("s")).alias("e"),
        F.size(F.array_distinct(F.filter(F.split("s", ""), lambda x: x != F.lit("")))).alias("k"),
    ).collect()
    for r in out:
        assert -1e-12 <= r.e <= math.log2(r.k) + 1e-9
    by_s = {r.s: r.e for r in out}
    assert by_s["q7f!kz0pW@3m"] > by_s["abcabcabcabc"] > by_s["x" * 40]


def test_geohash_matches_standard_test_vectors(spark):
    """geohash_encode must reproduce the standard geohash (Wikipedia
    vectors incl. the canonical u4pruydqqvj), handle the inclusive top
    edge (lat=90/lng=180 -> the last cell, not an overflow), propagate
    NULL coordinates, and refuse silly precisions."""
    import pytest
    from pyspark.sql import functions as F

    from cses2humio_spark.functions.geo import geohash_encode

    rows = [
        (57.64911, 10.40744, "u4pru"),  # wikipedia's canonical example
        (42.605, -5.603, "ezs42"),      # the RFC-discussion example
        (90.0, 180.0, "zzzzz"),         # inclusive top edge
        (-90.0, -180.0, "00000"),
        (0.0, 0.0, "s0000"),
    ]
    df = spark.createDataFrame(
        [(a, b) for a, b, _ in rows], "lat double, lng double"
    )
    got5 = [r[0] for r in df.select(geohash_encode(F.col("lat"), F.col("lng"), 5)).collect()]
    assert got5 == [w for _, _, w in rows]
    got11 = [r[0] for r in df.select(geohash_encode(F.col("lat"), F.col("lng"), 11)).collect()]
    assert got11[0] == "u4pruydqqvj"  # full-precision canonical vector
    # precision prefix property: shorter hashes are prefixes
    assert all(g11.startswith(g5) for g11, g5 in zip(got11, got5))
    null_df = spark.createDataFrame([(None, 10.0)], "lat double, lng double")
    assert null_df.select(
        geohash_encode(F.col("lat"), F.col("lng"), 5)
    ).collect()[0][0] is None
    with pytest.raises(ValueError, match="precision"):
        geohash_encode(F.col("lat"), F.col("lng"), 0)


class TestHashedLinearScore:
    def test_score_is_mean_token_weight(self, spark):
        from cses2humio_spark.functions.text import hashed_linear_score
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("a b a",), ("  x  ",), ("",)], "text string"
        )
        got = df.select(hashed_linear_score(F.col("text")).alias("s")).collect()
        # manual recompute of the same md5-uniform weights
        import hashlib

        def w(tok):
            h = hashlib.md5(f"qw:{tok}".encode()).hexdigest()[:8]
            return int(h, 16) / 4294967296.0 * 2.0 - 1.0

        exp = [
            (w("a") + w("b") + w("a")) / 3.0,
            w("x"),
            w(""),  # empty text -> [''] single-token mean
        ]
        for g, e in zip(got, exp):
            assert abs(g["s"] - e) < 1e-12

    def test_model_application_is_one_scan_no_shuffle(self, spark):
        """The point of the hashing trick at 100 TB: model inference is
        an in-row fold — no Python UDF, no token explode, no Exchange."""
        from cses2humio_spark.queries import QUERIES
        from tests.conftest import SF_SMALL

        plan = (
            QUERIES["model_quality_filter"](spark, SF_SMALL)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
        assert "Generate" not in plan  # no explode
        assert "Exchange" not in plan  # one scan, zero shuffles


class TestVocabLinearScore:
    def test_score_is_mean_vocab_weight_with_oov(self, spark):
        from pyspark.sql import functions as F

        from cses2humio_spark.functions.text import vocab_linear_score

        df = spark.createDataFrame(
            [("a b a",), ("z",), ("a z",)], "text string"
        )
        got = df.select(
            vocab_linear_score(
                F.col("text"), ["a", "b"], [0.5, -0.25], oov_weight=-1.0
            ).alias("s")
        ).collect()
        exp = [
            (0.5 - 0.25 + 0.5) / 3.0,  # all in-vocab
            -1.0,                       # pure OOV
            (0.5 - 1.0) / 2.0,          # mixed
        ]
        for g, e in zip(got, exp):
            assert abs(g["s"] - e) < 1e-12

    def test_vocab_size_mismatch_is_loud(self, spark):
        import pytest as _pytest
        from pyspark.sql import functions as F

        from cses2humio_spark.functions.text import vocab_linear_score

        with _pytest.raises(ValueError, match="vocab size mismatch"):
            vocab_linear_score(F.col("text"), ["a", "b"], [0.5])

    def test_trained_weights_keep_the_one_scan_plan(self, spark):
        """VERDICT r11 #7: the explicit-vocabulary path must compile to
        the SAME plan shape as the hashed path — the vocabulary rides
        the projection as a map literal, so scoring stays one scan,
        zero shuffles, no explode, no Python UDF."""
        from cses2humio_spark.queries import QUERIES
        from tests.conftest import SF_SMALL

        plan = (
            QUERIES["model_quality_filter_vocab"](spark, SF_SMALL)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
        assert "Generate" not in plan  # no explode in the scoring plan
        assert "Exchange" not in plan  # one scan, zero shuffles
        assert plan.count("Location: InMemoryFileIndex") == 1
