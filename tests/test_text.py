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
