"""BPE subword tokenization: trainer determinism, distributed-fold
parity against the reference implementation (including the adversarial
shapes the multi-pass replace must converge on), and the no-Python plan
contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cses2humio_spark.operators.bpe import (
    bpe_encode,
    bpe_encode_sql,
    reference_bpe_encode,
    sample_texts,
    train_bpe,
)

CORPUS = [
    "low lower lowest",
    "new newer newest",
    "wide wider widest",
    "low low low new new",
]


def test_trainer_is_deterministic_and_topologically_consistent():
    m1 = train_bpe(CORPUS, 16)
    m2 = train_bpe(list(reversed(CORPUS)), 16)
    assert m1 == m2  # word-count based: order of texts cannot matter
    # topological consistency: every multi-char operand was produced by
    # an EARLIER merge — the property that makes rank-order single
    # application equal to the reference's iterative-lowest-rank loop
    known = set()
    for a, b in m1:
        for operand in (a, b):
            if len(operand) > 1 and operand != "</w>":
                assert operand in known, (operand, m1)
        known.add(a + b)


@pytest.mark.parametrize(
    "text",
    [
        "low lowest newer",
        "aaaaaaaa",                      # identical-pair run (odd/even artifact)
        "a" * 63,                        # long run: multi-pass must converge
        "abababababab",                  # alternating pair run
        "wideness",
        "",
        "  spaced   out  ",
        "unicode ñandú über 東京",
        "x",                             # single char -> (x, </w>) shapes
    ],
)
def test_spark_fold_matches_reference(spark, text):
    merges = train_bpe(CORPUS + ["aa aaaa ab abab"], 20)
    ref = reference_bpe_encode(text, merges)
    df = spark.createDataFrame([(text,)], "t string")
    got = df.select(bpe_encode("t", merges).alias("s")).first()["s"]
    assert got == ref, (text, got, ref)


def test_duckdb_twin_matches_reference(spark):
    import duckdb

    merges = train_bpe(CORPUS + ["aa aaaa ab abab"], 20)
    texts = ["low lowest newer", "aaaaaaaa", "abab abab", "wideness"]
    ref = [reference_bpe_encode(t, merges) for t in texts]
    con = duckdb.connect()
    sql = (
        "SELECT " + bpe_encode_sql("t", merges)
        + " FROM (SELECT unnest(?) AS t)"
    )
    got = [list(r[0]) for r in con.execute(sql, [texts]).fetchall()]
    assert got == ref


def test_sample_texts_is_bounded_and_deterministic(spark):
    df = spark.createDataFrame(
        [(f"doc {i % 7}",) for i in range(100)], "text string"
    )
    s1 = sample_texts(df, "text", max_docs=10)
    s2 = sample_texts(df.repartition(13), "text", max_docs=10)
    assert s1 == s2 and len(s1) == 10 == len(sorted(s1)) and s1 == sorted(s1)


def test_bpe_plan_is_python_free_and_fans_out(spark):
    from tests.conftest import SF_SMALL

    from cses2humio_spark.sources.catalog import fan_out, load_table

    merges = train_bpe(CORPUS, 12)
    docs = fan_out(load_table(spark, SF_SMALL, "documents"))
    df = (
        docs.select(F.explode(bpe_encode("text", merges)).alias("sw"))
        .groupBy("sw")
        .count()
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure Catalyst fold
    # the merge fold rides as a literal — no extra join in the plan
    assert "Join" not in plan


def test_bpe_property_random_corpora_match_reference(spark):
    """Property test: for RANDOM corpora and random application texts,
    the distributed fold must equal the reference implementation exactly
    (hypothesis-style but with a fixed seed so the case set is
    reproducible; one Spark job for all cases)."""
    import random

    rng = random.Random(20260814)
    alphabet = "abcdefg "
    for trial in range(6):
        corpus = [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(5, 60)))
            for _ in range(rng.randrange(2, 6))
        ]
        merges = train_bpe(corpus, rng.randrange(1, 30))
        texts = [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 80)))
            for _ in range(8)
        ]
        ref = [reference_bpe_encode(t, merges) for t in texts]
        df = spark.createDataFrame([(t,) for t in texts], "t string")
        got = [r[0] for r in df.select(bpe_encode("t", merges)).collect()]
        assert got == ref, (trial, merges, texts)
