"""Sequence-packing invariants (operators/packing.py): budget respected,
assignment is a pure function of the corpus (partitioning-independent),
and the streaming (mapInPandas) variant is identical to the grouped one.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cses2humio_spark.functions.text import token_count
from cses2humio_spark.operators.packing import (
    pack_sequences,
    pack_sequences_iter,
    pack_stats,
)
from cses2humio_spark.sources.catalog import load_table
from tests.conftest import SF_SMALL

BUDGET = 256


def _narrow(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    return docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))


def _key(rows):
    return {r.doc_id: (r.bucket, r.pack_id, r.pack_pos) for r in rows}


def test_packs_respect_budget_except_single_overflow(spark):
    rows = pack_sequences(_narrow(spark), BUDGET, n_buckets=8).collect()
    packs: dict[tuple, list] = {}
    for r in rows:
        packs.setdefault((r.bucket, r.pack_id), []).append(r)
    assert packs, "no packs produced"
    for members in packs.values():
        total = sum(r.n_tokens for r in members)
        if total > BUDGET:
            # only a lone document may overflow the budget
            assert len(members) == 1, (
                f"multi-doc pack over budget: {[(r.doc_id, r.n_tokens) for r in members]}"
            )


def test_pack_ids_dense_and_positions_follow_id_order(spark):
    rows = pack_sequences(_narrow(spark), BUDGET, n_buckets=8).collect()
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, members in by_bucket.items():
        members.sort(key=lambda r: r.doc_id)
        # walking docs in id order, (pack_id, pack_pos) must advance
        # exactly as the greedy fold dictates: pos resets on pack change
        prev_pack, prev_pos = -1, -1
        for r in members:
            if r.pack_id == prev_pack:
                assert r.pack_pos == prev_pos + 1
            else:
                assert r.pack_id == prev_pack + 1, "pack ids not dense"
                assert r.pack_pos == 0
            prev_pack, prev_pos = r.pack_id, r.pack_pos


def test_assignment_is_partitioning_independent(spark):
    base = _narrow(spark)
    a = _key(pack_sequences(base, BUDGET, n_buckets=8).collect())
    b = _key(
        pack_sequences(
            base.repartition(13, "n_tokens"), BUDGET, n_buckets=8
        ).collect()
    )
    assert a == b


def test_streaming_variant_matches_grouped(spark):
    base = _narrow(spark)
    grouped = _key(pack_sequences(base, BUDGET, n_buckets=8).collect())
    streamed = _key(pack_sequences_iter(base, BUDGET, n_buckets=8).collect())
    assert grouped == streamed


def test_pack_stats_consistency(spark):
    asn = pack_sequences(_narrow(spark), BUDGET, n_buckets=8)
    stats = pack_stats(asn, BUDGET).collect()[0]
    n_docs = asn.count()
    assert stats.n_docs == n_docs
    assert stats.n_packs >= 1
    assert 0 < stats.avg_fill <= 1.0
    assert stats.min_fill <= stats.avg_fill
    # overflow packs are exactly the single-doc > budget cases
    overflow = (
        asn.groupBy("bucket", "pack_id")
        .agg(F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("t") > BUDGET)
        .collect()
    )
    assert stats.n_overflow_packs == len(overflow)
    assert all(r.n == 1 for r in overflow)


def test_packing_matches_pure_python_reference(spark):
    """Randomized (seeded) cross-check: the distributed packer must equal
    a direct python implementation of the greedy spec on arbitrary token
    sizes — including docs far over budget and single-token docs."""
    import random

    rng = random.Random(20260813)
    rows = [
        (i, rng.choice([1, 3, 50, 120, 255, 256, 257, 900]))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
    got = _key(pack_sequences(df, BUDGET, n_buckets=4).collect())

    from cses2humio_spark.operators.packing import hash_bucket
    from pyspark.sql import functions as F2

    buckets = {
        r.doc_id: r.b
        for r in df.select(
            "doc_id", hash_bucket(F2.col("doc_id"), 4).alias("b")
        ).collect()
    }
    expected = {}
    per_bucket: dict[int, list] = {}
    for i, t in rows:
        per_bucket.setdefault(buckets[i], []).append((i, t))
    for b, docs in per_bucket.items():
        docs.sort()
        acc, pid, pos = 0, -1, 0
        for i, t in docs:
            if pid < 0 or acc + t > BUDGET:
                pid += 1
                acc, pos = 0, 0
            acc += t
            expected[i] = (b, pid, pos)
            pos += 1
    assert got == expected
