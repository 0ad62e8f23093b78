"""Persisted MinHash LSH index (operators/dedup_index.py): the
build-once / probe-many split for text near-dup.

The contract under test: (1) probing the persisted index returns
IDENTICAL candidate pairs to the fused signature computation over the
same corpus; (2) streaming ingest is exactly-once under micro-batch
replay and converges to the cold-rebuild state; (3) deletes are visible
immediately and compact() physically drops them without changing probe
results; (4) geometry is pinned; (5) a compact can never shadow a
future stream batch id (the shared-store replay-guard contract).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cses2humio_spark.operators.dedup import minhash_signatures_rowwise
from cses2humio_spark.operators.dedup_index import MinHashIndex
from cses2humio_spark.sources.catalog import load_table
from tests.conftest import SF_SMALL


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def docs(spark):
    return load_table(spark, SF_SMALL, "documents")


@pytest.fixture()
def probes(docs):
    return docs.filter(F.col("doc_id") % 5 == 3)


def _fused_candidates(docs, probes):
    """The fused two-sided computation the index must reproduce."""
    corpus_sigs = minhash_signatures_rowwise(docs, "doc_id", "text").select(
        F.col("doc_id").alias("index_id"), "band", "sig"
    )
    probe_sigs = minhash_signatures_rowwise(probes, "doc_id", "text").select(
        F.col("doc_id").alias("probe_id"), "band", "sig"
    )
    return (
        probe_sigs.join(corpus_sigs, on=["band", "sig"])
        .select("probe_id", "index_id")
        .filter(F.col("probe_id") != F.col("index_id"))
        .distinct()
    )


def test_index_probe_equals_fused_computation(spark, docs, probes, tmp_path):
    idx = MinHashIndex(str(tmp_path / "mh"))
    idx.build(docs)
    assert _rows(idx.query_candidates(probes)) == _rows(
        _fused_candidates(docs, probes)
    )


def test_geometry_pinned(docs, tmp_path):
    idx = MinHashIndex(str(tmp_path / "mh"), n=3, bands=4, rows_per_band=2)
    idx.build(docs.limit(10))
    with pytest.raises(ValueError, match="geometry"):
        MinHashIndex(str(tmp_path / "mh"), n=3, bands=8, rows_per_band=2)


def test_probe_before_build_refused(spark, probes, tmp_path):
    idx = MinHashIndex(str(tmp_path / "mh"))
    with pytest.raises(ValueError, match="no committed version"):
        idx.query_candidates(probes).collect()


def test_streaming_ingest_exactly_once_and_converges(
    spark, docs, probes, tmp_path
):
    """Build on the first slice, ingest the rest in two micro-batches
    with a REPLAYED batch in between: signatures must equal a cold build
    over the full corpus (signatures are deterministic per document, so
    unlike PQ there is no frozen-codebook caveat), and the replay must
    be a no-op."""
    first = docs.filter(F.col("doc_id") % 3 == 0)
    d1 = docs.filter(F.col("doc_id") % 3 == 1)
    d2 = docs.filter(F.col("doc_id") % 3 == 2)
    assert d2.count() > 0

    idx = MinHashIndex(str(tmp_path / "stream"))
    idx.build(first)
    idx(d1, 0)
    idx(d1, 0)  # replayed micro-batch: must be skipped, not re-appended
    idx(d2, 1)
    assert idx.latest_version() == 1

    cold = MinHashIndex(str(tmp_path / "cold"))
    cold.build(docs)
    assert _rows(idx.read_signatures(spark)) == _rows(
        cold.read_signatures(spark)
    )
    assert _rows(idx.query_candidates(probes)) == _rows(
        cold.query_candidates(probes)
    )


def test_empty_batch_advances_replay_guard(spark, docs, tmp_path):
    idx = MinHashIndex(str(tmp_path / "mh"))
    idx.build(docs.filter(F.col("doc_id") < 50))
    empty = docs.filter(F.lit(False))
    idx(empty, 0)
    n_before = idx.read_signatures(spark).count()
    delta = docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 80))
    idx(delta, 0)  # same batch id: guard must skip it
    assert idx.read_signatures(spark).count() == n_before
    idx(delta, 1)  # genuine next batch still lands
    assert idx.read_signatures(spark).count() > n_before


def test_compact_does_not_shadow_future_batch_ids(spark, docs, tmp_path):
    """The shared-store contract (round-6 advice, factored into
    VersionedSegmentStore): compact() bumps the artifact VERSION, which
    must never make the replay guard swallow the next genuine batch."""
    idx = MinHashIndex(str(tmp_path / "mh"))
    idx.build(docs.filter(F.col("doc_id") < 40))
    idx(docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 60)), 0)
    idx(docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 80)), 1)
    idx.compact(spark)  # version jumps past the last batch id
    before = idx.read_signatures(spark).count()
    idx(docs.filter((F.col("doc_id") >= 80) & (F.col("doc_id") < 90)), 2)
    assert idx.read_signatures(spark).count() > before, (
        "genuine batch after compact() was silently dropped"
    )


def test_delete_visible_immediately_then_compact_drops(
    spark, docs, probes, tmp_path
):
    idx = MinHashIndex(str(tmp_path / "mh"))
    idx.build(docs)
    # pick an indexed doc that actually appears as a candidate
    some = idx.query_candidates(probes).select("index_id").first()
    victim = some.index_id
    idx.delete(docs.filter(F.col("doc_id") == victim).select("doc_id"))
    # visible immediately: no candidate pair may name the victim
    after = idx.query_candidates(probes)
    assert after.filter(F.col("index_id") == victim).count() == 0
    probe_rows_before = _rows(after)
    # compact physically drops the signatures and clears tombstones
    idx.compact(spark)
    man = idx._load_manifest(idx.latest_version())
    assert man["tombstones"] == []
    assert (
        idx.read_signatures(spark)
        .filter(F.col("doc_id") == victim)
        .count()
        == 0
    )
    assert _rows(idx.query_candidates(probes)) == probe_rows_before


def test_rebuild_supersedes_and_preserves_replay_guard(spark, docs, tmp_path):
    idx = MinHashIndex(str(tmp_path / "mh"))
    idx.build(docs.filter(F.col("doc_id") < 40))
    idx(docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 60)), 5)
    idx.build(docs.filter(F.col("doc_id") < 100))  # rebuild: new truth
    # replay guard carried forward: an old replayed batch is still skipped
    before = idx.read_signatures(spark).count()
    idx(docs.filter(F.col("doc_id") < 10), 5)
    assert idx.read_signatures(spark).count() == before
    # a genuine next batch lands
    idx(docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 110)), 6)
    assert idx.read_signatures(spark).count() > before


def test_stream_ingest_kill_restart_no_dup_or_missing(
    spark, docs, probes, tmp_path
):
    """The crawl-ingest streaming story end to end: document deltas
    arrive through a REAL checkpointed foreachBatch stream; the process
    crashes AFTER the index committed batch 0 but BEFORE the checkpoint
    did (the at-least-once window), restarts from the checkpoint,
    replays batch 0 (skipped — exactly-once) and continues. Signatures
    must equal a cold rebuild over the full corpus: nothing duplicated,
    nothing missing."""
    import os
    import shutil

    import pytest
    from pyspark.sql import functions as F  # noqa: F811 — local alias

    src = tmp_path / "src"
    src.mkdir()
    staging = tmp_path / "staging"
    base = docs.filter(F.col("doc_id") % 3 == 0)
    for i, rem in enumerate((1, 2)):
        d = docs.filter(F.col("doc_id") % 3 == rem).select("doc_id", "text")
        d.coalesce(1).write.mode("overwrite").parquet(str(staging))
        part = next(
            p for p in staging.iterdir() if p.name.endswith(".parquet")
        )
        dst = src / f"delta_{i}.parquet"
        shutil.move(str(part), str(dst))
        # file source orders batches by mtime — pin strictly increasing
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    shutil.rmtree(staging, ignore_errors=True)

    idx = MinHashIndex(str(tmp_path / "sidx"))
    idx.build(base)

    crash = {"armed": True}

    def sink(batch_df, batch_id):
        idx(batch_df, batch_id)
        if crash["armed"]:
            crash["armed"] = False
            raise RuntimeError("injected crash after index commit")

    def start():
        return (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination()
    q2 = start()  # same checkpoint = process restart; batch 0 replays
    q2.awaitTermination()

    cold = MinHashIndex(str(tmp_path / "scold"))
    cold.build(docs)
    assert _rows(idx.read_signatures(spark)) == _rows(
        cold.read_signatures(spark)
    )
    assert _rows(idx.query_candidates(probes)) == _rows(
        cold.query_candidates(probes)
    )


def test_probe_bucket_cap_bounds_mass_dup_fanout(spark, tmp_path):
    """A boilerplate page indexed 300 times must not fan 300 candidates
    per probe per band when the cap is set: the capped probe returns at
    most max_bucket_size index ids per bucket, always including the
    cluster's minimum id (the representative a dedup decision needs),
    and the uncapped form stays exact."""
    n = 300
    text = "the same boilerplate page body repeated verbatim every time"
    corpus = spark.createDataFrame(
        [(i, text) for i in range(n)], "doc_id long, text string"
    )
    probe = spark.createDataFrame([(9999, text)], "doc_id long, text string")
    idx = MinHashIndex(str(tmp_path / "mh"))
    idx.build(corpus)
    exact = idx.query_candidates(probe).collect()
    assert len(exact) == n  # every copy is a genuine candidate
    capped = idx.query_candidates(probe, max_bucket_size=50).collect()
    assert len(capped) == 50
    assert min(r.index_id for r in capped) == 0  # hub retained
