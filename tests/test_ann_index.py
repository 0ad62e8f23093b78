"""Persisted ANN index (operators/ann_index.py): build/search split.

The contract under test: (1) searching the persisted index returns
IDENTICAL rows to the fused oracle-checked operators over the same
corpus; (2) the search plan contains NO encode stage; (3) streaming
ingest is exactly-once under micro-batch replay and converges to the
cold-rebuild state; (4) geometry is pinned and versions prune safely.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from cses2humio_spark.operators.ann_index import PQIndex
from cses2humio_spark.operators.similarity import ivfpq_topk, pq_adc_topk
from cses2humio_spark.sources.catalog import load_table
from tests.conftest import SF_SMALL

M, K_CODES, DIM, K = 4, 16, 64, 5


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def emb(spark):
    return load_table(spark, SF_SMALL, "embeddings")


@pytest.fixture()
def probes(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )


@pytest.fixture()
def cents(emb):
    return emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), "embedding"
    )


def test_pq_index_search_equals_fused_query(spark, emb, probes, tmp_path):
    idx = PQIndex(str(tmp_path / "pq"), m=M, k_codes=K_CODES, dim=DIM)
    assert idx.build(emb) == -1
    got = idx.search(spark, probes, k=K)
    want = pq_adc_topk(emb, probes, m=M, k_codes=K_CODES, dim=DIM, k=K)
    assert _rows(got) == _rows(want)


def test_ivfpq_index_search_equals_fused_query(
    spark, emb, probes, cents, tmp_path
):
    idx = PQIndex(
        str(tmp_path / "ivfpq"), m=M, k_codes=K_CODES, dim=DIM, mode="ivfpq"
    )
    idx.build(emb, centroids=cents)
    got = idx.search(spark, probes, k=K, nprobe=2)
    want = ivfpq_topk(
        emb, probes, cents, m=M, k_codes=K_CODES, dim=DIM, k=K, nprobe=2
    )
    assert _rows(got) == _rows(want)


def test_search_plan_has_no_encode_stage(spark, emb, probes, cents, tmp_path):
    """The whole point of the split: a search must not re-encode the
    corpus. The encode argmin is a min_by aggregate over per-candidate
    scored rows — its presence in the plan IS the encode stage (the
    fused query plans one; the index search must not). The only
    FileScans may be the index artifacts + the probe side."""
    for mode in ("pq", "ivfpq"):
        idx = PQIndex(
            str(tmp_path / f"plan_{mode}"), m=M, k_codes=K_CODES, dim=DIM,
            mode=mode,
        )
        if mode == "ivfpq":
            idx.build(emb, centroids=cents)
        else:
            idx.build(emb)
        plan = (
            idx.search(spark, probes, k=K)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "min_by" not in plan, f"{mode}: search plan re-encodes:\n{plan[:1500]}"
        # fused twin DOES encode — the assertion above discriminates
    fused_plan = (
        pq_adc_topk(emb, probes, m=M, k_codes=K_CODES, dim=DIM, k=K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "min_by" in fused_plan


def test_ivfpq_segments_partitioned_by_cell(spark, emb, cents, tmp_path):
    """ivfpq segments must lay out as cid=<n> partition dirs so a
    search's nprobe cells prune at the scan."""
    idx = PQIndex(
        str(tmp_path / "part"), m=M, k_codes=K_CODES, dim=DIM, mode="ivfpq"
    )
    v = idx.build(emb, centroids=cents)
    seg = tmp_path / "part" / f"seg={v}"
    assert any(p.name.startswith("cid=") for p in seg.iterdir()), (
        sorted(p.name for p in seg.iterdir())
    )


def test_geometry_pinned(emb, tmp_path):
    PQIndex(str(tmp_path / "g"), m=M, k_codes=K_CODES, dim=DIM)
    with pytest.raises(ValueError, match="geometry"):
        PQIndex(str(tmp_path / "g"), m=8, k_codes=K_CODES, dim=DIM)


def test_search_before_build_refused(spark, probes, tmp_path):
    idx = PQIndex(str(tmp_path / "nb"), m=M, k_codes=K_CODES, dim=DIM)
    with pytest.raises(ValueError, match="build"):
        idx.search(spark, probes, k=K)


def test_ingest_before_build_refused(emb, tmp_path):
    idx = PQIndex(str(tmp_path / "ni"), m=M, k_codes=K_CODES, dim=DIM)
    with pytest.raises(ValueError, match="build"):
        idx(emb, 0)


def test_streaming_ingest_exactly_once_and_converges(
    spark, emb, probes, tmp_path
):
    """Build on the first half, ingest the rest in two micro-batches
    with a REPLAYED batch in between (crash-after-commit window): codes
    must equal a cold build over the full corpus with the same frozen
    codebook, and the replay must be a no-op."""
    # sf0.001 embeddings carries 500 vectors (ids 0..499)
    first = emb.filter(F.col("vec_id") < 300)
    d1 = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    d2 = emb.filter(F.col("vec_id") >= 400)
    assert d2.count() > 0  # split must exercise real deltas

    idx = PQIndex(str(tmp_path / "stream"), m=M, k_codes=K_CODES, dim=DIM)
    idx.build(first)
    idx(d1, 0)
    idx(d1, 0)  # replayed micro-batch: must be skipped, not re-appended
    idx(d2, 1)
    assert idx.latest_version() == 1
    assert idx.versions() == [0, 1]  # keep_versions=2 window

    cold = PQIndex(str(tmp_path / "cold"), m=M, k_codes=K_CODES, dim=DIM)
    # frozen-codebook contract: the cold twin uses the SAME codebook
    # source (ids < k_codes live in the first half), so codes must match
    cold.build(emb, codebook_src=first)
    assert _rows(idx.read_codes(spark)) == _rows(cold.read_codes(spark))
    assert _rows(idx.search(spark, probes, k=K)) == _rows(
        cold.search(spark, probes, k=K)
    )


def test_stream_ingest_kill_restart_no_dup_or_missing(
    spark, emb, probes, tmp_path
):
    """The full streaming story (VERDICT r5 stretch #8): deltas arrive
    through a REAL checkpointed foreachBatch stream; the process crashes
    AFTER the index committed batch 0 but BEFORE the checkpoint did (the
    at-least-once window), restarts from the checkpoint, replays batch 0
    (skipped — exactly-once) and continues. Codes must equal a cold
    rebuild with the same frozen codebook: nothing duplicated, nothing
    missing."""
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    staging = tmp_path / "staging"
    for i, (lo, hi) in enumerate([(300, 400), (400, 500)]):
        d = emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).select("vec_id", "embedding")
        d.coalesce(1).write.mode("overwrite").parquet(str(staging))
        part = next(
            p for p in (staging).iterdir() if p.name.endswith(".parquet")
        )
        dst = src / f"delta_{i}.parquet"
        shutil.move(str(part), str(dst))
        # file source orders batches by mtime — pin strictly increasing
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    shutil.rmtree(staging, ignore_errors=True)

    idx = PQIndex(str(tmp_path / "sidx"), m=M, k_codes=K_CODES, dim=DIM)
    idx.build(emb.filter(F.col("vec_id") < 300))

    crash = {"armed": True}

    def sink(batch_df, batch_id):
        idx(batch_df, batch_id)
        if crash["armed"]:
            crash["armed"] = False
            raise RuntimeError("injected crash after index commit")

    def start():
        return (
            spark.readStream.schema("vec_id bigint, embedding array<float>")
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

    cold = PQIndex(str(tmp_path / "scold"), m=M, k_codes=K_CODES, dim=DIM)
    cold.build(emb, codebook_src=emb.filter(F.col("vec_id") < 300))
    assert _rows(idx.read_codes(spark)) == _rows(cold.read_codes(spark))
    assert _rows(idx.search(spark, probes, k=K)) == _rows(
        cold.search(spark, probes, k=K)
    )


def test_compact_collapses_segments_search_unchanged(spark, emb, probes, tmp_path):
    """compact() merges every live segment into one (the small-files
    answer for long ingest streams): search results identical, segment
    count collapses once the retention window slides past, and the
    version stays monotonic so a replayed stream batch cannot
    double-apply over the compaction."""
    idx = PQIndex(str(tmp_path / "c"), m=M, k_codes=K_CODES, dim=DIM)
    idx.build(emb.filter(F.col("vec_id") < 200))
    for i, lo in enumerate(range(200, 500, 100)):
        idx(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 100)),
            i,
        )
    before = _rows(idx.search(spark, probes, k=K))
    n_codes = idx.read_codes(spark).count()
    v = idx.compact(spark)
    assert v == 3  # next version after ingest commits 0..2
    assert _rows(idx.search(spark, probes, k=K)) == before
    assert idx.read_codes(spark).count() == n_codes
    # two more commits slide the retention window past the
    # pre-compaction segments AND their one-commit read grace
    # (artifacts outlive their manifest by one commit so lazy readers
    # of the just-evicted version survive — see _prune); then only the
    # compacted segment remains on disk
    idx(emb.limit(0), 4)
    idx(emb.limit(0), 5)
    live = sorted(
        p for p in os.listdir(str(tmp_path / "c")) if p.startswith("seg=")
    )
    assert live == ["seg=3"], live
    assert _rows(idx.search(spark, probes, k=K)) == before
    # a replayed pre-compaction batch id is skipped: the replay guard
    # keys on last_batch_id, which the compaction carried forward
    idx(emb.filter(F.col("vec_id") < 100), 2)
    assert idx.read_codes(spark).count() == n_codes


def test_ivfpq_multi_segment_ingest_and_search(spark, emb, probes, cents, tmp_path):
    """Regression: a multi-segment ivfpq read must not trip Spark's
    CONFLICTING_DIRECTORY_STRUCTURES — the seg=<id> dirs are themselves
    key=value-shaped, so partition discovery needs the index root as
    basePath. Ingested ivfpq index must equal the cold build (same
    frozen residual codebook trained on the first slice's residuals is
    NOT reproducible cold — so pin search against the incremental
    index's own read_codes + fused ADC equivalence instead: every code
    row present exactly once, search returns full k rows)."""
    idx = PQIndex(
        str(tmp_path / "mseg"), m=M, k_codes=K_CODES, dim=DIM, mode="ivfpq"
    )
    idx.build(emb.filter(F.col("vec_id") < 300), centroids=cents)
    idx(emb.filter(F.col("vec_id") >= 300), 0)
    codes = idx.read_codes(spark)
    assert set(codes.columns) == {"vec_id", "sub_id", "code", "cid"}
    assert codes.count() == emb.count() * M
    assert codes.groupBy("vec_id").count().filter("count != 4").count() == 0
    out = idx.search(spark, probes, k=K)
    assert out.count() == 8 * K


def test_empty_batch_advances_replay_guard(spark, emb, tmp_path):
    idx = PQIndex(str(tmp_path / "empty"), m=M, k_codes=K_CODES, dim=DIM)
    idx.build(emb.filter(F.col("vec_id") < 100))
    n_before = idx.read_codes(spark).count()
    idx(emb.filter(F.col("vec_id") < 0), 0)  # empty delta
    assert idx.latest_version() == 0
    assert idx.read_codes(spark).count() == n_before
    assert not os.path.exists(str(tmp_path / "empty" / "seg=0"))


def _clustered_corpus(spark):
    """256 vectors in 64 well-separated tight R^16 clusters, ids
    SEQUENTIAL by cluster — the id-prefix codebook's seeds (ids <
    k_codes) all come from the first four clusters, the worst case the
    k-means training exists to fix; probes target clusters the prefix
    seeds never saw."""
    import numpy as np

    rng = np.random.RandomState(0)
    centers = rng.randn(64, 16) * 10.0
    vecs = [centers[i // 4] + rng.randn(16) * 0.1 for i in range(256)]
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    probe_vecs = [centers[20 + c] + rng.randn(16) * 0.1 for c in range(8)]
    pdf = spark.createDataFrame(
        [(c, v.tolist()) for c, v in enumerate(probe_vecs)],
        "probe_id long, embedding array<double>",
    )
    import numpy as _np

    exact = {}
    V = _np.array(vecs)
    for c, p in enumerate(probe_vecs):
        d = ((V - p) ** 2).sum(axis=1)
        exact[c] = set(_np.argsort(d, kind="stable")[:10].tolist())
    return df, pdf, exact


def _recall_at_10(found_df, exact):
    got: dict[int, set[int]] = {}
    for r in found_df.collect():
        got.setdefault(r["probe_id"], set()).add(r["vec_id"])
    return sum(
        len(got.get(c, set()) & exact[c]) / 10.0 for c in exact
    ) / len(exact)


def test_kmeans_codebook_lifts_recall_on_clustered_corpus(spark, tmp_path):
    """VERDICT r5 #2 'done' criterion: on clustered data the opt-in
    k-means codebook must beat the id-prefix placeholder's recall, with
    every oracle-paired default unchanged (the default path is still
    'prefix')."""
    corpus, pdf, exact = _clustered_corpus(spark)
    recalls = {}
    for cb in ("prefix", "kmeans"):
        idx = PQIndex(
            str(tmp_path / f"rc_{cb}"), m=4, k_codes=16, dim=16
        )
        idx.build(corpus, codebook=cb, codebook_iter=8)
        recalls[cb] = _recall_at_10(
            idx.search(spark, pdf, k=10), exact
        )
    # measured on this fixture: prefix 0.50, kmeans 0.625 (m=8 lifts both
    # further — 0.625 / 0.688 — the standard m dial, not under test here)
    assert recalls["kmeans"] > recalls["prefix"], recalls
    assert recalls["kmeans"] >= 0.6, recalls


def test_trained_ivfpq_index_recall_on_clustered_corpus(spark, tmp_path):
    """The FULL trained path through the persisted index — k-means IVF
    centroids (ivf_centroids_kmeans) + k-means residual codebooks
    (codebook='kmeans') + cell-partitioned segments + nprobe search:
    recall@10 must clear 0.7 on the clustered fixture (measured 0.75 at
    nprobe=2; flat prefix-codebook PQ reaches 0.50, flat trained PQ
    0.625 — the coarse-cell prune plus residual coding is the win)."""
    from cses2humio_spark.operators.similarity import ivf_centroids_kmeans

    corpus, pdf, exact = _clustered_corpus(spark)
    cents = ivf_centroids_kmeans(corpus, k=8, n_iter=4)
    idx = PQIndex(
        str(tmp_path / "trained"), m=4, k_codes=16, dim=16, mode="ivfpq"
    )
    idx.build(corpus, centroids=cents, codebook="kmeans", codebook_iter=4)
    rec = _recall_at_10(idx.search(spark, pdf, k=10, nprobe=2), exact)
    assert rec >= 0.7, rec


def test_kmeans_codebook_zero_iter_equals_prefix(spark, emb):
    """n_iter=0 must reproduce the id-prefix codebook EXACTLY — the
    trained path is a strict refinement of the deterministic default."""
    from cses2humio_spark.operators.similarity import (
        pq_codebook,
        pq_codebook_kmeans,
    )

    want = _rows(pq_codebook(emb, M, K_CODES, DIM))
    got = _rows(pq_codebook_kmeans(emb, M, K_CODES, DIM, n_iter=0))
    assert got == want


def test_kmeans_codebook_deterministic_across_partitionings(spark, emb):
    from cses2humio_spark.operators.similarity import pq_codebook_kmeans

    a = _rows(pq_codebook_kmeans(emb.repartition(3), M, K_CODES, DIM, n_iter=2))
    b = _rows(pq_codebook_kmeans(emb.repartition(17), M, K_CODES, DIM, n_iter=2))
    assert a == b


def test_ivf_centroids_kmeans_shape_and_determinism(spark, emb):
    from cses2humio_spark.operators.similarity import ivf_centroids_kmeans

    c1 = _rows(ivf_centroids_kmeans(emb.repartition(5), k=8, n_iter=2))
    c2 = _rows(ivf_centroids_kmeans(emb.repartition(11), k=8, n_iter=2))
    assert c1 == c2
    assert len(c1) == 8 and [r[0] for r in c1] == list(range(8))


def test_compact_does_not_shadow_future_batch_ids(spark, emb, tmp_path):
    """Replay-guard / version decoupling (round-6 advice, HIGH): build +
    ingest batches 0,1 + compact, then the stream's GENUINE next batch 2
    arrives. Under the old design (guard keyed on the artifact version)
    the compaction's version 2 shadowed batch 2 and silently dropped it
    — 300 codes instead of 350. The guard now keys on the dedicated
    last_batch_id manifest field, so the batch must be applied."""
    idx = PQIndex(str(tmp_path / "shadow"), m=M, k_codes=K_CODES, dim=DIM)
    idx.build(emb.filter(F.col("vec_id") < 200))
    idx(emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 250)), 0)
    idx(emb.filter((F.col("vec_id") >= 250) & (F.col("vec_id") < 300)), 1)
    idx.compact(spark)
    idx(emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 350)), 2)
    assert idx.read_codes(spark).count() == 350 * M  # 300 would be the bug
    # and a REPLAY of batch 2 after all that is still skipped
    idx(emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 350)), 2)
    assert idx.read_codes(spark).count() == 350 * M
    # same decoupling across a REBUILD: last_batch_id carries forward
    idx.build(emb.filter(F.col("vec_id") < 350))
    idx(emb.filter(F.col("vec_id") >= 490), 1)  # replay: skipped
    assert idx.read_codes(spark).count() == 350 * M
    idx(emb.filter(F.col("vec_id") >= 450), 3)  # genuine: applied
    assert idx.read_codes(spark).count() == 400 * M


def test_delete_tombstones_then_compact_drops(spark, emb, probes, tmp_path):
    """Vector deletion (VERDICT r6 #2): delete() commits a tombstone
    id-list — search stops returning the ids IMMEDIATELY (anti-join at
    read) and equals a cold rebuild without them; compact() physically
    drops the dead codes and clears the tombstones; the stream replay
    guard is untouched throughout."""
    idx = PQIndex(str(tmp_path / "del"), m=M, k_codes=K_CODES, dim=DIM)
    idx.build(emb)
    dead = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 150))
    idx.delete(dead.select("vec_id"))
    # reads exclude tombstoned ids the moment delete() commits
    assert idx.read_codes(spark).count() == (emb.count() - 50) * M
    got = idx.search(spark, probes, k=K)
    assert got.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 150)
    ).count() == 0
    # search == cold rebuild WITHOUT the deleted ids, same frozen codebook
    cold = PQIndex(str(tmp_path / "delcold"), m=M, k_codes=K_CODES, dim=DIM)
    cold.build(
        emb.filter((F.col("vec_id") < 100) | (F.col("vec_id") >= 150)),
        codebook_src=emb,
    )
    assert _rows(got) == _rows(cold.search(spark, probes, k=K))
    # compact physically drops the dead codes and clears tombstones
    n_live = idx.read_codes(spark).count()
    v = idx.compact(spark)
    assert idx.read_codes(spark).count() == n_live
    man = idx._load_manifest(v)
    assert man["tombstones"] == []
    seg = spark.read.option(
        "basePath", str(tmp_path / "del")
    ).parquet(str(tmp_path / "del" / f"seg={v}"))
    assert seg.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 150)
    ).count() == 0
    assert _rows(idx.search(spark, probes, k=K)) == _rows(got)
    # deleting an unknown id is a no-op
    idx.delete(emb.filter(F.col("vec_id") < 0).select("vec_id"))
    assert idx.read_codes(spark).count() == n_live


def test_delete_interleaves_safely_with_stream_ingest(spark, emb, tmp_path):
    """The crawl→dedup→index lifecycle: ingest, delete near-dup losers,
    keep ingesting — the delete's version bump must not perturb the
    replay guard (genuine next batch applied, replayed batch skipped),
    and re-ingesting a tombstoned id stays dead until a compact clears
    the tombstone (by-id semantics, as documented)."""
    idx = PQIndex(str(tmp_path / "mix"), m=M, k_codes=K_CODES, dim=DIM)
    idx.build(emb.filter(F.col("vec_id") < 200))
    idx(emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 300)), 0)
    idx.delete(
        emb.filter((F.col("vec_id") >= 250) & (F.col("vec_id") < 260))
        .select("vec_id")
    )
    idx(emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400)), 1)
    assert idx.read_codes(spark).count() == (400 - 10) * M
    idx(emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400)), 1)
    assert idx.read_codes(spark).count() == (400 - 10) * M  # replay no-op
    # re-ingest of a tombstoned id before compact: still dead (by-id)
    idx(emb.filter((F.col("vec_id") >= 250) & (F.col("vec_id") < 260)), 2)
    assert idx.read_codes(spark).count() == (400 - 10) * M
    # after compact the tombstone is gone; a fresh ingest resurrects
    idx.compact(spark)
    idx(emb.filter((F.col("vec_id") >= 250) & (F.col("vec_id") < 260)), 3)
    assert idx.read_codes(spark).count() == 400 * M


def test_refine_lifts_recall_and_requires_vectors(spark, tmp_path):
    """Exact re-rank refinement (VERDICT r6 #3, the FAISS
    IndexRefineFlat recipe): ADC top-R re-scored with exact L2 against
    the stored vectors must lift recall@10 at fixed nprobe on the
    clustered fixture, and the guards must refuse refine<k / missing
    refine_from."""
    corpus, pdf, exact = _clustered_corpus(spark)
    idx = PQIndex(str(tmp_path / "ref"), m=4, k_codes=16, dim=16)
    idx.build(corpus)
    base = _recall_at_10(idx.search(spark, pdf, k=10), exact)
    refined = _recall_at_10(
        idx.search(spark, pdf, k=10, refine=64, refine_from=corpus), exact
    )
    assert refined > base, (base, refined)
    # measured: 0.50 unrefined -> 0.85 at R=64 (0.90 plateau by R=100 —
    # the prefix codebook's ADC ordering bounds what any re-rank can see)
    assert refined >= 0.8, (base, refined)
    with pytest.raises(ValueError, match="refine_from"):
        idx.search(spark, pdf, k=10, refine=40)
    with pytest.raises(ValueError, match="must be >= k"):
        idx.search(spark, pdf, k=10, refine=5, refine_from=corpus)


def test_pruning_keeps_retained_window_readable(spark, emb, probes, tmp_path):
    """After many ingests only keep_versions manifests survive, every
    segment a retained manifest references is still readable (time
    travel inside the window), and superseded build artifacts from a
    REBUILD are gone."""
    idx = PQIndex(
        str(tmp_path / "prune"), m=M, k_codes=K_CODES, dim=DIM,
        keep_versions=2,
    )
    idx.build(emb.filter(F.col("vec_id") < 200))
    for i, lo in enumerate(range(200, 500, 100)):
        idx(
            emb.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 100)
            ),
            i,
        )
    assert idx.versions() == [1, 2]
    # old version inside the window: readable, smaller than latest
    n_prev = idx.read_codes(spark, version=1).count()
    n_latest = idx.read_codes(spark).count()
    assert n_prev < n_latest
    # outside the window: loud error
    with pytest.raises(ValueError, match="not available"):
        idx.read_codes(spark, version=0)
    # a REBUILD supersedes all segments; after the window slides past,
    # pre-rebuild segments are deleted from disk
    v = idx.build(emb)
    assert v == 3
    idx(emb.limit(0), 4)  # slide the window: retained = [3(rebuild), 4]
    idx(emb.limit(0), 5)  # retained = [4, 5]; both reference only seg=3
    live = sorted(
        p for p in os.listdir(str(tmp_path / "prune")) if p.startswith("seg=")
    )
    assert live == ["seg=3"], live
    assert idx.read_codes(spark).count() == emb.count() * M
    # the rebuilt index still searches correctly
    want = pq_adc_topk(emb, probes, m=M, k_codes=K_CODES, dim=DIM, k=K)
    assert _rows(idx.search(spark, probes, k=K)) == _rows(want)
