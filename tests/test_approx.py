"""Sketch-based approximations have no cross-engine oracle; bound their
error against exact values instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from cses2humio_spark.queries import QUERIES
from tests.conftest import SF_ORACLE


def test_approx_distinct_within_rsd(spark):
    approx = {
        r.event_type: r.approx_users
        for r in QUERIES["approx_distinct_users"](spark, SF_ORACLE).collect()
    }
    from cses2humio_spark.sources.catalog import load_table

    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        rel = abs(approx[et] - n) / n
        assert rel < 0.1, f"{et}: approx {approx[et]} vs exact {n} (rel {rel:.3f})"


def test_pandas_udf_scalar_and_iterator_match_jvm_norm(spark):
    """UDF-surface parity (SURVEY §2.2): the scalar and iterator pandas
    UDFs agree with the JVM-side higher-order-function norm to 1e-6."""
    from pyspark.sql import functions as F

    from cses2humio_spark.functions.udfs import iter_norm_udf, scalar_norm_udf
    from cses2humio_spark.functions.vectors import l2_norm
    from cses2humio_spark.sources.catalog import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings").limit(100)
    rows = emb.select(
        l2_norm(F.col("embedding")).alias("jvm"),
        scalar_norm_udf()(F.col("embedding")).alias("scalar"),
        iter_norm_udf()(F.col("embedding")).alias("it"),
    ).collect()
    assert len(rows) == 100
    for r in rows:
        assert abs(r.jvm - r.scalar) < 1e-6
        assert abs(r.jvm - r.it) < 1e-6


def test_ann_recall_floors(spark):
    """The approximate ANN paths must stay useful approximations of the
    exact brute force: IVF (nprobe=2 of 16 lists) holds high recall; LSH
    recall is bounded by this synthetic corpus's near-orthogonal neighbor
    geometry, so the test pins (a) an absolute floor and (b) that
    Hamming-1 multiprobe strictly improves over exact-signature probing
    at equal plane count — the documented recall/cost dial."""
    from pyspark.sql import functions as F

    from cses2humio_spark.operators.similarity import (
        cosine_topk_bruteforce,
        lsh_topk,
    )
    from cses2humio_spark.queries import QUERIES
    from cses2humio_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.01"
    pairs = lambda df: {(r.probe_id, r.vec_id) for r in df.collect()}

    exact = pairs(QUERIES["cosine_topk"](spark, sf))
    emb = load_table(spark, sf, "embeddings")
    probes10 = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )

    lsh_exact_sig = pairs(lsh_topk(emb, probes10, k=5, dim=64, n_planes=8))
    lsh_mp = pairs(QUERIES["cosine_topk_lsh"](spark, sf))
    r_exact_sig = len(exact & lsh_exact_sig) / len(exact)
    r_mp = len(exact & lsh_mp) / len(exact)
    assert r_mp > r_exact_sig, (r_mp, r_exact_sig)
    assert r_mp >= 0.25, r_mp

    probes8 = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    truth8 = pairs(cosine_topk_bruteforce(emb, probes8, k=5))
    ivf = pairs(QUERIES["ivf_topk"](spark, sf))
    r_ivf = len(truth8 & ivf) / len(truth8)
    assert r_ivf >= 0.8, r_ivf


def test_minhash_neardup_recall(spark):
    """End-to-end near-dup recall: every pair with exact 3-shingle Jaccard
    >= 0.5 (ground truth computed all-pairs in DuckDB) must be recovered
    by the banded-MinHash candidate + exact-verify pipeline. The (b=4,
    r=2) banding plus the provable-overlap fast path recovers all true
    pairs on this corpus; the floor is set at 0.9 to allow the banding's
    probabilistic margin if the corpus shifts."""
    import duckdb

    from cses2humio_spark.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    rows = con.sql(r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t)-2),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM toks WHERE len(t) >= 3
    ), e AS (SELECT doc_id, UNNEST(s) AS g FROM sh),
    sizes AS (SELECT doc_id, len(s) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS ni
      FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT ia, ib FROM inter
    JOIN sizes sa ON sa.doc_id = ia JOIN sizes sb ON sb.doc_id = ib
    WHERE ni / (sa.n + sb.n - ni) >= 0.5
    """).fetchall()
    truth = {(int(a), int(b)) for a, b in rows}
    assert truth, "ground-truth near-dup set unexpectedly empty"

    got = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in QUERIES["jaccard_near_dups"](spark, sf).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, (recall, len(truth), len(got))


def test_embedding_neardup_recall(spark):
    """Banded hyperplane LSH (15 bands x 4 bits) must recover the large
    majority of true cos >= 0.3 pairs — the single-signature formulation
    recalled ~2% on this corpus; banding measures ~0.89. Truth is the
    exact all-pairs cross join at sf0.01 (500 vectors, cheap)."""
    from pyspark.sql import functions as F

    from cses2humio_spark.functions.vectors import cosine_similarity
    from cses2humio_spark.queries import QUERIES
    from cses2humio_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    exact = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_similarity(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= 0.3)
    )
    truth = {(r.id_a, r.id_b) for r in exact.collect()}
    assert truth
    got = {
        (r.id_a, r.id_b)
        for r in QUERIES["embedding_near_dups"](spark, sf).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.8, (recall, len(truth), len(got))


def test_lsh_signature_paths_identical(spark):
    """The vectorized (Arrow/numpy) LSH signature path must agree
    bit-for-bit with the pure-JVM fold on every row — both accumulate the
    dot dimension-by-dimension in float64, so this is exact equality, not
    tolerance. Guards the oracle contract: DuckDB's list_reduce fold is
    the same order."""
    from pyspark.sql import functions as F

    from cses2humio_spark.operators.similarity import (
        lsh_signatures,
        lsh_signatures_fold,
    )
    from cses2humio_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    for planes in (8, 60):
        j = (
            lsh_signatures(emb, 64, planes)
            .select("vec_id", F.col("lsh_sig").alias("s1"))
            .join(
                lsh_signatures_fold(emb, 64, planes).select(
                    "vec_id", F.col("lsh_sig").alias("s2")
                ),
                "vec_id",
            )
        )
        assert j.filter(F.col("s1") != F.col("s2")).count() == 0, planes


def test_cosine_topk_paths_identical(spark):
    """The Arrow brute-force top-k (per-batch partial top-k with the
    1e-6 rounding margin) must return EXACTLY the fold path's rows —
    same ids, same rounded scores, same ranks — since both feed the same
    rounded-then-id-tiebroken ranking."""
    from pyspark.sql import functions as F

    from cses2humio_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_bruteforce_fold,
    )
    from cses2humio_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    probes = emb.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    a = sorted(map(tuple, cosine_topk_bruteforce(emb, probes, k=7).collect()))
    b = sorted(
        map(tuple, cosine_topk_bruteforce_fold(emb, probes, k=7).collect())
    )
    assert a == b and len(a) == 25 * 7


def test_cosine_pairs_matches_fold_bitwise(spark):
    """The Arrow pair-cosine must equal the JVM fold bit-for-bit on real
    vectors (same per-dimension accumulation order), and yield NULL where
    either input is NULL, exactly like the fold."""
    from pyspark.sql import functions as F

    from cses2humio_spark.functions.vectors import (
        cosine_pairs,
        cosine_similarity,
    )
    from cses2humio_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(
        (F.col("vec_id") + 1).alias("id_a"),
        F.when(F.col("vec_id") % 97 == 0, F.lit(None))
        .otherwise(F.col("embedding"))
        .alias("vb"),
    )
    j = a.join(b, on="id_a").select(
        cosine_pairs(F.col("va"), F.col("vb")).alias("arrow"),
        cosine_similarity(F.col("va"), F.col("vb")).alias("fold"),
    )
    assert j.count() > 0
    mismatch = j.filter(
        ~(
            (F.col("arrow").isNull() & F.col("fold").isNull())
            | (F.col("arrow") == F.col("fold"))
        )
    ).count()
    assert mismatch == 0


def test_first_matching_band_matches_python_reference(spark):
    """SWAR lowest-zero-field extraction vs a plain Python loop, over
    random signature pairs that are guaranteed to share >= 1 band, for
    several field widths (incl. the degenerate w=1)."""
    import random

    from pyspark.sql import functions as F

    from cses2humio_spark.operators.similarity import first_matching_band

    rng = random.Random(7)
    for w, nb in [(4, 15), (6, 10), (2, 31), (1, 30), (5, 12)]:
        rows = []
        for _ in range(500):
            sa = rng.getrandbits(w * nb)
            sb = rng.getrandbits(w * nb)
            shared = rng.randrange(nb)
            # force band `shared` to agree so a first match always exists
            field = ((1 << w) - 1) << (shared * w)
            sb = (sb & ~field) | (sa & field)
            expect = next(
                b
                for b in range(nb)
                if (sa >> (b * w)) & ((1 << w) - 1)
                == (sb >> (b * w)) & ((1 << w) - 1)
            )
            rows.append((sa, sb, expect))
        df = spark.createDataFrame(rows, "sa long, sb long, expect int")
        got = df.select(
            first_matching_band(F.col("sa"), F.col("sb"), w, nb).alias("got"),
            "expect",
        )
        bad = got.filter(F.col("got") != F.col("expect")).count()
        assert bad == 0, (w, nb)


def test_simhash_band_join_is_lossless_for_hamming_leq_3(spark):
    """The 4-band candidate join must find EVERY pair within Hamming 3 of
    each other (pigeonhole), and nothing farther — cross-checked against
    brute-force bit_count over all fingerprint pairs."""
    from pyspark.sql import functions as F

    from cses2humio_spark.operators.dedup import simhash, simhash_near_dup_pairs
    from cses2humio_spark.sources.catalog import load_table
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    got = {
        (r.id_a, r.id_b)
        for r in simhash_near_dup_pairs(
            docs, "doc_id", "text", bits=16, n_bands=4, max_hamming=3
        ).collect()
    }
    fp = simhash(docs, "doc_id", "text", bits=16)
    a = fp.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("ha"))
    b = fp.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("hb"))
    truth = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= 3)
        .collect()
    }
    assert got == truth and len(truth) > 0


def test_simhash_near_dup_pairs_guards():
    import pytest as _pytest

    from cses2humio_spark.operators.dedup import simhash_near_dup_pairs

    with _pytest.raises(ValueError, match="divide"):
        simhash_near_dup_pairs(None, bits=16, n_bands=5)
    with _pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dup_pairs(None, bits=16, n_bands=4, max_hamming=4)


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    """All points identical -> after iteration 1 every point lands in
    cluster 0; clusters 1 and 2 must carry their init centroids through
    unchanged instead of dropping to NaN/empty."""
    from cses2humio_spark.operators.clustering import kmeans_fit

    rows = [(i, [float(i <= 2), 0.0]) for i in range(1, 6)]
    # ids 1..5; seeds are ids 1,2,3 -> centroids [1,0],[1,0],[0,0]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    cents = kmeans_fit(df, "id", "v", k=3, n_iter=2)
    # cluster 0 ([1,0]) wins ids 1,2 (tie vs cluster 1 breaks low),
    # cluster 2 ([0,0]) wins ids 3,4,5 is wrong: id 3 has v=[0,0]? ids
    # 1,2 -> [1,0]; 3,4,5 -> [0,0]. cluster 1 gets nothing both rounds.
    assert cents[1] == [1.0, 0.0]
    assert cents[0] == [1.0, 0.0]
    assert cents[2] == [0.0, 0.0]


def test_kmeans_fit_validates_inputs(spark):
    import pytest as _pytest

    from cses2humio_spark.operators.clustering import kmeans_fit

    df = spark.createDataFrame([(1, [0.0])], "id long, v array<double>")
    with _pytest.raises(ValueError, match="k >= 1"):
        kmeans_fit(df, "id", "v", k=0, n_iter=1)
    with _pytest.raises(ValueError, match="only 1 vectors"):
        kmeans_fit(df, "id", "v", k=2, n_iter=1)


def test_sketch_wau_tracks_exact_rolling_wau(spark):
    """The merged-HLL rolling WAU must track the exact offset-explode twin
    within HLL(lgK=14) error (<1% at these cardinalities; exact here)."""
    from cses2humio_spark.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    exact = {
        r["day"]: r["wau"]
        for r in QUERIES["rolling_weekly_active_users"](spark, sf).collect()
    }
    approx = {
        r["day"]: r["approx_wau"]
        for r in QUERIES["weekly_active_users_sketch"](spark, sf).collect()
    }
    assert set(exact) == set(approx)
    for d in exact:
        assert abs(approx[d] - exact[d]) / max(exact[d], 1) < 0.01


def test_cosine_topk_probe_guard(spark):
    """An oversized probe set must be refused LOUDLY (ValueError), never
    collected to the driver — the brute-force path broadcasts every probe
    vector into every task, so probes=corpus at scale is a driver OOM."""
    import pytest as _pytest

    from cses2humio_spark.operators.similarity import cosine_topk_bruteforce

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    probes = emb.selectExpr("vec_id AS probe_id", "embedding")
    with _pytest.raises(ValueError, match="max_probes"):
        cosine_topk_bruteforce(emb, probes, k=3, max_probes=5)
    # under the cap: unchanged behavior
    small = probes.filter("probe_id < 3")
    out = cosine_topk_bruteforce(emb, small, k=2, max_probes=5).collect()
    assert len(out) == 6  # 3 probes x k=2


def test_minhash_mass_duplicate_bucket_cap(spark, caplog):
    """A mass-duplicate cluster (one text x N copies) must emit O(N) star
    pairs, not the C(N,2) clique, with a LOGGED cap notice — and the star
    must still connect the whole cluster to one component."""
    import logging

    from cses2humio_spark.operators.dedup import (
        minhash_candidate_pairs,
        near_dup_clusters,
    )

    n = 300
    text = "the same boilerplate page body repeated verbatim every time"
    docs = spark.createDataFrame(
        [(i, text) for i in range(n)] + [(n, "a completely different text here")],
        "doc_id long, text string",
    )
    with caplog.at_level(logging.WARNING, logger="cses2humio_spark.operators.dedup"):
        pairs = minhash_candidate_pairs(
            docs, "doc_id", "text", max_bucket_size=50
        )
        rows = pairs.collect()
        # the drop notice is an Observation metric logged from a daemon
        # thread once the action's metrics land — wait for it briefly
        import time

        for _ in range(100):
            if any("max_bucket_size" in r.message for r in caplog.records):
                break
            time.sleep(0.05)
    # star: hub (min id 0) -> each of the other n-1 members, once
    assert len(rows) == n - 1, len(rows)
    assert {(r.id_a, r.id_b) for r in rows} == {(0, i) for i in range(1, n)}
    assert any("max_bucket_size" in r.message for r in caplog.records)
    drop_msg = next(
        r.message for r in caplog.records if "max_bucket_size" in r.message
    )
    # one oversized bucket per band (identical docs collide in all 4
    # bands); each drops clique C(300,2) minus star 299 = 44551
    # bucket-local edges -> 4 x 44551, observed during the consumer's
    # own action
    assert "178204" in drop_msg and "largest: 300" in drop_msg, drop_msg
    # clustering still reaches every member through the hub
    clusters = near_dup_clusters(
        docs.select("doc_id"), pairs, id_col="doc_id"
    ).collect()
    reps = {r.doc_id: r.cluster_rep for r in clusters}
    assert all(reps[i] == 0 for i in range(n))
    assert reps[n] == n  # the distinct doc stays a singleton


def test_minhash_cap_guard_runs_zero_extra_jobs(spark):
    """Scale contract (VERDICT r4 #3): the mass-dup guard must be
    action-free — BUILDING the capped plan launches no Spark job, and
    collecting it costs the same job count as the uncapped plan (the
    bucket-stats branch rides the consumer's action via ReuseExchange +
    an Observation, never an eager probe)."""
    from cses2humio_spark.operators.dedup import minhash_candidate_pairs

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon word{i % 7}") for i in range(40)],
        "doc_id long, text string",
    )
    sc = spark.sparkContext
    sc.setJobGroup("massdup-build", "plan build must be lazy")
    try:
        pairs = minhash_candidate_pairs(
            docs, "doc_id", "text", max_bucket_size=50
        )
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    build_jobs = sc.statusTracker().getJobIdsForGroup("massdup-build")
    assert len(build_jobs) == 0, (
        f"building the capped plan launched {len(build_jobs)} job(s) — "
        "the guard must not run an eager probe action"
    )

    # the logged-drop contract rides the consumer's action as a
    # CollectMetrics (Observation) node inside the ONE query — not a
    # separate probe query
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    assert "CollectMetrics" in plan, plan


def test_minhash_cap_inactive_on_normal_corpus(spark):
    """With no oversized bucket the capped path must be pair-identical to
    the uncapped clique (the cap only rewrites pathological buckets)."""
    from cses2humio_spark.operators.dedup import minhash_candidate_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),
            (3, "one two three four five six seven"),
            (4, "one two three four five six eight"),
            (5, "totally unrelated content goes here now"),
        ],
        "doc_id long, text string",
    )
    capped = {
        (r.id_a, r.id_b)
        for r in minhash_candidate_pairs(
            docs, "doc_id", "text", max_bucket_size=50
        ).collect()
    }
    uncapped = {
        (r.id_a, r.id_b)
        for r in minhash_candidate_pairs(
            docs, "doc_id", "text", max_bucket_size=None
        ).collect()
    }
    assert capped == uncapped


def test_rowwise_signatures_identical_to_groupby_formulation(spark):
    """The zero-shuffle rowwise MinHash signature (array_min over the
    row's shingle array) must be ROW-IDENTICAL to the explode+groupBy
    formulation — both orderings of the same min."""
    from cses2humio_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_rowwise,
    )
    from cses2humio_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    a = {
        (r["doc_id"], r["band"], r["sig"])
        for r in minhash_signatures(docs, "doc_id", "text").collect()
    }
    b = {
        (r["doc_id"], r["band"], r["sig"])
        for r in minhash_signatures_rowwise(docs, "doc_id", "text").collect()
    }
    assert a == b and len(a) > 0
    # short doc (< n tokens): no signature rows in either formulation
    tiny = spark.createDataFrame([(1, "just two")], "doc_id long, text string")
    assert minhash_signatures_rowwise(tiny, "doc_id", "text").count() == 0


def test_rowwise_signatures_plan_has_no_shuffle(spark):
    """The rowwise formulation's whole point: signatures as a projection —
    no aggregation, no KEY shuffle (the groupBy formulation plans both).
    Since r9 the projection goes through fan_out, so a single-split local
    input legitimately shows ONE round-robin rebalance (load balancing
    for the md5-heavy map phase; a no-op at scale) — what stays forbidden
    is hash/range partitioning and any aggregate."""
    from cses2humio_spark.operators.dedup import minhash_signatures_rowwise
    from cses2humio_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        minhash_signatures_rowwise(docs, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert "Aggregate" not in plan


def test_pq_adc_recall_floor_vs_exact_l2(spark):
    """PQ-ADC is approximate by design; on the embeddings table its
    top-5 must still overlap the EXACT squared-L2 top-5 well (recall
    floor 0.5 averaged over probes — 4x16 codebooks on 64 dims), and
    the approx distance of the true nearest neighbor (the probe itself,
    distance 0) must rank it first."""
    import numpy as np

    from cses2humio_spark.operators.similarity import pq_adc_topk
    from cses2humio_spark.sources.catalog import load_table
    from tests.conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings")
    probes = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    got = pq_adc_topk(emb, probes, m=4, k_codes=16, dim=64, k=5).collect()
    by_probe = {}
    for r in got:
        by_probe.setdefault(r["probe_id"], []).append((r["rank"], r["vec_id"]))
    assert set(by_probe) == set(range(8))
    # exact ground truth
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    recalls = []
    for p in range(8):
        pv = vecs[p]
        exact = sorted(
            vecs, key=lambda v: (float(((vecs[v] - pv) ** 2).sum()), v)
        )[:5]
        approx = [v for _, v in sorted(by_probe[p])]
        # a probe is its own nearest neighbor at distance exactly 0
        assert approx[0] == p, (p, approx)
        recalls.append(len(set(exact) & set(approx)) / 5.0)
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_pq_plan_is_equi_join_only(spark):
    """The codebook and probe tables ride broadcast EQUI-joins — a PQ
    regression to a cross product would explode at corpus scale."""
    from cses2humio_spark.operators.similarity import pq_adc_topk
    from cses2humio_spark.plans.explain import assert_no_cartesian
    from cses2humio_spark.sources.catalog import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    probes = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    df = pq_adc_topk(emb, probes, m=4, k_codes=8, dim=64, k=3)
    assert_no_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivfpq_recall_floor_vs_exact_l2(spark):
    """IVF-PQ composes two approximations (cell pruning + residual
    codes). This synthetic corpus's near-orthogonal neighbor geometry is
    PQ's worst case (the same caveat test_ann_recall_floors documents
    for LSH: id-prefix codebooks measure ~0.22 recall at nprobe=2 and
    plateau ~0.35 by nprobe=4 — quantization, not pruning, binds), so
    the pins are structural: (a) every probe ranks ITSELF first
    (residual distance exactly 0 in its own cell — a correctness
    property), and (b) a larger codebook strictly improves recall vs
    the exact squared-L2 top-5 (nprobe is NOT the binding dial here —
    2 vs 4 measured identical — so the test pins the dial that is)."""
    import numpy as np

    from cses2humio_spark.operators.similarity import ivfpq_topk
    from cses2humio_spark.sources.catalog import load_table
    from tests.conftest import SF_ORACLE

    emb = load_table(spark, SF_ORACLE, "embeddings")
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    probes = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }

    def run(k_codes):
        got = ivfpq_topk(
            emb, probes, cent, m=4, k_codes=k_codes, dim=64, k=5, nprobe=2
        ).collect()
        by_probe = {}
        for r in got:
            by_probe.setdefault(r["probe_id"], []).append(
                (r["rank"], r["vec_id"])
            )
        recalls = []
        for p in range(8):
            pv = vecs[p]
            exact = sorted(
                vecs, key=lambda v: (float(((vecs[v] - pv) ** 2).sum()), v)
            )[:5]
            approx = [v for _, v in sorted(by_probe[p])]
            assert approx[0] == p, (p, approx)  # self at distance 0
            recalls.append(len(set(exact) & set(approx)) / 5.0)
        return sum(recalls) / len(recalls)

    small, big = run(16), run(32)
    assert big > small, (small, big)  # the recall/cost dial works
    assert small >= 0.2, small  # self-retrieval floor


def test_sq8_topk_recall_vs_exact_float(spark):
    """SQ8 cosine top-k must track the exact float ranking closely:
    int8 rounding perturbs cosines by ~1e-3, so recall@5 over the 8
    probes stays >= 0.9 on the synthetic corpus (the 4x-smaller scan is
    the point; this pins that the compression costs almost no recall)."""
    from cses2humio_spark.queries import QUERIES
    from tests.conftest import SF_SMALL

    sq8 = QUERIES["sq8_cosine_topk"](spark, SF_SMALL).collect()
    exact = QUERIES["cosine_topk"](spark, SF_SMALL).collect()
    got: dict[int, set[int]] = {}
    want: dict[int, set[int]] = {}
    for r in sq8:
        got.setdefault(r["probe_id"], set()).add(r["vec_id"])
    for r in exact:
        if r["probe_id"] < 8:  # sq8 query probes ids < 8; exact uses < 10
            want.setdefault(r["probe_id"], set()).add(r["vec_id"])
    assert set(got) == set(want)
    recall = sum(
        len(got[p] & want[p]) / len(want[p]) for p in want
    ) / len(want)
    assert recall >= 0.9, recall


def test_star_components_equal_propagation_and_survive_long_chains(spark):
    """alternating_star_components is the diameter-robust CC twin: on a
    graph min-label propagation handles, the two must agree EXACTLY; on
    a 200-node chain (diameter 199), the propagation twin's default
    round budget refuses while the star contraction converges in
    O(log^2 n) rounds and labels every node with the chain's minimum."""
    import pytest

    from cses2humio_spark.operators.dedup import (
        alternating_star_components,
        near_dup_clusters,
    )

    # mixed shapes: a triangle {0,1,2}, a pair {10,11}, a 4-star around
    # 20, singletons 30/31, and ids listed but absent from any pair
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (10, 11), (20, 21), (20, 22), (20, 23)],
        "id_a long, id_b long",
    )
    ids = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 10, 11, 20, 21, 22, 23, 30, 31]],
        "doc_id long",
    )
    # r10: the small-graph fast path resolves components with a driver
    # union-find (driver_max_edges default); driver_max_edges=0 forces
    # the distributed star alternation — the two must be bit-identical
    # (the VERDICT r9 #2 equal-output pin).
    star = {
        (r.doc_id, r.cluster_rep)
        for r in alternating_star_components(
            ids, pairs, driver_max_edges=0
        ).collect()
    }
    uf = {
        (r.doc_id, r.cluster_rep)
        for r in alternating_star_components(ids, pairs).collect()
    }
    prop = {
        (r.doc_id, r.cluster_rep)
        for r in near_dup_clusters(ids, pairs).collect()
    }
    assert star == prop
    assert star == uf
    assert star == {
        (0, 0), (1, 0), (2, 0), (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (23, 20), (30, 30), (31, 31),
    }

    # chain stress: 0-1-2-...-199 (diameter 199 >> any sane propagation
    # budget; the budget is capped at 6 here so the refusal is cheap —
    # each refused propagation round persists another lineage layer)
    n = 200
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    chain_ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        near_dup_clusters(chain_ids, chain, max_iter=6).collect()
    labels = alternating_star_components(
        chain_ids, chain, driver_max_edges=0
    ).collect()
    assert len(labels) == n
    assert all(r.cluster_rep == 0 for r in labels)
    uf_labels = alternating_star_components(chain_ids, chain).collect()
    assert {(r.doc_id, r.cluster_rep) for r in uf_labels} == {
        (r.doc_id, r.cluster_rep) for r in labels
    }

    # empty edge set: everyone is their own representative
    empty = spark.createDataFrame([], "id_a long, id_b long")
    singletons = alternating_star_components(chain_ids, empty).collect()
    assert all(r.cluster_rep == r.doc_id for r in singletons)

    # string ids: the driver union-find orders roots with Python's str
    # comparison, which must agree with Spark's min (UTF-8 byte order ==
    # code-point order) — pinned against the distributed path
    spairs = spark.createDataFrame(
        [("b", "Z"), ("Z", "é"), ("x", "y")], "id_a string, id_b string"
    )
    sids = spark.createDataFrame(
        [(s,) for s in ["b", "Z", "é", "x", "y", "lone"]], "doc_id string"
    )
    s_star = {
        (r.doc_id, r.cluster_rep)
        for r in alternating_star_components(
            sids, spairs, driver_max_edges=0
        ).collect()
    }
    s_uf = {
        (r.doc_id, r.cluster_rep)
        for r in alternating_star_components(sids, spairs).collect()
    }
    assert s_star == s_uf
    assert s_uf == {
        ("b", "Z"), ("Z", "Z"), ("é", "Z"),
        ("x", "x"), ("y", "x"), ("lone", "lone"),
    }


def test_semdedup_decisions_semantics_and_plan(spark):
    """SemDeDup decision semantics pinned from first principles on the
    sf0.001 fixture: a vector is dropped iff SOME lower-id vector in
    its own cluster has cosine >= tau, and dup_of is the SMALLEST such
    id — recomputed here with brute-force in-cluster pairs. Plan pins:
    the centroid assignment broadcasts (no shuffled centroid join), and
    the in-cluster self-join is an equi-join on cid, never a cartesian."""
    from pyspark.sql import functions as F

    from cses2humio_spark.operators.similarity import (
        cosine_similarity,
        ivf_assign,
        semdedup_within_cluster,
    )
    from cses2humio_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["semdedup_decisions"](spark, sf)
    got = {r.vec_id: (r.cid, r.kept, r.dup_of) for r in out.collect()}

    from cses2humio_spark.sources.catalog import load_table

    emb = load_table(spark, sf, "embeddings")
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    asn = ivf_assign(emb, cent)
    v = emb.select("vec_id", "embedding").join(asn, on="vec_id")
    a = v.select(
        F.col("cid"), F.col("vec_id").alias("ia"),
        F.col("embedding").alias("va"),
    )
    b = v.select(
        F.col("cid"), F.col("vec_id").alias("ib"),
        F.col("embedding").alias("vb"),
    )
    brute = (
        a.join(b, on="cid")
        .filter(F.col("ia") < F.col("ib"))
        .filter(cosine_similarity(F.col("va"), F.col("vb")) >= 0.4)
        .groupBy("ib").agg(F.min("ia").alias("dup_of"))
        .collect()
    )
    want_dropped = {r.ib: r.dup_of for r in brute}
    assert want_dropped, "fixture must exercise the dropped arm"
    for vid, (cid, kept, dup_of) in got.items():
        if vid in want_dropped:
            assert kept == 0 and dup_of == want_dropped[vid], (vid, dup_of)
        else:
            assert kept == 1 and dup_of is None, (vid, dup_of)
    # every vector gets exactly one decision row
    assert len(got) == emb.count()

    plan = out._jdf.queryExecution().executedPlan().toString()
    # never a SHUFFLED cartesian. (BroadcastNestedLoopJoin appears: it is
    # the 16-row centroid fan-out of the assignment — BNLJ_BY_DESIGN in
    # the fleet lint, same as ivf_topk; the plan string prints the shared
    # assignment subtree once per consumer, so its count is not pinned.)
    # The quadratic in-cluster stage itself must be an EQUI-join on cid.
    assert "CartesianProduct" not in plan, plan[:3000]
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    ), plan[:3000]


def test_semdedup_mixed_threshold_monotonicity(spark):
    """A higher tau can only KEEP more: dropped(tau=0.45) must be a
    subset of dropped(tau=0.4) on the same assignment."""
    from pyspark.sql import functions as F

    from cses2humio_spark.operators.similarity import semdedup_within_cluster
    from cses2humio_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    lo = {
        r.vec_id
        for r in semdedup_within_cluster(emb, cent, 0.4)
        .filter(F.col("kept") == 0).collect()
    }
    hi = {
        r.vec_id
        for r in semdedup_within_cluster(emb, cent, 0.45)
        .filter(F.col("kept") == 0).collect()
    }
    assert hi <= lo and len(hi) < len(lo)


def test_cosine_pairs_lookup_dim_aware_byte_bound(spark):
    """VERDICT r14 #6: ``max_vectors`` alone scales linearly with dim —
    the collected float64 matrix is rows x dim x 8 bytes, so the lookup
    now ALSO refuses on ``max_matrix_bytes``. Pins: (a) a table within
    the row bound but over the byte bound refuses loudly BEFORE building
    the matrix; (b) within both bounds the scores match the join +
    cosine_pairs formulation bit-for-bit, including the NULL-vector and
    zero-norm edges (Spark's x/0 is NULL; both formulations agree)."""
    import pytest

    from cses2humio_spark.functions.vectors import cosine_pairs_lookup
    from cses2humio_spark.operators.similarity import cosine_pairs

    vecs = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0]),
            (2, [1.0, 2.0, 3.0]),
            (3, [0.0, 0.0, 0.0]),  # zero norm -> NaN
            (4, None),  # NULL vector -> NULL cosine
        ],
        "vid long, v array<double>",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 99)], "id_a long, id_b long"
    )
    # (a) dim-aware refusal: 4 rows x 3 dims x 8 B = 96 B > 64 B budget
    with pytest.raises(ValueError, match="max_matrix_bytes"):
        cosine_pairs_lookup(
            pairs, vecs, "vid", "v", max_matrix_bytes=64
        )
    # (b) parity with the join formulation inside the bounds
    looked = {
        (r.id_a, r.id_b): r["__cos"]
        for r in cosine_pairs_lookup(pairs, vecs, "vid", "v").collect()
    }
    va = vecs.select(F.col("vid").alias("id_a"), F.col("v").alias("__va"))
    vb = vecs.select(F.col("vid").alias("id_b"), F.col("v").alias("__vb"))
    joined = {
        (r.id_a, r.id_b): r.c
        for r in pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            cosine_pairs(F.col("__va"), F.col("__vb")).alias("c"),
        )
        .collect()
    }
    assert looked[(1, 2)] == joined[(1, 2)] == 1.0
    # zero-norm: x/0 is NULL in Spark — both formulations agree
    assert looked[(1, 3)] is None and joined[(1, 3)] is None
    # the join drops (1,99) (missing id) and folds (1,4)'s NULL vector
    # to NULL — the lookup surfaces both as NULL, failing thresholds
    # the same way
    assert looked[(1, 4)] is None and looked[(1, 99)] is None
