"""PCA over embedding columns: fit/projection contracts (eigenvectors
are not SQL-expressible, so these tests are the correctness pin)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cses2humio_spark.operators.decomposition import pca_fit, pca_project
from cses2humio_spark.sources.catalog import load_table


def test_pca_recovers_planted_subspace(spark):
    """Synthetic data on a known 2-d subspace of R^4 (+ tiny fixed noise):
    the top-2 components must capture ~all variance and projection must
    preserve pairwise distances of the in-plane part."""
    import numpy as np

    rng = np.random.RandomState(7)
    basis = np.array(
        [[1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, -1.0]]
    ) / math.sqrt(2)
    coeffs = rng.randn(200, 2) * [5.0, 2.0]
    x = coeffs @ basis + rng.randn(200, 4) * 0.01
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    model = pca_fit(df, "embedding", k=2)
    ratio = sum(model.explained_variance_ratio)
    assert ratio > 0.999, ratio
    assert model.explained_variance[0] >= model.explained_variance[1] > 0
    # components are unit-length and orthogonal
    w0, w1 = (list(c) for c in model.components)
    assert abs(sum(a * a for a in w0) - 1) < 1e-9
    assert abs(sum(a * b for a, b in zip(w0, w1))) < 1e-9


def test_pca_projection_is_codegen_and_centers(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    model = pca_fit(emb, "embedding", k=3)
    out = pca_project(emb, "embedding", model, out_col="p")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # projection never leaves the JVM
    rows = out.select("p").collect()
    dim_k = {len(r["p"]) for r in rows}
    assert dim_k == {3}
    # projected data is centered: mean of each component ~ 0
    n = len(rows)
    for j in range(3):
        m = sum(r["p"][j] for r in rows) / n
        assert abs(m) < 1e-6, (j, m)
    # component variances match the eigenvalues (sample variance)
    for j in range(3):
        var = sum(r["p"][j] ** 2 for r in rows) / (n - 1)
        assert abs(var - model.explained_variance[j]) < 1e-6 * max(
            1.0, model.explained_variance[j]
        )


def test_pca_fit_is_deterministic_across_partitionings(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    m1 = pca_fit(emb.repartition(3), "embedding", k=2)
    m2 = pca_fit(emb.repartition(17), "embedding", k=2)
    for a, b in zip(m1.components, m2.components):
        for x, y in zip(a, b):
            assert abs(x - y) < 1e-9


def test_pca_fit_validates_inputs(spark):
    df = spark.createDataFrame([(1, [0.0, 1.0])], "id long, v array<double>")
    with pytest.raises(ValueError, match="k must be"):
        pca_fit(df, "v", k=0)
    with pytest.raises(ValueError, match="exceeds embedding dim"):
        pca_fit(df, "v", k=3)
    with pytest.raises(ValueError, match=">= 2 vectors"):
        pca_fit(df, "v", k=1)
    empty = df.filter("id < 0")
    with pytest.raises(ValueError, match="no non-null vectors"):
        pca_fit(empty, "v", k=1)


def test_pca_then_ann_preserves_neighbors_on_low_rank_data(spark):
    """The composition the operator exists for: reduce dim, then ANN.
    On low-rank data (3-d subspace in R^16 + small noise), exact cosine
    top-5 in the PCA(3) space must recover the full-dim top-5 almost
    perfectly — the projection is the structure."""
    import numpy as np

    from cses2humio_spark.operators.similarity import cosine_topk_bruteforce

    rng = np.random.RandomState(11)
    basis, _ = np.linalg.qr(rng.randn(16, 3))
    x = rng.randn(300, 3) @ basis.T + rng.randn(300, 16) * 0.01
    corpus = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).persist()
    probes = corpus.filter("vec_id < 10").selectExpr(
        "vec_id AS probe_id", "embedding"
    )

    def pairs(df):
        return {(r.probe_id, r.vec_id) for r in df.collect() if r.rank <= 5}

    truth = pairs(cosine_topk_bruteforce(corpus, probes, k=5))

    model = pca_fit(corpus, "embedding", k=3)
    corpus_p = pca_project(corpus, "embedding", model, "pe").select(
        "vec_id", F.col("pe").alias("embedding")
    )
    probes_p = pca_project(probes, "embedding", model, "pe").select(
        "probe_id", F.col("pe").alias("embedding")
    )
    got = pairs(cosine_topk_bruteforce(corpus_p, probes_p, k=5))
    recall = len(truth & got) / len(truth)
    corpus.unpersist()
    assert recall >= 0.9, recall
