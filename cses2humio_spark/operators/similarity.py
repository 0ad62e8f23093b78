"""Similarity search over embedding columns (SURVEY.md §2.2).

Two tiers:
- ``cosine_topk_bruteforce``: exact top-k by cosine. The query side is
  broadcast (small set of probe vectors); the corpus streams through a
  single map + per-probe top-k (TakeOrdered via window). Exact and
  oracle-checkable; cost O(|corpus| * |probes|) — the right baseline, and
  still viable at 100 TB when |probes| is small because it is one broadcast
  + one narrow pass + a k-row-per-probe aggregation.
- ``lsh_topk``: random-hyperplane LSH bucketing (signs of dot products with
  deterministic pseudo-random hyperplanes) — candidates share a signature
  band; exact cosine re-rank inside buckets only. Turns the corpus pass
  into an equi-join on the signature, the 100 TB scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cses2humio_spark.functions.vectors import cosine_similarity


def cosine_topk_bruteforce(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for each probe vector.

    ``probes`` (probe_id, embedding) is broadcast; ranking is
    row_number over (probe) ordered by (-cos, id) — a total order, so
    results are deterministic."""
    p = probes.select(
        F.col(probe_id_col), F.col(vec_col).alias("__pvec")
    )
    scored = corpus.join(F.broadcast(p)).select(
        F.col(probe_id_col),
        F.col(id_col),
        F.round(
            cosine_similarity(F.col(vec_col), F.col("__pvec")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id_col, id_col, "cos_sim", "rank")
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: values derived
    from a fixed LCG seeded by the plane index — reproducible across
    engines and runs with no RNG dependency."""
    vals = []
    state = (plane_idx * 2654435761 + 1013904223) & 0xFFFFFFFF
    for _ in range(dim):
        state = (state * 1664525 + 1013904223) & 0xFFFFFFFF
        vals.append((state / 0xFFFFFFFF) * 2.0 - 1.0)
    return vals


def lsh_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append an integer LSH signature: bit i = sign(v . plane_i)."""
    sig = F.lit(0).cast("bigint")
    for i in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, i)])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn("lsh_sig", sig)


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing the probe's LSH
    signature bucket; exact cosine re-rank within bucket. Recall < 1 by
    design; the bucket equi-join is the scale path (shuffle on signature
    instead of a full cross product)."""
    c = lsh_signatures(corpus, dim, n_planes, vec_col)
    p = lsh_signatures(
        probes.select(F.col(probe_id_col), F.col(vec_col)), dim, n_planes, vec_col
    ).select(F.col(probe_id_col), F.col(vec_col).alias("__pvec"), "lsh_sig")
    scored = c.join(p, on="lsh_sig").select(
        F.col(probe_id_col),
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), F.col("__pvec")), 6).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id_col, id_col, "cos_sim", "rank")
    )
