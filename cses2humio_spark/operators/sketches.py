"""Bounded-memory frequency sketches: Misra-Gries heavy hitters.

The idiomatic Spark answer to "which keys exceed n/k of the data" is a
plain groupBy — map-side partial aggregation already keeps shuffle volume
at O(groups). That answer breaks only when the DISTINCT key count itself
dwarfs executor memory (URLs, raw strings, IP pairs at 100 TB): the
partial hash map spills. Misra-Gries is the fix: each partition keeps at
most ``k`` counters no matter how many distinct keys stream through, and
the union of per-partition summaries provably contains every key with
global frequency > n/(k+1) (pigeonhole: a counter survives unless its
mass is cancelled k+1-for-1). A second, exact pass counts only those
candidates — so the final answer is EXACT, the sketch only bounds the
candidate set.

Scale shape: pass 1 is mapInPandas with O(k) state per partition and an
output of ≤ k rows per partition (the only Python stage — MG is
inherently row-sequential, amortized here by merging pandas value_counts
per Arrow batch and applying batched decrements). Pass 2 broadcasts the
candidate keys (≤ k × partitions rows) and runs a codegen semi-join +
groupBy over the raw data. Nothing driver-side except the candidate list
and the total count (two bounded scalars/collects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _make_mg_mapper(k: int):
    """Factory (cloudpickle ships it by value — workers don't import this
    package): batched Misra-Gries over Arrow batches of one partition."""

    def mg(batches):
        import pandas as pd

        counters: dict[object, int] = {}
        for pdf in batches:
            # dropna=False + None-normalization: NULL keys are counted as
            # one distinct key (GROUP BY semantics), not silently skipped
            for v, c in pdf["__key"].value_counts(dropna=False).items():
                v = None if pd.isna(v) else v
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                # batched decrement: subtract the (k+1)-th largest count
                # from every counter and drop the non-positive ones —
                # equivalent to that many single MG decrement rounds, so
                # the pigeonhole guarantee is preserved.
                vals = sorted(counters.values(), reverse=True)
                d = vals[k]
                counters = {
                    key: c - d for key, c in counters.items() if c - d > 0
                }
        yield pd.DataFrame(
            {"__key": list(counters.keys()) or pd.Series([], dtype=object)}
        )

    return mg


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """EXACT counts of every key of ``col`` with frequency > n/k, found
    with bounded memory: MG candidate generation (≤ k counters per
    partition) + an exact second pass over candidates only.

    Returns (``col``, n_rows) with the original column type preserved.
    NULL keys are a distinct key (exact GROUP BY semantics): the sketch
    counts them, the candidate join is null-safe, and a NULL exceeding
    n/k surfaces as a NULL-keyed result row.
    """
    keyed = df.select(F.col(col).cast("string").alias("__key"))
    candidates = (
        keyed.mapInPandas(_make_mg_mapper(k), schema="__key string")
        .distinct()
    )
    n = df.count()  # bounded driver state: one scalar
    exact = (
        df.join(
            F.broadcast(candidates),
            df[col].cast("string").eqNullSafe(candidates["__key"]),
            "left_semi",
        )
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    # integer arithmetic (count*k > n): no float threshold edge cases
    return exact.filter(F.col("n_rows") * k > F.lit(n))
