"""Window-function operators (ranking, running aggregates, sessionization).

A window = one shuffle on ``partitionBy`` keys + per-key sort. At 100 TB the
key cardinality must exceed executor count (user_id / custkey do); a window
with no partition key would serialize onto one task and is never emitted
here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k_per_group(
    df: DataFrame,
    part_by: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Deterministic per-group top-k via row_number. Callers must make
    ``order`` a total order (include a unique tiebreak column)."""
    w = Window.partitionBy(*part_by).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def running_total(
    df: DataFrame,
    part_by: Sequence[str],
    order: Sequence[Column],
    value: Column,
    alias: str = "running_total",
) -> DataFrame:
    w = (
        Window.partitionBy(*part_by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(value).over(w))


def sessionize(
    df: DataFrame,
    part_by: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Batch gap-based sessionization: a new session starts when the gap to
    the previous event (per key) exceeds ``gap_seconds``. Classic
    lag + cumulative-sum formulation — single shuffle, SQL-expressible
    (the streaming equivalent is ``session_window`` in streaming/pipeline).
    """
    w = Window.partitionBy(*part_by).orderBy(F.col(ts_col).asc())
    ts = F.col(ts_col).cast("double")
    prev = F.lag(ts).over(w)
    new_session = F.when(
        prev.isNull() | ((ts - prev) > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        session_col,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
