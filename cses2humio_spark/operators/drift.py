"""Sequential drift detection (one-sided CUSUM) over per-key event
streams — the change-detection primitive SIEM/observability pipelines run
on metrics: s_i = max(0, s_{i-1} + (x_i - k)) with an alarm when s
crosses h.

The recurrence is inherently sequential per key (each state depends on
the previous), which no built-in window aggregate expresses — this is
the honest ``applyInPandas`` case: one Arrow batch per key group, a
vectorizable-in-C numpy scan inside, keys processed in parallel across
executors. State is one float per key; memory is bounded by the largest
single key's history (the same bound any per-key sort carries).

Cross-engine determinism: the update uses only IEEE-exact ops (+, -,
max) applied in a TOTAL per-key order (ts, id tie-break), so a DuckDB
recursive CTE replaying the same recurrence produces bit-identical
doubles — the oracle for ``cusum_drift_alarms`` does exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

def cusum_schema(key_col: str) -> str:
    return (
        f"{key_col} bigint, n_events bigint, max_cusum double, "
        "n_alarms bigint, first_alarm_step bigint"
    )


def cusum_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    drift_k: float,
    alarm_h: float,
) -> DataFrame:
    """Per-key one-sided CUSUM scan. Returns one row per key:
    (key, n_events, max_cusum, n_alarms, first_alarm_step) where an
    alarm is any step with s > alarm_h (1-based step index in the
    (order_cols)-sorted sequence; NULL if never)."""

    # self-contained closure (executor workers don't have this package
    # on sys.path when driven from an arbitrary cwd)
    kd, hh = float(drift_k), float(alarm_h)
    ocols = list(order_cols)
    vcol, kcol = value_col, key_col

    def scan(pdf):
        import numpy as _np
        import pandas as _pd

        pdf = pdf.sort_values(ocols, kind="mergesort")
        x = pdf[vcol].to_numpy(dtype=_np.float64)
        s = 0.0
        smax = 0.0
        n_alarms = 0
        first = None
        for i, xi in enumerate(x):
            s = s + (xi - kd)
            if s < 0.0:
                s = 0.0
            if s > smax:
                smax = s
            if s > hh:
                n_alarms += 1
                if first is None:
                    first = i + 1
        return _pd.DataFrame(
            {
                kcol: [int(pdf[kcol].iloc[0])],
                "n_events": [len(x)],
                "max_cusum": [smax],
                "n_alarms": [n_alarms],
                "first_alarm_step": [first],
            }
        )

    return df.groupBy(key_col).applyInPandas(scan, cusum_schema(key_col))


def ewma_final(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Per-key exponentially-weighted moving average (the UEBA baseline
    smoother: s_0 = v_0, s_i = alpha*v_i + (1-alpha)*s_{i-1}) — final
    state plus the last value's deviation from it, the 'is the newest
    observation off its own baseline' signal.

    Pure Catalyst: one shuffle on the key, the ordered series folds
    sequentially inside ``aggregate`` (left fold over the sorted array —
    IEEE order identical to the oracle's ``list_reduce``, so doubles
    match bit-for-bit under any partitioning). Per-key state is the
    collected series; keys with very long histories should pre-bucket
    time (the same contract as every collect_list family op here)."""
    from pyspark.sql import functions as F

    arr = F.array_sort(
        F.collect_list(F.struct(*[F.col(c) for c in order_cols], F.col(value_col)))
    )
    grouped = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.transform(arr, lambda s: s[value_col]).alias("__vs"),
    )
    vs = F.col("__vs")
    a = float(alpha)
    ewma = F.aggregate(
        F.slice(vs, 2, F.size(vs) - 1),
        F.element_at(vs, 1),
        lambda acc, v: F.lit(a) * v + F.lit(1.0 - a) * acc,
    )
    last = F.element_at(vs, -1)
    return grouped.select(
        key_col,
        "n_events",
        F.round(last, 6).alias("last_value"),
        F.round(ewma, 6).alias("ewma"),
        F.round(last - ewma, 6).alias("deviation"),
    )


def holt_final(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.1,
) -> DataFrame:
    """Per-key Holt double-exponential smoothing (level + trend) — the
    drift family's trend-aware member: EWMA flags 'off own baseline',
    Holt flags 'off own TREND' (a steadily-climbing series is normal to
    Holt, anomalous to EWMA).

        l_i = alpha*v_i + (1-alpha)*(l_{i-1} + b_{i-1})
        b_i = beta*(l_i - l_{i-1}) + (1-beta)*b_{i-1}

    init: l = v_1, b = v_1 - v_0 after the first two points. Emits the
    final level/trend, the one-step-ahead forecast for the NEXT point
    (l + b), and the newest point's deviation from the forecast that
    was made BEFORE it — the alerting signal. Keys need >= 3 points (a
    trend is meaningless sooner); shorter series are dropped.

    Pure Catalyst like ``ewma_final``: one shuffle on the key, then a
    left fold over the ordered series with a (level, trend, forecast)
    STRUCT accumulator — the lambda's expression tree is written
    IDENTICALLY in the DuckDB oracle, so doubles match bit-for-bit
    under any partitioning."""
    from pyspark.sql import functions as F

    a, b = float(alpha), float(beta)
    arr = F.array_sort(
        F.collect_list(
            F.struct(*[F.col(c) for c in order_cols], F.col(value_col))
        )
    )
    grouped = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.transform(arr, lambda s: s[value_col]).alias("__vs"),
    )
    vs = F.col("__vs")

    def step(acc, v):
        # init step: acc.b is NULL -> acc.l holds v_0, v is v_1
        l_new = F.lit(a) * v + F.lit(1.0 - a) * (acc["l"] + acc["b"])
        return F.when(
            acc["b"].isNull(),
            F.struct(
                v.alias("l"),
                (v - acc["l"]).alias("b"),
                F.lit(None).cast("double").alias("f"),
            ),
        ).otherwise(
            F.struct(
                l_new.alias("l"),
                (
                    F.lit(b) * (l_new - acc["l"])
                    + F.lit(1.0 - b) * acc["b"]
                ).alias("b"),
                (acc["l"] + acc["b"]).alias("f"),
            )
        )

    init = F.struct(
        F.element_at(vs, 1).alias("l"),
        F.lit(None).cast("double").alias("b"),
        F.lit(None).cast("double").alias("f"),
    )
    fin = F.aggregate(F.slice(vs, 2, F.size(vs) - 1), init, step)
    last = F.element_at(vs, -1)
    return (
        grouped.filter(F.col("n_events") >= 3)
        .select(
            key_col,
            "n_events",
            F.round(last, 6).alias("last_value"),
            F.round(fin["l"], 6).alias("level"),
            F.round(fin["b"], 6).alias("trend"),
            F.round(fin["l"] + fin["b"], 6).alias("forecast_next"),
            F.round(last - fin["f"], 6).alias("deviation"),
        )
    )


def holt_winters_final(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    period: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
) -> DataFrame:
    """Per-key additive Holt-Winters (level + trend + SEASONALITY) — the
    smoothing family's final member: EWMA scores against a flat
    baseline, Holt against a trend, Holt-Winters against a trend AND a
    repeating profile (period ``period`` observations), the shape of
    hourly/daily ops series.

        l_i = a*(v_i - s_{i-m}) + (1-a)*(l_{i-1} + b_{i-1})
        b_i = B*(l_i - l_{i-1}) + (1-B)*b_{i-1}
        s_i = g*(v_i - l_i) + (1-g)*s_{i-m}

    Classic init from the first two periods: l = mean(period 1),
    b = (mean(period 2) - mean(period 1)) / m, s_j = v_j - l. Keys need
    >= 2m + 1 observations; shorter series are dropped. Emits the final
    level/trend, the next slot's seasonal component, the one-step-ahead
    forecast (l + b + s[next]), and the newest point's deviation from
    the forecast made BEFORE it.

    Pure Catalyst like its siblings: one shuffle on the key, then a
    left fold whose accumulator is a (level, trend, seasonal-array,
    forecast) struct — the expression trees are written identically in
    the recursive-CTE oracle, so doubles match bit-for-bit."""
    from pyspark.sql import functions as F

    a, b_, g = float(alpha), float(beta), float(gamma)
    m = int(period)
    if m < 2:
        raise ValueError(f"period must be >= 2, got {m}")
    arr = F.array_sort(
        F.collect_list(
            F.struct(*[F.col(c) for c in order_cols], F.col(value_col))
        )
    )
    grouped = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.transform(arr, lambda s: s[value_col].cast("double")).alias("__vs"),
    )
    vs = F.col("__vs")

    def fold_mean(start: int) -> "F.Column":
        return (
            F.aggregate(
                F.slice(vs, start, m), F.lit(0.0), lambda acc, x: acc + x
            )
            / F.lit(float(m))
        )

    l0 = fold_mean(1)
    b0 = (fold_mean(m + 1) - fold_mean(1)) / F.lit(float(m))
    s0 = F.transform(F.slice(vs, 1, m), lambda x: x - l0)

    def step(acc, xi):
        v = xi["v"]
        slot = xi["i"]  # 0-based seasonal slot
        s_old = F.element_at(acc["s"], slot + 1)
        l_new = F.lit(a) * (v - s_old) + F.lit(1.0 - a) * (
            acc["l"] + acc["b"]
        )
        return F.struct(
            l_new.alias("l"),
            (
                F.lit(b_) * (l_new - acc["l"]) + F.lit(1.0 - b_) * acc["b"]
            ).alias("b"),
            F.transform(
                acc["s"],
                lambda sv, j: F.when(
                    j == slot,
                    F.lit(g) * (v - l_new) + F.lit(1.0 - g) * sv,
                ).otherwise(sv),
            ).alias("s"),
            (acc["l"] + acc["b"] + s_old).alias("f"),
        )

    tail = F.transform(
        F.slice(vs, m + 1, F.size(vs) - m),
        lambda x, i: F.struct(x.alias("v"), (i % m).alias("i")),
    )
    init = F.struct(
        l0.alias("l"),
        b0.alias("b"),
        s0.alias("s"),
        F.lit(None).cast("double").alias("f"),
    )
    fin = F.aggregate(tail, init, step)
    last = F.element_at(vs, -1)
    next_slot = (F.col("n_events") % m).cast("int")  # 0-based
    return (
        grouped.filter(F.col("n_events") >= 2 * m + 1)
        .select(
            key_col,
            "n_events",
            F.round(last, 6).alias("last_value"),
            F.round(fin["l"], 6).alias("level"),
            F.round(fin["b"], 6).alias("trend"),
            F.round(
                F.element_at(fin["s"], next_slot + 1), 6
            ).alias("season_next"),
            F.round(
                fin["l"] + fin["b"] + F.element_at(fin["s"], next_slot + 1),
                6,
            ).alias("forecast_next"),
            F.round(last - fin["f"], 6).alias("deviation"),
        )
    )
