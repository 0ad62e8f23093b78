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
