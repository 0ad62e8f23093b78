"""Data-quality expectations (a deequ-style contract checker): declare
checks against a DataFrame, get back one (check, observed, passed) row per
check — the gate a 100 TB ingest pipeline runs before promoting a batch.

Design: every metric that is expressible as an aggregate is computed in
ONE wide pass (a single scan + one shuffle of partial states, like the
column profiler); only multi-table checks (foreign-key orphans) add their
own anti-join. Nothing is collected except the final report (one row per
check).

Check kinds:
- ``("row_count_min", n)``                 — COUNT(*) >= n
- ``("null_fraction_max", col, f)``        — null share of col <= f
- ``("unique", col)``                      — col has no duplicate values
- ``("domain", col, values)``              — every col value ∈ values
- ``("range", col, lo, hi)``               — min/max of col within [lo, hi]
- ``("fk", col, dim_df, dim_col)``         — no orphan col values vs dim
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expectations_report(df: DataFrame, checks: list[tuple]) -> DataFrame:
    """Evaluate ``checks`` against ``df``; returns (check, observed,
    passed) with observed rendered as a string (engine-portable) and
    passed as int 0/1."""
    aggs: list = []
    names: list[str] = []
    conds: list = []  # SQL boolean over the wide row, as Column

    n_rows = F.count(F.lit(1)).cast("bigint")
    fk_reports: list[DataFrame] = []

    for chk in checks:
        kind = chk[0]
        if kind == "row_count_min":
            _, n = chk
            names.append(f"row_count_min:{n}")
            aggs.append(n_rows.alias(f"m{len(names)}"))
            conds.append(F.col(f"m{len(names)}") >= n)
        elif kind == "null_fraction_max":
            _, col, frac = chk
            names.append(f"null_fraction_max:{col}:{frac}")
            aggs.append(
                F.round(
                    F.sum(F.col(col).isNull().cast("int"))
                    / F.count(F.lit(1)),
                    6,
                ).alias(f"m{len(names)}")
            )
            conds.append(F.col(f"m{len(names)}") <= frac)
        elif kind == "unique":
            _, col = chk
            names.append(f"unique:{col}")
            # duplicates = rows - distinct values; count_distinct excludes
            # ALL nulls, so even a single NULL row fails the check (the
            # oracle SQL mirrors the same formula)
            aggs.append(
                (F.count(F.lit(1)) - F.count_distinct(F.col(col)))
                .cast("bigint")
                .alias(f"m{len(names)}")
            )
            conds.append(F.col(f"m{len(names)}") == 0)
        elif kind == "domain":
            _, col, values = chk
            names.append(f"domain:{col}")
            aggs.append(
                F.sum((~F.col(col).isin(*values)).cast("int"))
                .cast("bigint")
                .alias(f"m{len(names)}")
            )
            conds.append(F.col(f"m{len(names)}") == 0)
        elif kind == "range":
            _, col, lo, hi = chk
            names.append(f"range:{col}:{lo}:{hi}")
            aggs.append(
                F.sum(
                    ((F.col(col) < lo) | (F.col(col) > hi)).cast("int")
                )
                .cast("bigint")
                .alias(f"m{len(names)}")
            )
            conds.append(F.col(f"m{len(names)}") == 0)
        elif kind == "fk":
            _, col, dim_df, dim_col = chk
            # orphan count needs the dim side: its own anti-join report row
            orphans = (
                df.join(
                    F.broadcast(
                        dim_df.select(F.col(dim_col).alias(col)).distinct()
                    ),
                    on=col,
                    how="left_anti",
                )
                .agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
                .select(
                    F.lit(f"fk:{col}").alias("check"),
                    F.col("observed").cast("string").alias("observed"),
                    (F.col("observed") == 0).cast("int").alias("passed"),
                )
            )
            fk_reports.append(orphans)
        else:
            raise ValueError(f"unknown check kind {kind!r}")

    report = None
    if aggs:
        # ONE wide aggregation row, exploded into one report row per
        # check — the scan happens once, not once per check
        wide = df.agg(*aggs)
        structs = [
            F.struct(
                F.lit(name).alias("check"),
                F.col(f"m{i + 1}").cast("string").alias("observed"),
                cond.cast("int").alias("passed"),
            )
            for i, (name, cond) in enumerate(zip(names, conds))
        ]
        report = wide.select(
            F.explode(F.array(*structs)).alias("r")
        ).select("r.check", "r.observed", "r.passed")
    for fk in fk_reports:
        report = fk if report is None else report.unionByName(fk)
    if report is None:
        raise ValueError("no checks given")
    return report
