"""Reshape operators: dynamic map → columns (SURVEY.md §7.5) and the
relational value pivot.

The reference flattens AuditKeyValues into top-level event keys per record
(app.py:123-127) — a row-local operation with no fixed schema. A DataFrame
needs one schema for all rows, so the streaming path keeps attributes as
``map<string,string>`` and this batch operator performs the promised
two-pass pivot: pass 1 discovers the key universe, pass 2 projects one
column per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_map_to_columns(
    df: DataFrame,
    map_col: str,
    max_keys: int = 1000,
    keep: list[str] | None = None,
) -> DataFrame:
    """Batch flatten of a ``map<string,string>`` column into one column per
    distinct key (SURVEY.md §7.5 "pivot-to-columns only in batch via
    two-pass key discovery").

    Pass 1 (distributed): ``explode(map_keys) -> distinct`` — a shuffle of
    the key universe only, never the values. The collected key set IS the
    output schema, so it must be driver-sized: ``max_keys`` guards against
    unbounded-cardinality maps (at 100 TB a million-key map is a data bug,
    not a schema). Pass 2: one ``element_at`` projection per key — a single
    narrow map stage over the data.

    Keys become columns in sorted order (deterministic schema regardless of
    partition layout). ``keep`` lists pass-through columns (default: all
    non-map columns)."""
    keys_rows = (
        df.select(F.explode(F.map_keys(F.col(map_col))).alias("__k"))
        .distinct()
        .limit(max_keys + 1)
        .collect()
    )
    keys = sorted(r["__k"] for r in keys_rows)
    if len(keys) > max_keys:
        raise ValueError(
            f"{map_col!r} has more than max_keys={max_keys} distinct keys; "
            "refusing to build an unbounded schema"
        )
    base = keep if keep is not None else [c for c in df.columns if c != map_col]
    # a map key may collide with a pass-through column (arbitrary event
    # attributes vs envelope columns) — deterministically prefix those so
    # the output never carries duplicate names
    taken = set(base)
    return df.select(
        *base,
        *[
            F.element_at(F.col(map_col), F.lit(k)).alias(
                k if k not in taken else f"{map_col}_{k}"
            )
            for k in keys
        ],
    )


def compact_for_scan(
    df: DataFrame,
    out_path: str,
    sort_col: str,
    n_files: int | None = None,
) -> None:
    """Write a scan-optimized parquet layout: range-partition by
    ``sort_col`` then sort within partitions before writing.

    Each output file then covers a DISJOINT range of ``sort_col``, so its
    parquet min/max statistics become effective zone maps: a reader with a
    ``sort_col`` predicate skips every non-overlapping file/row-group
    without touching data. This is the write-side half of predicate
    pushdown — at 100 TB, time-range queries over an events table laid out
    this way read only the matching slice. (The daily compaction job shape:
    ``repartitionByRange(ts).sortWithinPartitions(ts).write``.)"""
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(out_path)
    )


def zorder_key(
    df: DataFrame,
    cols: "list[str]",
    bits: int = 6,
    rel_err: float = 0.01,
) -> "F.Column":
    """Z-order (Morton) sort key over numeric columns — the multi-column
    zone-map clustering used by lakehouse OPTIMIZE jobs. Each column is
    rank-bucketed into 2^bits quantile buckets (boundaries from a
    sample-based ``approxQuantile`` — driver cost is 2^bits doubles, no
    extra shuffle), then bucket bits are interleaved so that rows close in
    the key are close in EVERY dimension. Files written in z-key order get
    tight per-file min/max on all ``cols`` at once, where a single-column
    sort only narrows its own column (measured in
    test_scale.py::test_zorder_layout_narrows_all_columns).

    The bucketing comparisons and bit interleave are pure integer codegen
    expressions; quantile (not value-range) bucketing makes the curve
    robust to skew. bits * len(cols) must fit a bigint (<= 62)."""
    if bits * len(cols) > 62:
        raise ValueError(
            f"bits*len(cols) must be <= 62, got {bits}*{len(cols)}"
        )
    n_bounds = (1 << bits) - 1
    probs = [(i + 1) / (1 << bits) for i in range(n_bounds)]
    z = F.lit(0).cast("bigint")
    n = len(cols)
    # ONE multi-column approxQuantile pass — a per-column loop would scan
    # the full input len(cols) times before the write starts
    all_bounds = df.stat.approxQuantile(list(cols), probs, rel_err)
    for i, c in enumerate(cols):
        bounds = all_bounds[i]
        idx = F.lit(0).cast("bigint")
        for b in bounds:
            idx = idx + (F.col(c) > F.lit(b)).cast("bigint")
        for bit in range(bits):
            z = z + (
                F.shiftright(idx, bit).bitwiseAND(F.lit(1))
                * F.lit(1 << (bit * n + i)).cast("bigint")
            )
    return z


def compact_zordered(
    df: DataFrame,
    out_path: str,
    cols: "list[str]",
    bits: int = 6,
    n_files: int | None = None,
) -> None:
    """Write a z-order-clustered parquet layout: range-partition + sort by
    the interleaved key so each file covers a compact region of the
    multi-dimensional space — predicates on ANY of ``cols`` skip most
    files via parquet min/max, the multi-column generalization of
    ``compact_for_scan``."""
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    zk = zorder_key(df, cols, bits=bits)
    (
        df.withColumn("__zk", zk)
        .repartitionByRange(n, F.col("__zk"))
        .sortWithinPartitions("__zk")
        .drop("__zk")
        .write.mode("overwrite")
        .parquet(out_path)
    )
