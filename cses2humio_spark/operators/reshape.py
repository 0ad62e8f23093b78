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
