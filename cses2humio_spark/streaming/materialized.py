"""Incremental materialized-view maintenance over a micro-batch stream:
a ``foreachBatch`` sink that keeps a parquet-backed per-key rollup
(count + sum) current as batches arrive, with EXACTLY-ONCE semantics
under micro-batch replay.

Structured Streaming's own parquet sink is append-only; a maintained
aggregate needs merge-on-write. The standard production answer is a
transactional table format (Delta/Iceberg ``MERGE INTO``); this module
implements the same contract on plain parquet with the minimal
transaction machinery:

- every applied batch writes a FULL new table version to
  ``<dir>/v=<batch_id>`` (versions are immutable — no in-place update);
- a one-line ``_LATEST`` pointer file is switched via ``os.replace``
  (atomic on POSIX), so readers always see a complete version;
- replayed batches (crash after merge, before checkpoint commit — the
  at-least-once window) are detected by ``batch_id <= latest`` and
  skipped, upgrading foreachBatch's at-least-once to exactly-once.

Scale: the merge unions the CURRENT rollup (|keys| rows) with the batch
DELTA (pre-aggregated map-side, so the shuffle carries per-key partials,
never raw events) and re-aggregates — O(|keys|) per batch, independent
of stream volume. For key spaces too large to rewrite per batch, the
same pattern applies per hash-bucket subdirectory (rewrite only buckets
the delta touches); the version-pointer commit is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IncrementalRollup:
    """foreachBatch callable maintaining ``(key, n_rows, total)`` per key.

    ``read(spark)`` returns the current rollup (empty DataFrame before the
    first batch commits).
    """

    def __init__(self, table_dir: str, key_col: str, value_col: str):
        self.table_dir = table_dir
        self.key_col = key_col
        self.value_col = value_col
        os.makedirs(table_dir, exist_ok=True)

    # -- version pointer ---------------------------------------------------

    @property
    def _pointer(self) -> str:
        return os.path.join(self.table_dir, "_LATEST")

    def latest_batch_id(self) -> int | None:
        try:
            with open(self._pointer, encoding="ascii") as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def _commit(self, batch_id: int) -> None:
        tmp = self._pointer + ".tmp"
        with open(tmp, "w", encoding="ascii") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, self._pointer)  # atomic pointer switch

    # -- read / merge ------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame:
        latest = self.latest_batch_id()
        if latest is None:
            return spark.createDataFrame(
                [], f"{self.key_col} string, n_rows bigint, total double"
            )
        return spark.read.parquet(os.path.join(self.table_dir, f"v={latest}"))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        latest = self.latest_batch_id()
        if latest is not None and batch_id <= latest:
            # replayed micro-batch: its effect is already in the table
            return
        delta = batch_df.groupBy(self.key_col).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col(self.value_col).cast("double")).alias("total"),
        )
        current = self.read(batch_df.sparkSession)
        merged = (
            current.unionByName(delta)
            .groupBy(self.key_col)
            .agg(
                F.sum("n_rows").cast("bigint").alias("n_rows"),
                F.sum("total").alias("total"),
            )
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(self.table_dir, f"v={batch_id}")
        )
        self._commit(batch_id)
