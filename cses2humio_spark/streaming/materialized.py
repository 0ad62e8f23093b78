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
  skipped, upgrading foreachBatch's at-least-once to exactly-once;
- superseded versions are pruned after each commit (``keep_versions``
  retained), so disk stays O(keep_versions x |keys|) for unbounded
  streams instead of growing per batch.

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

    def __init__(
        self,
        table_dir: str,
        key_col: str,
        value_col: str,
        key_type: str = "string",
        keep_versions: int = 2,
    ):
        if keep_versions < 1:
            raise ValueError(f"keep_versions must be >= 1, got {keep_versions}")
        self.table_dir = table_dir
        self.key_col = key_col
        self.value_col = value_col
        # the empty pre-first-commit frame must carry the REAL key type:
        # unionByName would otherwise widen a typed key against string and
        # silently store string keys forever
        self.key_type = key_type
        # superseded immutable versions are pruned after each commit,
        # keeping the pointer target plus keep_versions-1 predecessors
        # (readers of an in-flight older version finish before it ages out)
        self.keep_versions = keep_versions
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
                [], f"{self.key_col} {self.key_type}, n_rows bigint, total double"
            )
        return spark.read.parquet(os.path.join(self.table_dir, f"v={latest}"))

    def _prune_versions(self, committed: int) -> None:
        import re
        import shutil

        keep_floor = []
        for name in os.listdir(self.table_dir):
            m = re.fullmatch(r"v=(\d+)", name)
            if m:
                keep_floor.append(int(m.group(1)))
        keep_floor.sort(reverse=True)
        for vid in keep_floor[self.keep_versions :]:
            if vid < committed:  # never touch the pointer target or newer
                shutil.rmtree(
                    os.path.join(self.table_dir, f"v={vid}"), ignore_errors=True
                )

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
        self._prune_versions(batch_id)
