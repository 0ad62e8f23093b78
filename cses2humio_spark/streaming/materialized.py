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


class MaterializedHqlSearch(IncrementalRollup):
    """A saved HQL search maintained as a LIVE TABLE — the dashboard half
    of the reference's delegated workflow (alerts fire, dashboards read a
    current aggregate). The pipe must end in a ``groupBy`` whose
    aggregates are MERGEABLE (count without distinct, sum, min, max):
    each micro-batch contributes a pre-aggregated delta (map-side
    partials; raw events never reach the merge), merged into the current
    version with the aggregate's own merge function (sum-of-counts,
    sum-of-sums, min-of-mins, max-of-maxes). Versioned-pointer commits
    and replay skipping are inherited — exactly-once under micro-batch
    replay, same as IncrementalRollup.

    Non-mergeable aggregates (avg, percentile, count distinct, stddev)
    are REFUSED loudly at construction: silently maintaining a wrong
    average would be the worst dashboard failure mode. (avg = maintain
    sum + count and divide at read time; distinct needs a sketch — both
    are deliberate future surface, not silent approximations.)

    Merge-order caveat: sums are merged as doubles across versions, so a
    float sum's last bits depend on batch boundaries; integer-valued
    measures (counts, cents) are exact. Same contract as any incremental
    rollup.
    """

    def __init__(
        self,
        table_dir: str,
        query: str,
        tables: dict[str, DataFrame] | None = None,
        keep_versions: int = 2,
    ):
        from cses2humio_spark.hql import Call, parse

        if keep_versions < 1:
            raise ValueError(f"keep_versions must be >= 1, got {keep_versions}")
        stages = parse(query)
        if not stages or not (
            isinstance(stages[-1], Call) and stages[-1].name == "groupBy"
        ):
            raise ValueError(
                "MaterializedHqlSearch: the pipe must end in groupBy(...)"
            )
        gb = stages[-1]
        keys = gb.args[0] if gb.args else []
        keys = keys if isinstance(keys, list) else [keys]
        if not keys:
            raise ValueError("MaterializedHqlSearch: groupBy needs key fields")
        funcs = gb.kwargs.get("function", Call("count"))
        funcs = funcs if isinstance(funcs, list) else [funcs]
        specs: list[tuple[str, str | None, str]] = []
        for c in funcs:
            if not isinstance(c, Call):
                raise ValueError("groupBy function= entries must be aggs")
            if c.name == "count":
                if str(c.kwargs.get("distinct", "false")).lower() == "true":
                    raise ValueError(
                        "count(distinct=true) is not mergeable across "
                        "batches — refusing to maintain a wrong answer"
                    )
                specs.append(("count", c.args[0] if c.args else None,
                              c.kwargs.get("as") or "_count"))
            elif c.name in ("sum", "min", "max"):
                if not c.args:
                    raise ValueError(f"{c.name}() needs a field")
                specs.append(
                    (c.name, c.args[0], c.kwargs.get("as") or f"_{c.name}")
                )
            else:
                raise ValueError(
                    f"aggregate {c.name!r} is not mergeable across "
                    "micro-batches (mergeable: count/sum/min/max)"
                )
        aliases = [a for _, _, a in specs]
        if len(set(aliases)) != len(aliases):
            raise ValueError(
                f"duplicate aggregate aliases {aliases} — use as= to "
                "disambiguate"
            )
        self.table_dir = table_dir
        self.keep_versions = keep_versions
        self._prefix = stages[:-1]
        self._keys = [str(k) for k in keys]
        self._specs = specs
        self._tables = tables or {}
        os.makedirs(table_dir, exist_ok=True)

    def _delta(self, batch_df: DataFrame) -> DataFrame:
        from cses2humio_spark.hql import _compile_stage

        df = batch_df
        for st in self._prefix:
            df = _compile_stage(df, st, self._tables, root=batch_df)
        aggs = []
        for kind, field, alias in self._specs:
            if kind == "count":
                col = (
                    F.count(F.col(field)) if field else F.count(F.lit(1))
                ).cast("bigint")
            elif kind == "sum":
                col = F.sum(F.col(field).cast("double"))
            elif kind == "min":
                col = F.min(F.col(field))
            else:
                col = F.max(F.col(field))
            aggs.append(col.alias(alias))
        return df.groupBy(*[F.col(k) for k in self._keys]).agg(*aggs)

    def read(self, spark: SparkSession) -> DataFrame:
        latest = self.latest_batch_id()
        if latest is None:
            raise ValueError(
                f"{self.table_dir}: no committed version yet — the search "
                "has not processed a batch"
            )
        return spark.read.parquet(os.path.join(self.table_dir, f"v={latest}"))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        latest = self.latest_batch_id()
        if latest is not None and batch_id <= latest:
            return  # replayed micro-batch: already merged
        delta = self._delta(batch_df)
        if latest is None:
            merged = delta
        else:
            merge = {
                "count": F.sum, "sum": F.sum, "min": F.min, "max": F.max,
            }
            current = self.read(batch_df.sparkSession)
            merged = current.unionByName(delta).groupBy(
                *[F.col(k) for k in self._keys]
            ).agg(
                *[
                    (merge[kind](alias).cast("bigint") if kind == "count"
                     else merge[kind](alias)).alias(alias)
                    for kind, _f, alias in self._specs
                ]
            )
        merged.write.mode("overwrite").parquet(
            os.path.join(self.table_dir, f"v={batch_id}")
        )
        self._commit(batch_id)
        self._prune_versions(batch_id)
