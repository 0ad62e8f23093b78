"""Stream-stream interval join (SURVEY.md §2.2 joins: "interval/time-window
join (stream-stream)").

The shape: two watermarked event-time streams, an equi key, and a time-bound
condition ``right_ts ∈ [left_ts + lower, left_ts + upper]``. Spark keeps
both sides in keyed state and evicts rows once the watermark passes the
bound — state is bounded by ``watermark + (upper - lower)`` per key, which
is what makes the operator safe on an unbounded 100 TB/day feed (the naive
alternative, buffering one side fully, is unbounded)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "event_time",
    right_ts: str = "probe_time",
    watermark: str = "1 minute",
    upper: str = "5 minutes",
) -> DataFrame:
    """Inner interval join: each left event matches right events with the
    same ``key`` arriving within ``[left_ts, left_ts + upper]``.

    Both inputs must carry distinct timestamp column names. The equi key
    keeps the join a state-store hash lookup (co-partitioned by key), never
    a cross product; the interval bound drives state eviction.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join — the workhorse production shape: an
    unbounded stream joined to a bounded dimension (user directory, asset
    inventory, threat-intel list). Stateless: each micro-batch joins
    against the CURRENT dim snapshot, so no watermark and no state store
    (unlike stream-stream); a dim backed by a mutable source (Delta/parquet
    re-read) picks up updates per batch.

    ``broadcast_dim=True`` ships the dimension to every executor once per
    batch — the right default while the dim fits the broadcast budget; at
    100 TB the fact side never shuffles for this join at all. Only left /
    inner are allowed: right/full outer against a static side is not
    supported by Structured Streaming (results would retroactively change
    as the stream progresses).
    """
    if how not in ("left", "inner"):
        raise ValueError(
            f"stream-static join supports how='left'|'inner', got {how!r}"
        )
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=key, how=how)
