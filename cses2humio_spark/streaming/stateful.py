"""Custom stateful per-key streaming operators (SURVEY.md §2.2
"stateful per-key processing") via ``applyInPandasWithState``.

``running_user_totals`` keeps a per-user (count, sum-cents) accumulator
across micro-batches — the shape of any custom sessionization / rate
tracking the built-in windows can't express. State lives in the state
store (RocksDB/HDFS-backed on a cluster), partitioned by key: scale-out is
by key hash, identical to a streaming aggregation.

The state function is self-contained (stdlib+pandas only inside) so
executor workers never need this package on sys.path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "user string, batch_events bigint, total_events bigint, total_cents bigint"
STATE_SCHEMA = "total_events bigint, total_cents bigint"


def running_user_totals(enveloped: DataFrame) -> DataFrame:
    """Per-user running totals over the enriched envelope stream.
    Input needs columns: attributes.event['user'] and timestamp."""
    from pyspark.sql import functions as F

    keyed = enveloped.select(
        F.col("attributes.event")["user"].alias("user"),
        F.coalesce(
            F.col("attributes.event")["cents"].cast("bigint"), F.lit(0)
        ).alias("cents"),
    )

    def update(key, pdfs, state):
        import pandas as _pd

        total_events, total_cents = (
            state.get if state.exists else (0, 0)
        )
        batch_events = 0
        for pdf in pdfs:
            batch_events += len(pdf)
            total_events += len(pdf)
            total_cents += int(pdf["cents"].sum())
        state.update((total_events, total_cents))
        yield _pd.DataFrame(
            {
                "user": [key[0]],
                "batch_events": [batch_events],
                "total_events": [total_events],
                "total_cents": [total_cents],
            }
        )

    return keyed.groupBy("user").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_tws(enveloped: DataFrame) -> DataFrame:
    """Spark 4 ``transformWithStateInPandas`` formulation of the same
    per-user accumulator — the successor API to applyInPandasWithState:
    typed state handles (ValueState here; List/Map available), explicit
    init/close lifecycle, and timer support for timeout-driven emission.
    Kept alongside the classic form so both stateful surfaces are pinned.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    keyed = enveloped.select(
        F.col("attributes.event")["user"].alias("user"),
        F.coalesce(
            F.col("attributes.event")["cents"].cast("bigint"), F.lit(0)
        ).alias("cents"),
    )

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "total_events bigint, total_cents bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as _pd

            if self._totals.exists():
                total_events, total_cents = self._totals.get()
            else:
                total_events, total_cents = 0, 0
            batch_events = 0
            for pdf in rows:
                batch_events += len(pdf)
                total_events += len(pdf)
                total_cents += int(pdf["cents"].sum())
            self._totals.update((total_events, total_cents))
            yield _pd.DataFrame(
                {
                    "user": [key[0]],
                    "batch_events": [batch_events],
                    "total_events": [total_events],
                    "total_cents": [total_cents],
                }
            )

        def close(self) -> None:
            pass

    return keyed.groupBy("user").transformWithStateInPandas(
        statefulProcessor=_Totals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


KMEANS_OUTPUT_SCHEMA = "cid int, n bigint, batch_n bigint, centroid array<double>"
KMEANS_STATE_SCHEMA = "n bigint, sums array<double>"


def streaming_kmeans(vectors: DataFrame, seeds: list[list[float]]) -> DataFrame:
    """Streaming k-means (incremental centroid maintenance): each arriving
    vector is assigned to its nearest SEED centroid — the same join-free
    literal-centroid projection (and lowest-id tiebreak) as the batch
    ``kmeans_fit`` assignment step — and per-cluster state accumulates
    (count, per-dimension sums); after every micro-batch each touched
    cluster emits its evolving running-mean centroid.

    This is the batch update step unrolled over an unbounded stream: after
    any prefix of the stream, cluster ``cid``'s emitted centroid equals
    exactly what one Lloyd update over all data seen so far would produce
    (bit-identical when component sums are float64-exact, e.g. integer
    grids — pinned in tests against the batch twin). Assignment centroids
    stay fixed (the seeds): re-deriving assignment centroids mid-stream
    would make results depend on batch boundaries, which is precisely the
    non-determinism the batch twin's oracle forbids. For drift-following
    mini-batch k-means (Sculley), re-run the batch ``kmeans_fit``
    periodically and restart the stream with the new seeds — the
    checkpoint keys state by cluster id, so new seeds mean a new
    checkpoint, never silently mixed state.

    Scale: state is k rows of (bigint, dim doubles) TOTAL — independent of
    stream length; the shuffle per batch carries one row per vector keyed
    by cid (k reducers; skew-safe because per-key work is a columnar sum).

    Input needs columns: ``vec_id`` (any id) and ``embedding``
    (array<float/double>).
    """
    from pyspark.sql import functions as F

    from cses2humio_spark.operators.clustering import assign_to_nearest

    dim = len(seeds[0])
    keyed = vectors.select(
        assign_to_nearest(
            F.col("embedding").cast("array<double>"), seeds
        ).alias("cid"),
        F.col("embedding").cast("array<double>").alias("v"),
    )

    def update(key, pdfs, state):
        import pandas as _pd

        if state.exists:
            n, sums = state.get
            sums = list(sums)
        else:
            n, sums = 0, [0.0] * dim
        batch_n = 0
        for pdf in pdfs:
            for v in pdf["v"]:
                batch_n += 1
                # dimension-by-dimension accumulation in input order —
                # the same left-to-right float64 addition as the batch
                # update's partial sums
                for j in range(dim):
                    sums[j] += float(v[j])
        n += batch_n
        state.update((n, sums))
        yield _pd.DataFrame(
            {
                "cid": [key[0]],
                "n": [n],
                "batch_n": [batch_n],
                "centroid": [[s / n for s in sums]],
            }
        )

    return keyed.groupBy("cid").applyInPandasWithState(
        update,
        outputStructType=KMEANS_OUTPUT_SCHEMA,
        stateStructType=KMEANS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def minibatch_kmeans_sink(
    seeds: list[list[float]],
    learning_schedule: str = "harmonic",
):
    """Drift-following mini-batch k-means (Sculley, WWW'10) as a
    foreachBatch sink factory — the complement of ``streaming_kmeans``:
    there the ASSIGNMENT centroids stay fixed (exact, oracle-checkable
    running means); here they MOVE with the data, tracking cluster drift
    on an unbounded stream.

    Per micro-batch: assign each vector to the nearest CURRENT centroid
    (join-free literal projection, executed on the cluster), pull back
    only the per-cluster (count, per-dim mean) — k rows — and apply the
    standard per-center learning-rate update on the driver:
    ``c += eta * (batch_mean - c)`` with ``eta = batch_n / total_n``
    (harmonic: exact streaming mean when data is stationary) or a constant
    (exponential forgetting for drift).

    Centroids are k x dim driver floats — the same driver-state posture as
    batch ``kmeans_fit``; the per-batch cluster work is one scan + one
    k-group partial agg. Results depend on batch boundaries BY DESIGN
    (that is what "follows drift" means), so this is test-pinned
    (deterministic under maxFilesPerTrigger=1) rather than oracle-paired.

    Returns (sink, state): pass ``sink`` to ``foreachBatch``; ``state``
    exposes ``centroids`` (list of k lists) and ``counts`` (per-cluster
    totals) for inspection after the stream drains.
    """
    if learning_schedule not in ("harmonic",) and not isinstance(
        learning_schedule, float
    ):
        raise ValueError(
            "learning_schedule must be 'harmonic' or a float eta, "
            f"got {learning_schedule!r}"
        )

    from pyspark.sql import functions as F

    from cses2humio_spark.operators.clustering import assign_to_nearest

    dim = len(seeds[0])
    state = {
        "centroids": [list(map(float, c)) for c in seeds],
        "counts": [0] * len(seeds),
    }

    def sink(batch_df, batch_id) -> None:
        cents = state["centroids"]
        assigned = batch_df.select(
            assign_to_nearest(
                F.col("embedding").cast("array<double>"), cents
            ).alias("cid"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
        rows = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.avg("val").alias("mean"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        per_cid: dict[int, dict[int, float]] = {}
        n_cid: dict[int, int] = {}
        for r in rows:
            per_cid.setdefault(r["cid"], {})[r["pos"]] = r["mean"]
            n_cid[r["cid"]] = r["n"]
        for cid, means in per_cid.items():
            bn = n_cid[cid]
            state["counts"][cid] += bn
            if learning_schedule == "harmonic":
                eta = bn / state["counts"][cid]
            else:
                eta = float(learning_schedule)
            c = cents[cid]
            for j in range(dim):
                c[j] += eta * (means[j] - c[j])

    return sink, state


CUSUM_OUT_SCHEMA = (
    "user bigint, n_events bigint, cusum double, max_cusum double, "
    "n_alarms bigint"
)
CUSUM_STATE_SCHEMA = "s double, smax double, n_events bigint, n_alarms bigint"


def streaming_cusum(
    keyed: DataFrame, drift_k: float, alarm_h: float
) -> DataFrame:
    """Streaming twin of ``operators/drift.py::cusum_per_key``: the
    one-sided CUSUM recurrence maintained ACROSS micro-batches via
    ``applyInPandasWithState`` — state is four scalars per key, so the
    state store stays O(keys) no matter how long the stream runs.

    Input: columns (user bigint, ts, value). Rows are scanned in ts
    order WITHIN each batch; cross-batch order is the stream's arrival
    order (the replayed-source contract — same as any event-time-
    sequential stateful op without a watermark reorder buffer). Because
    the update uses only IEEE-exact ops, a stream chunked ANY way over
    time-ordered input produces bit-identical state to the batch scan —
    pinned by test_streaming_cusum_matches_batch_scan."""
    kd, hh = float(drift_k), float(alarm_h)

    def update(key, pdfs, state):
        import pandas as _pd

        s, smax, n_events, n_alarms = (
            state.get if state.exists else (0.0, 0.0, 0, 0)
        )
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts"], kind="mergesort")
            for xi in pdf["value"].astype("float64"):
                s = s + (xi - kd)
                if s < 0.0:
                    s = 0.0
                if s > smax:
                    smax = s
                if s > hh:
                    n_alarms += 1
                n_events += 1
        state.update((s, smax, n_events, n_alarms))
        yield _pd.DataFrame(
            {
                "user": [int(key[0])],
                "n_events": [n_events],
                "cusum": [s],
                "max_cusum": [smax],
                "n_alarms": [n_alarms],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout as _GST

    return keyed.groupBy("user").applyInPandasWithState(
        update,
        outputStructType=CUSUM_OUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=_GST.NoTimeout,
    )


SESSION_OUT_SCHEMA = (
    "user bigint, session_start_us bigint, session_end_us bigint, "
    "n_events bigint"
)
SESSION_STATE_SCHEMA = "start_us bigint, last_us bigint, n_events bigint"


def _make_session_update(gap_seconds: int):
    """Per-key applyInPandasWithState update for gap sessionization —
    module-level factory so the timer-clamp branch is unit-testable with
    a fake GroupState (the real trigger needs a watermark race)."""
    gap_us = int(gap_seconds) * 1_000_000

    def update(key, pdfs, state):
        import pandas as _pd

        closed: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            closed.append((start_us, last_us, n))
            state.remove()
        else:
            start_us = None
            if state.exists:
                start_us, last_us, n = state.get
            for pdf in pdfs:
                pdf = pdf.sort_values("ts", kind="mergesort")
                for ts in pdf["ts"]:
                    us = ts.value // 1000  # pandas ns -> us
                    if start_us is None:
                        start_us, last_us, n = us, us, 1
                    elif us - last_us > gap_us:
                        closed.append((start_us, last_us, n))
                        start_us, last_us, n = us, us, 1
                    else:
                        if us > last_us:
                            last_us = us
                        n += 1
            if start_us is not None:
                timer_ms = last_us // 1000 + int(gap_seconds) * 1000
                # Spark refuses a timeout timestamp <= the current
                # watermark (IllegalArgumentException kills the query). A
                # batch of late-but-in-watermark rows can yield last+gap
                # already behind the watermark — that session is over by
                # definition, so close it inline instead of arming.
                wm_ms = state.getCurrentWatermarkMs()
                if wm_ms > 0 and timer_ms <= wm_ms:
                    closed.append((start_us, last_us, n))
                    if state.exists:
                        state.remove()
                else:
                    state.update((start_us, last_us, n))
                    # arm the event-time timer: fire when wm > last+gap
                    state.setTimeoutTimestamp(timer_ms)
        if closed:
            yield _pd.DataFrame(
                {
                    "user": [int(key[0])] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return update


def streaming_sessionize_timeout(
    keyed: DataFrame, gap_seconds: int, watermark_delay: str = "10 seconds"
) -> DataFrame:
    """Gap-based sessionization with TIMER-driven final emission: the
    streaming twin of ``operators/windows.py::sessionize`` that solves the
    problem batch logic can't — a session is only known CLOSED when no
    event arrives for ``gap_seconds``, which on a stream is an absence of
    data, not a row. The state store keeps (start, last, n) per key; every
    update arms an EVENT-TIME timeout at ``last + gap``; when the
    watermark passes it, the function fires with ``state.hasTimedOut`` and
    the finished session is emitted exactly once (APPEND semantics).

    In-stream closure needs no timer: a row that lands more than ``gap``
    after ``last`` closes the previous session inline and starts the next.
    Rows are scanned in event-time order within a batch; cross-batch order
    is the stream's replay order (same contract as streaming_cusum).

    Emits epoch-MICROSECOND bounds (engine-portable, no timestamp-repr
    drift). State is three bigints per ACTIVE key and the timeout clears
    it — at 100 TB/day the store holds only keys active within one gap,
    not the key universe.
    """
    from pyspark.sql import functions as F

    keyed = keyed.select("user", "ts").withWatermark("ts", watermark_delay)
    update = _make_session_update(gap_seconds)

    return keyed.groupBy("user").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_sessionize_tws(
    keyed: DataFrame, gap_seconds: int, watermark_delay: str = "10 seconds"
) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of
    ``streaming_sessionize_timeout`` using the REAL timer API
    (``registerTimer`` / ``handleExpiredTimer``) instead of the classic
    single-timeout conf: timers are explicit, per-key, and re-armed on
    every update (``deleteTimer`` of the stale one first — TWS allows many
    live timers per key, unlike the one-slot GroupState timeout). Same
    output contract and APPEND semantics. Requires google.protobuf at
    runtime (the TWS state-server protocol); tests importorskip."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    keyed = keyed.select("user", "ts").withWatermark("ts", watermark_delay)
    gap_us = int(gap_seconds) * 1_000_000
    gap_ms = int(gap_seconds) * 1000

    class _Sessions(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._sess = handle.getValueState(
                "sess", "start_us bigint, last_us bigint, n_events bigint"
            )
            self._handle = handle

        def handleInputRows(self, key, rows, timerValues):
            import pandas as _pd

            closed: list[tuple[int, int, int]] = []
            start_us = None
            if self._sess.exists():
                start_us, last_us, n = self._sess.get()
                # re-arming: drop the stale timer before registering the
                # new one so exactly one live timer tracks the session
                self._handle.deleteTimer(last_us // 1000 + gap_ms)
            for pdf in rows:
                pdf = pdf.sort_values("ts", kind="mergesort")
                for ts in pdf["ts"]:
                    us = ts.value // 1000
                    if start_us is None:
                        start_us, last_us, n = us, us, 1
                    elif us - last_us > gap_us:
                        closed.append((start_us, last_us, n))
                        start_us, last_us, n = us, us, 1
                    else:
                        if us > last_us:
                            last_us = us
                        n += 1
            if start_us is not None:
                self._sess.update((start_us, last_us, n))
                self._handle.registerTimer(last_us // 1000 + gap_ms)
            if closed:
                yield _pd.DataFrame(
                    {
                        "user": [int(key[0])] * len(closed),
                        "session_start_us": [c[0] for c in closed],
                        "session_end_us": [c[1] for c in closed],
                        "n_events": [c[2] for c in closed],
                    }
                )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            import pandas as _pd

            if self._sess.exists():
                start_us, last_us, n = self._sess.get()
                self._sess.clear()
                yield _pd.DataFrame(
                    {
                        "user": [int(key[0])],
                        "session_start_us": [start_us],
                        "session_end_us": [last_us],
                        "n_events": [n],
                    }
                )

        def close(self) -> None:
            pass

    return keyed.groupBy("user").transformWithStateInPandas(
        statefulProcessor=_Sessions(),
        outputStructType=SESSION_OUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )


EWMA_OUT_SCHEMA = (
    "user bigint, n_events bigint, last_value double, ewma double, "
    "deviation double"
)
EWMA_STATE_SCHEMA = "ewma double, last_value double, n_events bigint"


def streaming_ewma(keyed: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Streaming twin of ``operators/drift.py::ewma_final``: the EWMA
    recurrence (s_0 = v_0, s_i = alpha*v_i + (1-alpha)*s_{i-1})
    maintained ACROSS micro-batches via ``applyInPandasWithState`` —
    state is three scalars per key. Rows are scanned in ts order WITHIN
    each batch; cross-batch order is the stream's arrival order (the
    replayed-source contract, same as streaming_cusum). IEEE-exact
    updates: a stream chunked ANY way over time-ordered input produces
    bit-identical state to the batch fold — pinned by
    test_streaming_ewma_matches_batch_fold. Emits the newest
    observation's deviation from the key's own baseline each batch
    (update mode)."""
    a = float(alpha)

    def update(key, pdfs, state):
        import pandas as _pd

        if state.exists:
            ew, last, n = state.get
        else:
            ew, last, n = None, None, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts"], kind="mergesort")
            for xi in pdf["value"].astype("float64"):
                ew = xi if ew is None else a * xi + (1.0 - a) * ew
                last = xi
                n += 1
        if n:
            state.update((ew, last, n))
            yield _pd.DataFrame(
                {
                    "user": [int(key[0])],
                    "n_events": [n],
                    "last_value": [last],
                    "ewma": [ew],
                    "deviation": [last - ew],
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout as _GST

    return keyed.groupBy("user").applyInPandasWithState(
        update,
        outputStructType=EWMA_OUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=_GST.NoTimeout,
    )
