"""Native chunked-HTTP event-feed source (PySpark Python Data Source API).

The reference's actual ingestion path — the one capability this engine
still mapped onto Kafka/file sources until round 10 — is a long-lived
``GET`` against a per-partition feed URL whose response body is an
unbounded newline-delimited JSON stream (``app.py:93-102``:
``requests.get(url, stream=True)`` + ``iter_lines``), with three
contract points this module reproduces exactly:

- **offset resume**: the consumer passes the last committed offset as an
  ``offset`` query parameter and the server replays from there
  (``app.py:77-79``); each event carries its own authoritative position
  at ``metadata.offset`` (``app.py:146-149``) and the committed offset
  is ``last seen + 1``.
- **partition-from-URL**: a feed exposes N independent partition URLs
  whose path ends in the partition number (``app.py:61-62``
  ``retrieve_partition_from_url``); one consumer loop per partition.
- **keep-alive skip**: the server emits blank lines as keep-alives;
  they are skipped and advance nothing (``app.py:100-104``).

Spark-first shape: a ``DataSource`` named ``falcon_feed`` with a
``SimpleDataSourceStreamReader`` whose offset is the per-partition dict
``{str(partition): next_offset}`` — the streaming equivalent of the
reference's ``offset.db`` file (``app.py:38-58``), except the WAL is
Spark's checkpoint (exactly-once ``foreachBatch`` downstream instead of
the reference's at-least-once commit-after-POST). ``read`` tails every
partition URL from its committed offset until the stream goes quiet or
a per-trigger cap hits; ``readBetweenOffsets`` replays a committed
window exactly, which the feed's offset parameter makes deterministic.

Driver-side reads are the HONEST match for this feed: there is no tip
API (the only way to learn the latest offset is to read), so a
partition-planned reader would have to read everything on the driver
anyway just to plan. The per-trigger cap bounds driver memory; at 100 TB
the feed itself is the bottleneck (one TCP stream per partition,
server-paced — the reference has the same ceiling, one Python thread
per partition). Scale-out happens downstream: this source emits raw
lines which immediately fan out to executors for parse/enrich/flatten.

No external HTTP client: stdlib ``urllib`` streams chunked responses
and its socket timeout doubles as the quiet-period detector.
"""

from __future__ import annotations

import json
from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType


def register(spark) -> None:
    """Register the ``falcon_feed`` source on ``spark``, shipping this
    module BY VALUE: Spark instantiates Python data sources in a worker
    process that inherits env PYTHONPATH, not the driver's ``sys.path``,
    so a by-reference pickle dies with ModuleNotFoundError whenever the
    engine isn't pip-installed on the workers (the repo's UDF
    self-containment rule). This module is deliberately stdlib+pyspark
    only, so value-shipping it is a few KB."""
    from pyspark import cloudpickle

    import cses2humio_spark.sources.http_feed as _self

    cloudpickle.register_pickle_by_value(_self)
    spark.dataSource.register(FalconFeedDataSource)


def partition_from_url(url: str) -> int:
    """Trailing integer of the URL path = partition number (the
    reference's ``retrieve_partition_from_url``, ``app.py:61-62``).
    Query string and fragment are ignored."""
    from urllib.parse import urlparse

    path = urlparse(url).path.rstrip("/")
    tail = path.rsplit("/", 1)[-1]
    if not tail.isdigit():
        raise ValueError(
            f"feed URL path must end in the partition number, got {url!r}"
        )
    return int(tail)


class FalconFeedDataSource(DataSource):
    """``spark.readStream.format("falcon_feed")`` — options:

    - ``urls`` (required): comma-separated per-partition feed URLs; the
      partition number is the trailing integer of each URL path.
    - ``token``: bearer token, sent as ``Authorization: Token <t>``
      (the reference's session-token header, ``app.py:88-92``).
    - ``start_offsets``: JSON dict ``{partition: offset}`` to begin from
      (default 0 everywhere — the reference's fresh ``offset.db``).
    - ``max_events_per_partition``: per-trigger cap per partition
      (default 10000) — bounds driver memory per micro-batch.
    - ``quiet_ms``: socket-read timeout treated as "stream is idle,
      close the micro-batch" (default 1000).

    Trigger semantics: with ``processingTime`` the source tails the feed
    one capped window per trigger, indefinitely. With ``availableNow``
    Spark captures the tip at start — which for a tip-less feed is the
    FIRST prefetched window — so one availableNow run processes exactly
    one read window (everything pending up to the cap); restarting from
    the same checkpoint resumes offset-exactly. Both pinned in
    tests/test_http_feed.py.
    """

    @classmethod
    def name(cls) -> str:
        return "falcon_feed"

    def schema(self) -> str:
        # raw transport row: position + provenance + the undecoded line.
        # Parsing/enrichment happens downstream (streaming/pipeline.py),
        # mirroring the reference's raw-vs-enriched split (app.py:364-374)
        return "partition int, offset bigint, value string"

    def simpleStreamReader(self, schema: StructType):
        return FalconFeedSimpleStreamReader(self.options)


class FalconFeedSimpleStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        urls = options.get("urls")
        if not urls:
            raise ValueError("falcon_feed requires the 'urls' option")
        self._urls = {
            partition_from_url(u.strip()): u.strip()
            for u in urls.split(",")
            if u.strip()
        }
        self._token = options.get("token")
        self._cap = int(options.get("max_events_per_partition", "10000"))
        self._quiet_s = int(options.get("quiet_ms", "1000")) / 1000.0
        start = json.loads(options.get("start_offsets", "{}") or "{}")
        self._start = {
            str(p): int(start.get(str(p), 0)) for p in self._urls
        }

    # -- offset model ------------------------------------------------------

    def initialOffset(self) -> dict:
        return dict(self._start)

    def commit(self, end: dict) -> None:
        # nothing server-side to acknowledge: the feed is replayable by
        # offset; Spark's checkpoint IS the offset store (the engine
        # twin of the reference's offset.db write, app.py:146-149)
        return

    # -- transport ---------------------------------------------------------

    def _open(self, url: str, offset: int):
        """Long-lived GET with the resume offset as a query parameter
        (``app.py:77-79``) and the session-token header. Returns the
        streaming response; socket timeout = quiet-period detector."""
        from urllib.request import Request, urlopen

        sep = "&" if "?" in url else "?"
        req = Request(f"{url}{sep}offset={offset}")
        if self._token:
            req.add_header("Authorization", f"Token {self._token}")
        return urlopen(req, timeout=self._quiet_s)

    def _tail_partition(
        self, part: int, start: int, *, stop_before: int | None, cap: int
    ) -> list[tuple]:
        """Read events from one partition feed starting at ``start``:
        skip blank keep-alive lines; take each event's authoritative
        position from its ``metadata.offset`` (malformed lines — which
        the reference drops AFTER reading, app.py:107-114 — are still
        delivered, at last_offset+1, so downstream permissive parsing
        owns the drop decision); stop at ``cap`` events, at EOF, at the
        quiet timeout, or (replay mode) once ``stop_before`` is reached."""
        import socket

        from urllib.error import HTTPError

        rows: list[tuple] = []
        last = start - 1
        try:
            resp = self._open(self._urls[part], start)
        except HTTPError:
            # the server ANSWERED with an error (401/403 expired session,
            # 404 stale partition URL): loud failure — silently tailing
            # an auth-refused feed forever is the no-silent-failure
            # anti-contract. The supervisor owns restart policy
            # (streaming/pipeline.py::supervise_pipeline), mirroring the
            # reference's thread-restart loop (app.py:305-326).
            raise
        except OSError:
            if stop_before is not None:
                raise  # a committed window MUST replay — never silently short
            return rows  # transient connect failure: empty batch, retry next trigger
        try:
            for raw in resp:
                line = raw.decode("utf-8", errors="replace").rstrip("\r\n")
                if not line.strip():
                    continue  # keep-alive (app.py:100-104)
                try:
                    off = int(json.loads(line)["metadata"]["offset"])
                except (ValueError, KeyError, TypeError):
                    off = last + 1
                if off < start:
                    continue  # server replayed earlier than asked
                if stop_before is not None and off >= stop_before:
                    break
                rows.append((part, off, line))
                last = off
                if len(rows) >= cap:
                    break
        except (socket.timeout, TimeoutError, OSError):
            if stop_before is not None and (
                not rows or rows[-1][1] < stop_before - 1
            ):
                raise RuntimeError(
                    f"falcon_feed replay of partition {part} "
                    f"[{start}, {stop_before}) ended early at "
                    f"{rows[-1][1] if rows else start - 1} — the feed no "
                    "longer serves a committed window"
                )
        finally:
            try:
                resp.close()
            except Exception:  # noqa: BLE001 — already have the data
                pass
        return rows

    # -- micro-batch construction -------------------------------------------

    def _tail_all(
        self, jobs: list[tuple[int, int, int | None]]
    ) -> dict[int, list[tuple]]:
        """Tail several partitions CONCURRENTLY (one thread each — the
        reference runs a thread per stream the same way, app.py:305) so
        their quiet-period socket timeouts overlap instead of adding
        up: a P-partition feed pays one quiet window per read, not P
        (r14 — the sequential loop made every micro-batch of the
        composed feed pipelines idle ~0.8 s per partition). Output is
        combined per partition, so row order is identical to the
        sequential loop's."""
        from concurrent.futures import ThreadPoolExecutor

        if len(jobs) <= 1:
            return {
                part: self._tail_partition(
                    part, start, stop_before=stop, cap=self._cap
                )
                for part, start, stop in jobs
            }
        with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
            futs = {
                part: pool.submit(
                    self._tail_partition,
                    part,
                    start,
                    stop_before=stop,
                    cap=self._cap,
                )
                for part, start, stop in jobs
            }
            return {part: fut.result() for part, fut in futs.items()}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        """Tail every partition from its committed offset; the new
        offset is last-seen + 1 per partition (``app.py:146-149``)."""
        rows: list[tuple] = []
        end = dict(start)
        got_all = self._tail_all(
            [
                (part, int(start.get(str(part), 0)), None)
                for part in sorted(self._urls)
            ]
        )
        for part in sorted(self._urls):
            got = got_all[part]
            rows.extend(got)
            if got:
                end[str(part)] = got[-1][1] + 1
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        """Exact replay of a committed window — deterministic because
        the feed replays by offset (the same property the reference's
        crash-recovery leans on, ``app.py:77-79``)."""
        jobs = []
        for part in sorted(self._urls):
            s = int(start.get(str(part), 0))
            e = int(end.get(str(part), s))
            if e > s:
                jobs.append((part, s, e))
        got_all = self._tail_all(jobs)
        rows: list[tuple] = []
        for part, _s, _e in jobs:
            rows.extend(got_all[part])
        return iter(rows)
