"""Sinks for the connector pipeline (SURVEY.md §2.1 R9-R12).

``HttpBulkSink`` rebuilds the reference's Humio bulk POST (app.py:151-155):
events are shipped in chunks of ≤ ``bulk_max_size`` (default 200,
app.py:485-491) as ``[{"events": [...]}]`` (structured) or
``[{"messages": [...]}]`` (unstructured/raw).

Scale design: posting happens EXECUTOR-side via foreachPartition — each
task posts its own partition's chunks in parallel; nothing funnels through
the driver. A failed chunk raises, failing the task → Spark retries the
task, then the micro-batch — reproducing the reference's hold-buffer-and-
retry (R12) on top of checkpoint at-least-once.

The HTTP transport is injectable: tests (and this offline environment) pass
a ``post_fn``; production would pass a requests-based callable. The default
``post_fn=None`` writes NDJSON chunk files to ``spool_dir`` — a
deterministic, inspectable stand-in for the network boundary.
"""

from __future__ import annotations


class HttpBulkSink:
    """foreachBatch callable: (batch_df, batch_id) -> None."""

    def __init__(
        self,
        bulk_max_size: int = 200,
        structured: bool = True,
        post_fn=None,
        spool_dir: str | None = None,
    ):
        if post_fn is None and spool_dir is None:
            raise ValueError("need post_fn or spool_dir")
        self.bulk_max_size = bulk_max_size
        self.structured = structured
        self.post_fn = post_fn
        self.spool_dir = spool_dir

    def __call__(self, batch_df, batch_id: int) -> None:
        bulk = self.bulk_max_size
        structured = self.structured
        post_fn = self.post_fn
        spool = self.spool_dir
        keyword = "events" if structured else "messages"

        # NB: this closure runs on EXECUTORS. It must be fully
        # self-contained (stdlib imports inside, no references to this
        # module's globals) so cloudpickle ships it by value — executor
        # Python workers cannot be assumed to have cses2humio_spark on
        # their sys.path.
        def post_partition(rows) -> None:
            import json as _json
            import os as _os
            import uuid as _uuid

            def chunks(seq, size):
                buf = []
                for x in seq:
                    buf.append(x)
                    if len(buf) >= size:
                        yield buf
                        buf = []
                if buf:
                    yield buf

            for chunk in chunks(rows, bulk):
                if structured:
                    payload = [
                        {
                            "timestamp": r.timestamp,
                            "rawstring": r.rawstring,
                            "attributes": (
                                r.attributes.asDict(recursive=True)
                                if r.attributes is not None
                                else None
                            ),
                        }
                        for r in chunk
                    ]
                else:
                    payload = [r.rawstring for r in chunk]
                body = [{keyword: payload}]
                if post_fn is not None:
                    post_fn(body)
                else:
                    _os.makedirs(spool, exist_ok=True)
                    final = _os.path.join(spool, f"{_uuid.uuid4().hex}.json")
                    tmp = final + ".tmp"
                    with open(tmp, "w") as f:
                        _json.dump({"batch_id": batch_id, "body": body}, f)
                    _os.rename(tmp, final)

        batch_df.foreachPartition(post_partition)



def chunked_sink(spool_dir: str, bulk_max_size: int = 200, structured: bool = True):
    """Convenience: a spool-file HttpBulkSink (the test/offline transport)."""
    return HttpBulkSink(
        bulk_max_size=bulk_max_size, structured=structured, spool_dir=spool_dir
    )
