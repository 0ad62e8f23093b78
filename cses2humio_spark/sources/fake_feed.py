"""Local fake of the partitioned chunked-HTTP event feed.

Serves the exact transport contract ``sources/http_feed.py`` consumes —
per-partition URLs ending in the partition number, ``offset`` query-param
replay, blank-line keep-alives, optional ``Authorization: Token ...``
enforcement, and a held-open connection after the backlog drains (the
long-lived chunked response; the client's quiet timeout ends the batch).
Used by tests/test_http_feed.py and the registered demo query — there is
no live CrowdStrike endpoint in any sandbox, and the reference itself is
only ever integration-tested against this same shape of fake
(SURVEY.md §5: the reference ships no tests at all).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


class FakeFeedServer:
    """``events``: {partition -> [ndjson line, ...]}; each line should
    carry its authoritative position at ``metadata.offset`` (lines
    without one are served as-is — the client assigns positions). Lines
    may be appended after start via :meth:`add_events` (a live feed
    growing between micro-batches)."""

    def __init__(
        self,
        events: dict[int, list[str]],
        token: str | None = None,
        hold_open_s: float = 1.2,
    ) -> None:
        self._events = {int(p): list(lines) for p, lines in events.items()}
        self._lock = threading.Lock()
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            def log_message(self, *args) -> None:  # quiet test output
                pass

            def do_GET(self) -> None:
                try:
                    u = urlparse(self.path)
                    part = int(u.path.rstrip("/").rsplit("/", 1)[-1])
                    offset = int(parse_qs(u.query).get("offset", ["0"])[0])
                    if token is not None and (
                        self.headers.get("Authorization") != f"Token {token}"
                    ):
                        self.send_response(403)
                        self.end_headers()
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    with outer._lock:
                        lines = list(outer._events.get(part, []))
                    for line in lines:
                        try:
                            if (
                                int(json.loads(line)["metadata"]["offset"])
                                < offset
                            ):
                                continue
                        except (ValueError, KeyError, TypeError):
                            pass  # offsetless line: always served
                        # keep-alive blank line before each event
                        self.wfile.write(b"\r\n")
                        self.wfile.write(line.encode("utf-8") + b"\n")
                        self.wfile.flush()
                    # hold the stream open like the real long-lived feed;
                    # the CLIENT's quiet timeout closes the micro-batch
                    time.sleep(hold_open_s)
                except OSError:
                    pass  # client hung up mid-stream (replay cut short)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    def start(self) -> "FakeFeedServer":
        self._thread.start()
        return self

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def url(self, partition: int) -> str:
        return f"http://127.0.0.1:{self.port}/sensors/entities/datafeed/v1/{partition}"

    @property
    def urls(self) -> str:
        """Comma-joined per-partition URLs — the ``urls`` option value."""
        return ",".join(self.url(p) for p in sorted(self._events))

    def add_events(self, partition: int, lines: list[str]) -> None:
        with self._lock:
            self._events.setdefault(int(partition), []).extend(lines)

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
