"""In-process GraphQL fixture server for HTTP-transport tests.

A stdlib ``ThreadingHTTPServer`` speaking just enough GraphQL-over-HTTP
to exercise the reference's observable contract: Relay-paginated
connection queries, batched mutations with per-record results, flaky
endpoints (fail-then-succeed for retry tests), and a slow endpoint
that outlives the client timeout (for the K4 timeout-tolerance path,
ETL:224–246).

The server runs in a daemon thread of the test process; Spark local
executors are separate processes but reach it over localhost TCP —
the same topology as a real external API.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any


class FixtureGQLServer:
    def __init__(self, pages: list[dict[str, Any]] | None = None):
        self.pages = pages or []
        self.mutations: list[dict[str, Any]] = []  # every mutation POST body
        self.fail_next: dict[str, int] = {}  # operationName -> remaining failures
        self.slow_ops: dict[str, float] = {}  # operationName -> sleep seconds
        self.fail_record_when = None  # predicate dict -> bool for per-record failure
        self.connections = 0  # distinct TCP connections accepted
        self.requests = 0  # total POSTs served
        self.close_each = False  # send Connection: close per response
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # HTTP/1.1 so keep-alive works: one Handler instance serves
            # every request on its connection, which is what lets the
            # connections-vs-requests counters distinguish reuse
            protocol_version = "HTTP/1.1"

            def log_message(self, *args):  # quiet
                pass

            def setup(self):
                with outer._lock:
                    outer.connections += 1
                super().setup()

            def do_POST(self):
                body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
                op = body.get("operationName") or ""
                with outer._lock:
                    outer.requests += 1
                with outer._lock:
                    sleep_s = outer.slow_ops.get(op, 0)
                    failures_left = outer.fail_next.get(op, 0)
                    if failures_left:
                        outer.fail_next[op] = failures_left - 1
                if sleep_s:
                    time.sleep(sleep_s)
                if failures_left:
                    self._reply({"errors": [{"message": f"injected failure for {op}"}]})
                    return
                if op == "fetchThings":
                    after = (body.get("variables") or {}).get("after")
                    self._reply({"data": {"things": outer._page(after)}})
                    return
                # any other operation is a mutation: record and ack
                with outer._lock:
                    outer.mutations.append(body)
                records = ((body.get("variables") or {}).get("input") or {}).get("records", [])
                results = []
                for r in records:
                    if outer.fail_record_when is not None and outer.fail_record_when(r):
                        results.append({"success": False, "error": "server rejected record"})
                    else:
                        results.append({"success": True, "error": None})
                self._reply({"data": {op: {"results": results}}})

            def _reply(self, payload: dict):
                data = json.dumps(payload).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                if outer.close_each:
                    self.send_header("Connection", "close")
                    self.close_connection = True
                self.end_headers()
                self.wfile.write(data)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._server.server_address[1]
        self.url = f"http://127.0.0.1:{self.port}/graphql"
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def _page(self, after: str | None) -> dict[str, Any]:
        idx = 0
        if after is not None:
            for i, p in enumerate(self.pages):
                if p["pageInfo"]["endCursor"] == after:
                    idx = i + 1
                    break
            else:
                idx = len(self.pages)
        if idx >= len(self.pages):
            return {"pageInfo": {"hasNextPage": False, "endCursor": None}, "edges": []}
        return self.pages[idx]

    def __enter__(self) -> "FixtureGQLServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()


def make_pages(n_pages: int, per_page: int) -> list[dict[str, Any]]:
    """Relay pages of numbered nodes: node i has id ``L{i}`` and a
    nested struct, to exercise the S4 flatten path end-to-end."""
    pages = []
    i = 0
    for p in range(n_pages):
        edges = []
        for _ in range(per_page):
            edges.append(
                {
                    "cursor": f"c{i}",
                    "node": {
                        "id": f"L{i}",
                        "name": f"thing {i}",
                        "address": {"state": "TX" if i % 2 else "CA"},
                    },
                }
            )
            i += 1
        pages.append(
            {
                "pageInfo": {"hasNextPage": p < n_pages - 1, "endCursor": f"c{i - 1}"},
                "edges": edges,
            }
        )
    return pages
