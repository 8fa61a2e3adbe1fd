"""Minimal HTTP serving surface (S7, net/http/http.go:54-208).

riot ships HTTP endpoints for search / index / delete; this engine's
production surface is batch (spark-submit jobs + result tables), but a
thin driver-resident endpoint makes the riot-user migration story
complete for smoke/interactive use: one Python stdlib server in front
of a SearchEngine, no extra dependencies.

NOT the scale path — every request is a Spark job from the driver
(~0.3 s floor); high-QPS serving belongs to `search_batch` over query
logs or an external serving tier fed by the exported index.  Mirrors
riot's form parameters: `query`, `outputOffset`, `maxOutputs`
(http.go:54-98); add/delete re-enter the Engine facade and take effect
on `flush` (riot's own add is async until Flush, engine.go:376-416).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from riot_spark.query import SearchEngine, SearchRequest

# cap accepted POST bodies — Content-Length is attacker-controlled
# and fed to rfile.read()
MAX_BODY_BYTES = 16 * 1024 * 1024


def _handler(engine: SearchEngine | None, facade=None):
    # with a facade, search through it so post-flush snapshots are
    # picked up; a bare SearchEngine serves a fixed snapshot
    def search(req: SearchRequest):
        return facade.search(req) if facade is not None else engine.search(req)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/health":
                return self._json(200, {"status": "ok"})
            if url.path != "/search":
                return self._json(404, {"error": "not found"})
            try:
                q = parse_qs(url.query)
                req = SearchRequest(
                    text=q.get("query", [""])[0],
                    offset=int(q.get("outputOffset", ["0"])[0]),
                    max_outputs=int(q.get("maxOutputs", ["10"])[0]),
                )
            except (ValueError, KeyError) as ex:
                return self._json(400, {"error": f"bad request: {ex}"})
            rows = search(req).collect()
            return self._json(
                200,
                {
                    "docs": [
                        {"doc_id": r["doc_id"], "score": float(r["score"])}
                        for r in rows
                    ]
                },
            )

        def do_POST(self):
            if facade is None:
                return self._json(501, {"error": "read-only server"})
            url = urlparse(self.path)
            try:
                n = int(self.headers.get("Content-Length", "0"))
                if n < 0 or n > MAX_BODY_BYTES:
                    return self._json(
                        413, {"error": f"body over {MAX_BODY_BYTES} bytes"}
                    )
                payload = json.loads(self.rfile.read(n) or b"{}")
                if not isinstance(payload, dict):
                    raise ValueError("body must be a JSON object")
                if url.path == "/index":
                    facade.index_doc(
                        int(payload["doc_id"]),
                        payload.get("content", ""),
                        payload.get("labels"),
                    )
                    return self._json(200, {"indexed": True})
                if url.path == "/delete":
                    facade.remove_doc(int(payload["doc_id"]))
                    return self._json(200, {"removed": True})
            except (ValueError, KeyError, TypeError, json.JSONDecodeError) as ex:
                return self._json(400, {"error": f"bad request: {ex}"})
            if url.path == "/flush":
                facade.flush()
                return self._json(200, {"flushed": True})
            return self._json(404, {"error": "not found"})

    return Handler


def serve(
    engine: SearchEngine | None = None,
    facade=None,
    host: str = "127.0.0.1",
    port: int = 0,
) -> ThreadingHTTPServer:
    """Start the endpoint on a daemon thread; returns the server (its
    `.server_address[1]` is the bound port; `.shutdown()` stops it)."""
    srv = ThreadingHTTPServer((host, port), _handler(engine, facade))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv
