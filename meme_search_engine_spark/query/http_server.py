"""HTTP query server — the reference's online API surface
(POST / with weighted terms: /root/reference/mse.py:37-47 and
src/main.rs:1044-1050 QueryRequest) re-hosted over LocalSearcher.

stdlib-only (http.server): no web framework in this environment.
Request JSON (mse.py-compatible subset):
    {"text": [["query terms", weight], ...], "top_k": 10}
or the simple form:
    {"query": "free text", "top_k": 10}
Response JSON:
    {"matches": [{"rank", "doc_id", "score", "score_fixed"}, ...]}

Image/embedding terms from the reference's API have no BM25 analogue
and return 400 with an explanatory message.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .serve import LocalSearcher


def make_handler(searcher: LocalSearcher):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
            except (ValueError, json.JSONDecodeError):
                return self._reply(400, {"error": "invalid JSON body"})
            if "images" in req or "embeddings" in req:
                return self._reply(
                    400,
                    {
                        "error": "image/embedding terms are not supported "
                        "by the BM25 engine; use text terms"
                    },
                )
            k = int(req.get("top_k", 10))
            if k < 1:
                return self._reply(400, {"error": "top_k must be >= 1"})
            try:
                if "text" in req:
                    terms = [(str(t), float(w)) for t, w in req["text"]]
                    matches = searcher.search_weighted(terms, k, with_urls=True)
                elif "query" in req:
                    matches = searcher.search(str(req["query"]), k, with_urls=True)
                else:
                    return self._reply(
                        400, {"error": "need 'text' or 'query' field"}
                    )
            except (TypeError, ValueError) as e:
                return self._reply(400, {"error": f"bad request: {e}"})
            self._reply(200, {"matches": matches})

        def do_GET(self):
            if self.path == "/health":
                return self._reply(
                    200,
                    {
                        "status": "ok",
                        "n_docs": searcher.stats["N"],
                        "avgdl": searcher.stats["avgdl"],
                    },
                )
            self._reply(404, {"error": "POST / with a JSON query"})

    return Handler


class SearchServer:
    """Threaded HTTP server wrapper (start()/stop()); the reference's
    axum/aiohttp server role."""

    def __init__(self, index_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.searcher = LocalSearcher(index_dir)
        self._httpd = ThreadingHTTPServer(
            (host, port), make_handler(self.searcher)
        )
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "SearchServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=10)
        self._httpd.server_close()


def main() -> None:  # pragma: no cover - manual entry point
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args()
    server = SearchServer(args.index, args.host, args.port)
    print(f"serving BM25 queries on {args.host}:{server.port}")
    server.start()
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":  # pragma: no cover
    main()
