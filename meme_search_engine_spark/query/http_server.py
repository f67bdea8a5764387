"""HTTP query server — the reference's online API surface
(POST / with weighted terms: /root/reference/mse.py:37-47 and
src/main.rs:1044-1050 QueryRequest) re-hosted over LocalSearcher.

stdlib-only (http.server): no web framework in this environment.
Request JSON (mse.py-compatible subset):
    {"text": [["query terms", weight], ...], "top_k": 10}
or the simple form:
    {"query": "free text", "top_k": 10}
or a saved preset (the reference's predefined_embeddings — reusable
named query vectors registered server-side, src/main.rs:102-127,
976-985 — as named term-weight presets stored in the index dir):
    {"preset": "name", "top_k": 10}
Response JSON:
    {"matches": [{"rank", "doc_id", "score", "score_fixed"}, ...]}

GET /presets lists saved presets; PUT semantics via
{"save_preset": "name", "text": [[...], ...]} persist one.

Hybrid text+vector queries (the reference's mixed text/image mode):
    {"query": "free text", "qvec": [f32...], "weights": [3, 1],
     "top_k": 10}
served when the server is constructed with embeddings_path (exact
rerank source) AND ivf_dir (partition-pruned candidate index); raw
image bytes still 400 (embed client-side, pass qvec).
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .serve import LocalSearcher


class _Server(ThreadingHTTPServer):
    # socketserver's default listen backlog is 5: a 100-concurrent
    # client burst (the reference's perf_test.py shape) overflows it
    # and connections get RST before accept.  The reference's tokio
    # listener has no such cap; match it.
    request_queue_size = 128
    daemon_threads = True


class PresetStore:
    """Named term-weight presets persisted next to the index —
    the reference's predefined_embeddings table (main.rs:102-127):
    register once, query by name forever."""

    def __init__(self, index_dir: str):
        self._path = os.path.join(index_dir, "presets.json")
        self._presets: dict[str, list] = {}
        # ThreadingHTTPServer handlers call save()/get() concurrently:
        # guard the dict and serialize writers so two saves can't
        # interleave on the same temp file and rename a torn JSON into
        # place (ADVICE r02)
        self._lock = threading.Lock()
        self._mtime_ns = -1
        self._reload_locked()

    def _reload_locked(self) -> None:
        """Refresh from disk when the file changed.  presets.json is
        the shared state between pre-fork workers (mp_server): a save
        through one worker process must be visible to queries routed
        to any OTHER worker, so every read path re-checks the file's
        mtime (one stat) before answering."""
        try:
            st = os.stat(self._path)
        except OSError:
            return
        if st.st_mtime_ns != self._mtime_ns:
            with open(self._path) as fh:
                self._presets = json.load(fh)
            self._mtime_ns = st.st_mtime_ns

    def names(self) -> list[str]:
        with self._lock:
            self._reload_locked()
            return sorted(self._presets)

    def get(self, name: str) -> list[tuple[str, float]] | None:
        with self._lock:
            self._reload_locked()
            if name not in self._presets:  # empty list != missing
                return None
            return [(str(t), float(w)) for t, w in self._presets[name]]

    def save(self, name: str, terms: list[tuple[str, float]]) -> None:
        with self._lock:
            # merge-on-save under an INTER-process lock: threading.Lock
            # only serializes threads of this worker, but presets.json
            # is shared across pre-fork workers (mp_server) — two
            # workers saving different names concurrently could both
            # reload, then the second os.replace would drop the first
            # worker's new entry.  flock a sidecar (not the data file:
            # os.replace swaps the inode the lock lives on) for the
            # whole reload+write+swap, so last-writer-wins is per NAME,
            # never a sibling's whole entry.
            import fcntl

            with open(f"{self._path}.lock", "w") as lockfh:
                fcntl.flock(lockfh, fcntl.LOCK_EX)
                self._reload_locked()
                self._presets[name] = [[t, w] for t, w in terms]
                tmp = (
                    f"{self._path}.{os.getpid()}.{threading.get_ident()}.tmp"
                )
                with open(tmp, "w") as fh:
                    json.dump(self._presets, fh, indent=1)
                os.replace(tmp, self._path)  # atomic swap, like the manifest
                try:
                    self._mtime_ns = os.stat(self._path).st_mtime_ns
                except OSError:
                    pass


class Metrics:
    """Process-local query metrics in Prometheus text exposition
    format — the reference's monitoring surface (main.rs
    QUERIES_COUNTER / TERMS_COUNTER and the axum /metrics route)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._counts: dict[str, int] = {}
        self._lat_ms: list[float] = []  # bounded reservoir

    def observe(self, kind: str, ms: float, ok: bool) -> None:
        with self._lock:
            key = kind if ok else f"{kind}_error"
            self._counts[key] = self._counts.get(key, 0) + 1
            if ok:
                self._lat_ms.append(ms)
                if len(self._lat_ms) > 4096:
                    self._lat_ms = self._lat_ms[-2048:]

    def render(self) -> str:
        with self._lock:
            lines = [
                "# TYPE mse_queries_total counter",
            ]
            for key in sorted(self._counts):
                lines.append(
                    f'mse_queries_total{{kind="{key}"}} {self._counts[key]}'
                )
            lat = sorted(self._lat_ms)
            if lat:
                lines.append("# TYPE mse_query_latency_ms summary")
                for q, name in ((0.5, "0.5"), (0.9, "0.9"), (0.99, "0.99")):
                    v = lat[min(int(q * len(lat)), len(lat) - 1)]
                    lines.append(
                        f'mse_query_latency_ms{{quantile="{name}"}} {v:.3f}'
                    )
                lines.append(f"mse_query_latency_ms_count {len(lat)}")
            return "\n".join(lines) + "\n"


def make_handler(
    searcher: LocalSearcher,
    presets: PresetStore,
    embeddings_path: str | None = None,
    metrics: Metrics | None = None,
    ivf_dir: str | None = None,
):
    metrics = metrics or Metrics()
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
            if "images" in req:
                return self._reply(
                    400,
                    {
                        "error": "raw image terms are not supported; embed "
                        "client-side and pass {'qvec': [...]} for the "
                        "hybrid text+vector mode"
                    },
                )
            k = int(req.get("top_k", 10))
            if k < 1:
                return self._reply(400, {"error": "top_k must be >= 1"})
            if k > 10_000:
                # k feeds n_candidates (max(k, ...)) and LocalVamana's
                # beam (max(manifest_beam, k)): an unclamped top_k is
                # the same exact-rerank-over-the-whole-table DoS the
                # pool clamps below exist to prevent (ADVICE r07)
                return self._reply(
                    400, {"error": "top_k must be <= 10000"}
                )
            import time as _time

            kind = (
                "hybrid" if "qvec" in req
                else "preset" if "preset" in req
                else "weighted" if "text" in req
                else "simple"
            )
            t0 = _time.time()
            try:
                if "save_preset" in req:
                    if "text" not in req:
                        return self._reply(
                            400, {"error": "save_preset needs 'text' terms"}
                        )
                    terms = [(str(t), float(w)) for t, w in req["text"]]
                    presets.save(str(req["save_preset"]), terms)
                    return self._reply(
                        200, {"saved": str(req["save_preset"])}
                    )
                if "qvec" in req:
                    # hybrid text+vector query — the reference's mixed
                    # text/image channels (query_disk_index.rs:463-527)
                    if embeddings_path is None or ivf_dir is None:
                        return self._reply(
                            400,
                            {
                                "error": "server started without an "
                                "embeddings table + IVF index; hybrid "
                                "queries disabled"
                            },
                        )
                    qvec = [float(x) for x in req["qvec"]]
                    # per-position defaults: [5] means w_text=5 with the
                    # DEFAULT w_vec=1 (not w_vec=3)
                    w_raw = req.get("weights", [])
                    if not isinstance(w_raw, list) or len(w_raw) > 2:
                        return self._reply(
                            400,
                            {"error": "weights must be a list of <=2 numbers"},
                        )
                    w_text = w_raw[0] if len(w_raw) > 0 else 3
                    w_vec = w_raw[1] if len(w_raw) > 1 else 1
                    # optional query-time near-dup suppression of
                    # results (the reference's DEDUPLICATE_THRESHOLD
                    # 0.95 gram-matrix drop, query_disk_index.rs:99)
                    dt = req.get("dedup_threshold")
                    # pool-sizing knobs per request (the reference's
                    # QueryRequest carries per-query config,
                    # common.rs:201-209) — clamped: the body is
                    # untrusted, so 0 / negative / giant values never
                    # reach ivf.candidates (a huge pool is an exact
                    # rerank over the whole table)
                    n_cand = max(
                        k, min(int(req.get("n_candidates", 50)), 10_000)
                    )
                    n_probe = max(
                        1, min(int(req.get("n_probe", 8)), 256)
                    )
                    matches = searcher.search_hybrid(
                        str(req.get("query", "")),
                        qvec,
                        embeddings_path,
                        k,
                        w_text=int(w_text),
                        w_vec=int(w_vec),
                        with_urls=True,
                        ivf_dir=ivf_dir,
                        n_candidates=n_cand,
                        n_probe=n_probe,
                        dedup_threshold=(
                            float(dt) if dt is not None else None
                        ),
                    )
                elif "preset" in req:
                    terms = presets.get(str(req["preset"]))
                    if terms is None:
                        return self._reply(
                            404, {"error": f"unknown preset {req['preset']!r}"}
                        )
                    matches = searcher.search_weighted(terms, k, with_urls=True)
                elif "text" in req:
                    terms = [(str(t), float(w)) for t, w in req["text"]]
                    matches = searcher.search_weighted(terms, k, with_urls=True)
                elif "query" in req:
                    matches = searcher.search(str(req["query"]), k, with_urls=True)
                else:
                    return self._reply(
                        400, {"error": "need 'text', 'query', or 'preset'"}
                    )
            except (TypeError, ValueError) as e:
                metrics.observe(kind, 0.0, ok=False)
                return self._reply(400, {"error": f"bad request: {e}"})
            metrics.observe(kind, (_time.time() - t0) * 1000.0, ok=True)
            self._reply(200, {"matches": matches})

        def do_GET(self):
            if self.path == "/metrics":
                body = metrics.render().encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if self.path == "/presets":
                return self._reply(200, {"presets": presets.names()})
            if self.path == "/health":
                return self._reply(
                    200,
                    {
                        "status": "ok",
                        # which process answered — observable worker
                        # spread for the pre-fork server (mp_server)
                        "pid": os.getpid(),
                        "n_docs": searcher.stats["N"],
                        "avgdl": searcher.stats["avgdl"],
                    },
                )
            self._reply(404, {"error": "POST / with a JSON query"})

    return Handler


class SearchServer:
    """Threaded HTTP server wrapper (start()/stop()); the reference's
    axum/aiohttp server role."""

    def __init__(
        self,
        index_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        embeddings_path: str | None = None,
        ivf_dir: str | None = None,
    ):
        self.searcher = LocalSearcher(index_dir)
        self.presets = PresetStore(index_dir)
        self._httpd = _Server(
            (host, port),
            make_handler(
                self.searcher, self.presets, embeddings_path, ivf_dir=ivf_dir
            ),
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
    ap.add_argument("--embeddings", default=None,
                    help="embedding table (exact-rerank source)")
    ap.add_argument("--ivf", default=None,
                    help="persistent IVF index dir (hybrid candidates)")
    args = ap.parse_args()
    server = SearchServer(
        args.index, args.host, args.port,
        embeddings_path=args.embeddings, ivf_dir=args.ivf,
    )
    print(f"serving BM25 queries on {args.host}:{server.port}")
    server.start()
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":  # pragma: no cover
    main()
