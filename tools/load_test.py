"""Concurrent HTTP load test — the analogue of the reference's
perf_test.py (/root/reference/perf_test.py:6-27: 1000 random queries,
k=10, 100 concurrent against localhost).

Usage:
    python tools/load_test.py [--index data/eval_idx_5000]
        [--n 1000] [--concurrency 100] [--k 10]

Prints ONE JSON line: {"qps": ..., "p50_ms": ..., "p99_ms": ...,
"errors": 0, ...}.  Needs a built index dir (tools/evaluate.py leaves
one under data/eval_idx_<docs>).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--index",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data", "eval_idx_5000",
        ),
    )
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--concurrency", type=int, default=100)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from meme_search_engine_spark.datagen import generate_queries
    from meme_search_engine_spark.query.http_server import SearchServer

    with open(os.path.join(args.index, "stats.json")) as fh:
        n_docs = json.load(fh)["N"]
    qtexts = [q["text"] for q in generate_queries(n_docs)]
    # 1000 "random" queries = deterministic round-robin over the
    # reference query set (no wall-clock seeds anywhere)
    queries = [qtexts[i % len(qtexts)] for i in range(args.n)]

    srv = SearchServer(args.index).start()
    lat: list[float] = []
    errors = 0

    def one(text: str) -> float:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/",
            data=json.dumps({"query": text, "top_k": args.k}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        t0 = time.time()
        with urllib.request.urlopen(req, timeout=60) as resp:
            resp.read()
            assert resp.status == 200
        return time.time() - t0

    try:
        # warm pass (cold decode paid once, like a live server)
        for t in qtexts:
            one(t)
        t0 = time.time()
        with ThreadPoolExecutor(args.concurrency) as ex:
            for dt in ex.map(one, queries):
                lat.append(dt)
        wall = time.time() - t0
    except Exception:
        errors += 1
        raise
    finally:
        srv.stop()

    lat.sort()
    print(
        json.dumps(
            {
                "metric": "http_load_test",
                "qps": round(args.n / wall, 1),
                "p50_ms": round(1000 * lat[len(lat) // 2], 2),
                "p99_ms": round(1000 * lat[int(len(lat) * 0.99)], 2),
                "n": args.n,
                "concurrency": args.concurrency,
                "k": args.k,
                "n_docs": n_docs,
                "errors": errors,
            }
        )
    )


if __name__ == "__main__":
    main()
