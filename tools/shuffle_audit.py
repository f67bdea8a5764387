"""Shuffle-volume audit of the build's ONE big exchange (r4 advice #1).

Measures, for the posting build at a given corpus size, the bytes and
records crossing the (term_hash, salt) shuffle — A/B across:
  - combine: doc-local JVM tf pre-combine (doc_term_tf_exploded) vs
    raw token-occurrence explode;
  - codec: lz4 (Spark default) vs zstd shuffle compression.

Each variant runs in its OWN subprocess (spark.io.compression.codec is
a JVM-startup conf), with the UI enabled so stage-level
shuffleWriteBytes/Records come from Spark's own metrics via the REST
API.  One JSON line per variant is appended to BENCH/runs.jsonl with
metric=shuffle_audit.

Usage:
    python tools/shuffle_audit.py [--docs 100000] [--cpus 8]
    python tools/shuffle_audit.py --worker --combine 1 --codec zstd ...
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(args) -> None:
    from meme_search_engine_spark.session import get_spark
    from meme_search_engine_spark.index.build import corpus_stats, docs_from_pages
    from meme_search_engine_spark.index.postings import (
        IndexConfig,
        build_partials_from_docs,
    )

    spark = get_spark(
        app_name=f"shuffle-audit-{args.combine}-{args.codec}",
        cores=args.cpus,
        shuffle_partitions=4 * args.cpus,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.io.compression.codec": args.codec,
        },
    )
    cfg = IndexConfig(salt_shift=14)
    pages = spark.read.parquet(args.pages)
    docs = docs_from_pages(pages).persist()
    stats = corpus_stats(docs)

    def api(path: str):
        # THIS session's UI (another Spark app on 4040 would otherwise
        # be silently measured instead)
        ui = spark.sparkContext.uiWebUrl
        base = f"{ui}/api/v1/applications"
        app_id = spark.sparkContext.applicationId
        return json.load(urllib.request.urlopen(f"{base}/{app_id}{path}"))

    def shuffle_since(before_ids):
        w = r = 0
        for s in api("/stages"):
            if s["stageId"] in before_ids:
                continue
            w += s.get("shuffleWriteBytes", 0)
            r += s.get("shuffleWriteRecords", 0)
        return w, r

    combine = bool(args.combine)
    # warm codegen + python workers
    build_partials_from_docs(
        docs.limit(2000), stats["avgdl"], cfg, combine=combine
    ).count()
    before = {s["stageId"] for s in api("/stages")}
    t0 = time.time()
    n_blocks = build_partials_from_docs(
        docs, stats["avgdl"], cfg, combine=combine
    ).count()
    wall = time.time() - t0
    bytes_w, recs = shuffle_since(before)
    # postings = distinct (doc, term) pairs == sum of n_docs over blocks
    print(
        "WORKER_RESULT "
        + json.dumps(
            {
                "combine": combine,
                "codec": args.codec,
                "n_docs": stats["N"],
                "total_tokens": stats["total_tokens"],
                "n_blocks": n_blocks,
                "partials_sec": round(wall, 3),
                "shuffle_write_bytes": bytes_w,
                "shuffle_write_records": recs,
                "bytes_per_record": round(bytes_w / max(recs, 1), 2),
                "bytes_per_token": round(bytes_w / max(stats["total_tokens"], 1), 2),
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--combine", type=int, default=1)
    ap.add_argument("--codec", type=str, default="lz4")
    ap.add_argument("--pages", type=str, default="")
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()
    if args.worker:
        worker(args)
        return

    from meme_search_engine_spark.datagen import ensure_corpus

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
    )
    pages_dir, _ = ensure_corpus(base, args.docs, n_files=32)
    out = []
    for combine in (0, 1):
        for codec in ("lz4", "zstd"):
            proc = subprocess.run(
                [
                    sys.executable, os.path.abspath(__file__), "--worker",
                    "--combine", str(combine), "--codec", codec,
                    "--pages", pages_dir, "--cpus", str(args.cpus),
                ],
                capture_output=True, text=True, timeout=3600,
            )
            lines = [
                l for l in proc.stdout.splitlines()
                if l.startswith("WORKER_RESULT ")
            ]
            if not lines:
                print(proc.stderr[-2000:], file=sys.stderr)
                raise RuntimeError(f"worker combine={combine} codec={codec} failed")
            r = json.loads(lines[0][len("WORKER_RESULT "):])
            print(json.dumps(r))
            out.append(r)

    summary = {"metric": "shuffle_audit", "cpus": args.cpus, "variants": out}
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/runs.jsonl", "a") as fh:
        fh.write(json.dumps(summary) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
