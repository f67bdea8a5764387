"""Same-window A/B: does the doc-local tf combine move the build's
2->8-core scaling, or was protocol run 1's 0.590 a window draw?

Interleaves subprocess runs of the PARTIALS stage (tokenize ->
[combine] -> one (term_hash, salt) shuffle -> encode kernel) across
combine ∈ {off, on} × cpus ∈ {2, 8}, with the bench_scaling membw/ALU
controls embedded per run, so every variant samples the same
hypervisor window (CLAUDE.md: never compare runs from different
windows).  Best-of-N per cell; appends ONE JSON line
(metric=combine_scaling_ab) to BENCH/runs.jsonl.

Usage: python tools/combine_scaling_ab.py [--docs 300000] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(args) -> None:
    os.environ["SPARK_GRAFT_BUILD_COMBINE"] = str(args.combine)
    import bench_scaling

    from meme_search_engine_spark.session import get_spark
    from meme_search_engine_spark.index.build import docs_from_pages
    from meme_search_engine_spark.index.postings import (
        IndexConfig,
        build_partials_from_docs,
    )

    spark = get_spark(
        app_name=f"ab-combine{args.combine}-{args.cpus}",
        cores=args.cpus,
        shuffle_partitions=max(4 * args.cpus, 8),
    )
    cfg = IndexConfig(salt_shift=14)
    pages = spark.read.parquet(args.pages)
    n_docs = pages.count()
    docs = docs_from_pages(pages)
    # warm python workers + codegen off the clock
    build_partials_from_docs(
        docs_from_pages(pages.limit(2000)), 210.0, cfg
    ).count()
    cpu = bench_scaling._cpu_control(args.cpus)
    membw = bench_scaling._membw_control(args.cpus)
    t0 = time.time()
    n_blocks = build_partials_from_docs(docs, 210.0, cfg).count()
    wall = time.time() - t0
    print(
        "WORKER_RESULT "
        + json.dumps(
            {
                "combine": args.combine,
                "cpus": args.cpus,
                "n_docs": n_docs,
                "n_blocks": n_blocks,
                "partials_sec": round(wall, 3),
                "docs_per_sec": round(n_docs / wall, 1),
                "cpu_control_mops_per_proc": cpu,
                "membw_control_gbps": membw,
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--combine", type=int, default=1)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--pages", type=str, default="")
    ap.add_argument("--docs", type=int, default=300_000)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    if args.worker:
        worker(args)
        return

    from meme_search_engine_spark.datagen import ensure_corpus

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
    )
    pages_dir, _ = ensure_corpus(base, args.docs, n_files=32)
    cells: dict[tuple, dict] = {}
    order = [
        (c, n) for c in (0, 1) for n in (2, 8)
    ]
    for rep in range(args.repeats):
        for combine, cpus in order:
            proc = subprocess.run(
                [
                    sys.executable, os.path.abspath(__file__), "--worker",
                    "--combine", str(combine), "--cpus", str(cpus),
                    "--pages", pages_dir,
                ],
                capture_output=True, text=True, timeout=3600,
            )
            lines = [
                l for l in proc.stdout.splitlines()
                if l.startswith("WORKER_RESULT ")
            ]
            if not lines:
                print(proc.stderr[-2000:], file=sys.stderr)
                raise RuntimeError(f"worker c={combine} n={cpus} failed")
            r = json.loads(lines[0][len("WORKER_RESULT "):])
            print(json.dumps(r), file=sys.stderr)
            key = (combine, cpus)
            if key not in cells or r["partials_sec"] < cells[key]["partials_sec"]:
                cells[key] = r

    out = {"metric": "combine_scaling_ab", "cells": []}
    for combine in (0, 1):
        lo, hi = cells[(combine, 2)], cells[(combine, 8)]
        speed = hi["docs_per_sec"] / lo["docs_per_sec"]
        bw = (hi["membw_control_gbps"] or 1e-9) / max(
            lo["membw_control_gbps"] or 1e-9, 1e-9
        )
        out["cells"].append(
            {
                "combine": bool(combine),
                "partials_sec_2": lo["partials_sec"],
                "partials_sec_8": hi["partials_sec"],
                "speedup_2_to_8": round(speed, 3),
                "efficiency": round(speed / 4, 3),
                "membw_ceiling": round(bw, 3),
                "pct_of_ceiling": round(100 * speed / bw, 1),
                "controls": {
                    "cpu_2": lo["cpu_control_mops_per_proc"],
                    "cpu_8": hi["cpu_control_mops_per_proc"],
                    "membw_2": lo["membw_control_gbps"],
                    "membw_8": hi["membw_control_gbps"],
                },
            }
        )
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/runs.jsonl", "a") as fh:
        fh.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
