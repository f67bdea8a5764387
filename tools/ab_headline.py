"""Interleaved A/B of the full HEADLINE bench prefix (the six timed
queries of bench.py, same methodology, no 100k/ANN extras) between two
repo checkouts — the same-window discipline of tools/ab_build_bench.py
extended to every driver-timed query.

Worker:  python tools/ab_headline.py worker <repo_path> <data_dir> <label>
Driver:  python tools/ab_headline.py ab <repoA> <repoB> [pairs]
         (alternates A,B / B,A per pair; appends rows to BENCH/runs.jsonl)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def worker(repo: str, data_dir: str, label: str) -> None:
    sys.path.insert(0, repo)
    from meme_search_engine_spark.session import get_spark
    from meme_search_engine_spark import gate
    from meme_search_engine_spark.index.builder import build_index, load_index
    from meme_search_engine_spark.index.postings import IndexConfig
    from meme_search_engine_spark.query.wand import wand_topk

    sf_dir = "/root/testdata/sf0.1"
    out: dict = {"kind": "ab_headline", "label": label, "ts": time.time()}
    t0 = time.time()
    spark = get_spark(app_name=f"ab-{label}", cores=32, shuffle_partitions=32)
    out["session_sec"] = round(time.time() - t0, 3)
    timings: dict = {}

    def timed(name, fn, repeats=1):
        best, r = None, None
        for _ in range(repeats):
            t0 = time.time()
            r = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return r

    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    pages = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = IndexConfig(salt_shift=12, n_buckets=32, n_parts=8)
    idx = tempfile.mkdtemp(prefix="ab_idx_")
    try:
        timed("index_build", lambda: build_index(spark, pages, idx, cfg))
        timed(
            "bm25_exhaustive",
            lambda: gate.q_bm25_topk(spark, sf_dir).collect(),
            repeats=2,
        )
        segments, term_stats, manifest = load_index(spark, idx)
        segments = segments.cache()
        segments.count()
        qdf = spark.createDataFrame(
            gate.GATE_QUERIES, "query_id int, text string, k int"
        )
        timed(
            "wand_topk",
            lambda: wand_topk(
                spark, segments, term_stats, manifest, qdf
            ).collect(),
            repeats=2,
        )
        timed(
            "doc_stats",
            lambda: gate.q_doc_stats(spark, sf_dir).collect(),
            repeats=2,
        )
        timed(
            "term_df_top",
            lambda: gate.q_term_df_top(spark, sf_dir).collect(),
            repeats=2,
        )
        html_pages = spark.read.parquet(
            os.path.join(data_dir, "pages_20000")
        ).drop("text")
        idx2 = tempfile.mkdtemp(prefix="ab_idx_html_")
        try:
            timed(
                "index_build_from_html",
                lambda: build_index(spark, html_pages, idx2, cfg),
            )
        finally:
            shutil.rmtree(idx2, ignore_errors=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
        spark.stop()
    out["queries"] = timings
    out["value"] = round(sum(timings.values()), 3)
    print("ABRESULT " + json.dumps(out), flush=True)


def ab(repo_a: str, repo_b: str, pairs: int) -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data_dir = os.path.join(here, "data")
    sys.path.insert(0, here)
    from bench_scaling import _cpu_control, _membw_control

    runs_path = os.path.join(here, "BENCH", "runs.jsonl")
    results: list[dict] = []
    for p in range(pairs):
        order = [repo_a, repo_b] if p % 2 == 0 else [repo_b, repo_a]
        for repo in order:
            label = "A" if repo == repo_a else "B"
            ctl = {"cpu_control_mops": _cpu_control(8),
                   "membw_control_gbps": _membw_control(8)}
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "worker", repo, data_dir, f"{label}:{repo}",
            ]
            r = subprocess.run(
                cmd, capture_output=True, text=True, cwd=repo
            )
            row = None
            for line in r.stdout.splitlines():
                if line.startswith("ABRESULT "):
                    row = json.loads(line[len("ABRESULT "):])
            if row is None:
                print(f"pair {p} {label}: FAILED rc={r.returncode}\n"
                      + r.stderr[-2000:])
                continue
            row.update(ctl)
            row["pair"] = p
            results.append(row)
            with open(runs_path, "a") as fh:
                fh.write(json.dumps(row) + "\n")
            print(
                f"pair {p} {label}: value={row['value']} "
                f"queries={row['queries']} cpu={ctl['cpu_control_mops']}",
                flush=True,
            )
    # summary: per-query best across draws per side
    for side, name in (("A", repo_a), ("B", repo_b)):
        rows = [r for r in results if r["label"].startswith(side)]
        if not rows:
            continue
        best = {
            q: min(r["queries"][q] for r in rows)
            for q in rows[0]["queries"]
        }
        med = {
            q: sorted(r["queries"][q] for r in rows)[len(rows) // 2]
            for q in rows[0]["queries"]
        }
        print(f"{side} ({name}) best={best}")
        print(f"{side} ({name}) med ={med}")


if __name__ == "__main__":
    if sys.argv[1] == "worker":
        worker(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        ab(sys.argv[2], sys.argv[3], int(sys.argv[4]) if len(sys.argv) > 4 else 3)
