"""r8 optimization instrumentation: per-phase + per-query timings with
job counts, isolated from the frozen bench.py (guide §1.4 noop-sink
methodology).  Appends one JSON line per run to BENCH/runs.jsonl.

Usage: python tools/bench_phases.py [--skip-html] [--skip-build]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-html", action="store_true")
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--skip-queries", action="store_true")
    ap.add_argument("--label", default="r8_phases")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bench_scaling import _cpu_control, _membw_control
    from meme_search_engine_spark.session import get_spark
    from meme_search_engine_spark import gate
    from meme_search_engine_spark.index.builder import build_index, load_index
    from meme_search_engine_spark.index.postings import IndexConfig
    from meme_search_engine_spark.query.wand import wand_topk

    out: dict = {"kind": args.label, "cpus": cpus, "ts": time.time()}
    out["cpu_control_mops"] = _cpu_control(8)
    out["membw_control_gbps"] = _membw_control(8)

    spark = get_spark(app_name="bench_phases", cores=cpus, shuffle_partitions=cpus)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def run_grouped(name: str, fn):
        """Run fn under a job group; return (wall_sec, n_jobs, result)."""
        sc.setJobGroup(name, name)
        t0 = time.time()
        r = fn()
        dt = time.time() - t0
        sc.setJobGroup("default", "default")
        jobs = tracker.getJobIdsForGroup(name)
        return round(dt, 3), len(jobs), r

    # warm JVM
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    import shutil

    if not args.skip_build:
        cfg = IndexConfig(salt_shift=12, n_buckets=32, n_parts=8)
        pages = spark.read.parquet(f"{sf_dir}/documents.parquet")
        phases: dict = {}
        idx_dir = tempfile.mkdtemp(prefix="phase_idx_")
        try:
            dt, nj, _ = run_grouped(
                "index_build",
                lambda: build_index(spark, pages, idx_dir, cfg, timings=phases),
            )
            out["index_build_sec"] = dt
            out["index_build_jobs"] = nj
            out["index_build_phases"] = phases
            # keep index for wand below
            if not args.skip_queries:
                segments, term_stats, manifest = load_index(spark, idx_dir)
                segments = segments.cache()
                segments.count()
                qdf = spark.createDataFrame(
                    gate.GATE_QUERIES, "query_id int, text string, k int"
                )
                for rep in range(2):
                    dt, nj, _ = run_grouped(
                        f"wand_topk_{rep}",
                        lambda: wand_topk(
                            spark, segments, term_stats, manifest, qdf
                        ).collect(),
                    )
                    out[f"wand_topk_{rep}_sec"] = dt
                    out[f"wand_topk_{rep}_jobs"] = nj
                segments.unpersist()
        finally:
            shutil.rmtree(idx_dir, ignore_errors=True)

    if not args.skip_queries:
        for rep in range(2):
            dt, nj, _ = run_grouped(
                f"bm25_exhaustive_{rep}",
                lambda: gate.q_bm25_topk(spark, sf_dir).collect(),
            )
            out[f"bm25_exhaustive_{rep}_sec"] = dt
            out[f"bm25_exhaustive_{rep}_jobs"] = nj
        for rep in range(2):
            dt, nj, _ = run_grouped(
                f"doc_stats_{rep}",
                lambda: gate.q_doc_stats(spark, sf_dir).collect(),
            )
            out[f"doc_stats_{rep}_sec"] = dt
            out[f"doc_stats_{rep}_jobs"] = nj
        for rep in range(2):
            dt, nj, _ = run_grouped(
                f"term_df_top_{rep}",
                lambda: gate.q_term_df_top(spark, sf_dir).collect(),
            )
            out[f"term_df_top_{rep}_sec"] = dt
            out[f"term_df_top_{rep}_jobs"] = nj

    if not args.skip_html:
        from meme_search_engine_spark.datagen import ensure_corpus

        sf = sf_dir.rstrip("/").split("sf")[-1]
        n_html = max(2000, min(int(20000 * float(sf or 0.1) * 10), 50000))
        pages_dir, _ = ensure_corpus(
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "data",
            ),
            n_html,
        )
        html_pages = spark.read.parquet(pages_dir).drop("text")
        cfg = IndexConfig(salt_shift=12, n_buckets=32, n_parts=8)
        phases2: dict = {}
        idx2 = tempfile.mkdtemp(prefix="phase_idx_html_")
        try:
            dt, nj, _ = run_grouped(
                "index_build_from_html",
                lambda: build_index(
                    spark, html_pages, idx2, cfg, timings=phases2
                ),
            )
            out["index_build_from_html_sec"] = dt
            out["index_build_from_html_jobs"] = nj
            out["index_build_from_html_phases"] = phases2
        finally:
            shutil.rmtree(idx2, ignore_errors=True)

    spark.stop()
    out["cpu_control_mops_end"] = _cpu_control(8)
    out["membw_control_gbps_end"] = _membw_control(8)
    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH",
            "runs.jsonl",
        ),
        "a",
    ) as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
