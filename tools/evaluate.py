"""Evaluation harness — the reference's ``evaluate()`` shape
(/root/reference/src/query_disk_index.rs:225-343: brute-force oracle
comparison, recall@K, rank stats, QPS) for the BM25 engine.

Builds an index over a deterministic synthetic corpus, runs the
reference query set through the WAND serving path, compares against
the exhaustive pure-Python oracle, and prints one JSON line:
recall@k (must be 1.0 — WAND is exact), rank-identity rate, score
identity rate, p50/p95 latency, QPS.

Usage: python tools/evaluate.py [--docs 5000] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=5000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    import duckdb

    from meme_search_engine_spark.datagen import ensure_corpus, generate_queries
    from meme_search_engine_spark.index.builder import build_index
    from meme_search_engine_spark.index.postings import IndexConfig
    from meme_search_engine_spark.oracle import OracleIndex
    from meme_search_engine_spark.query.serve import LocalSearcher
    from meme_search_engine_spark.session import get_spark

    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
    pages_dir, _ = ensure_corpus(base, args.docs)
    idx_dir = os.path.join(base, f"eval_idx_{args.docs}")
    if not os.path.exists(os.path.join(idx_dir, "manifest.json")):
        spark = get_spark(app_name="evaluate", cores=args.cores)
        build_index(
            spark, spark.read.parquet(pages_dir), idx_dir,
            IndexConfig(salt_shift=12, n_buckets=32, n_parts=8),
        )
        spark.stop()

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{pages_dir}/*.parquet' ORDER BY doc_id"
    ).fetchall()
    oracle = OracleIndex.build(rows)
    searcher = LocalSearcher(idx_dir)
    searcher.search("term0001")  # warm

    queries = generate_queries(args.docs)
    lat, n_rank_ident, n_score_ident, recall_num, recall_den = [], 0, 0, 0, 0
    for q in queries:
        t0 = time.time()
        got = searcher.search(q["text"], q["k"])
        lat.append(time.time() - t0)
        expected = oracle.topk(q["text"], q["k"])
        got_t = [(r["rank"], r["doc_id"], r["score_fixed"]) for r in got]
        exp_t = [(rank, doc, sf) for rank, doc, sf, _ in expected]
        n_rank_ident += [x[:2] for x in got_t] == [x[:2] for x in exp_t]
        n_score_ident += got_t == exp_t
        exp_ids = {doc for _, doc, _, _ in expected}
        recall_num += len(exp_ids & {r["doc_id"] for r in got})
        recall_den += len(exp_ids)
    lat.sort()
    nq = len(queries)
    print(
        json.dumps(
            {
                "n_docs": args.docs,
                "n_queries": nq,
                "recall_at_k": round(recall_num / max(recall_den, 1), 6),
                "rank_identical": f"{n_rank_ident}/{nq}",
                "score_identical": f"{n_score_ident}/{nq}",
                "p50_ms": round(1000 * lat[nq // 2], 2),
                "p95_ms": round(1000 * lat[int(nq * 0.95)], 2),
                "qps_serial": round(nq / sum(lat), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
