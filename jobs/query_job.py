"""spark-submit entry point: batch BM25 top-k over a built index.

    spark-submit --py-files mse_spark.zip jobs/query_job.py \
        --index s3://bucket/index --queries s3://bucket/queries.parquet \
        --output s3://bucket/topk [--engine wand|exhaustive] [--k 10]

queries parquet schema: (query_id int, text string[, k int]).
Output: (query_id, rank, doc_id, score_fixed, score).

For single interactive queries use query.serve.LocalSearcher instead —
no Spark job launch on the query path.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--engine", choices=("wand", "exhaustive"), default="wand")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
        # project invariant: EVERY session path ships the package zip
        # (idempotent; a no-op when --py-files already did it)
        from meme_search_engine_spark.shipping import ensure_shipped

        ensure_shipped(spark)
    else:
        from meme_search_engine_spark.session import get_spark

        spark = get_spark(app_name="bm25-query", cores=args.cores)

    from meme_search_engine_spark.index.builder import load_index
    from meme_search_engine_spark.query.wand import wand_topk

    segments, term_stats, manifest = load_index(spark, args.index)
    queries = spark.read.parquet(args.queries)

    if args.engine == "wand":
        out = wand_topk(spark, segments, term_stats, manifest, queries, args.k)
    else:
        from meme_search_engine_spark.index.postings import (
            decode_segments_to_postings,
        )
        from meme_search_engine_spark.query.dataframe_engine import bm25_topk

        postings = decode_segments_to_postings(segments)
        tf = postings.select("term_hash", "doc_id", "tf", "doc_len")
        term_df = postings.select("term_hash", "df").distinct()
        out = bm25_topk(tf, term_df, manifest["stats"], queries, args.k)

    out.write.mode("overwrite").parquet(args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
