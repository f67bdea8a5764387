"""spark-submit entry point: build (or append to) a sharded Vamana
graph ANN index over an embeddings table — the graph sibling of
build_ivf_job (reference analogue: the per-shard DiskANN build driver,
generate_index_shard.rs).

    spark-submit --py-files mse_spark.zip jobs/build_vamana_job.py \
        --input s3://bucket/embeddings --output s3://bucket/vamana \
        --shards 42 --r 64 --beam 192 --alpha 1.2 [--append]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="embeddings parquet/table")
    ap.add_argument("--output", required=True, help="Vamana index directory")
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--r", type=int, default=16, help="graph degree")
    ap.add_argument("--beam", type=int, default=48, help="build beam width")
    ap.add_argument("--alpha", type=float, default=1.2)
    ap.add_argument("--append", action="store_true",
                    help="route new vectors against the stored centroids "
                         "and rebuild only the touched shards")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
        from meme_search_engine_spark.shipping import ensure_shipped

        ensure_shipped(spark)
    else:
        from meme_search_engine_spark.session import get_spark

        spark = get_spark(app_name="build-vamana", cores=args.cores)

    from meme_search_engine_spark.lake import load_pages
    from meme_search_engine_spark.ops.vamana import (
        append_vamana_index,
        build_vamana_index,
    )

    emb = load_pages(spark, args.input)
    if args.append:
        manifest = append_vamana_index(spark, emb, args.output)
    else:
        manifest = build_vamana_index(
            spark,
            emb,
            args.output,
            n_shards=args.shards,
            r=args.r,
            beam=args.beam,
            alpha=args.alpha,
        )
    print(json.dumps(
        {k: v for k, v in manifest.items() if k != "centroids"}
    ))


if __name__ == "__main__":
    main()
