"""spark-submit entry point: build (or append to) a persistent IVF
ANN index over an embeddings table — the ANN sibling of
build_index_job (reference analogue: the DiskANN shard build driver,
dump_processor.rs:428-461).

    spark-submit --py-files mse_spark.zip jobs/build_ivf_job.py \
        --input s3://bucket/embeddings --output s3://bucket/ivf \
        --lists 4096 --spill 2 --storage pq --pq-m 64 [--opq] [--append]

storage: fp32 | fp16 | int8 | pq (see ops/ivf_index.build_ivf_index
for the footprint/recall trade of each tier).
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
    ap.add_argument("--output", required=True, help="IVF index directory")
    ap.add_argument("--lists", type=int, default=64)
    ap.add_argument("--spill", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument(
        "--storage", choices=("fp32", "fp16", "int8", "pq"), default="fp16"
    )
    ap.add_argument("--pq-m", type=int, default=8)
    ap.add_argument("--pq-ksub", type=int, default=256)
    ap.add_argument("--opq", action="store_true",
                    help="train an OPQ rotation for pq storage")
    ap.add_argument("--append", action="store_true",
                    help="assign new vectors against the stored centroids")
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

        spark = get_spark(app_name="build-ivf", cores=args.cores)

    from meme_search_engine_spark.lake import load_pages
    from meme_search_engine_spark.ops.ivf_index import (
        append_ivf_index,
        build_ivf_index,
    )

    emb = load_pages(spark, args.input)
    if args.append:
        manifest = append_ivf_index(spark, emb, args.output)
    else:
        manifest = build_ivf_index(
            spark,
            emb,
            args.output,
            n_lists=args.lists,
            spill=args.spill,
            n_iters=args.iters,
            storage=args.storage,
            pq_m=args.pq_m,
            pq_ksub=args.pq_ksub,
            pq_opq=args.opq,
        )
    out = {k: v for k, v in manifest.items()
           if k not in ("centroids", "pq_codebooks", "pq_rotation",
                        "int8_smin", "int8_smax")}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
