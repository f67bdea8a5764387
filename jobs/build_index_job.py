"""spark-submit entry point: build (or resume, or append to) a posting
index over a pages/documents table.

Cluster usage (the packaging contract of BASELINE.json's north rule):

    python -c "from meme_search_engine_spark.shipping import \
        build_pyfiles_zip; print(build_pyfiles_zip('mse_spark.zip'))"
    spark-submit --py-files mse_spark.zip jobs/build_index_job.py \
        --input s3://bucket/pages --output s3://bucket/index \
        --salt-shift 17 --buckets 4096 --parts 256 \
        [--append] [--parts-per-batch 16]

Locally it also runs directly (the session factory ships the package
to workers itself).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages parquet/table path")
    ap.add_argument("--output", required=True, help="index directory")
    ap.add_argument("--salt-shift", type=int, default=17)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--parts-per-batch", type=int, default=None)
    ap.add_argument("--append", action="store_true",
                    help="incremental append to an existing index")
    ap.add_argument("--cores", type=int, default=None,
                    help="local[N] cores (ignored under spark-submit)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active  # spark-submit provided the session config
        # project invariant: EVERY session path ships the package zip
        # (idempotent; a no-op when --py-files already did it)
        from meme_search_engine_spark.shipping import ensure_shipped

        ensure_shipped(spark)
    else:
        from meme_search_engine_spark.session import get_spark

        spark = get_spark(app_name="build-index", cores=args.cores)

    from meme_search_engine_spark.index.builder import append_to_index, build_index
    from meme_search_engine_spark.index.postings import IndexConfig

    # `table:catalog.db.pages[@snapshot]` reads via the session catalog
    # (Iceberg on a real cluster); a plain path reads parquet — see
    # meme_search_engine_spark/lake.py for the layout<->Iceberg mapping
    from meme_search_engine_spark.lake import load_pages

    pages = load_pages(spark, args.input)
    if args.append:
        manifest = append_to_index(spark, pages, args.output)
    else:
        cfg = IndexConfig(
            salt_shift=args.salt_shift,
            n_buckets=args.buckets,
            n_parts=args.parts,
            block_size=args.block_size,
        )
        manifest = build_index(
            spark, pages, args.output, cfg, parts_per_batch=args.parts_per_batch
        )
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
