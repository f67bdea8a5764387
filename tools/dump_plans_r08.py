"""Dump .explain('formatted') for the r8-touched queries.

Usage: python tools/dump_plans_r08.py <repo_path> <out_dir> <suffix>
  suffix: "before" (run with repo_path=r7 checkout) or "after" (HEAD).
Writes <out_dir>/<query>_<suffix>.txt — the judge checks plan claims
against these files.
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

repo, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)
os.makedirs(out_dir, exist_ok=True)

from meme_search_engine_spark.session import get_spark  # noqa: E402
from meme_search_engine_spark import gate  # noqa: E402
from meme_search_engine_spark.index.build import docs_from_pages  # noqa: E402
from meme_search_engine_spark.index.builder import build_index, load_index  # noqa: E402
from meme_search_engine_spark.index.postings import (  # noqa: E402
    IndexConfig,
    build_partials_from_docs,
    finalize_segments,
)

import pyspark.sql.functions as F  # noqa: E402

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name=f"plans-{suffix}", cores=8, shuffle_partitions=8)


def dump(name: str, df) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
        fh.write(buf.getvalue())
    print("dumped", name, flush=True)


pages = spark.read.parquet(f"{sf_dir}/documents.parquet")
cfg = IndexConfig(salt_shift=12, n_buckets=32, n_parts=8)

# the build's two big DataFrames (stage-1 partials, stage-2 finalize)
docs = docs_from_pages(pages)
if hasattr(docs, "select"):
    try:
        docs_b = docs.select("doc_id", "url", "tokens", "doc_len")
    except Exception:
        docs_b = docs
dump("build_partials", build_partials_from_docs(docs_b, 200.0, cfg))

idx = tempfile.mkdtemp(prefix="plan_idx_")
try:
    build_index(spark, pages, idx, cfg)
    partials = spark.read.parquet(os.path.join(idx, "partials", "epoch=0"))
    dump("build_finalize_segments", finalize_segments(partials, cfg))

    # gate queries timed by the driver bench
    dump("bm25_exhaustive", gate.q_bm25_topk(spark, sf_dir))
    dump("doc_stats", gate.q_doc_stats(spark, sf_dir))
    dump("term_df_top", gate.q_term_df_top(spark, sf_dir))

    from meme_search_engine_spark.query.wand import wand_topk

    segments, term_stats, manifest = load_index(spark, idx)
    qdf = spark.createDataFrame(
        gate.GATE_QUERIES, "query_id int, text string, k int"
    )
    dump("wand_topk", wand_topk(spark, segments, term_stats, manifest, qdf))
finally:
    import shutil

    shutil.rmtree(idx, ignore_errors=True)
spark.stop()
