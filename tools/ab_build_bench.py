"""One-shot build-bench worker for interleaved A/B (tools/ab_build_bench.py).

Usage: python tools/ab_build_bench.py <repo_path> <label>
Times build_index on sf0.1 documents (5k docs) and the 100k html-less
pages corpus, one draw each, and prints ONE JSON line.  The caller
interleaves A/B subprocess runs so both versions sample the same
hypervisor-noise window (CLAUDE.md: windows drift minute-to-minute —
never compare runs from different windows).
"""

import json
import os
import shutil
import sys
import tempfile
import time

repo, label = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)

from meme_search_engine_spark.session import get_spark  # noqa: E402
from meme_search_engine_spark.index.builder import build_index  # noqa: E402
from meme_search_engine_spark.index.postings import IndexConfig  # noqa: E402

spark = get_spark(app_name=f"ab-{label}", cores=32, shuffle_partitions=32)
out = {"label": label, "repo": repo}

sf_docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
sf_docs.count()  # warm scan

# warm the python-worker/Arrow path with a small throwaway build so the
# timed draws measure the engine, not worker fork/import
warm_dir = tempfile.mkdtemp(prefix="ab_warm_")
try:
    build_index(
        spark,
        sf_docs.limit(500),
        warm_dir,
        IndexConfig(salt_shift=12, n_buckets=32, n_parts=8),
    )
finally:
    shutil.rmtree(warm_dir, ignore_errors=True)

for name, pages, cfg in [
    (
        "sf01_5k",
        sf_docs,
        IndexConfig(salt_shift=12, n_buckets=32, n_parts=8),
    ),
    (
        "big_100k",
        spark.read.parquet(os.path.join(repo, "data", "pages_100000")),
        IndexConfig(salt_shift=14, n_buckets=64, n_parts=8),
    ),
]:
    idx = tempfile.mkdtemp(prefix=f"ab_{name}_")
    try:
        t0 = time.time()
        build_index(spark, pages, idx, cfg)
        out[name] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(idx, ignore_errors=True)

spark.stop()
print(json.dumps(out))
