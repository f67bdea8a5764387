"""End-to-end training-data pipeline (jobs/pipeline_job.run_pipeline):
filter -> dedup -> index build (+ optional vector indexes), stage
counts monotone, the built index queryable and duplicate-free."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def dirty_pages(spark, sf001_dir):
    """documents plus planted exact duplicates and junk rows."""
    base = spark.read.parquet(f"{sf001_dir}/documents.parquet").toPandas()
    dups = base.head(5).copy()
    dups["doc_id"] = [900001 + i for i in range(5)]  # same text, new ids
    junk = pd.DataFrame(
        {
            "doc_id": [910001, 910002],
            "text": ["zz", "yy qq"],
            "lang": ["en", "en"],
            "source": ["junk", "junk"],
            "n_chars": [2, 5],
        }
    )
    pdf = pd.concat(
        [base, dups[base.columns], junk[base.columns]], ignore_index=True
    )
    return spark.createDataFrame(pdf)


def test_pipeline_end_to_end(spark, dirty_pages, tmp_path):
    from jobs.pipeline_job import run_pipeline
    from meme_search_engine_spark.index.postings import IndexConfig
    from meme_search_engine_spark.query.serve import LocalSearcher

    n_in = dirty_pages.count()
    summary = run_pipeline(
        spark,
        dirty_pages,
        str(tmp_path / "work"),
        min_tokens=5,
        lang="en",
        dedup="exact",
        index_cfg=IndexConfig(salt_shift=10, n_buckets=8, n_parts=2),
    )
    assert summary["rows_in"] == n_in
    # junk filtered, duplicates removed, counts monotone
    assert summary["rows_after_quality"] <= n_in - 2
    assert summary["rows_after_dedup"] == summary["rows_after_quality"] - 5
    assert summary["index_docs"] == summary["rows_after_dedup"]

    s = LocalSearcher(summary["index_dir"])
    res = s.search("key value table", k=5)
    assert len(res) == 5
    # none of the planted duplicate doc_ids survived (min-doc_id wins)
    all_ids = {r["doc_id"] for r in res}
    assert not any(i >= 900001 for i in all_ids)


def test_pipeline_with_vector_indexes(spark, sf001_dir, tmp_path):
    import pyspark.sql.functions as F

    from jobs.pipeline_job import run_pipeline
    from meme_search_engine_spark.index.postings import IndexConfig
    from meme_search_engine_spark.ops import ivf_index

    pages = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf001_dir}/embeddings.parquet")
    summary = run_pipeline(
        spark,
        pages,
        str(tmp_path / "work2"),
        dedup="exact",
        embeddings=emb,
        build_ivf=True,
        index_cfg=IndexConfig(salt_shift=10, n_buckets=8, n_parts=2),
    )
    assert "ivf_dir" in summary and summary["vectors_kept"] > 0
    qpd = (
        emb.orderBy("vec_id").limit(2)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
        )
        .toPandas()
    )
    res = ivf_index.ivf_search(
        spark, summary["ivf_dir"], qpd, k=5, n_probe=4
    ).collect()
    assert len(res) == 10
