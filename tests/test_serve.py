"""Driver-local serving path: identical results to the oracle, at
interactive latency (SURVEY.md §3.2 analogue)."""

import time

import pytest

from meme_search_engine_spark.datagen import ensure_corpus, generate_queries
from meme_search_engine_spark.index.builder import build_index
from meme_search_engine_spark.index.postings import IndexConfig
from meme_search_engine_spark.oracle import OracleIndex
from meme_search_engine_spark.query.serve import LocalSearcher

N_DOCS = 500


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("serve")
    pages_dir, _ = ensure_corpus(str(base), N_DOCS)
    out = str(base / "idx")
    build_index(
        spark,
        spark.read.parquet(pages_dir),
        out,
        IndexConfig(salt_shift=7, n_buckets=8, n_parts=2, block_size=32),
    )
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{pages_dir}/*.parquet' ORDER BY doc_id"
    ).fetchall()
    return out, OracleIndex.build(rows)


def test_local_searcher_rank_identity(built):
    index_dir, oracle = built
    searcher = LocalSearcher(index_dir)
    for q in generate_queries(N_DOCS):
        got = [
            (r["rank"], r["doc_id"], r["score_fixed"])
            for r in searcher.search(q["text"], q["k"])
        ]
        expected = [
            (rank, doc_id, sf)
            for rank, doc_id, sf, _ in oracle.topk(q["text"], q["k"])
        ]
        assert got == expected, q["text"]


def test_local_searcher_urls(built, spark):
    index_dir, _ = built
    searcher = LocalSearcher(index_dir)
    results = searcher.search("term0001 term0100", 5, with_urls=True)
    assert results and all(
        r["url"] and r["url"].startswith("https://example") for r in results
    )
    # urls must belong to the right docs
    meta = {
        r["doc_id"]: r["url"]
        for r in spark.read.parquet(
            f"{index_dir}/docmeta"
        ).collect()
    }
    for r in results:
        assert r["url"] == meta[r["doc_id"]]


def test_local_searcher_quality_prior_matches_spark_engine(built, spark):
    """search_quality == bm25_topk_with_prior (same fixed-point prior
    from the same channels), rank- and score-identical."""
    import pyspark.sql.functions as F

    from meme_search_engine_spark.gate import quality_prior_fixed
    from meme_search_engine_spark.index.build import (
        corpus_stats,
        docs_from_pages,
        term_df,
        term_doc_tf,
    )
    from meme_search_engine_spark.query.dataframe_engine import (
        bm25_topk_with_prior,
    )

    import os

    index_dir, _ = built
    searcher = LocalSearcher(index_dir)
    pages_dir = os.path.join(os.path.dirname(index_dir), f"pages_{N_DOCS}")
    pages = spark.read.parquet(pages_dir)
    docs = docs_from_pages(pages)
    tf = term_doc_tf(docs)
    stats = corpus_stats(docs)
    priors = quality_prior_fixed(pages)
    for qid, text in enumerate(["term0001 term0100", "term0007", "the term0042"]):
        qdf = spark.createDataFrame(
            [(qid, text, 10)], "query_id int, text string, k int"
        )
        expected = [
            (r["rank"], r["doc_id"], r["score_fixed"])
            for r in bm25_topk_with_prior(
                tf, term_df(tf), stats, qdf, priors
            ).collect()
        ]
        got = [
            (r["rank"], r["doc_id"], r["score_fixed"])
            for r in searcher.search_quality(text, 10)
        ]
        assert got == sorted(expected), text


def test_local_searcher_latency(built):
    index_dir, _ = built
    searcher = LocalSearcher(index_dir)
    searcher.search("term0001 term0100")  # warm
    lat = []
    for i in range(20):
        t0 = time.time()
        searcher.search(f"term{i:04d} term{(i * 37) % 3000:04d}", 10)
        lat.append(time.time() - t0)
    lat.sort()
    # interactive: p50 well under the Spark job-launch floor
    assert lat[10] < 0.5, lat


def test_embedding_point_lookup_budget_paths(sf01_dir):
    """_EmbeddingPointLookup must return IDENTICAL (ids, vectors) from
    both of its modes: cached (table fits the byte budget) and the
    over-budget dataset-level filtered fallback (budget 0)."""
    import os

    import numpy as np

    from meme_search_engine_spark.query.serve import _EmbeddingPointLookup

    path = f"{sf01_dir}/embeddings.parquet"
    ids = [3, 7, 11, 200, 123456789]  # incl. a missing id

    cached = _EmbeddingPointLookup(path)
    assert cached._cacheable
    got_c = cached.vectors_for(ids)

    os.environ["SPARK_GRAFT_EMB_CACHE_MB"] = "0"
    try:
        filtered = _EmbeddingPointLookup(path)
        assert not filtered._cacheable
        got_f = filtered.vectors_for(ids)
    finally:
        del os.environ["SPARK_GRAFT_EMB_CACHE_MB"]

    assert np.array_equal(got_c[0], got_f[0])
    assert np.array_equal(got_c[1], got_f[1])
    assert len(got_c[0]) == 4  # the missing id dropped
    assert list(got_c[0]) == sorted(got_c[0])  # ascending contract


def test_resident_caches_invalidate_on_rewrite(spark, tmp_path):
    """A server running across an index/table REWRITE must not serve
    stale decoded vectors (ADVICE r05): the module-level caches
    fingerprint the path (manifest/commit-marker stat) per access and
    rebuild when it moves."""
    import numpy as np
    import pandas as pd

    from meme_search_engine_spark.datagen import generate_embeddings
    from meme_search_engine_spark.ops.ivf_index import build_ivf_index
    from meme_search_engine_spark.ops.similarity import (
        deterministic_centroids,
    )
    from meme_search_engine_spark.query.serve import LocalSearcher

    def emb_df(seed_shift):
        ids, vecs = generate_embeddings(300, 16)
        pdf = pd.DataFrame(
            {
                "vec_id": ids,
                # shift vectors so the rewrite visibly changes results
                "embedding": [
                    [float(x) for x in np.roll(v, seed_shift)] for v in vecs
                ],
            }
        )
        return spark.createDataFrame(
            pdf, "vec_id bigint, embedding array<float>"
        )

    out = str(tmp_path / "ivf")
    emb_path = str(tmp_path / "emb")
    e1 = emb_df(0)
    e1.write.mode("overwrite").parquet(emb_path)
    build_ivf_index(
        spark, e1, out, centroids=deterministic_centroids(e1, 4)
    )

    s = LocalSearcher.__new__(LocalSearcher)  # only the cache methods
    q = [float(x) for x in np.arange(16)]
    ivf1 = s._ivf(out)
    c1 = ivf1.candidates(q, k=5, n_probe=4)
    ids1, m1 = s._vectors_for(emb_path, c1)
    assert s._ivf(out) is ivf1  # unchanged dir -> same resident object

    # rewrite BOTH the index and the table with different content
    e2 = emb_df(3)
    e2.write.mode("overwrite").parquet(emb_path)
    build_ivf_index(
        spark, e2, out, centroids=deterministic_centroids(e2, 4)
    )

    ivf2 = s._ivf(out)
    assert ivf2 is not ivf1  # fingerprint moved -> rebuilt
    c2 = ivf2.candidates(q, k=5, n_probe=4)
    ids2, m2 = s._vectors_for(emb_path, sorted(set(c1) | set(c2)))
    # the served vectors are the REWRITTEN table's (roll(3) != roll(0))
    common = np.intersect1d(ids1, ids2)
    assert len(common)
    row1 = m1[np.searchsorted(ids1, common[0])]
    row2 = m2[np.searchsorted(ids2, common[0])]
    assert not np.array_equal(row1, row2)
    assert np.array_equal(np.roll(row2, -3), row1)


def test_serve_survives_compaction_swap(spark, tmp_path):
    """A searcher whose fragment map predates a compact_index swap must
    serve THROUGH the swap (re-resolve + retry, VERDICT r07 #3) — no
    FileNotFoundError, results identical to a fresh post-compact
    searcher, and already-decoded terms stay correct."""
    import pyspark.sql.functions as F

    from meme_search_engine_spark.datagen import rare_term
    from meme_search_engine_spark.index.builder import (
        append_to_index,
        compact_index,
    )

    base = tmp_path
    pages_dir, _ = ensure_corpus(str(base), N_DOCS)
    pages = spark.read.parquet(pages_dir)
    out = str(base / "swap_idx")
    cfg = IndexConfig(salt_shift=7, n_buckets=8, n_parts=2, block_size=32)
    split = N_DOCS * 7 // 10
    build_index(spark, pages.filter(F.col("doc_id") < split), out, cfg)
    append_to_index(spark, pages.filter(F.col("doc_id") >= split), out)

    s = LocalSearcher(out)
    head_before = s.search("term0001", 10)  # warms + decodes this term
    compact_index(spark, out)  # old segment files are GONE now

    # uncached terms force fragment reads through the stale map
    fresh = LocalSearcher(out)
    for text in (rare_term(5), "term0002 term0150", "term0100"):
        assert s.search(text, 10) == fresh.search(text, 10), text
    # decoded-cache entries from before the swap stay correct
    # (compaction preserves logical content)
    assert s.search("term0001", 10) == head_before
    assert fresh.search("term0001", 10) == head_before


def test_ivf_probe_survives_compact_swap(spark, tmp_path):
    """LocalIVF keeps answering through a compact_ivf_index rewrite:
    stale fragments trigger one re-resolve + retry, and the candidate
    set is invariant (compaction only dedups rows)."""
    from meme_search_engine_spark.datagen import ensure_embeddings
    from meme_search_engine_spark.ops.ivf_index import (
        append_ivf_index,
        build_ivf_index,
        compact_ivf_index,
    )
    from meme_search_engine_spark.query.serve import LocalIVF

    emb_dir = ensure_embeddings(str(tmp_path), 2000)
    emb = spark.read.parquet(emb_dir)
    d = str(tmp_path / "ivf_swap")
    build_ivf_index(
        spark, emb.filter("vec_id < 1500"), d, n_lists=8, n_iters=2
    )
    append_ivf_index(spark, emb.filter("vec_id >= 1500"), d)
    probe = LocalIVF(d)
    q = [float(x) for x in emb.filter("vec_id = 3").collect()[0]["embedding"]]
    before = probe.candidates(q, k=10, n_probe=4)
    compact_ivf_index(spark, d)  # lists rewritten, old files gone
    after = probe.candidates(q, k=10, n_probe=4)
    assert after == LocalIVF(d).candidates(q, k=10, n_probe=4)
    assert after == before
