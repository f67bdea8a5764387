"""Hybrid text+vector fusion: the candidate-union scale path must
reproduce the dense fused ranking (reference analogue: ANN candidates
reranked with full score channels, query_disk_index.rs:486-527)."""

import pyspark.sql.functions as F
import pytest

from meme_search_engine_spark.gate import GATE_QUERIES, _corpus
from meme_search_engine_spark.query.dataframe_engine import (
    hybrid_topk,
    hybrid_topk_pruned,
)


@pytest.fixture(scope="module")
def hybrid_inputs(spark, sf01_dir):
    emb = spark.read.parquet(f"{sf01_dir}/embeddings.parquet").cache()
    qtext = spark.createDataFrame(
        GATE_QUERIES, "query_id int, text string, k int"
    )
    qv = emb.filter(F.col("vec_id") < len(GATE_QUERIES)).select(
        F.col("vec_id").cast("int").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    c = _corpus(spark, sf01_dir)
    return {
        "c": c,
        "queries": qtext.join(qv, "query_id"),
        "doc_vecs": emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
    }


def _rows(df):
    return [
        (r["query_id"], r["rank"], r["doc_id"], r["score_fixed"])
        for r in df.orderBy("query_id", "rank").collect()
    ]


def test_pruned_matches_dense(spark, hybrid_inputs):
    h = hybrid_inputs
    dense = hybrid_topk(
        h["c"]["tf"], h["c"]["term_df"], h["c"]["stats"],
        h["queries"], h["doc_vecs"],
    )
    pruned = hybrid_topk_pruned(
        spark, h["c"]["tf"], h["c"]["term_df"], h["c"]["stats"],
        h["queries"], h["doc_vecs"], n_candidates=200,
    )
    assert _rows(pruned) == _rows(dense)


def test_channels_both_contribute(spark, hybrid_inputs):
    """Text-less query ids still rank by cosine; a doc matching query
    terms outranks its pure-cosine score."""
    h = hybrid_inputs
    dense = hybrid_topk(
        h["c"]["tf"], h["c"]["term_df"], h["c"]["stats"],
        h["queries"], h["doc_vecs"],
    ).collect()
    by_qid = {}
    for r in dense:
        by_qid.setdefault(r["query_id"], []).append(r)
    # query 3 is 'zzzmissingterm' — no BM25 hits, ranking is pure
    # cosine, still k results (the vector channel is dense)
    assert len(by_qid[3]) == 10
    # every score_fixed is the exact integer fusion (divisible check:
    # pure-cosine scores are multiples of COSINE_STEP_FIXED)
    from meme_search_engine_spark.query.dataframe_engine import (
        COSINE_STEP_FIXED,
    )

    for r in by_qid[3]:
        assert r["score_fixed"] % COSINE_STEP_FIXED == 0


def test_serve_hybrid_matches_batch(spark, sf01_dir, hybrid_inputs, tmp_path):
    """LocalSearcher.search_hybrid (IVF-candidate union + exact point-
    lookup rerank — no full-matrix load) reproduces the batch
    hybrid_topk_pruned(vec_candidates=ivf_search) rank- AND
    score_fixed-identically per gate query, and with the full-recall
    probe config it equals the dense fused ranking too."""
    from meme_search_engine_spark.gate import _built_index
    from meme_search_engine_spark.ops import ivf_index
    from meme_search_engine_spark.ops.similarity import (
        deterministic_centroids,
    )
    from meme_search_engine_spark.query.serve import LocalSearcher

    h = hybrid_inputs
    emb = h["doc_vecs"].select(F.col("doc_id").alias("vec_id"), "embedding")
    out = str(tmp_path / "ivf_serve")
    ivf_index.build_ivf_index(
        spark, emb, out, centroids=deterministic_centroids(emb, 8),
        spill=1, storage="fp32",
    )
    C, NP = 200, 8
    qpd = h["queries"].select("query_id", "qvec").toPandas()
    vec_cands = ivf_index.ivf_search(
        spark, out, qpd, k=C, n_probe=NP
    ).select("query_id", F.col("vec_id").alias("doc_id"))
    batch = hybrid_topk_pruned(
        spark, h["c"]["tf"], h["c"]["term_df"], h["c"]["stats"],
        h["queries"], h["doc_vecs"], n_candidates=C,
        vec_candidates=vec_cands,
    ).collect()
    by_qid = {}
    for r in batch:
        by_qid.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score_fixed"])
        )
    dense = hybrid_topk(
        h["c"]["tf"], h["c"]["term_df"], h["c"]["stats"],
        h["queries"], h["doc_vecs"],
    ).collect()
    dense_by_qid = {}
    for r in dense:
        dense_by_qid.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score_fixed"])
        )
    searcher = LocalSearcher(_built_index(spark, sf01_dir))
    # the dense-matrix cache is gone from the serve path entirely
    assert not hasattr(LocalSearcher, "_EMB_CACHE")
    assert not hasattr(searcher, "_embeddings")
    qall = h["queries"].toPandas()
    for _, row in qall.iterrows():
        got = searcher.search_hybrid(
            row["text"], row["qvec"],
            f"{sf01_dir}/embeddings.parquet", k=int(row["k"]),
            ivf_dir=out, n_candidates=C, n_probe=NP,
        )
        got_rows = [(g["rank"], g["doc_id"], g["score_fixed"]) for g in got]
        assert got_rows == sorted(by_qid[row["query_id"]]), row["query_id"]
        assert got_rows == sorted(dense_by_qid[row["query_id"]]), (
            row["query_id"]
        )


def test_pruned_with_ivf_candidates(spark, sf01_dir, hybrid_inputs, tmp_path):
    """The 10^12-doc shape: vector candidates from the persistent
    partition-pruned IVF index, fused rerank on the union."""
    from meme_search_engine_spark.ops import ivf_index
    from meme_search_engine_spark.ops.similarity import (
        deterministic_centroids,
    )

    h = hybrid_inputs
    emb = h["doc_vecs"].select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    out = str(tmp_path / "ivf_hybrid")
    ivf_index.build_ivf_index(
        spark, emb, out, centroids=deterministic_centroids(emb, 8),
        spill=1, storage="fp16",
    )
    qpd = h["queries"].select("query_id", "qvec").toPandas()
    # n_probe == n_lists -> exhaustive probe: candidate recall 1.0, so
    # the fused rerank must equal the dense ranking exactly
    vec_cands = ivf_index.ivf_search(
        spark, out, qpd, k=200, n_probe=8
    ).select("query_id", F.col("vec_id").alias("doc_id"))
    dense = hybrid_topk(
        h["c"]["tf"], h["c"]["term_df"], h["c"]["stats"],
        h["queries"], h["doc_vecs"],
    )
    pruned = hybrid_topk_pruned(
        spark, h["c"]["tf"], h["c"]["term_df"], h["c"]["stats"],
        h["queries"], h["doc_vecs"], n_candidates=200,
        vec_candidates=vec_cands,
    )
    assert _rows(pruned) == _rows(dense)


def test_mlp_score_channel(spark, sf01_dir, hybrid_inputs):
    """Learned scorer channel (reference meme-rater / score_model.rs):
    the Spark GEMM forward pass matches numpy exactly, and the fixed
    prior reranks BM25 results deterministically."""
    import numpy as np

    from meme_search_engine_spark.ops import score_model
    from meme_search_engine_spark.query.dataframe_engine import (
        bm25_topk,
        bm25_topk_with_prior,
    )

    h = hybrid_inputs
    emb = spark.read.parquet(f"{sf01_dir}/embeddings.parquet")
    rng = np.random.default_rng(3)
    layers = [
        (rng.normal(size=(64, 16)), rng.normal(size=16)),
        (rng.normal(size=(16, 1)), rng.normal(size=1)),
    ]
    scored = score_model.mlp_score(emb, layers).collect()
    by_id = {r["vec_id"]: r["model_score"] for r in scored}
    vecs = {r["vec_id"]: np.asarray(r["embedding"]) for r in emb.collect()}
    for vid in list(by_id)[:20]:
        want = score_model.mlp_forward(vecs[vid][None, :], layers)[0]
        assert abs(by_id[vid] - want) < 1e-9

    priors = score_model.model_prior_fixed(emb, layers, weight=0.1)
    base = bm25_topk(
        h["c"]["tf"], h["c"]["term_df"], h["c"]["stats"],
        h["queries"].select("query_id", "text", "k"),
    ).collect()
    rated = bm25_topk_with_prior(
        h["c"]["tf"], h["c"]["term_df"], h["c"]["stats"],
        h["queries"].select("query_id", "text", "k"), priors,
    ).collect()
    assert len(rated) == len(base)
    # the channel actually moves scores: fixed deltas equal the prior
    pr = {r["doc_id"]: r["prior_fixed"] for r in priors.collect()}
    base_by = {(r["query_id"], r["doc_id"]): r["score_fixed"] for r in base}
    moved = 0
    for r in rated:
        key = (r["query_id"], r["doc_id"])
        if key in base_by:
            assert r["score_fixed"] == base_by[key] + pr.get(r["doc_id"], 0)
            if pr.get(r["doc_id"], 0) != 0:
                moved += 1
    assert moved > 0
