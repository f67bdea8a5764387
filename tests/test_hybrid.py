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


def test_query_time_near_dup_suppression(spark, sf01_dir, hybrid_inputs, tmp_path):
    """Query-time result dedup (reference: gram-matrix rerank + greedy
    drop of results with cosine > 0.95 to a kept one,
    query_disk_index.rs:99,514-527): on a corpus with PLANTED
    near-duplicate embeddings, (a) the undeduped top-k contains
    near-dups, (b) the deduped top-k is pairwise-diverse, (c) the
    serving path and the batch diversify_topk keep IDENTICAL results
    (shared greedy kernel)."""
    import numpy as np
    import pandas as pd

    from meme_search_engine_spark.common.vecmath import l2_normalize
    from meme_search_engine_spark.gate import _built_index
    from meme_search_engine_spark.ops import ivf_index
    from meme_search_engine_spark.ops.similarity import (
        deterministic_centroids,
    )
    from meme_search_engine_spark.query.dataframe_engine import (
        diversify_topk,
        hybrid_topk_pruned,
    )
    from meme_search_engine_spark.query.serve import LocalSearcher

    h = hybrid_inputs
    THR = 0.95

    # plant near-dup clusters: vec_ids 100..119 become tiny
    # perturbations of vec_id 100's embedding (pairwise cosine ~1)
    emb_pd = spark.read.parquet(f"{sf01_dir}/embeddings.parquet").toPandas()
    emb_pd = emb_pd.sort_values("vec_id").reset_index(drop=True)
    base = np.asarray(
        emb_pd.loc[emb_pd["vec_id"] == 100, "embedding"].iloc[0],
        dtype=np.float64,
    )
    rng = np.random.default_rng(7)
    rows = []
    for i, vid in enumerate(range(100, 120)):
        v = base + 1e-3 * rng.standard_normal(base.shape)
        rows.append((int(vid), v.astype(np.float32)))
    planted = emb_pd.copy()
    pmap = dict(rows)
    planted["embedding"] = [
        pmap.get(int(vid), np.asarray(e, dtype=np.float32))
        for vid, e in zip(planted["vec_id"], planted["embedding"])
    ]
    emb_path = str(tmp_path / "planted_emb")
    spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": planted["vec_id"],
                "embedding": [list(map(float, e)) for e in planted["embedding"]],
            }
        ),
        "vec_id long, embedding array<float>",
    ).write.parquet(emb_path)

    emb = spark.read.parquet(emb_path)
    doc_vecs = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    out = str(tmp_path / "ivf_dedup")
    ivf_index.build_ivf_index(
        spark, emb, out, centroids=deterministic_centroids(emb, 8),
        spill=1, storage="fp32",
    )
    C, NP, K = 200, 8, 10
    # query AT the planted cluster so near-dups crowd the top-k
    queries = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": [0],
                "text": ["zzzmissingterm"],
                "k": [K],
                "qvec": [list(map(float, base.astype(np.float32)))],
            }
        ),
        "query_id int, text string, k int, qvec array<float>",
    )
    qpd = queries.select("query_id", "qvec").toPandas()
    vec_cands = ivf_index.ivf_search(
        spark, out, qpd, k=C, n_probe=NP
    ).select("query_id", F.col("vec_id").alias("doc_id"))

    # batch: FULL candidate pool (k widened so nothing is cut), then
    # greedy diversify to K
    pool = hybrid_topk_pruned(
        spark, h["c"]["tf"], h["c"]["term_df"], h["c"]["stats"],
        queries.withColumn("k", F.lit(1_000_000)),
        doc_vecs, n_candidates=C, vec_candidates=vec_cands,
    )
    plain = [
        (r["rank"], r["doc_id"], r["score_fixed"])
        for r in pool.filter(F.col("rank") <= K).collect()
    ]
    batch = [
        (r["rank"], r["doc_id"], r["score_fixed"])
        for r in diversify_topk(
            pool, doc_vecs, k=K, threshold=THR
        ).orderBy("rank").collect()
    ]

    searcher = LocalSearcher(_built_index(spark, sf01_dir))
    got = searcher.search_hybrid(
        "zzzmissingterm", base, emb_path, k=K,
        ivf_dir=out, n_candidates=C, n_probe=NP, dedup_threshold=THR,
    )
    serve = [(g["rank"], g["doc_id"], g["score_fixed"]) for g in got]

    # (c) serve == batch, bit-identical decisions
    assert serve == sorted(batch)
    # (a) the undeduped ranking is crowded by the planted cluster...
    plain_ids = {d for _, d, _ in plain}
    assert len(plain_ids & set(range(100, 120))) > 1
    # ...(b) the deduped one keeps at most one of them, and the kept
    # set is pairwise-diverse under the exact vectors
    kept_ids = [d for _, d, _ in batch]
    assert len(set(kept_ids) & set(range(100, 120))) <= 1
    vecs = {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.filter(F.col("vec_id").isin(kept_ids)).collect()
    }
    unit = l2_normalize(np.stack([vecs[d] for d in kept_ids]))
    gram = unit @ unit.T
    np.fill_diagonal(gram, 0.0)
    assert float(gram.max()) <= THR + 1e-12
    # suppression replaces, not truncates: still K results
    assert len(batch) == K == len(serve)
