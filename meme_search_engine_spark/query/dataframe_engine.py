"""Exhaustive BM25 top-k as pure DataFrame ops — the engine's
"brute-force oracle at scale" and the semantics reference for the WAND
path (the reference does the same: exact scoring validates approximate,
/root/reference/src/query_disk_index.rs:262-276).

Plan shape (all built-ins, no Python in the hot path):

    tf(term_hash, doc_id, doc_len, tf)
      JOIN broadcast(query_terms x term_df)  ON term_hash
      -> per-(query,term,doc) fixed-point contribution  [codegen exprs]
      GROUP BY (query_id, doc_id) SUM(contrib_fixed)    [partial agg]
      WINDOW row_number BY query_id ORDER score DESC    [top-k]

Determinism contract (T7, SURVEY.md §2.6): contributions are converted
to int64 fixed-point (score * 2^32, half-up) BEFORE the sum, so the
aggregate is exact integer math — identical result for any partitioning
— and ties break by ascending doc_id.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..common.bm25 import B, FIXED_POINT_SCALE, K1
from ..index.build import tokens_col


def query_terms_local(
    queries: DataFrame, default_k: int = 10, max_rows: int = 10_000
):
    """Driver-side (query_id, k, term, term_hash) rows when `queries`
    is a small batch; None when it is too large to plan locally.

    A query batch is tiny, but the distributed tokenization embedded a
    pandas UDF + a `distinct` exchange into EVERY downstream plan that
    referenced it (one extra job per use — ~0.7 s of a 1.9 s warm WAND
    batch was this planning read).  Small batches tokenize with the
    SAME shared tokenizer and hash with the bit-identical pure xxhash64
    (tests/test_hashing.py), so the rows are identical — set semantics
    included.  LocalRelation inputs collect for free; other plans
    (createDataFrame yields a LogicalRDD, parquet a scan) pay ONE
    row-limited collect, which replaces the per-reference tokenizer
    jobs downstream.  Batches past max_rows stay fully distributed.
    """
    try:
        if queries.isLocal():
            rows = queries.collect()
        else:
            rows = queries.limit(max_rows + 1).collect()
            if len(rows) > max_rows:
                return None
    except Exception:
        return None
    from ..common.hashing import term_hash as _th
    from ..common.textproc import tokenize as _tok

    has_k = "k" in queries.columns
    seen = set()
    for r in rows:
        k = int(r["k"]) if has_k and r["k"] is not None else int(default_k)
        for term in _tok(r["text"]):
            seen.add((r["query_id"], k, term))
    return [
        (qid, k, term, _th(term)) for qid, k, term in sorted(seen)
    ]


def query_terms(queries: DataFrame, default_k: int = 10) -> DataFrame:
    """queries(query_id, text[, k]) -> (query_id, k, term, term_hash),
    deduplicated (set semantics, weight 1 — same rule as the oracle).
    Query text goes through the *same* tokenizer as documents.

    Driver-local query batches short-circuit to a LocalRelation (see
    query_terms_local) — no tokenizer UDF, no distinct exchange."""
    local = query_terms_local(queries, default_k)
    if local is not None:
        qid_type = queries.schema["query_id"].dataType.simpleString()
        return queries.sparkSession.createDataFrame(
            local,
            f"query_id {qid_type}, k int, term string, term_hash long",
        )
    if "k" not in queries.columns:
        queries = queries.withColumn("k", F.lit(default_k))
    return (
        queries.select(
            "query_id",
            F.col("k").cast("int").alias("k"),
            F.explode(tokens_col(F.col("text"))).alias("term"),
        )
        .distinct()
        .withColumn("term_hash", F.xxhash64("term"))
    )


def bm25_topk_weighted(
    tf: DataFrame,
    term_df: DataFrame,
    stats: dict,
    query_terms_weighted: DataFrame,
) -> DataFrame:
    """Weighted multi-term BM25 (the reference's query algebra:
    sum of weight_i * score_i, /root/reference/src/common.rs:215-274;
    weights may be negative — 'exclude-ish' terms).

    query_terms_weighted: (query_id, k, term, weight) — already
    tokenized terms with accumulated weights.
    """
    qt = query_terms_weighted.withColumn("term_hash", F.xxhash64("term"))
    qdf = qt.join(term_df, "term_hash")
    idf = F.log(
        (F.lit(float(stats["N"])) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_norm = F.col("tf") / (
        F.col("tf")
        + F.lit(K1)
        * (F.lit(1.0 - B) + F.lit(B) * F.col("doc_len") / F.lit(stats["avgdl"]))
    )
    weighted = idf * F.lit(K1 + 1.0) * tf_norm * F.col("weight")
    scored = tf.join(F.broadcast(qdf), "term_hash").withColumn(
        "contrib_fixed",
        F.floor(weighted * F.lit(float(FIXED_POINT_SCALE)) + F.lit(0.5)).cast(
            "long"
        ),
    )
    agg = scored.groupBy("query_id", "k", "doc_id").agg(
        F.sum("contrib_fixed").alias("score_fixed")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_fixed"), F.asc("doc_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select(
            "query_id",
            "rank",
            "doc_id",
            "score_fixed",
            (F.col("score_fixed") / F.lit(float(FIXED_POINT_SCALE))).alias(
                "score"
            ),
        )
    )


def bm25_topk_with_prior(
    tf: DataFrame,
    term_df: DataFrame,
    stats: dict,
    queries: DataFrame,
    priors: DataFrame,
    default_k: int = 10,
) -> DataFrame:
    """BM25 + per-document quality prior — the reference's score
    channels: per-item weight/512-scaled descriptors added into every
    node score at query time
    (/root/reference/src/query_disk_index.rs:135-142,463-473).

    priors: (doc_id, prior_fixed int64) — already fixed-point (same
    2^32 scale), typically floor(Σ wᵢ·channelᵢ(doc) · 2^32 + 0.5) over
    ops.textstats.quality_scores channels.  The prior applies only to
    docs matching ≥1 query term (a ranking prior, not a recall source).

    Plan shape: the prior join happens AFTER the (query, doc) aggregate
    — it shuffles only the candidate set, never the full postings."""
    qt = query_terms(queries, default_k)
    qdf = qt.join(term_df, "term_hash")
    scored = tf.join(F.broadcast(qdf), "term_hash").withColumn(
        "contrib_fixed", _contrib_fixed(stats["N"], stats["avgdl"])
    )
    agg = scored.groupBy("query_id", "k", "doc_id").agg(
        F.sum("contrib_fixed").alias("bm25_fixed")
    )
    agg = agg.join(priors, "doc_id", "left").withColumn(
        "score_fixed",
        F.col("bm25_fixed") + F.coalesce(F.col("prior_fixed"), F.lit(0)),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_fixed"), F.asc("doc_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select(
            "query_id",
            "rank",
            "doc_id",
            "score_fixed",
            (F.col("score_fixed") / F.lit(float(FIXED_POINT_SCALE))).alias(
                "score"
            ),
        )
    )


def _contrib_fixed(n_docs: int, avgdl: float):
    """Fixed-point BM25 contribution column, mirroring common.bm25
    expression-for-expression (same association order, so JVM doubles
    match CPython doubles bit-for-bit up to libm's 1 ulp on log)."""
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_norm = F.col("tf") / (
        F.col("tf")
        + F.lit(K1)
        * (F.lit(1.0 - B) + F.lit(B) * F.col("doc_len") / F.lit(avgdl))
    )
    contrib = idf * F.lit(K1 + 1.0) * tf_norm
    return F.floor(contrib * F.lit(float(FIXED_POINT_SCALE)) + F.lit(0.5)).cast(
        "long"
    )


def bm25_topk(
    tf: DataFrame,
    term_df: DataFrame,
    stats: dict,
    queries: DataFrame,
    default_k: int = 10,
) -> DataFrame:
    """Exhaustive BM25 top-k for a batch of queries.

    Returns (query_id, rank, doc_id, score_fixed, score) — rank 1-based,
    ordered by fixed-point score desc, doc_id asc within each query.
    """
    qt = query_terms(queries, default_k)
    # (query term x df) is tiny (≤ queries x terms rows) -> broadcast;
    # the probe side (tf) never shuffles for the join.
    qdf = qt.join(term_df, "term_hash")
    scored = tf.join(F.broadcast(qdf), "term_hash").withColumn(
        "contrib_fixed", _contrib_fixed(stats["N"], stats["avgdl"])
    )
    agg = scored.groupBy("query_id", "k", "doc_id").agg(
        F.sum("contrib_fixed").alias("score_fixed")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_fixed"), F.asc("doc_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select(
            "query_id",
            "rank",
            "doc_id",
            "score_fixed",
            (F.col("score_fixed") / F.lit(float(FIXED_POINT_SCALE))).alias(
                "score"
            ),
        )
    )


# --------------------------------------------------- hybrid text+vector

# the embedding channel is quantized to 1e-4 cosine steps, then scaled
# into the BM25 fixed-point space with an INTEGER factor so the fusion
# is exact int64 arithmetic (cross-engine hash-stable); 1e-4 matches
# the precision the ann gates already verified across Spark and DuckDB
COSINE_STEPS = 10_000
COSINE_STEP_FIXED = FIXED_POINT_SCALE // COSINE_STEPS


def _cosine_fixed(vec: str, qvec: str):
    """round(cosine * 1e4) as int64 — the quantized embedding channel."""
    dot = F.aggregate(
        F.zip_with(vec, qvec, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.zip_with(c, c, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    # clamp the denominator so an all-zero embedding scores cosine 0
    # (not NaN -> null) — same convention as serve.search_hybrid's
    # np.maximum(denom, 1e-30) and l2_normalize's zero-row handling
    cos = dot / F.greatest(norm(vec) * norm(qvec), F.lit(1e-30))
    return F.round(cos * F.lit(float(COSINE_STEPS)), 0).cast("long")


def hybrid_topk(
    tf: DataFrame,
    term_df: DataFrame,
    stats: dict,
    queries: DataFrame,
    doc_vecs: DataFrame,
    w_text: int = 3,
    w_vec: int = 1,
    default_k: int = 10,
) -> DataFrame:
    """Fused text+vector ranking — the reference's mixed query mode:
    one query carries BOTH text terms and an embedding, and every
    channel contributes weight_i * score_i to a single ranked list
    (/root/reference/src/common.rs:215-274 query algebra;
    query_disk_index.rs:463-473 per-channel weights at score time).

    queries: (query_id, text, k, qvec array<float>);
    doc_vecs: (doc_id, embedding array<float>).
    score_fixed = w_text * bm25_fixed + w_vec * cos4 * COSINE_STEP_FIXED
    — all-integer fusion (hash-stable across engines).

    DENSE: every doc scores the cosine channel (query broadcast, JVM
    fold, no shuffle on the doc side until the per-query aggregate).
    Exact, and the right oracle — but at 10^12 docs the dense channel
    is the bottleneck; use hybrid_topk_pruned there."""
    qt = query_terms(queries.select("query_id", "text", "k"), default_k)
    qdf = qt.join(term_df, "term_hash")
    scored = tf.join(F.broadcast(qdf), "term_hash").withColumn(
        "contrib_fixed", _contrib_fixed(stats["N"], stats["avgdl"])
    )
    bm = scored.groupBy("query_id", "doc_id").agg(
        F.sum("contrib_fixed").alias("bm25_fixed")
    )
    qv = queries.select("query_id", "k", "qvec")
    cos = doc_vecs.crossJoin(F.broadcast(qv)).withColumn(
        "cos4", _cosine_fixed("embedding", "qvec")
    )
    fused = cos.join(bm, ["query_id", "doc_id"], "left").withColumn(
        "score_fixed",
        F.lit(w_text) * F.coalesce(F.col("bm25_fixed"), F.lit(0))
        + F.lit(w_vec) * F.col("cos4") * F.lit(COSINE_STEP_FIXED),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_fixed"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select(
            "query_id",
            "rank",
            "doc_id",
            "score_fixed",
            (F.col("score_fixed") / F.lit(float(FIXED_POINT_SCALE))).alias(
                "score"
            ),
        )
    )


def hybrid_topk_pruned(
    spark,
    tf: DataFrame,
    term_df: DataFrame,
    stats: dict,
    queries: DataFrame,
    doc_vecs: DataFrame,
    w_text: int = 3,
    w_vec: int = 1,
    default_k: int = 10,
    n_candidates: int = 50,
    vec_candidates: DataFrame | None = None,
) -> DataFrame:
    """Scale path for hybrid_topk: candidate generation then exact
    fused rerank — the reference reranks a shard's ANN candidates with
    the full score channels (query_disk_index.rs:486-527 gram-matrix
    rerank) instead of scoring the corpus densely.

    Candidates per query = (BM25 top-C) ∪ (cosine top-C); both
    channels are then re-scored EXACTLY on that union with the same
    integer fusion as hybrid_topk.  C >= k trades recall for cost the
    same way the reference's beam does; equality to the dense ranking
    on the test corpora is pytest-asserted.

    The fusion join touches only Q x 2C broadcastable candidate rows —
    never docs x Q.  Channel candidate cost: text top-C is the
    broadcast-join BM25 aggregate (only term-matching postings move);
    the DEFAULT vector top-C is cosine_topk_exact — a shuffle-free
    per-partition GEMM scan, linear in corpus size — so at 10^12 docs
    pass `vec_candidates` (query_id, doc_id) from the partition-pruned
    persistent index instead (ops.ivf_index.ivf_search / pq ADC),
    trading exactness of the candidate SET for sublinear probe cost,
    exactly like the reference's shard routing."""
    from ..ops.similarity import cosine_topk_exact

    # bm25_topk honors per-query k; candidate generation overrides to C
    cand_text = bm25_topk(
        tf, term_df, stats,
        queries.select(
            "query_id", "text", F.lit(n_candidates).alias("k")
        ),
        default_k=n_candidates,
    ).select("query_id", "doc_id")
    if vec_candidates is not None:
        cand_vec = vec_candidates.select("query_id", "doc_id")
    else:
        cand_vec = cosine_topk_exact(
            doc_vecs.select(
                F.col("doc_id").alias("vec_id"), "embedding"
            ),
            queries.select("query_id", "qvec"),
            k=n_candidates,
        ).select("query_id", F.col("vec_id").alias("doc_id"))
    cands = cand_text.union(cand_vec).distinct()

    qt = query_terms(queries.select("query_id", "text", "k"), default_k)
    qdf = qt.join(term_df, "term_hash")
    bm = (
        tf.join(F.broadcast(qdf), "term_hash")
        .join(F.broadcast(cands), ["query_id", "doc_id"])
        .withColumn(
            "contrib_fixed", _contrib_fixed(stats["N"], stats["avgdl"])
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib_fixed").alias("bm25_fixed"))
    )
    qv = queries.select("query_id", "k", "qvec")
    cos = (
        doc_vecs.join(
            F.broadcast(cands), "doc_id"
        )
        .join(F.broadcast(qv), "query_id")
        .withColumn("cos4", _cosine_fixed("embedding", "qvec"))
    )
    fused = cos.join(bm, ["query_id", "doc_id"], "left").withColumn(
        "score_fixed",
        F.lit(w_text) * F.coalesce(F.col("bm25_fixed"), F.lit(0))
        + F.lit(w_vec) * F.col("cos4") * F.lit(COSINE_STEP_FIXED),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_fixed"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select(
            "query_id",
            "rank",
            "doc_id",
            "score_fixed",
            (F.col("score_fixed") / F.lit(float(FIXED_POINT_SCALE))).alias(
                "score"
            ),
        )
    )


def diversify_topk(
    ranked: DataFrame,
    doc_vecs: DataFrame,
    k: int = 10,
    threshold: float = 0.95,
) -> DataFrame:
    """Query-time near-duplicate suppression of RESULTS — the
    reference's serving behavior of reranking the visited set and
    greedily dropping results with cosine > threshold to an
    already-kept one (/root/reference/src/query_disk_index.rs:99,
    514-527: gram matrix + DEDUPLICATE_THRESHOLD 0.95).

    ranked: a candidate POOL per query — (query_id, doc_id,
    score_fixed, ...) ranked output deeper than the final k (e.g.
    hybrid_topk_pruned with per-query k widened to C); pools of only
    k rows can't replace suppressed results.  doc_vecs: (doc_id,
    embedding).  Candidates without an embedding row drop out (same
    inner-join semantics as the hybrid engines).

    Per query: visit candidates in (-score_fixed, doc_id) order, drop
    any with cosine > threshold to a kept result, emit the first k
    survivors re-ranked 1..k.  The keep/drop decisions come from the
    SAME shared kernel as LocalSearcher.search_hybrid(dedup_threshold=)
    (common.vecmath.greedy_diverse_prefix) — serve == batch
    bit-identically (pytest).  Greedy selection is inherently
    sequential in k but per-QUERY independent, so it distributes as
    one applyInPandas over query groups of <=pool rows each — the
    same per-query grouping shape as the WAND merge, never a
    corpus-sized group."""
    import numpy as np
    import pandas as pd

    from ..common.vecmath import greedy_diverse_prefix, l2_normalize

    qt = dict(ranked.dtypes)["query_id"]
    schema = (
        f"query_id {qt}, rank int, doc_id long, score_fixed long, "
        "score double"
    )
    pool = ranked.join(doc_vecs, "doc_id").select(
        "query_id", "doc_id", "score_fixed", "embedding"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["score_fixed", "doc_id"], ascending=[False, True],
            kind="mergesort",
        ).reset_index(drop=True)
        unit = l2_normalize(
            np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        )
        keep = greedy_diverse_prefix(unit, threshold, k)
        out = pdf.iloc[keep]
        return pd.DataFrame(
            {
                "query_id": out["query_id"].to_numpy(),
                "rank": np.arange(1, len(out) + 1, dtype=np.int32),
                "doc_id": out["doc_id"].to_numpy(np.int64),
                "score_fixed": out["score_fixed"].to_numpy(np.int64),
                "score": out["score_fixed"].to_numpy(np.int64)
                / float(FIXED_POINT_SCALE),
            }
        )

    return pool.groupBy("query_id").applyInPandas(kernel, schema)
