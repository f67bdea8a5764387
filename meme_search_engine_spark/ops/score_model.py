"""Learned per-item score channel — the reference's meme-rater.

The reference trains a small MLP over CLIP embeddings
(/root/reference/meme-rater, loaded at query time by
src/score_model.rs) and folds its output into ranking as an extra
weighted channel (query_disk_index.rs:135-142 score channels).

Spark-first re-expression: weights live on the driver (a few KB-MB),
the forward pass is one GEMM chain per Arrow batch inside a pandas
UDF — the same no-shuffle batch-inference shape as
similarity.cosine_topk_gemm — and the output feeds
query.dataframe_engine.bm25_topk_with_prior as a fixed-point prior,
so the fused ranking stays exact-int64 and cross-engine stable.
No training here: training a rater is offline (the reference trains
with torch on a workstation); this op is the SERVING side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..common.bm25 import FIXED_POINT_SCALE


def mlp_forward(x: np.ndarray, layers) -> np.ndarray:
    """(n, d) -> (n,) — ReLU hidden layers, linear scalar head.
    layers: [(W0 (d,h0), b0 (h0,)), ..., (Wk (hk-1,1), bk (1,))]."""
    h = np.asarray(x, dtype=np.float64)
    for i, (w, b) in enumerate(layers):
        h = h @ np.asarray(w, dtype=np.float64) + np.asarray(
            b, dtype=np.float64
        )
        if i < len(layers) - 1:
            np.maximum(h, 0.0, out=h)
    return h.reshape(len(h))


def mlp_score(
    embeddings: DataFrame,
    layers,
    col: str = "embedding",
    out: str = "model_score",
) -> DataFrame:
    """Add a learned scalar score column: one GEMM chain per Arrow
    batch, weights broadcast in the UDF closure, no shuffle."""
    mats = [
        (np.ascontiguousarray(w, dtype=np.float64),
         np.ascontiguousarray(b, dtype=np.float64))
        for w, b in layers
    ]

    @F.pandas_udf("double")
    def score(s: pd.Series) -> pd.Series:
        if not len(s):
            return pd.Series([], dtype=np.float64)
        return pd.Series(mlp_forward(np.stack(s.to_numpy()), mats))

    return embeddings.withColumn(out, score(F.col(col)))


def model_prior_fixed(
    embeddings: DataFrame,
    layers,
    weight: float = 1.0,
    id_col: str = "vec_id",
) -> DataFrame:
    """-> (doc_id, prior_fixed int64): the learned channel quantized
    into the engine's fixed-point score space, ready for
    bm25_topk_with_prior (same floor(x*SCALE+0.5) convention as
    gate.quality_prior_fixed)."""
    scored = mlp_score(embeddings, layers)
    return scored.select(
        F.col(id_col).alias("doc_id"),
        F.floor(
            F.col("model_score") * F.lit(float(weight))
            * F.lit(float(FIXED_POINT_SCALE))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("prior_fixed"),
    )
