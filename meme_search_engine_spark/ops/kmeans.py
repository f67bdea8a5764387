"""Balanced k-means for IVF centroid training.

The reference trains k-means with a balance fudge so no shard/list gets
overloaded (/root/reference/kmeans.py:12-127; the shard-balancing
consumer is src/dump_processor.rs:438-461).  Spark-first version:

- assignment: one GEMM per Arrow batch (mapInPandas) against the
  broadcast centroid matrix — shuffle-free;
- update: each batch emits per-centroid partial (count, sum-vector)
  rows; the driver reduces the ≤ batches x k tiny partials in numpy
  (centroids are k x dim — driver-sized by definition);
- balance: a size penalty subtracted from the cosine at assignment
  time, alpha * (size_c / mean_size - 1), recomputed each iteration
  from the previous iteration's counts — oversized lists repel new
  members, the same effect as the reference's fudge;
- determinism: init = first-k by vec_id, stable argmax, no RNG — the
  whole training is a pure function of the input.

Iterations are driver-side loops over Spark jobs; the per-iteration
cost is one pass over the vectors (at 100 TB: cache/persist the
normalized vectors once, then T cheap GEMM passes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.vecmath import l2_normalize

from pyspark.sql import DataFrame


def _partials_kernel(cm_norm: np.ndarray, penalty: np.ndarray):
    """Per-batch: assign to argmax(cos - penalty), emit per-centroid
    (count, sum-vector) partials."""
    k = cm_norm.shape[0]

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            vn = l2_normalize(vm)
            sims = vn @ cm_norm.T - penalty[None, :]
            assign = sims.argmax(axis=1)  # first max -> lowest centroid id
            counts = np.bincount(assign, minlength=k)
            sums = np.zeros((k, vm.shape[1]))
            np.add.at(sums, assign, vn)  # mean of NORMALIZED vectors
            nz = np.flatnonzero(counts)
            yield pd.DataFrame(
                {
                    "list_id": nz.astype(np.int32),
                    "n": counts[nz].astype(np.int64),
                    "vsum": [sums[c].tolist() for c in nz],
                }
            )

    return kernel


def train_balanced_kmeans(
    embeddings: DataFrame,
    n_lists: int,
    n_iters: int = 8,
    balance_alpha: float = 0.05,
) -> np.ndarray:
    """-> (n_lists, dim) float64 centroid matrix (unnormalized means of
    normalized vectors; callers normalize for cosine).

    Deterministic: first-k init, stable assignment, integer counts.
    The balance penalty keeps list sizes within a small factor of the
    mean (asserted in tests/test_ops.py) — unbalanced lists skew probe
    cost at query time, the r01 critique of the first-N stand-in."""
    from .similarity import deterministic_centroids

    cents = deterministic_centroids(embeddings, n_lists)
    cents = l2_normalize(cents)
    k = cents.shape[0]
    counts = np.zeros(k)
    emb = embeddings.select("embedding").persist()
    try:
        for _ in range(n_iters):
            mean_sz = counts.mean() if counts.sum() else 0.0
            penalty = (
                balance_alpha * (counts / mean_sz - 1.0)
                if mean_sz > 0
                else np.zeros(k)
            )
            cm_norm = l2_normalize(cents)
            partials = emb.mapInPandas(
                _partials_kernel(cm_norm, penalty),
                "list_id int, n long, vsum array<double>",
            ).collect()
            new_counts = np.zeros(k)
            new_sums = np.zeros_like(cents)
            for r in partials:
                new_counts[r["list_id"]] += r["n"]
                new_sums[r["list_id"]] += np.asarray(r["vsum"])
            nz = new_counts > 0
            cents = cents.copy()
            cents[nz] = new_sums[nz] / new_counts[nz, None]
            # empty list: keep the old centroid (deterministic; a dead
            # centroid simply keeps attracting nothing)
            counts = new_counts
    finally:
        emb.unpersist()
    return cents


def assignment_counts(
    embeddings: DataFrame, centroids: np.ndarray
) -> np.ndarray:
    """List sizes for a hard (spill=1, no penalty) assignment — the
    balance metric used by tests and capacity planning."""
    from .similarity import ivf_assign

    assigned = ivf_assign(embeddings, centroids, spill=1)
    rows = assigned.groupBy("list_id").count().collect()
    out = np.zeros(centroids.shape[0], dtype=np.int64)
    for r in rows:
        out[r["list_id"]] = r["count"]
    return out
