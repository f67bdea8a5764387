"""Block-max WAND top-k over posting segments.

The reference's two-phase approximate-then-exact query engine
(PQ upper bounds for the frontier, exact fp16 dot for visited —
/root/reference/src/query_disk_index.rs:169-207) re-expressed for BM25:
per-block score upper bounds (idf·(k1+1)·block_max_tfnorm) prune whole
blocks below the running top-k threshold θ; surviving blocks are
decoded and scored exactly in fixed-point.

Correctness argument (rank-identity with the exhaustive engine):
- θ is seeded from exact partial sums (any partial sum of a doc's
  contributions lower-bounds its total), so θ ≤ true kth score;
- a block is pruned only if ub(block) + Σ_{other terms} max-overlapping
  -block-ub < θ — an upper bound on ANY doc in the block, so pruned
  blocks contain no true top-k member;
- every block containing a true top-k doc d has bound ≥ total(d) ≥ θ
  and survives, so true top-k docs are scored EXACTLY; all other docs'
  partial sums stay < θ and cannot displace them.
Property-tested against the exhaustive engine in tests/test_wand.py.

Distribution shape: segment scan is pruned to the query terms' hash
buckets (partition pruning) + term_hash pushdown; the per-query scoring
group ships only those terms' compressed blocks.  The driver-side plan
is all DataFrame ops; the kernel is numpy over Arrow batches.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..common.bm25 import FIXED_POINT_SCALE
from ..common.codecs import varbyte_decode
from .dataframe_engine import query_terms

RESULT_SCHEMA = (
    "query_id int, rank int, doc_id long, score_fixed long, score double"
)


def _decode_block(doc_ids_b, tfs_b, dls_b):
    d = np.cumsum(varbyte_decode(doc_ids_b), dtype=np.int64)
    return d, varbyte_decode(tfs_b), varbyte_decode(dls_b)


def score_query_blocks(
    pdf: pd.DataFrame, n_docs: int, avgdl: float, k1: float, b: float
) -> pd.DataFrame:
    """Block-max WAND scoring of ONE query's candidate blocks.

    pdf columns: query_id, k, term_hash, df, block_id, n_docs,
    min_doc_id, max_doc_id, doc_ids, tfs, dls, block_max_tfnorm.
    Shared by the distributed grouped-map path (wand_topk) and the
    driver-local serving path (query.serve.LocalSearcher)."""
    two32 = float(FIXED_POINT_SCALE)

    def contribs_fixed(idf: float, tfs: np.ndarray, dls: np.ndarray) -> np.ndarray:
        tfs_f = tfs.astype(np.float64)
        dls_f = dls.astype(np.float64)
        tf_norm = tfs_f / (tfs_f + k1 * ((1.0 - b) + (b * dls_f) / avgdl))
        contrib = idf * (k1 + 1.0) * tf_norm
        return np.floor(contrib * two32 + 0.5).astype(np.int64)

    query_id = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    # per-term block tables, ordered by unsigned min_doc_id
    # (range-disjoint ascending — block_id would also work post-
    # finalize, but min_doc order is what the invariant actually is)
    pdf = pdf.assign(
        _umin=pdf["min_doc_id"].to_numpy(np.int64).astype(np.uint64)
    )
    terms = []
    for th, g in pdf.groupby("term_hash"):
        g = g.sort_values("_umin")
        df_t = int(g["df"].iloc[0])
        idf = math.log((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
        # dynamic block bound from (max_tf, min_dl): valid for the
        # CURRENT avgdl even when blocks were encoded under an older
        # one (incremental appends shift avgdl); tf_norm is monotone
        # increasing in tf, decreasing in dl
        mtf = g["max_tf"].to_numpy(np.float64)
        mdl = g["min_dl"].to_numpy(np.float64)
        bound_tfnorm = mtf / (mtf + k1 * ((1.0 - b) + (b * mdl) / avgdl))
        ub = idf * (k1 + 1.0) * bound_tfnorm
        ub_fixed = np.floor(ub * two32 + 0.5).astype(np.int64)
        terms.append(
            {
                "idf": idf,
                "lo": g["min_doc_id"].to_numpy(np.int64).astype(np.uint64),
                "hi": g["max_doc_id"].to_numpy(np.int64).astype(np.uint64),
                "ub": ub_fixed,
                "n": g["n_docs"].to_numpy(np.int64),
                "doc_ids": g["doc_ids"].tolist(),
                "tfs": g["tfs"].tolist(),
                "dls": g["dls"].tolist(),
            }
        )

    # ---- phase 1: θ seed from the highest-ub blocks (exact partial
    # sums are valid lower bounds)
    flat = [
        (t_i, b_i, int(t["ub"][b_i]), int(t["n"][b_i]))
        for t_i, t in enumerate(terms)
        for b_i in range(len(t["ub"]))
    ]
    flat.sort(key=lambda x: -x[2])
    seed, covered = [], 0
    for t_i, b_i, _, n in flat:
        seed.append((t_i, b_i))
        covered += n
        if covered >= 2 * k:
            break
    theta = 0
    if seed:
        ids_parts, c_parts = [], []
        for t_i, b_i in seed:
            t = terms[t_i]
            d, tfs, dls = _decode_block(
                t["doc_ids"][b_i], t["tfs"][b_i], t["dls"][b_i]
            )
            ids_parts.append(d)
            c_parts.append(contribs_fixed(t["idf"], tfs, dls))
        ids = np.concatenate(ids_parts)
        cs = np.concatenate(c_parts)
        uniq, inv = np.unique(ids, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, cs)
        if len(sums) >= k:
            theta = int(np.partition(sums, -k)[-k])

    # ---- phase 2: block-max pruning with doc-range-aware bounds
    survivors: list[tuple[int, int]] = []
    for t_i, t in enumerate(terms):
        bound = t["ub"].astype(np.int64).copy()
        for o_i, o in enumerate(terms):
            if o_i == t_i:
                continue
            # o's blocks overlapping [lo, hi] of each block of t
            s = np.searchsorted(o["hi"], t["lo"], side="left")
            e = np.searchsorted(o["lo"], t["hi"], side="right")
            add = np.zeros(len(bound), dtype=np.int64)
            for j in range(len(bound)):
                if s[j] < e[j]:
                    add[j] = int(o["ub"][s[j] : e[j]].max())
            bound += add
        for b_i in np.flatnonzero(bound >= theta):
            survivors.append((t_i, int(b_i)))

    if not survivors:
        return pd.DataFrame(
            columns=["query_id", "rank", "doc_id", "score_fixed", "score"]
        ).astype(
            {
                "query_id": "int32", "rank": "int32", "doc_id": "int64",
                "score_fixed": "int64", "score": "float64",
            }
        )

    # ---- phase 3: exact scoring of surviving blocks
    ids_parts, c_parts = [], []
    for t_i, b_i in survivors:
        t = terms[t_i]
        d, tfs, dls = _decode_block(
            t["doc_ids"][b_i], t["tfs"][b_i], t["dls"][b_i]
        )
        ids_parts.append(d)
        c_parts.append(contribs_fixed(t["idf"], tfs, dls))
    ids = np.concatenate(ids_parts)
    cs = np.concatenate(c_parts)
    uniq, inv = np.unique(ids, return_inverse=True)
    sums = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(sums, inv, cs)
    # top-k by (-score, doc_id): lexsort is stable
    order = np.lexsort((uniq, -sums))[:k]
    return pd.DataFrame(
        {
            "query_id": np.full(len(order), query_id, np.int32),
            "rank": np.arange(1, len(order) + 1, dtype=np.int32),
            "doc_id": uniq[order],
            "score_fixed": sums[order],
            "score": sums[order] / two32,
        }
    )



def wand_topk(
    spark: SparkSession,
    segments: DataFrame,
    term_stats: DataFrame,
    manifest: dict,
    queries: DataFrame,
    default_k: int = 10,
) -> DataFrame:
    """Block-max WAND top-k for a batch of queries against a built
    index.  Returns (query_id, rank, doc_id, score_fixed, score) —
    rank-identical to the exhaustive engine."""
    cfg = manifest["config"]
    stats = manifest["stats"]
    qt = query_terms(queries, default_k)
    # driver-side pruning plan: buckets + term hashes of the query set
    # (tiny collect — this is the reference's "pick start shard" step,
    # query_disk_index.rs:447-450, as partition pruning)
    q_hashes = [r["term_hash"] for r in qt.select("term_hash").distinct().collect()]
    if not q_hashes:
        return spark.createDataFrame([], RESULT_SCHEMA)
    buckets = sorted({h % cfg["n_buckets"] for h in q_hashes})
    pruned = segments.filter(
        F.col("bucket").isin(buckets) & F.col("term_hash").isin(q_hashes)
    )
    blocks = pruned.join(F.broadcast(qt), "term_hash").select(
        "query_id", "k", "term_hash", "df", "block_id", "n_docs",
        "min_doc_id", "max_doc_id", "doc_ids", "tfs", "dls",
        "block_max_tfnorm", "max_tf", "min_dl",
    )
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return score_query_blocks(
            pdf, stats["N"], stats["avgdl"], cfg["k1"], cfg["b"]
        )

    return blocks.groupBy("query_id").applyInPandas(kernel, RESULT_SCHEMA)
