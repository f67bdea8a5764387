"""BM25 scoring math — one source of truth for the Spark engine, the
WAND pruner, the pytest oracle, and (as SQL text) the DuckDB oracle.

Formula (Lucene-flavored, idf always positive):

    idf(t)        = ln( (N - df + 0.5) / (df + 0.5) + 1 )
    tf_norm(t, d) = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q, d)   = sum_t idf(t) * (k1 + 1) * tf_norm(t, d)

Rank determinism: floating-point summation order varies with Spark
partitioning, so per-term contributions are converted to fixed-point
int64 (score * 2^32, half-up) and summed as integers — exact, associative,
partitioning-independent.  Adopted from the reference's fixed-point i64
score trick (/root/reference/diskann/src/vector.rs:45-47,408-416 and
src/query_disk_index.rs:539).
"""

from __future__ import annotations

import math

K1 = 1.2
B = 0.75
FIXED_POINT_SCALE = 2**32


def bm25_idf(df: int, n_docs: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_tf_norm(tf: float, dl: float, avgdl: float, k1: float = K1, b: float = B) -> float:
    return tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


def bm25_score(
    tf: float, df: int, dl: float, n_docs: int, avgdl: float,
    k1: float = K1, b: float = B,
) -> float:
    """Single-term contribution to a document's score."""
    return bm25_idf(df, n_docs) * (k1 + 1.0) * bm25_tf_norm(tf, dl, avgdl, k1, b)


def to_fixed(score: float) -> int:
    """Fixed-point int64 (half-up, matches SQL floor(x*2^32 + 0.5))."""
    return math.floor(score * FIXED_POINT_SCALE + 0.5)


# SQL fragments kept next to the math they mirror, so a formula change
# can't silently diverge from the oracle_sql() side of the gate.
SQL_IDF = "ln(({N} - df + 0.5) / (df + 0.5) + 1.0)"
SQL_TF_NORM = "(tf / (tf + {k1} * (1.0 - {b} + {b} * dl / {avgdl})))"
