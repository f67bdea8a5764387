"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k over sf0.001 documents.
``queries()`` / ``oracle_sql()`` — the correctness-gate registry, one
entry per implemented operator (see meme_search_engine_spark/gate*.py
and SURVEY.md §2).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _with_shipping(fn: Callable) -> Callable:
    """Make a gate callable robust to externally-created sessions: ship
    the package zip to executors before running (== --py-files)."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from meme_search_engine_spark.shipping import ensure_shipped

        ensure_shipped(spark)
        return fn(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: build the in-flight
    inverted stats over `documents` and answer the gate query set with
    exhaustive BM25 (driver checks rows>0, stable schema)."""
    from meme_search_engine_spark.gate import q_bm25_topk
    from meme_search_engine_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from meme_search_engine_spark import gate

    return {name: _with_shipping(fn) for name, fn in gate.queries().items()}


def oracle_sql() -> dict[str, str]:
    from meme_search_engine_spark import gate

    return gate.oracle_sql()
