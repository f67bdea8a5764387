"""Gate entries for the training-data-pipeline operators (dedup,
similarity search, text analysis) over documents/embeddings.  Filled
operator-by-operator."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {}


def oracle_sql() -> dict[str, str]:
    return {}
