"""Gate entries for the relational operator inventory (SURVEY.md §2.2-2.8)
over the TPC-H-ish testdata tables.  Filled operator-by-operator."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {}


def oracle_sql() -> dict[str, str]:
    return {}
