"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the ``engine`` package (SURVEY.md §7.7): the operator
modules register every implemented SURVEY.md §2 query and its DuckDB
oracle into ``engine.registry``; this file just exposes them.

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import engine

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (agg_pricing_summary, SURVEY.md §7.1) on sf0.001."""
    return engine.QUERIES["agg_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(engine.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query id; keys absent here (no-oracle rows in
    SURVEY.md §2) get the driver's weaker rows-only check."""
    return dict(engine.ORACLES)
