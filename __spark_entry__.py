"""Driver contract for the spark-graft builder (PySpark target).

Aggregates the engine's query registry: each operator module exposes a
``QUERIES`` dict (name -> callable(spark, sf_dir) -> DataFrame) and an
``ORACLE`` dict (name -> equivalent DuckDB-runnable ANSI SQL). See
SURVEY.md §2B for the inventory this covers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    from nfl_predictions_spark.operators import relational

    modules = [relational]
    for modname in (
        "streaming_batch",
        "dedup",
        "similarity",
        "text",
        "multimodal",
        "extended",
        "skew",
        "ml_text",
        "asof",
        "modern",
        "sketches",
        "maintenance",
        "timeseries",
        "interval",
        "graph",
    ):
        try:
            import importlib

            modules.append(
                importlib.import_module(f"nfl_predictions_spark.operators.{modname}")
            )
        except ImportError:
            pass
    try:
        from nfl_predictions_spark.ml import queries as ml_queries

        modules.append(ml_queries)
    except ImportError:
        pass

    queries: dict[str, Callable] = {}
    oracle: dict[str, str] = {}
    for mod in modules:
        queries.update(getattr(mod, "QUERIES", {}))
        oracle.update(getattr(mod, "ORACLE", {}))
    return queries, oracle


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H-Q1-shaped
    pricing summary (multi-measure hash aggregate, exact-decimal sums)."""
    from nfl_predictions_spark.operators.relational import q12_agg_pricing_summary

    return q12_agg_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
