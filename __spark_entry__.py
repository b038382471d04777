"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the engine's query catalog
(etl_pipeline_challenge_aladia_spark/plans/queries.py) for the driver's
DuckDB hash-comparison gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's documented analytics workload — average
    watched ratio per video over the deduplicated CDC warehouse."""
    return CATALOG["cdc_avg_watched_ratio_per_video"].spark(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in CATALOG.items() if spec.oracle is not None
    }
