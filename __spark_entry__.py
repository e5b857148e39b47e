"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship DARIMA query on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2B.
``oracle_sql()`` — DuckDB-equivalent SQL for the hash-matched subset.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: distributed ARIMA (q_ts_fit_combine) on hourly series
    derived from sf0.001 events — scan → gap-fill resample → contiguous
    split → per-window Arrow-UDF fit → per-coef hash-agg combine.

    Returns the combined coefficient frame (series_id, coef, value): the
    engine equivalent of the reference's map_reduce output
    (/root/reference/darima.py:143-169).
    """
    from python_darima_spark.darima.pipeline import DarimaConfig, darima
    from python_darima_spark.operators.timeseries import resample_regular
    from python_darima_spark.queries import load

    events = load(spark, "/root/testdata/sf0.001", "events")
    series = events.select(
        F.col("event_type").alias("series_id"),
        F.col("ts"),
        F.col("value").alias("y"),
    )
    hourly = resample_regular(series, "1 hour")
    cfg = DarimaConfig(
        num_windows=4, period=24, tol=48, max_p=3, max_q=1, max_P=1, method="mean"
    )
    return darima(hourly, cfg).coefs


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from python_darima_spark.queries import registry

    return {name: spec.fn for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    from python_darima_spark.queries import registry

    return {
        name: spec.oracle for name, spec in registry().items() if spec.oracle
    }
