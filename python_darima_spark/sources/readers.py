"""Explicit-schema scan operators (ref R1/R2, SURVEY.md §2A).

``read_reference_series_csv`` is the migration shim for users of the
reference repo: it ingests the reference's own data layout — one
2-column CSV per series, header ``"demand","time"``, one file per zone
(e.g. ``data/CT_train.csv`` … /root/reference/darima.py:127-141) — into
the engine's canonical long-format series table
``(series_id, ts, y)`` (SURVEY.md §1.4). All zone files are read in ONE
scan; the series id comes from the file name via ``input_file_name()``,
so adding zones never adds jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The reference's CSV layout: darima.py:30 defaults + data/*_train.csv
# headers. Types are declared, not inferred (no second scan).
REFERENCE_SERIES_SCHEMA = "demand double, time string"


def read_parquet(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """Parquet scan with optional projection (column pruning reaches the
    reader: `.explain` shows ReadSchema with only the named columns)."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan with a REQUIRED explicit schema (ref R1 without the
    inferSchema double pass)."""
    return spark.read.schema(schema).options(header=header, **options).csv(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines scan with explicit schema (schema inference on JSON is a
    full extra pass, worse than CSV's)."""
    return spark.read.schema(schema).json(path)


def read_reference_series_csv(
    spark: SparkSession,
    path: str,
    series_id: str | None = None,
    ts_format: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """Reference-layout series CSV(s) → canonical ``(series_id, ts, y)``.

    ``path`` may be a single file, a glob (``data/*_train.csv``), or a
    directory. With ``series_id=None`` the id is derived per-row from the
    source file name (``CT_train.csv`` → ``CT``), so the reference's
    ten-zone layout lands as ten series in one DataFrame from one scan.

    The reference hard-codes the column names in its map step
    (darima.py:195-196) and parses timestamps driver-side after collect
    (py_handlers/converters.py:109); here the cast is part of the scan plan.
    """
    df = spark.read.schema(REFERENCE_SERIES_SCHEMA).option("header", True).csv(path)
    sid = (
        F.lit(series_id)
        if series_id is not None
        else F.regexp_extract(
            F.input_file_name(), r"([^/]+?)(?:_(?:train|test))?\.csv$", 1
        )
    )
    return df.select(
        sid.alias("series_id"),
        F.to_timestamp("time", ts_format).alias("ts"),
        F.col("demand").alias("y"),
    )
