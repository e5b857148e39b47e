"""Declared query/operator registry — the SURVEY.md §2B checklist.

Each entry pairs a Spark DataFrame program with (where expressible) an
equivalent ANSI-SQL string for the DuckDB oracle. The driver runs both at
sf0.01 and compares row count + schema + order-insensitive value hash, so:

* every computed column is aliased IDENTICALLY in both formulations;
* floating-point aggregates are ``round(…, 4)``-ed on both sides so
  summation-order ulps can't flip the hash;
* DuckDB's integer-sum type promotion (HUGEINT) is cast back to BIGINT.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # DuckDB SQL; None → rows-only check


_MODULES = [
    "python_darima_spark.queries.relational",
    "python_darima_spark.queries.joins",
    "python_darima_spark.queries.scalars",
    "python_darima_spark.queries.udfs",
    "python_darima_spark.queries.domain",
    "python_darima_spark.queries.llm_data",
    "python_darima_spark.queries.streaming_q",
]

# Execution-priority prefix: the driver's round-1 correctness pass stopped
# after exactly 50 registry entries (budget cap), so the tail — similarity,
# text, multimodal, and streaming — never got a CORRECTNESS row despite
# having oracles. Queries listed here are emitted FIRST (in this order) so
# a budget-capped driver verifies them; everything else follows in module
# order. Cheap SQL-oracled queries lead; the stateful streaming replays
# (seconds each) close the prefix.
_PRIORITY = [
    "q_text_stats",
    "q_text_lang",
    "q_text_fingerprint",
    "q_sim_topk",
    "q_sim_topk_ivf",
    "q_multimodal_features",
    "q_agg_approx",
    "q_sink_orc",
    "q_join_bucketed",
    "q_ts_many_series",
    "q_stream_tumble",
    "q_stream_slide",
    "q_stream_session",
    "q_stream_dedup",
    "q_stream_anomaly",
]


def registry() -> dict[str, QuerySpec]:
    out: dict[str, QuerySpec] = {}
    for modname in _MODULES:
        try:
            mod = importlib.import_module(modname)
        except ModuleNotFoundError:
            continue
        specs = getattr(mod, "QUERIES", {})
        overlap = set(specs) & set(out)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(specs)
    head = {n: out[n] for n in _PRIORITY if n in out}
    return {**head, **{n: s for n, s in out.items() if n not in head}}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a testdata table, normalizing physical quirks.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    (PARQUET_TYPE_ILLEGAL) unless ``spark.sql.legacy.parquet.nanosAsLong``
    is set; we set it at runtime and convert nanos→microsecond timestamp
    here so every downstream query sees a plain TimestampType column.
    """
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        # Integer division (`div`), NOT `/1000`: float division of an
        # epoch-nanos value loses precision below ~256 ns (53-bit mantissa)
        # and rounds the microsecond — off-by-1µs vs DuckDB's truncation.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
