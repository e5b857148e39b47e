"""Local replica of the driver's correctness gate: run every registered
query on Spark AND its oracle SQL on DuckDB, compare row count, schema
(sorted column names) and exact values (order-insensitive).

Default scale factor mirrors the driver (sf0.01); set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.001 for quick iteration.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from python_darima_spark.queries import registry

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            # unify resolution: spark arrives ns, duckdb may arrive us
            df[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[ns]")
        elif s.dtype == object:
            # dates / decimals from duckdb arrive as objects
            df[c] = s.astype(str)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("float64") if s.isna().any() else s.astype("int64")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def assert_query_matches(spark, duck, name, spec, sf_dir=SF_DIR):
    got = _normalize(spec.fn(spark, sf_dir).toPandas())
    oracle = (
        spec.oracle_builder(duck, sf_dir)
        if getattr(spec, "oracle_builder", None)
        else spec.oracle
    )
    want = _normalize(duck.execute(oracle).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            np.testing.assert_allclose(
                g.astype(float), w.astype(float), rtol=0, atol=0,
                err_msg=f"{name}.{c}", equal_nan=True,
            )
        else:
            pd.testing.assert_series_equal(
                g, w, check_names=False, check_dtype=False, obj=f"{name}.{c}"
            )


_SQL_QUERIES = sorted(n for n, s in registry().items() if s.oracle)
_ROWS_ONLY = sorted(n for n, s in registry().items() if not s.oracle)


@pytest.mark.parametrize("name", _SQL_QUERIES)
def test_sql_oracle(spark, duck, name):
    assert_query_matches(spark, duck, name, registry()[name])


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    if name == "q_stream_anomaly_tws":
        # registered unconditionally so the driver records an explicit
        # env-refusal row (round 6); where protobuf is absent the
        # plan-time guard must raise, where present it must run — both
        # honest outcomes, asserted respectively
        from python_darima_spark.streaming.stateful import has_tws_support

        if not has_tws_support():
            with pytest.raises(NotImplementedError, match="ENV-REFUSAL"):
                registry()[name].fn(spark, SF_DIR)
            return
    df = registry()[name].fn(spark, SF_DIR)
    assert df.count() >= 0 and len(df.schema.fields) > 0
