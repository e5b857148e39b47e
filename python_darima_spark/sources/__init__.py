"""Input connectors (SURVEY.md §2B q_scan_*): explicit-schema readers.

The reference reads CSV with ``header=True, inferSchema=True``
(/root/reference/darima.py:135-139), paying a second full scan just to
guess types. Every reader here takes an explicit schema instead: one
scan, stable types, and the schema is part of the call contract — which
is what you want on a cluster where "the CSV" is 100k files on object
storage (the reference's gs:// paths, darima_config.json:6-7, work
unchanged here: path scheme is the Hadoop FS connector's problem).
"""

from python_darima_spark.sources.readers import (
    REFERENCE_SERIES_SCHEMA,
    read_csv,
    read_json,
    read_parquet,
    read_reference_series_csv,
)
from python_darima_spark.sources.writers import (
    write_bucketed_table,
    write_csv,
    write_json,
    write_partitioned_parquet,
)

__all__ = [
    "REFERENCE_SERIES_SCHEMA",
    "read_csv",
    "read_json",
    "read_parquet",
    "read_reference_series_csv",
    "write_bucketed_table",
    "write_csv",
    "write_json",
    "write_partitioned_parquet",
]
