"""python-darima-spark: a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``vladislabv/python-darima`` (distributed ARIMA for
ultra-long time series), generalized to many series, plus the
relational / streaming / LLM-data operator surface declared in
SURVEY.md §2B. Everything is DataFrame-native: the only Python
boundaries are Arrow-backed grouped pandas UDFs (model fit /
forecast), and all combines are Catalyst hash aggregates.
"""

__version__ = "0.1.0"

from python_darima_spark.session import get_spark  # noqa: F401
