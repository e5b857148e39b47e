"""Relational / time-series / data-pipeline operators (DataFrame-native)."""
