"""Scalar/column function library (JVM-side expressions, no UDFs)."""
