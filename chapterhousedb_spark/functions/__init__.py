"""Scalar/aggregate helper functions shared by the workload operators."""

from chapterhousedb_spark.functions.exact import davg, dsum

__all__ = ["davg", "dsum"]
