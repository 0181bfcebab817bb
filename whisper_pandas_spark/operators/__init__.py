"""Operator library: plain functions DataFrame → DataFrame.

Everything is declarative (built-in ``pyspark.sql.functions``) so Catalyst
keeps full optimization freedom; Pandas UDFs appear only where Spark lacks
a primitive (documented per site).
"""

from whisper_pandas_spark.operators.relational import pricing_summary

__all__ = ["pricing_summary"]
