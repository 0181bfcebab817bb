"""whisper_pandas_spark — a PySpark-native analytics engine with the
capability surface of ``heidelbergcement/whisper-pandas`` (a WhisperDB →
pandas decoder), re-expressed Spark-first and extended with the relational
and LLM-data-pipeline operators a 100 TB training-data platform needs.

Layout
------
- :mod:`whisper_pandas_spark.session`   — SparkSession factory (UTC, AQE, Arrow)
- :mod:`whisper_pandas_spark.sources`   — Whisper Python DataSource, meta API,
  parquet table loaders
- :mod:`whisper_pandas_spark.operators` — rollup family, as-of joins, dedup,
  similarity search, text analysis, multimodal
- :mod:`whisper_pandas_spark.functions` — scalar/column helper expressions
- :mod:`whisper_pandas_spark.plans`     — plan inspection helpers
- :mod:`whisper_pandas_spark.streaming` — Structured Streaming rollups

Reference parity is documented per-function with ``file:line`` citations into
``/root/reference/whisper_pandas.py`` (the reference implementation is a
single-process pandas decoder; this package shares its semantics, not its
architecture).
"""

from whisper_pandas_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
