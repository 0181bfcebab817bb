"""Sources: the Whisper Python DataSource, the meta API, and parquet
table loaders for the driver testdata."""

from whisper_pandas_spark.sources.tables import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
