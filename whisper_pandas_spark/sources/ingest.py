"""Tolerant JSONL / CSV ingestion (extension beyond the reference —
whisper_pandas.py reads only `.wsp`; a training-data pipeline's edge is
JSONL/CSV crawls long before anything becomes parquet).

Design:

- EXPLICIT schema always. Schema inference at 100 TB means an extra full
  pass over the data AND a silently drifting contract (one malformed
  shard flips a column to string); callers pass the DDL they expect.
- Malformed records follow the package's tolerant-decode convention
  (sources/whisper.py `on_error`): ``skip`` drops them, ``keep`` emits
  them with typed columns null + the raw line in ``_corrupt``, ``fail``
  aborts the job on the first bad record (FAILFAST).
- Readers are thin over `spark.read.json/csv` — Spark's native sources
  are distributed, splittable (uncompressed / bzip2), and push column
  pruning; there is nothing to hand-roll.

Scale: one narrow scan per read; corrupt handling is per-record inside
the scan (PERMISSIVE mode), no extra pass. `write_jsonl` round-trips
through the same schema so ingest → engine → export is lossless for the
supported types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CORRUPT = "_corrupt"


def _validated(on_error: str) -> str:
    if on_error not in ("skip", "keep", "fail"):
        raise ValueError(f"on_error must be skip|keep|fail, got {on_error!r}")
    return on_error


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    on_error: str = "skip",
) -> DataFrame:
    """Read newline-delimited JSON with an explicit DDL *schema*.

    ``skip``: malformed lines are dropped (DROPMALFORMED — Spark
    disallows filtering on the internal corrupt-record column when
    pruning leaves it as the only referenced column, so skip must be
    the source's own mode, not a filter). ``keep``: malformed lines
    survive with nulls + the raw text in ``_corrupt``. ``fail``:
    FAILFAST.

    DROPMALFORMED caveat (Spark-documented): malformedness is judged
    against the columns a query actually reads, so a pruned projection
    can retain a row whose UNREAD columns are malformed. Select the
    full declared schema (as every entry here does) for exact
    semantics.
    """
    mode = {"skip": "DROPMALFORMED", "keep": "PERMISSIVE", "fail": "FAILFAST"}[
        _validated(on_error)
    ]
    full_schema = schema + f", {_CORRUPT} string" if on_error == "keep" else schema
    return (
        spark.read.schema(full_schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    on_error: str = "skip",
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Read CSV with an explicit DDL *schema*; same tolerance contract
    (and DROPMALFORMED pruning caveat) as :func:`read_jsonl` — a row
    with the wrong arity or an uncastable cell is malformed."""
    mode = {"skip": "DROPMALFORMED", "keep": "PERMISSIVE", "fail": "FAILFAST"}[
        _validated(on_error)
    ]
    full_schema = schema + f", {_CORRUPT} string" if on_error == "keep" else schema
    return (
        spark.read.schema(full_schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Export as newline-delimited JSON (the interchange format every
    downstream tokenizer/trainer toolchain reads)."""
    df.write.mode(mode).json(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_orc(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read ORC with an explicit DDL *schema* (column-pruned, predicate
    pushdown, vectorized — Spark's native reader; ORC is self-describing
    so there is no malformed-record mode: corruption fails the footer
    read, it cannot silently null a column the way text formats can).

    The explicit schema is still REQUIRED (same contract as
    read_jsonl/read_csv): at 100 TB a silently widened column in one
    shard must be a job failure at plan time, not a runtime surprise.
    """
    return spark.read.schema(schema).orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Export as ORC (zlib default) — the Hive-ecosystem interchange
    twin of the parquet sink; column-pruned and predicate-pushed on
    re-read, so it is a first-class engine sink, not just an export."""
    df.write.mode(mode).orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    schema: str,
    row_tag: str = "row",
    on_error: str = "skip",
) -> DataFrame:
    """Read XML (Spark 4 built-in source) with an explicit DDL *schema*
    — the enterprise-interchange twin of the JSONL path, same tolerant
    corrupt-record contract (skip/keep/fail)."""
    mode = {"skip": "DROPMALFORMED", "keep": "PERMISSIVE", "fail": "FAILFAST"}[
        _validated(on_error)
    ]
    reader = (
        spark.read.schema(schema)
        .option("rowTag", row_tag)
        .option("mode", mode)
    )
    if on_error == "keep":
        reader = reader.option("columnNameOfCorruptRecord", _CORRUPT)
    return reader.format("xml").load(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite"
) -> None:
    """Export as XML (entity-escaped by the source — `&`, `<`, `>`
    round-trip losslessly; verified by the ingest_xml_roundtrip
    oracle)."""
    (
        df.write.mode(mode)
        .option("rootTag", "rows")
        .option("rowTag", row_tag)
        .format("xml")
        .save(path)
    )


def write_sharded(
    df: DataFrame,
    path: str,
    rows_per_shard: int,
    order_col: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Export as size-bounded parquet shards for training consumption
    and return a shard manifest (shard_path, n_rows).

    - ``rows_per_shard`` caps each output file (Spark's
      ``maxRecordsPerFile`` splits a task's output as it exceeds the
      cap) — trainers get uniform shards regardless of upstream
      partition sizes;
    - ``order_col`` range-partitions + sorts first, so global order
      (e.g. a `deterministic_shuffle` epoch permutation) survives into
      the shard layout: shard N's rows all precede shard N+1's.

    The manifest is derived by re-scanning the output with
    ``input_file_name`` — shard accounting a resume/verify step can
    trust because it reflects what is actually on disk.

    Scale: one range exchange (only when ordering) + the write; the
    manifest scan reads footer-only row counts per file.
    """
    w = df
    if order_col is not None:
        w = w.repartitionByRange(F.col(order_col)).sortWithinPartitions(order_col)
    (
        w.write.mode(mode)
        .option("maxRecordsPerFile", int(rows_per_shard))
        .parquet(path)
    )
    out = w.sparkSession.read.parquet(path)
    return (
        out.groupBy(F.input_file_name().alias("shard_path"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("shard_path")
    )
