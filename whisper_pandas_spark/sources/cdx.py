"""CDX URL index + WAT metadata + range fetch — the CommonCrawl
companion surfaces to the WARC container (``sources/warc.py``).

A crawl ships three public artifacts per shard: the WARC itself
(payloads), a WAT file (per-record metadata JSON), and a CDX(J) index
(one line per URL: SURT key + fetch range). Real pipelines read CDX
FIRST — a URL survey or selective re-crawl answers from the index
alone and then range-GETs only the matching records, never scanning
payload shards. This module gives the engine all three:

- :func:`build_cdx` — CDX-style index frame from a ``read_warc``
  frame. Pure codegen projection: the fetch range columns
  (``warc_file``/``record_offset``/``record_length``) come straight
  from the reader's byte scan (compressed gzip-member ranges for
  ``.warc.gz``, record spans for plain ``.warc``), so the index is
  derived from the actual container bytes, not re-derived arithmetic.
- :func:`extract_wat` — WAT-style per-record metadata JSON, built with
  a single codegen ``concat`` over the parsed envelope columns (fixed
  key order, so the string is hash-comparable across engines).
- :func:`fetch_ranges` — the selective-fetch path: group CDX hits by
  file, open each file ONCE, ``seek``+``read`` exactly the indexed
  ranges, re-parse just those bytes. Files with no hits are never
  opened and bytes outside the ranges are never read — the
  ``layout_partition_prune`` doctrine applied to crawl storage.

Scale notes: build_cdx/extract_wat are narrow maps over the one-task-
per-file WARC scan (no shuffle; at 100 TB the crawl's ~100k files ARE
the parallelism). fetch_ranges shuffles only the index rows (tens of
bytes each, never payloads) to co-locate per-file hits, then does one
task per touched file. Like ``write_warc``, the plain ``open()`` in
fetch_ranges is the local-mode binding; on a cluster the same
(file, offset, length) plan drives ``FileSystem.open().seek()`` or an
HTTP range GET — CommonCrawl's S3 layout serves exactly these ranges.

SURT keys follow the public convention (host labels reversed and
comma-joined, then ``)/path``), minus the scheme/port/query edge
cases the synthetic corpus never exercises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whisper_pandas_spark.sources.warc import WARC_SCHEMA, _parse_warc_bytes

_WARC_COLS = [f.split()[0] for f in WARC_SCHEMA.split(", ")]


def build_cdx(records: DataFrame) -> DataFrame:
    """CDX-style URL index (one row per ``response`` record) from a
    ``read_warc`` frame: SURT key, original URL, payload MIME, HTTP
    status, payload digest (md5 hex — same primitive both engines ship
    natively; CommonCrawl uses sha1-base32, a cosmetic difference),
    and the byte fetch range."""
    host = F.regexp_extract("target_uri", r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)
    path = F.regexp_extract(
        "target_uri", r"^[a-z][a-z0-9+.-]*://[^/]*(/.*)?$", 1
    )
    surt = F.concat(
        F.array_join(F.reverse(F.split(F.lower(host), r"\.")), ","),
        F.lit(")"),
        F.lower(path),
    )
    return records.filter(F.col("warc_type") == "response").select(
        surt.alias("surt_key"),
        F.col("target_uri").alias("url"),
        F.col("http_content_type").alias("mime"),
        F.col("http_status"),
        F.md5(F.col("body").cast("binary")).alias("digest"),
        F.col("warc_file"),
        F.col("record_offset"),
        F.col("record_length"),
    )


def _jesc(col):
    """Minimal JSON string escaping (backslash + double quote) for
    header-derived fields; identity on the synthetic corpus, so the
    oracle replays the unescaped concat."""
    return F.regexp_replace(
        F.regexp_replace(col, r"\\", r"\\\\"), '"', '\\\\"'
    )


def extract_wat(records: DataFrame) -> DataFrame:
    """WAT-style per-record metadata JSON (string column ``wat``) next
    to the record's URL. One codegen ``concat`` with a FIXED key order
    so the JSON is byte-stable; rows whose HTTP fields are NULL
    (non-``response`` records) yield a NULL ``wat``."""
    wat = F.concat(
        F.lit('{"Envelope":{"WARC-Header-Metadata":{"WARC-Type":"'),
        _jesc(F.col("warc_type")),
        F.lit('","WARC-Record-ID":"<urn:uuid:'),
        _jesc(F.col("record_id")),
        F.lit('>","WARC-Target-URI":"'),
        _jesc(F.col("target_uri")),
        F.lit('","WARC-Date":"'),
        _jesc(F.col("warc_date")),
        F.lit('","Content-Length":"'),
        F.col("content_length").cast("string"),
        F.lit('"},"Payload-Metadata":{"Actual-Content-Type":"'),
        _jesc(F.col("content_type")),
        F.lit('","HTTP-Response-Metadata":{"Response-Message":{"Status":"'),
        F.col("http_status").cast("string"),
        F.lit('"},"Headers":{"Content-Type":"'),
        _jesc(F.col("http_content_type")),
        F.lit('"},"Entity-Length":"'),
        F.octet_length(F.col("body")).cast("string"),
        F.lit('"}}},"Container":{"Filename":"'),
        _jesc(F.col("warc_file")),
        F.lit('","Offset":"'),
        F.col("record_offset").cast("string"),
        F.lit('","Length":"'),
        F.col("record_length").cast("string"),
        F.lit('"}}'),
    )
    return records.select(
        F.col("target_uri").alias("url"), wat.alias("wat")
    )


def fetch_ranges(
    spark, warc_dir: str, ranges: DataFrame
) -> DataFrame:
    """Fetch ONLY the indexed byte ranges from a WARC directory.

    *ranges* carries ``warc_file``/``record_offset``/``record_length``
    (a filtered CDX frame). Hits group by file (the only shuffle, and
    it moves index rows — bytes, not payloads); each task opens its
    one file, ``seek``s to each range in offset order, reads exactly
    ``record_length`` bytes, and re-parses just that slice (a gzip
    member for ``.warc.gz``, a record span for plain ``.warc``).
    Untouched files are never opened. Returns WARC_SCHEMA rows with
    offsets rebased to the true in-file positions."""
    import os

    import pandas as pd

    base = warc_dir

    def fetch(key, pdf):
        fname = key[0]
        path = os.path.join(base, fname)
        out = []
        with open(path, "rb") as f:
            for off, ln in sorted(
                zip(pdf["record_offset"], pdf["record_length"])
            ):
                f.seek(int(off))
                chunk = f.read(int(ln))
                for rec in _parse_warc_bytes(fname, chunk):
                    # rebase the slice-relative offset to the file
                    out.append((rec[0], int(off) + rec[1]) + rec[2:])
        return pd.DataFrame(out, columns=_WARC_COLS)

    return (
        ranges.select("warc_file", "record_offset", "record_length")
        .groupBy("warc_file")
        .applyInPandas(fetch, WARC_SCHEMA)
    )
