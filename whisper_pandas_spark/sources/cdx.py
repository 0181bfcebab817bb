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


# -- zipnum (cluster.idx) secondary index ------------------------------------
#
# CommonCrawl's CDX is served as "zipnum" shards: the sorted index is
# cut into gzip members of N lines each, concatenated into ~300 shard
# files, with a small secondary index (cluster.idx) holding one row per
# member (first SURT key + byte range). A prefix query binary-searches
# cluster.idx, range-reads ONLY the members whose key interval
# intersects the prefix, and never touches the rest of the index — the
# same prune-at-a-higher-tier move as Hive partitions over parquet.

#: one CDX line: space-separated key + fetch-range fields.
ZIPNUM_LINE_SCHEMA = (
    "surt_key string, url string, warc_file string, "
    "record_offset long, record_length long"
)


def write_zipnum(cdx: DataFrame, gz_path: str, block_lines: int):
    """Write *cdx* as ONE zipnum shard (concatenated gzip members of
    ``block_lines`` sorted lines) and return the cluster.idx rows
    ``[(first_key, offset, length, n_lines), ...]`` in key order.

    Single task — the shard IS the CommonCrawl parallel unit (a crawl
    ships ~300 of them); sorting uses repartition(1) +
    sortWithinPartitions so the member layout is deterministic under
    any input partitioning. Same local-mode ``open()`` caveat as
    write_warc."""
    import gzip as _gzip

    import pandas as pd

    rows = (
        cdx.select(
            "surt_key", "url", "warc_file", "record_offset", "record_length"
        )
        .repartition(1)
        .sortWithinPartitions("surt_key")
    )

    def write_part(batches):
        buf: list[str] = []
        first: str | None = None
        idx: list[tuple[str, int, int, int]] = []
        with open(gz_path, "wb") as f:

            def flush():
                nonlocal buf, first
                if not buf:
                    return
                off = f.tell()
                g = _gzip.compress("".join(buf).encode("utf-8"), mtime=0)
                f.write(g)
                idx.append((first, off, len(g), len(buf)))
                buf, first = [], None

            for pdf in batches:
                for t in pdf.itertuples(index=False):
                    if first is None:
                        first = t.surt_key
                    buf.append(
                        f"{t.surt_key} {t.url} {t.warc_file} "
                        f"{t.record_offset} {t.record_length}\n"
                    )
                    if len(buf) == block_lines:
                        flush()
            flush()
        yield pd.DataFrame(
            idx, columns=["first_key", "offset", "length", "n_lines"]
        )

    out = rows.mapInPandas(
        write_part, "first_key string, offset long, length long, n_lines long"
    )
    return [tuple(r) for r in out.collect()]  # n/B rows — bounded


def zipnum_select(idx_rows, prefix: str):
    """cluster.idx member selection for a key-prefix query: members
    whose key interval [first_key, next_first_key) intersects
    [prefix, prefix + U+FFFF]. Pure driver arithmetic over the tiny
    secondary index — the payload index is never scanned."""
    hi = prefix + "￿"
    sel = []
    for i, m in enumerate(idx_rows):
        first = m[0]
        nxt = idx_rows[i + 1][0] if i + 1 < len(idx_rows) else None
        if first <= hi and (nxt is None or nxt > prefix):
            sel.append(m)
    return sel


def zipnum_fetch(spark, gz_path: str, members) -> DataFrame:
    """Range-read ONLY the selected zipnum members (seek + read +
    gunzip + line parse in one executor pass) and return the parsed
    CDX rows. Bytes outside the selected members are never read."""
    import gzip as _gzip

    import pandas as pd

    ranges = spark.createDataFrame(
        [(int(m[1]), int(m[2])) for m in members], "offset long, length long"
    )

    def fetch(batches):
        out = []
        with open(gz_path, "rb") as f:
            for pdf in batches:
                for off, ln in zip(pdf["offset"], pdf["length"]):
                    f.seek(int(off))
                    text = _gzip.decompress(f.read(int(ln))).decode("utf-8")
                    for line in text.splitlines():
                        k, u, wf, ro, rl = line.split(" ")
                        out.append((k, u, wf, int(ro), int(rl)))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "surt_key",
                    "url",
                    "warc_file",
                    "record_offset",
                    "record_length",
                ],
            )

    return ranges.mapInPandas(fetch, ZIPNUM_LINE_SCHEMA)
