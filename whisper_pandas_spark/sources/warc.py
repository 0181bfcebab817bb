"""WARC (Web ARChive, ISO 28500) source/sink — the CommonCrawl
container format.

Extension beyond the reference (whisper_pandas.py reads only `.wsp`):
a web-scale training pipeline's raw input IS WARC — CommonCrawl
publishes ~100k `.warc.gz` files per crawl — so an engine that claims
the 100 TB curation story needs to open the container itself, not just
the post-extraction JSONL.

Format support (the deliberately-small, fully-parsed subset):

- WARC/1.0 and WARC/1.1 records: CRLF header block (`Name: value`
  lines) + `Content-Length` octet-counted payload + CRLF CRLF record
  separator, per the public ISO 28500 / IIPC spec.
- ``response`` records carry an HTTP/1.1 envelope; the reader splits
  status line + HTTP headers from the body on the first CRLFCRLF.
  Other record types (``warcinfo``, ``request``, ``metadata``) pass
  through with the raw payload and a NULL body.
- gzip: the CommonCrawl convention is ONE GZIP MEMBER PER RECORD,
  concatenated — `gzip.decompress` on the whole file handles
  multi-member streams, so `.warc.gz` reads need no special casing.

Scale design
------------
The parallel unit is the FILE (one Spark task per WARC), exactly the
CommonCrawl reality: a crawl ships as ~100k independently-compressed
members-in-files, and record offsets within a file are only
discoverable by scanning it, so per-file tasks are the natural — and
the published — partitioning (this is how every public WARC toolchain
shards). The reader is `binaryFile scan -> mapInPandas` (Arrow batch
of file payloads in, record rows out): bytes are parsed ONCE, in C
speed `bytes.find/split`, never per-line Python. At 100 TB you get
100k-way parallelism from the file layout itself; no shuffle anywhere
— the parse is a narrow map, and downstream filters prune on the typed
columns it emits.

The writer shards the frame into N files (`warc-00000.warc[.gz]` ...)
via the same one-task-per-file model, emitting spec-shaped records
with deterministic `WARC-Record-ID`s derived from the id column — so
write -> read is byte-lossless and oracle-checkable (the
`ingest_*_roundtrip` doctrine).
"""

from __future__ import annotations

import gzip
import io

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_VERSION = "WARC/1.0"

#: Byte length of the writer's HTTP envelope MINUS the Content-Length
#: digits and the body: everything the oracle's Content-Length
#: arithmetic needs in ONE place (round-13b/14 offset oracles).
HTTP_ENVELOPE_CONST = len(
    "HTTP/1.1 200 OK\r\n"
    "Content-Type: text/plain; charset=utf-8\r\n"
    "Content-Length: \r\n\r\n"
)
_CRLF = "\r\n"

#: Output schema of read_warc (one row per WARC record).
#:
#: ``record_offset`` / ``record_length`` are the CDX-style fetch range:
#: for ``.warc.gz`` files the COMPRESSED byte offset and length of the
#: gzip member holding the record (CommonCrawl's one-member-per-record
#: layout makes this a single-record range; a multi-record member maps
#: all its records to the member's range — exactly what an HTTP range
#: GET of that member would return), for plain ``.warc`` files the
#: uncompressed record span including the trailing CRLFCRLF separator.
#: ``http_content_type`` is the Content-Type of the HTTP payload (the
#: CDX "mime" field), vs ``content_type`` which is the WARC envelope's.
WARC_SCHEMA = (
    "warc_file string, record_offset long, record_length long, "
    "warc_type string, "
    "record_id string, target_uri string, warc_date string, "
    "content_type string, http_content_type string, "
    "content_length long, http_status int, "
    "body string"
)


def _build_record(
    rec_type: str,
    rec_id: str,
    uri: str | None,
    date: str,
    body: bytes,
    http: bool,
    ctype: str | None = None,
) -> bytes:
    """One spec-shaped WARC record (bytes, including the trailing
    CRLF CRLF separator). Non-HTTP records default to warcinfo's
    ``application/warc-fields``; WET ``conversion`` records pass
    ``ctype="text/plain"`` (the CommonCrawl WET convention)."""
    if http:
        payload = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/plain; charset=utf-8\r\n"
            + f"Content-Length: {len(body)}".encode()
            + b"\r\n\r\n"
            + body
        )
        ctype = "application/http; msgtype=response"
    else:
        payload = body
        ctype = ctype or "application/warc-fields"
    headers = [
        WARC_VERSION,
        f"WARC-Type: {rec_type}",
        f"WARC-Record-ID: <urn:uuid:{rec_id}>",
        f"WARC-Date: {date}",
        f"Content-Type: {ctype}",
        f"Content-Length: {len(payload)}",
    ]
    if uri is not None:
        headers.insert(3, f"WARC-Target-URI: {uri}")
    return (
        _CRLF.join(headers).encode("utf-8")
        + b"\r\n\r\n"
        + payload
        + b"\r\n\r\n"
    )


def write_warc(
    df: DataFrame,
    out_dir: str,
    id_col: str,
    text_col: str,
    num_files: int = 4,
    compression: str = "none",
    date: str = "2024-01-01T00:00:00Z",
    record_type: str = "response",
) -> None:
    """Write (id, text) rows as `num_files` WARC (or, with
    ``record_type="conversion"``, WET) files under *out_dir*
    (`warc-00000.warc[.gz]` ...), one ``response`` record per row with
    `WARC-Record-ID = urn:uuid:doc-<id>` and
    `WARC-Target-URI = http://corpus.example/doc/<id>` — deterministic,
    so the round trip is value-checkable. Rows shard by ``id % num_files``
    and write in id order within a shard (stable bytes under any input
    partitioning). gzip mode emits one member per record (the
    CommonCrawl layout).

    Deployment note: shard files are written with plain ``open()`` inside
    Spark tasks, so this sink is **local-mode only** — on a multi-node
    cluster each shard would land on its executor's local disk and a
    subsequent ``read_warc`` from the driver's path would miss them. The
    cluster path is the same record-builder routed through the Hadoop
    FileSystem API (``spark._jvm.org.apache.hadoop.fs``) or a
    ``foreachPartition`` writer targeting shared storage (S3/HDFS), as the
    parquet sinks in ``sources/materialize.py`` already do; the bytes
    produced per record are identical either way.
    """
    if compression not in ("none", "gzip"):
        raise ValueError(f"compression must be none|gzip, got {compression!r}")
    if record_type not in ("response", "conversion"):
        raise ValueError(
            f"record_type must be response|conversion, got {record_type!r}"
        )
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compression == "gzip" else ".warc"
    shards = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(text_col).alias("text"),
            (F.col(id_col) % num_files).cast("int").alias("shard"),
        )
        .repartition(num_files, "shard")
        .sortWithinPartitions("shard", "id")
    )

    def write_shard(rows):
        import os as _os

        bufs: dict[int, io.BytesIO] = {}
        for r in rows:
            buf = bufs.setdefault(int(r["shard"]), io.BytesIO())
            rec = _build_record(
                record_type,
                f"doc-{r['id']}",
                f"http://corpus.example/doc/{r['id']}",
                date,
                r["text"].encode("utf-8"),
                http=record_type == "response",
                # WET layout: conversion records carry the extracted
                # text directly (no HTTP envelope), typed text/plain
                ctype="text/plain" if record_type == "conversion" else None,
            )
            if compression == "gzip":
                g = io.BytesIO()
                with gzip.GzipFile(fileobj=g, mode="wb", mtime=0) as z:
                    z.write(rec)
                rec = g.getvalue()
            buf.write(rec)
        for shard, buf in bufs.items():
            path = _os.path.join(out_dir, f"warc-{shard:05d}{ext}")
            with open(path, "wb") as f:
                f.write(buf.getvalue())
        return iter(())

    # one task per shard file — the WARC parallel unit
    shards.rdd.mapPartitions(write_shard).count()


def _gzip_members(blob: bytes):
    """Yield ``(compressed_offset, compressed_length, decompressed)``
    per gzip member of a concatenated-member stream (the CommonCrawl
    one-record-per-member layout). memoryview slicing keeps the walk
    O(total) instead of O(n_members x tail)."""
    import zlib

    view = memoryview(blob)
    pos = 0
    n = len(blob)
    while pos < n:
        d = zlib.decompressobj(31)  # 31 = gzip wrapper
        data = d.decompress(view[pos:])
        data += d.flush()
        end = n - len(d.unused_data)
        if end <= pos:  # trailing garbage that is not a member
            break
        yield pos, end - pos, data
        pos = end


def _parse_warc_bytes(name: str, blob: bytes):
    """Yield WARC_SCHEMA tuples from one WARC file.

    ``.warc.gz`` files are walked gzip-member-by-member so each record
    carries its member's COMPRESSED (offset, length) — the CDX fetch
    range an HTTP range GET would use; plain ``.warc`` files carry the
    record's uncompressed span (including the trailing CRLFCRLF)."""
    if name.endswith(".gz") or blob[:2] == b"\x1f\x8b":
        for moff, mlen, data in _gzip_members(blob):
            for rec in _parse_record_stream(name, data):
                # override the in-member span with the member's
                # compressed range (all records of a multi-record
                # member share it: that IS what a range GET returns)
                yield (rec[0], moff, mlen) + rec[3:]
    else:
        yield from _parse_record_stream(name, blob)


def _parse_record_stream(name: str, blob: bytes):
    """Yield WARC_SCHEMA tuples from an UNCOMPRESSED record stream."""
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record padding
        while pos < n and blob[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        offset = pos
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        head = blob[pos:hdr_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            raise ValueError(
                f"{name}: record at offset {offset} lacks a WARC/ version"
            )
        fields: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields.get("content-length", "0"))
        body_start = hdr_end + 4
        payload = blob[body_start : body_start + clen]
        pos = body_start + clen
        # record span includes the trailing CRLFCRLF separator (clamped
        # at EOF for truncated tails) — the fetch range for plain .warc
        rec_len = min(pos + 4, n) - offset
        rtype = fields.get("warc-type", "")
        status = None
        body = None
        http_ctype = None
        if rtype == "response" and payload[:5] == b"HTTP/":
            split = payload.find(b"\r\n\r\n")
            if split < 0:
                # No CRLFCRLF separator: the whole payload is HTTP headers
                # with no body. Parse the status line but leave body NULL
                # rather than slicing payload[3:] into a mangled body.
                http_head = payload.decode("utf-8", "replace")
                body = None
            else:
                http_head = payload[:split].decode("utf-8", "replace")
                body = payload[split + 4 :].decode("utf-8", "replace")
            status_line = http_head.split("\r\n", 1)[0].split(" ")
            status = int(status_line[1]) if len(status_line) > 1 else None
            for hln in http_head.split("\r\n")[1:]:
                hk, _, hv = hln.partition(":")
                if hk.strip().lower() == "content-type":
                    http_ctype = hv.strip()
                    break
        elif rtype in ("conversion", "resource"):
            # WET files (CommonCrawl's extracted-text sibling) are
            # `conversion` records whose payload IS the text — no HTTP
            # envelope; `resource` records are direct payloads too.
            body = payload.decode("utf-8", "replace")
        rid = fields.get("warc-record-id", "").strip("<>")
        if rid.startswith("urn:uuid:"):
            rid = rid[len("urn:uuid:") :]
        yield (
            name.rsplit("/", 1)[-1],
            offset,
            rec_len,
            rtype,
            rid,
            fields.get("warc-target-uri"),
            fields.get("warc-date"),
            fields.get("content-type"),
            http_ctype,
            clen,
            status,
            body,
        )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of `.warc` / `.warc.gz` files into one row per
    WARC record (WARC_SCHEMA). One task per file — see module
    docstring for why that is the right unit at crawl scale."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        for pdf in batches:
            out = []
            for name, blob in zip(pdf["path"], pdf["content"]):
                out.extend(_parse_warc_bytes(name, bytes(blob)))
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "warc_file",
                        "record_offset",
                        "record_length",
                        "warc_type",
                        "record_id",
                        "target_uri",
                        "warc_date",
                        "content_type",
                        "http_content_type",
                        "content_length",
                        "http_status",
                        "body",
                    ],
                )

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)
