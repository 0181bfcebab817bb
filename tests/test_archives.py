"""Archive-shard ingestion (sources/archives.py): tar/tar.gz/zip member
inventory, WebDataset sample grouping, corrupt-shard tolerance, and the
end-to-end shard -> decode_image_stats pipeline."""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile

import numpy as np
import pytest

from whisper_pandas_spark.functions.codecs import encode_png, encode_wav
from whisper_pandas_spark.sources.archives import (
    member_payloads,
    read_archive_members,
    read_webdataset,
)


def _tar_bytes(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def _zip_bytes(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


@pytest.fixture()
def shard_dir(tmp_path):
    rng = np.random.default_rng(51)
    img = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    wav = rng.integers(-1000, 1000, (64, 1)).astype(np.int16)
    shard0 = {
        "000001.png": encode_png(img),
        "000001.txt": b"a red square",
        "000001.json": b'{"id": 1}',
        "000002.png": encode_png(img[:, :, 0]),
        "000002.txt": b"gray now",
    }
    shard1 = {
        "train/000003.wav": encode_wav(wav, 8000),
        "train/000003.txt": b"some audio",
        "train/000004.seg.png": encode_png(img),  # multi-dot extension
        "train/000004.txt": b"segmented",
    }
    (tmp_path / "shard-000.tar").write_bytes(_tar_bytes(shard0))
    (tmp_path / "shard-001.tar").write_bytes(_tar_bytes(shard1))
    return tmp_path


def test_member_inventory_across_shards(spark, shard_dir):
    df = read_archive_members(spark, str(shard_dir))
    rows = df.collect()
    assert len(rows) == 9
    by_member = {r["member"]: r for r in rows}
    assert by_member["000001.txt"]["payload"] == bytearray(b"a red square")
    assert by_member["000001.txt"]["n_bytes"] == 12
    assert by_member["train/000003.wav"]["shard"].endswith("shard-001.tar")


def test_webdataset_grouping_and_multidot_keys(spark, shard_dir):
    df = read_webdataset(spark, str(shard_dir))
    rows = {r["key"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"000001", "000002", "000003", "000004"}
    assert rows["000001"]["exts"] == ["json", "png", "txt"]
    # multi-dot member: ext is everything after the FIRST dot
    assert rows["000004"]["exts"] == ["seg.png", "txt"]
    assert bytes(rows["000002"]["payloads"]["txt"]) == b"gray now"
    # keys keep their directory prefix (shard-local uniqueness)
    assert any(r["key"].startswith("train/") for r in df.collect())


def test_gz_and_zip_shards(spark, tmp_path):
    members = {"1.txt": b"one", "1.cls": b"7", "2.txt": b"two"}
    (tmp_path / "a.tar.gz").write_bytes(gzip.compress(_tar_bytes(members)))
    (tmp_path / "b.zip").write_bytes(_zip_bytes({"9.txt": b"nine"}))
    gz = read_webdataset(spark, str(tmp_path), glob="*.tar.gz").collect()
    assert {r["key"] for r in gz} == {"1", "2"}
    zf = read_archive_members(spark, str(tmp_path), glob="*.zip").collect()
    assert len(zf) == 1 and zf[0]["member"] == "9.txt"


def test_corrupt_shard_skip_and_fail(spark, tmp_path):
    (tmp_path / "good.tar").write_bytes(_tar_bytes({"1.txt": b"ok"}))
    (tmp_path / "bad.tar").write_bytes(b"definitely not a tar archive" * 20)
    got = read_archive_members(spark, str(tmp_path)).collect()
    assert [r["member"] for r in got] == ["1.txt"]
    with pytest.raises(Exception):
        read_archive_members(spark, str(tmp_path), on_error="fail").collect()
    with pytest.raises(ValueError):
        read_archive_members(spark, str(tmp_path), on_error="bogus")


def test_shard_to_decode_pipeline(spark, shard_dir):
    from whisper_pandas_spark.operators.multimodal import decode_image_stats

    from pyspark.sql import functions as F

    wds = read_webdataset(spark, str(shard_dir))
    pngs = member_payloads(wds, "png")
    keyed = pngs.withColumn("doc_id", F.xxhash64("key"))
    got = decode_image_stats(keyed, "doc_id").collect()
    assert len(got) == 2  # 000001.png + 000002.png (the seg.png ext differs)
    assert {(r["height"], r["width"]) for r in got} == {(6, 6)}


def test_torn_shard_keeps_pretear_prefix_in_both_readers(spark, tmp_path):
    """A tar truncated mid-member yields the members before the tear —
    the SAME contract in the inventory and the webdataset reader."""
    full = _tar_bytes({"1.txt": b"first", "2.txt": b"second" * 100})
    torn = full[: full.index(b"second") + 20]  # inside member 2's data
    (tmp_path / "torn.tar").write_bytes(torn)
    inv = read_archive_members(spark, str(tmp_path)).collect()
    assert [r["member"] for r in inv] == ["1.txt"]
    wds = read_webdataset(spark, str(tmp_path)).collect()
    assert [r["key"] for r in wds] == ["1"]
    with pytest.raises(Exception):
        read_webdataset(spark, str(tmp_path), on_error="fail").collect()


def test_member_size_cap(monkeypatch):
    from whisper_pandas_spark.sources import archives

    monkeypatch.setattr(archives, "MAX_MEMBER_BYTES", 16)
    blob = _tar_bytes({"small.txt": b"ok", "big.bin": b"x" * 64})
    got = archives._members_tolerant(blob, "skip")
    assert [name for name, _ in got] == ["small.txt"]
    with pytest.raises(ValueError, match="exceeds"):
        archives._members_tolerant(blob, "fail")
    zblob = _zip_bytes({"a.txt": b"ok", "bomb.bin": b"y" * 64})
    zgot = archives._members_tolerant(zblob, "skip")
    assert [name for name, _ in zgot] == ["a.txt"]


# -- write_webdataset_shards -----------------------------------------------


def _sample_rows(n=40):
    rows = []
    for i in range(n):
        rows.append(
            (
                f"doc{i:04d}",
                {
                    "txt": bytearray(f"text {i}".encode()),
                    "json": bytearray(b'{"i": %d}' % i),
                },
            )
        )
    return rows


def test_webdataset_write_read_roundtrip(spark, tmp_path):
    from whisper_pandas_spark.sources.archives import (
        read_webdataset,
        write_webdataset_shards,
    )

    df = spark.createDataFrame(
        _sample_rows(), "key string, payloads map<string, binary>"
    )
    out = str(tmp_path / "wds")
    manifest = write_webdataset_shards(df, out, n_shards=3).toPandas()
    assert manifest["n_samples"].sum() == 40
    assert manifest["n_members"].sum() == 80
    back = read_webdataset(spark, out).toPandas()
    assert len(back) == 40
    got = {
        r["key"]: {e: bytes(p) for e, p in r["payloads"].items()}
        for _, r in back.iterrows()
    }
    for key, payloads in _sample_rows():
        assert got[key] == {e: bytes(p) for e, p in payloads.items()}
    # keys never span shards (the WebDataset contract we rely on)
    span = back.groupby("key")["shard"].nunique()
    assert (span == 1).all()


def test_webdataset_write_is_deterministic_and_stable(spark, tmp_path):
    import hashlib
    from pathlib import Path

    from whisper_pandas_spark.sources.archives import write_webdataset_shards

    df = spark.createDataFrame(
        _sample_rows(20), "key string, payloads map<string, binary>"
    )

    def digest(d):
        return {
            p.name: hashlib.md5(p.read_bytes()).hexdigest()
            for p in sorted(Path(d).glob("shard-*.tar"))
        }

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_webdataset_shards(df, a, n_shards=2)
    write_webdataset_shards(df.repartition(7), b, n_shards=2)
    assert digest(a) == digest(b)  # byte-identical under any partitioning

    # append-stability: a grown corpus keeps old keys in their shards
    from whisper_pandas_spark.operators.sampling import hash_bucket
    from pyspark.sql import functions as F

    shard_of = {
        r["key"]: r["s"]
        for r in df.select(
            "key", F.pmod(hash_bucket(F.col("key")), F.lit(2)).alias("s")
        ).collect()
    }
    df2 = spark.createDataFrame(
        _sample_rows(30), "key string, payloads map<string, binary>"
    )
    shard_of2 = {
        r["key"]: r["s"]
        for r in df2.select(
            "key", F.pmod(hash_bucket(F.col("key")), F.lit(2)).alias("s")
        ).collect()
    }
    assert all(shard_of2[k] == v for k, v in shard_of.items())

    import pytest as _pt

    with _pt.raises(FileExistsError):
        write_webdataset_shards(df, a, n_shards=2, mode="error")
    with _pt.raises(ValueError):
        write_webdataset_shards(df, a, n_shards=0)


def test_tokenize_pack_export_loop(spark, tmp_path):
    """The full training-data export loop in one plan family:
    BPE-encode documents -> pack into token-budget bins -> write each
    bin's samples as WebDataset shards -> read back and verify both the
    payload bytes and the bin budget invariant."""
    import json

    from pyspark.sql import functions as F

    from whisper_pandas_spark.operators.bpe_train import (
        bpe_alphabet,
        bpe_encode,
        bpe_train,
        bpe_vocab,
    )
    from whisper_pandas_spark.operators.packing import pack_bins
    from whisper_pandas_spark.sources.archives import (
        read_webdataset,
        write_webdataset_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"doc number {i} " + "common words repeat here " * (1 + i % 4))
         for i in range(24)],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, "text", 10)
    vocab = bpe_vocab(bpe_alphabet(docs, "text"), merges)
    enc = bpe_encode(docs, "doc_id", "text", merges, vocab)
    packed = pack_bins(
        enc.withColumn("block", F.lit("train")),
        "doc_id",
        F.col("n_tokens"),
        "block",
        budget=120,
    )
    samples = packed.select(
        F.col("doc_id").cast("string").alias("key"),
        F.create_map(
            F.lit("json"),
            F.to_json(F.struct("doc_id", "bin_id", "n_tokens", "ids")).cast(
                "binary"
            ),
        ).alias("payloads"),
    )
    out = str(tmp_path / "export")
    manifest = write_webdataset_shards(samples, out, n_shards=2).toPandas()
    assert manifest["n_samples"].sum() == 24

    back = read_webdataset(spark, out).toPandas()
    got = {
        int(r["key"]): json.loads(bytes(r["payloads"]["json"]))
        for _, r in back.iterrows()
    }
    assert len(got) == 24
    want_ids = {r["doc_id"]: list(r["ids"]) for r in enc.collect()}
    bins = {}
    for k, payload in got.items():
        assert payload["ids"] == want_ids[k]  # token ids survive the loop
        bins.setdefault(payload["bin_id"], []).append(payload["n_tokens"])
    # packing invariant: every bin except possibly the last started under
    # budget (overflow <= one document)
    for b, toks in bins.items():
        assert sum(toks) - max(toks) < 120, (b, toks)


def test_webdataset_overwrite_clears_stale_shards(spark, tmp_path):
    """Re-exporting with fewer shards must not leave the first export's
    extra tars mixed in (that produced stale + duplicate keys)."""
    from whisper_pandas_spark.sources.archives import (
        read_webdataset,
        write_webdataset_shards,
    )

    out = str(tmp_path / "wds")
    big = spark.createDataFrame(
        _sample_rows(20), "key string, payloads map<string, binary>"
    )
    write_webdataset_shards(big, out, n_shards=4)
    small = spark.createDataFrame(
        _sample_rows(3), "key string, payloads map<string, binary>"
    )
    write_webdataset_shards(small, out, n_shards=2)
    back = read_webdataset(spark, out).toPandas()
    assert sorted(back["key"]) == ["doc0000", "doc0001", "doc0002"]


def test_webdataset_rejects_dotted_and_duplicate_keys(spark, tmp_path):
    from whisper_pandas_spark.sources.archives import write_webdataset_shards

    dotted = spark.createDataFrame(
        [("v1.2", {"txt": bytearray(b"x")})],
        "key string, payloads map<string, binary>",
    )
    with pytest.raises(Exception, match="must not contain"):
        write_webdataset_shards(dotted, str(tmp_path / "a"), n_shards=1)
    # dots in the DIRECTORY part are fine (reader splits after last /)
    dir_dot = spark.createDataFrame(
        [("v1.2/sample", {"txt": bytearray(b"x")})],
        "key string, payloads map<string, binary>",
    )
    m = write_webdataset_shards(dir_dot, str(tmp_path / "b"), n_shards=1)
    assert m.toPandas()["n_samples"].sum() == 1
    dup = spark.createDataFrame(
        [("k1", {"txt": bytearray(b"x")}), ("k1", {"txt": bytearray(b"y")})],
        "key string, payloads map<string, binary>",
    )
    with pytest.raises(Exception, match="duplicate key"):
        write_webdataset_shards(dup, str(tmp_path / "c"), n_shards=1)
