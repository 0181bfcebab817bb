"""Parity against the reference's REAL fixture file.

`/root/reference/data/example_truncated.wsp` is the first 100 000 bytes of
the reference's 82.8 MB golden sensor file (recipe:
/root/reference/data/README.md:13-21). The reference asserts its header
decodes fine and the size mismatch is *exposed but not enforced*
(/root/reference/test_whisper_pandas.py:100-103); the full-file golden
values it implies are pinned in SURVEY.md §1.2. This test runs OUR engine
over THEIR bytes."""

from __future__ import annotations

import pytest

from whisper_pandas_spark.sources.format import read_header

REF_FIXTURE = "/root/reference/data/example_truncated.wsp"


def test_reference_truncated_header_parity():
    info = read_header(REF_FIXTURE)
    # Golden header values (reference test_whisper_pandas.py:19-40 asserts
    # these for the untruncated original; the header region is intact)
    assert info.aggregation_method == "average"
    assert info.max_retention == 315_363_600
    assert info.x_files_factor == pytest.approx(0.5)
    assert len(info.archives) == 3

    spp = [a.seconds_per_point for a in info.archives]
    pts = [a.points for a in info.archives]
    assert spp == [10, 60, 3600]
    assert pts == [1_555_200, 5_256_000, 87_601]
    # retention = spp * points (reference whisper_pandas.py:67-69)
    assert [a.retention for a in info.archives] == [
        15_552_000, 315_360_000, 315_363_600
    ]
    # header geometry (reference whisper_pandas.py:125-135)
    assert info.header_size == 16 + 12 * 3
    assert info.file_size == 52 + 12 * (1_555_200 + 5_256_000 + 87_601)
    assert info.file_size == 82_785_664  # test_whisper_pandas.py:27-28
    # truncation is EXPOSED, not enforced
    assert info.file_size_actual == 100_000
    assert info.file_size_mismatch is True


def test_reference_truncated_scan_raises_clearly(spark):
    """Reference semantics: the HEADER of a truncated file reads fine
    (test above) but materializing archive data fails — the reference's
    `to_frame()` would hit a short numpy buffer
    (whisper_pandas.py:178-184); our reader raises a descriptive error
    instead of decoding garbage."""
    from whisper_pandas_spark.sources.whisper import register_whisper

    register_whisper(spark)
    df = spark.read.format("whisper").load(REF_FIXTURE)
    with pytest.raises(Exception, match="truncated"):
        df.collect()


def test_reference_truncated_meta_dataframe(spark):
    """Header-only APIs stay fully usable on the truncated file."""
    from whisper_pandas_spark.sources.meta import archive_meta, file_meta

    meta = file_meta(spark, REF_FIXTURE).collect()
    assert len(meta) == 1 and meta[0]["file_size_mismatch"] is True
    arch = archive_meta(spark, REF_FIXTURE).collect()
    assert [a["seconds_per_point"] for a in arch] == [10, 60, 3600]
