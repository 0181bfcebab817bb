"""Round-12 operators: perceptual-hash image near-dup (image_dhash /
phash_neardup_pairs) — property tests per VERDICT r11 task #4: crop and
brightness perturbations cluster, distinct images don't, and the banded
join equals the O(n^2) brute force.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from whisper_pandas_spark.functions.codecs import encode_png
from whisper_pandas_spark.operators.multimodal import (
    image_dhash,
    phash_neardup_pairs,
)


def _pgm(img: np.ndarray) -> bytes:
    h, w = img.shape
    return f"P5\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def _rng_img(seed: int, h: int = 32, w: int = 36) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 200, (h, w), dtype=np.uint8)


def _hashes(spark, payloads: dict[int, bytes]) -> dict[int, int]:
    df = spark.createDataFrame(
        list(payloads.items()), "doc_id long, payload binary"
    )
    return {
        r["doc_id"]: r["dhash"]
        for r in image_dhash(df, "doc_id").collect()
    }


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_dhash_brightness_invariant(spark):
    base = _rng_img(1)
    shifted = np.clip(base.astype(np.int64) + 30, 0, 255).astype(np.uint8)
    h = _hashes(spark, {0: _pgm(base), 1: _pgm(shifted)})
    # +30 with no clipping below 230: every grid inequality preserved
    assert _ham(h[0], h[1]) == 0


def test_dhash_small_perturbation_small_distance(spark):
    base = _rng_img(2)
    noisy = base.copy()
    noisy[5:7, 5:7] = 255  # one localized blotch
    h = _hashes(spark, {0: _pgm(base), 1: _pgm(noisy)})
    d = _ham(h[0], h[1])
    assert 0 <= d <= 6


def test_dhash_crop_tolerant(spark):
    base = _rng_img(3, 40, 45)
    # shave one row/col: block boundaries shift by <1 pixel per cell
    crop = base[1:, 1:]
    h = _hashes(spark, {0: _pgm(base), 1: _pgm(crop)})
    assert _ham(h[0], h[1]) <= 16  # clusters, even if not identical


def test_dhash_distinct_images_far(spark):
    h = _hashes(spark, {i: _pgm(_rng_img(100 + i)) for i in range(6)})
    ds = [
        _ham(h[i], h[j]) for i in range(6) for j in range(i + 1, 6)
    ]
    assert min(ds) > 10  # random 64-bit-ish fingerprints: expect ~32
    assert sum(ds) / len(ds) > 20


def test_dhash_png_and_pgm_agree(spark):
    img = _rng_img(7, 16, 18)
    h = _hashes(
        spark,
        {0: _pgm(img), 1: encode_png(img[:, :, None])},
    )
    assert h[0] == h[1]


def test_dhash_rejects_tiny_and_null(spark):
    df = spark.createDataFrame(
        [(0, _pgm(np.zeros((4, 4), dtype=np.uint8))), (1, None),
         (2, _pgm(_rng_img(9, 16, 18)))],
        "doc_id long, payload binary",
    )
    ok = image_dhash(df, "doc_id").collect()  # skip mode
    assert [r["doc_id"] for r in ok] == [2]
    nulls = image_dhash(df, "doc_id", on_error="null").collect()
    assert sorted(r["doc_id"] for r in nulls) == [0, 1, 2]
    assert {r["doc_id"]: r["dhash"] is None for r in nulls}[1] is True


def test_banded_pairs_equal_brute_force(spark):
    # 3 clusters of perturbed twins + singletons
    payloads: dict[int, bytes] = {}
    for c in range(3):
        base = _rng_img(200 + c)
        payloads[c * 10] = _pgm(base)
        tw = base.copy()
        tw[c : c + 2, c : c + 2] = 0
        payloads[c * 10 + 1] = _pgm(tw)
    for s in range(3):
        payloads[100 + s] = _pgm(_rng_img(300 + s))

    df = spark.createDataFrame(
        list(payloads.items()), "doc_id long, payload binary"
    )
    pairs = phash_neardup_pairs(df, "doc_id", max_hamming=7)
    got = {
        (r["doc_i"], r["doc_j"]): r["hamming"] for r in pairs.collect()
    }
    h = _hashes(spark, payloads)
    ids = sorted(h)
    want = {
        (a, b): _ham(h[a], h[b])
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _ham(h[a], h[b]) <= 7
    }
    assert got == want
    assert all((c * 10, c * 10 + 1) in want for c in range(3))


def test_dhash_sign_bit_safe(spark):
    # an image whose top-left grid comparisons all ascend sets high bits;
    # force bit 63: gradient image ascending along x everywhere
    g = np.tile(np.arange(0, 180, 5, dtype=np.uint8), (16, 1))
    h = _hashes(spark, {0: _pgm(g)})
    assert h[0] == -1  # all 64 bits set -> two's-complement -1
    # and hamming against itself is zero through the banded join
    df = spark.createDataFrame(
        [(0, _pgm(g)), (1, _pgm(g))], "doc_id long, payload binary"
    )
    rows = phash_neardup_pairs(df, "doc_id").collect()
    assert len(rows) == 1 and rows[0]["hamming"] == 0


# ---------------------------------------------------------------------------
# paragraph_dedup (Dolma-style)
# ---------------------------------------------------------------------------

from whisper_pandas_spark.operators.dedup import paragraph_dedup  # noqa: E402


def test_paragraph_dedup_no_dups_round_trips(spark):
    texts = [
        "alpha\n\nbeta\n\ngamma",
        "delta",
        "eps zeta\n\neta",
        "",  # empty doc: one empty paragraph, unique nowhere else? it is
    ]
    # make every paragraph globally unique (and non-empty) to guarantee
    # a byte-identical round trip
    texts = [t if t else "lone-empty-stand-in" for t in texts]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(df, "doc_id", "text").collect()
    }
    for i, t in enumerate(texts):
        assert out[i]["text_dedup"] == t
        assert out[i]["n_kept"] == out[i]["n_paras"] == t.count("\n\n") + 1


def test_paragraph_dedup_drop_rules(spark):
    df = spark.createDataFrame(
        [
            (0, "HDR\n\nalpha beta\n\ngamma"),
            (1, "HDR\n\nalpha beta\n\ndelta"),  # both dups dropped
            (2, "same\n\nsame\n\nHDR"),  # within-doc repeat + corpus dup
            (3, "HDR"),  # everything seen before -> empty
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(df, "doc_id", "text").collect()
    }
    assert out[0]["text_dedup"] == "HDR\n\nalpha beta\n\ngamma"
    assert out[1]["text_dedup"] == "delta" and out[1]["n_kept"] == 1
    assert out[2]["text_dedup"] == "same" and out[2]["n_kept"] == 1
    assert out[3]["text_dedup"] == "" and out[3]["n_kept"] == 0
    assert all(out[i]["n_paras"] in (1, 3) for i in out)


def test_paragraph_dedup_partitioning_independent(spark):
    rows = [(i, f"HDR\n\nuniq {i}\n\nshared {i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        map(tuple, paragraph_dedup(df, "doc_id", "text").collect())
    )
    b = sorted(
        map(
            tuple,
            paragraph_dedup(df.repartition(7), "doc_id", "text").collect(),
        )
    )
    assert a == b
    # min-(doc_id,pos) winner: doc 0 keeps all three paragraphs
    byid = dict((t[0], t) for t in a)
    assert byid[0][2] == 3
    # docs 3..29 lose HDR and their shared paragraph
    assert byid[4][2] == 1 and byid[4][3] == "uniq 4"


# ---------------------------------------------------------------------------
# url_key_df (URL normalization + registered-domain keying)
# ---------------------------------------------------------------------------

from whisper_pandas_spark.operators.urlkey import url_key_df  # noqa: E402

URL_GOLDEN = [
    # url, scheme, host, path, reg_domain
    ("https://WWW.Example.COM/path/a?q=1#f", "https", "www.example.com",
     "/path/a", "example.com"),
    ("http://sub.shop.example.CO.UK:8080/x", "http",
     "sub.shop.example.co.uk", "/x", "example.co.uk"),
    ("ftp://user:pw@files.example.com.au/dl", "ftp",
     "files.example.com.au", "/dl", "example.com.au"),
    ("example.org/no-scheme", "http", "example.org", "/no-scheme",
     "example.org"),
    ("https://192.168.1.7/ip", "https", "192.168.1.7", "/ip",
     "192.168.1.7"),
    ("https://blog.team.github.io/post/", "https", "blog.team.github.io",
     "/post/", "team.github.io"),
    ("https://deep.example.net./trail.", "https", "deep.example.net",
     "/trail.", "example.net"),
    ("HTTPS://EXAMPLE.IO?onlyquery", "https", "example.io", "/",
     "example.io"),
    ("localhost", "http", "localhost", "/", "localhost"),
    ("https://example.com", "https", "example.com", "/", "example.com"),
    ("scheme+v1.2://Weird.Example.ORG/ok", "scheme+v1.2",
     "weird.example.org", "/ok", "example.org"),
    ("https://a@b@evil.example.com/p", "https", "evil.example.com", "/p",
     "example.com"),
]


def test_url_key_golden(spark):
    df = spark.createDataFrame(
        [(i, u[0]) for i, u in enumerate(URL_GOLDEN)],
        "doc_id long, url string",
    )
    rows = {r["doc_id"]: r for r in url_key_df(df, "url").collect()}
    for i, (url, scheme, host, path, dom) in enumerate(URL_GOLDEN):
        got = rows[i]
        assert (got["scheme"], got["host"], got["path"], got["reg_domain"]) \
            == (scheme, host, path, dom), url


def test_url_key_is_codegen_only(spark):
    df = spark.createDataFrame([(1, "https://x.example.com/a")],
                               "doc_id long, url string")
    plan = url_key_df(df, "url")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


# ---------------------------------------------------------------------------
# audio_fingerprint / audio_neardup_pairs
# ---------------------------------------------------------------------------

from whisper_pandas_spark.functions.codecs import encode_wav  # noqa: E402
from whisper_pandas_spark.operators.multimodal import (  # noqa: E402
    audio_fingerprint,
    audio_neardup_pairs,
)


def _clip(seed: int, n: int = 1056) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        -20000, 20000, n, dtype=np.int64
    ).astype(np.int16)


def _afps(spark, clips: dict[int, np.ndarray]) -> dict[int, int]:
    df = spark.createDataFrame(
        [(i, encode_wav(s, 8000)) for i, s in clips.items()],
        "doc_id long, payload binary",
    )
    return {
        r["doc_id"]: r["afp"] for r in audio_fingerprint(df, "doc_id").collect()
    }


def test_audio_fp_gain_invariant(spark):
    base = (_clip(1) // 4).astype(np.int16)  # headroom for 3x gain
    loud = (base.astype(np.int64) * 3).astype(np.int16)
    fp = _afps(spark, {0: base, 1: loud})
    assert fp[0] == fp[1]  # every energy scales by 9x: inequalities keep


def test_audio_fp_local_edit_small_distance(spark):
    base = _clip(2)
    edited = base.copy()
    edited[100:110] = 32000  # one loud blip inside frame 3
    fp = _afps(spark, {0: base, 1: edited})
    d = bin(fp[0] ^ fp[1]).count("1")
    assert 0 < d <= 4  # frames 3 only -> bits 2 and 3 at most... plus margin


def test_audio_fp_distinct_clips_far(spark):
    fp = _afps(spark, {i: _clip(50 + i) for i in range(6)})
    ds = [
        bin(fp[a] ^ fp[b]).count("1")
        for a in range(6)
        for b in range(a + 1, 6)
    ]
    assert min(ds) > 4 and sum(ds) / len(ds) > 10


def test_audio_fp_short_clip_errors(spark):
    df = spark.createDataFrame(
        [(0, encode_wav(_clip(9, 500), 8000)), (1, encode_wav(_clip(9), 8000))],
        "doc_id long, payload binary",
    )
    assert [r["doc_id"] for r in audio_fingerprint(df, "doc_id").collect()] == [1]


def test_audio_banded_pairs_equal_brute_force(spark):
    clips: dict[int, np.ndarray] = {}
    for c in range(3):
        base = _clip(300 + c)
        clips[c * 10] = base
        tw = base.copy()
        tw[c * 37 : c * 37 + 5] = 31000
        clips[c * 10 + 1] = tw
    for s in range(3):
        clips[100 + s] = _clip(400 + s)
    df = spark.createDataFrame(
        [(i, encode_wav(v, 8000)) for i, v in clips.items()],
        "doc_id long, payload binary",
    )
    pairs = audio_neardup_pairs(df, "doc_id", max_hamming=3)
    got = {(r["doc_i"], r["doc_j"]): r["hamming"] for r in pairs.collect()}
    fp = _afps(spark, clips)
    ids = sorted(fp)
    # hamming <= 3 is inside the pigeonhole guarantee: banded == brute
    want = {
        (a, b): bin(fp[a] ^ fp[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fp[a] ^ fp[b]).count("1") <= 3
    }
    assert got == want


# ---------------------------------------------------------------------------
# video_frame_dhash / video_neardup_pairs
# ---------------------------------------------------------------------------

from whisper_pandas_spark.functions.codecs import encode_gif  # noqa: E402
from whisper_pandas_spark.operators.multimodal import (  # noqa: E402
    video_frame_dhash,
    video_neardup_pairs,
)

_GRAY = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)


def _gif(seed: int, n_frames: int = 4) -> bytes:
    rng = np.random.default_rng(seed)
    return encode_gif(
        [rng.integers(0, 200, (16, 18), dtype=np.uint8) for _ in range(n_frames)],
        _GRAY,
    )


def test_video_frame_dhash_rows_and_sampling(spark):
    df = spark.createDataFrame(
        [(0, _gif(1, 6))], "doc_id long, payload binary"
    )
    rows = video_frame_dhash(df, "doc_id").collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3, 4, 5]
    sampled = video_frame_dhash(df, "doc_id", every=2).collect()
    assert [r["frame_idx"] for r in sampled] == [0, 2, 4]
    # sampled hashes equal the full pass at the same indices
    full = {r["frame_idx"]: r["dhash"] for r in rows}
    assert all(full[r["frame_idx"]] == r["dhash"] for r in sampled)


def test_video_neardup_one_edited_frame(spark):
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 200, (16, 18), dtype=np.uint8) for _ in range(4)]
    twin = [f.copy() for f in frames]
    twin[2][4:6, 4:6] = 255  # local blotch in one frame
    df = spark.createDataFrame(
        [(0, encode_gif(frames, _GRAY)), (1, encode_gif(twin, _GRAY)),
         (100, _gif(50)), (101, _gif(51))],
        "doc_id long, payload binary",
    )
    pairs = video_neardup_pairs(df, "doc_id", max_total_hamming=8)
    got = {(r["doc_i"], r["doc_j"]): r["total_hamming"] for r in pairs.collect()}
    assert (0, 1) in got and got[(0, 1)] <= 8
    # distinct random clips never pair
    assert all(p == (0, 1) for p in got)


def test_video_identical_clips_distance_zero(spark):
    g = _gif(99)
    df = spark.createDataFrame(
        [(0, g), (1, g)], "doc_id long, payload binary"
    )
    rows = video_neardup_pairs(df, "doc_id").collect()
    assert len(rows) == 1 and rows[0]["total_hamming"] == 0


# ---------------------------------------------------------------------------
# duplicate_span_removal (Lee et al. ExactSubstr, word-token form)
# ---------------------------------------------------------------------------

from whisper_pandas_spark.operators.dedup import duplicate_span_removal  # noqa: E402


def _spans(spark, texts, window=3):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    return {
        r["doc_id"]: r
        for r in duplicate_span_removal(df, "doc_id", "text", window).collect()
    }


def test_spans_no_duplicates_round_trip(spark):
    texts = ["a b c d e", "f g h i j", "k l"]  # last is below the window
    out = _spans(spark, texts, window=3)
    for i, t in enumerate(texts):
        assert out[i]["text_dedup"] == t and out[i]["n_removed"] == 0


def test_spans_cross_doc_duplicate_keeps_first(spark):
    texts = [
        "x y z SHARED SPAN OF TOKENS q r",
        "a b SHARED SPAN OF TOKENS c d",
    ]
    out = _spans(spark, texts, window=4)
    assert out[0]["n_removed"] == 0  # winner occurrence keeps everything
    assert "SHARED SPAN OF TOKENS" not in out[1]["text_dedup"]
    assert out[1]["text_dedup"].startswith("a b")
    # tokens outside every duplicated window survive
    assert out[1]["text_dedup"].endswith("c d")


def test_spans_within_doc_duplicate(spark):
    out = _spans(spark, ["p q r s HH II JJ mm HH II JJ tt"], window=3)
    t = out[0]["text_dedup"]
    assert t.count("HH II JJ") == 1 and out[0]["n_removed"] == 3


def test_spans_overlapping_windows_merge(spark):
    # a 5-token duplicated run with window 3 -> overlapping windows
    # cover the whole run in the losing doc
    texts = ["A B C D E x", "y A B C D E z"]
    out = _spans(spark, texts, window=3)
    assert out[0]["n_removed"] == 0
    assert out[1]["text_dedup"] == "y z" and out[1]["n_removed"] == 5


def test_spans_partitioning_independent(spark):
    texts = [f"u{i} v{i} COMMON RUN HERE w{i}" for i in range(20)]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    a = sorted(map(tuple, duplicate_span_removal(df, "doc_id", "text", 3).collect()))
    b = sorted(
        map(
            tuple,
            duplicate_span_removal(
                df.repartition(7), "doc_id", "text", 3
            ).collect(),
        )
    )
    assert a == b
    byid = {t[0]: t for t in a}
    assert byid[0][2] == 0  # doc 0 is the winner
    assert all(byid[i][2] == 3 for i in range(1, 20))


# ---------------------------------------------------------------------------
# semantic_contamination
# ---------------------------------------------------------------------------

from whisper_pandas_spark.operators.decontam import semantic_contamination  # noqa: E402


def test_semantic_contamination_flags(spark):
    def vec(*xs):
        return [float(x) for x in xs]

    corpus = spark.createDataFrame(
        [
            (0, vec(1, 0, 0, 0)),       # exact held-out member
            (1, vec(0.99, 0.14, 0, 0)), # near-paraphrase of held-out
            (2, vec(0, 1, 0, 0)),       # orthogonal
            (3, vec(-1, 0, 0, 0)),      # opposite
        ],
        "vec_id long, embedding array<float>",
    )
    held = corpus.filter(F.col("vec_id") == 0)
    out = {
        r["vec_id"]: r
        for r in semantic_contamination(
            corpus, held, "vec_id", "embedding", 0.95
        ).collect()
    }
    assert out[0]["contaminated"] == 1 and abs(out[0]["max_cos"] - 1) < 1e-9
    assert out[1]["contaminated"] == 1  # cos ~ 0.990
    assert out[2]["contaminated"] == 0 and abs(out[2]["max_cos"]) < 1e-9
    assert out[3]["contaminated"] == 0 and out[3]["max_cos"] < 0
    # every corpus row gets a verdict
    assert sorted(out) == [0, 1, 2, 3]


def test_semantic_contamination_broadcasts_heldout(spark):
    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    held = corpus.filter(F.col("vec_id") < 2)
    df = semantic_contamination(corpus, held)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


# ---------------------------------------------------------------------------
# stream_phash_dedup (streaming perceptual registry)
# ---------------------------------------------------------------------------

from whisper_pandas_spark.operators.merge import current_version_path  # noqa: E402
from whisper_pandas_spark.streaming.phash import stream_phash_dedup  # noqa: E402


def test_stream_phash_registry(spark, tmp_path):
    d = str(tmp_path)
    base = _rng_img(900, 16, 18)
    twin = base.copy()
    twin[3:5, 3:5] = 0
    other = _rng_img(901, 16, 18)
    b1 = spark.createDataFrame(
        [(10, _pgm(base)), (11, _pgm(base))],  # exact dup within batch
        "img_id long, payload binary",
    )
    b2 = spark.createDataFrame(
        [(20, _pgm(twin)), (21, _pgm(other))],
        "img_id long, payload binary",
    )
    b1.coalesce(1).write.parquet(f"{d}/changes/f1")
    b2.coalesce(1).write.parquet(f"{d}/changes/f2")

    def run(ckpt):
        sdf = (
            spark.readStream.schema("img_id long, payload binary")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/changes/*")
        )
        q = stream_phash_dedup(sdf, f"{d}/state", checkpoint_dir=ckpt)
        q.processAllAvailable()
        q.stop()

    run(f"{d}/c1")
    s1 = sorted(
        (r["img_id"], r["dhash"])
        for r in spark.read.parquet(current_version_path(f"{d}/state")).collect()
    )
    ids = [i for i, _ in s1]
    assert 10 in ids          # batch-1 exact-dup keeps min id
    assert 11 not in ids
    assert 20 not in ids      # twin within hamming of registry -> rejected
    assert 21 in ids          # distinct image registers
    # full reprocess: idempotent — state content unchanged
    run(f"{d}/c2")
    s2 = sorted(
        (r["img_id"], r["dhash"])
        for r in spark.read.parquet(current_version_path(f"{d}/state")).collect()
    )
    assert s1 == s2


def test_stream_phash_rejects_bad_hamming(spark):
    import pytest as _pt

    with _pt.raises(ValueError):
        stream_phash_dedup(None, "/tmp/x", max_hamming=8)
