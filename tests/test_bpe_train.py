"""Distributed BPE training (operators/bpe_train.py) vs an independent
single-node reference implementation of the public algorithm."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from whisper_pandas_spark.operators.bpe_train import (
    END,
    bpe_segment_counts,
    bpe_train,
)

CORPUS = [
    "the cat sat on the mat",
    "the cat ate the fish",
    "low lower lowest",
    "new newer newest",
    "the newest cat is the lowest cat",
    "fish and cats and mats",
]


def _ref_tokenize(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _ref_train(texts, num_merges, min_pair_freq=2):
    """Independent reference BPE (dict/Counter, no Spark)."""
    vocab = Counter()
    for t in texts:
        for w in _ref_tokenize(t):
            vocab[tuple(list(w) + [END])] += 1
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        # max count, ties lexicographic
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        (a, b), _n = best
        merges.append((a, b))
        new_vocab = Counter()
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


def _ref_segment(word: str, merges) -> list[str]:
    rank = {p: i for i, p in enumerate(merges)}
    syms = list(word) + [END]
    while len(syms) > 1:
        cands = [
            (rank[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in rank
        ]
        if not cands:
            break
        r, _ = min(cands)
        a, b = merges[r]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_merge_table_matches_reference_exactly(docs):
    got = bpe_train(docs, "text", num_merges=12)
    expect = _ref_train(CORPUS, 12)
    assert got == expect
    assert len(got) >= 5  # the corpus supports a non-trivial table


def test_merge_table_partitioning_independent(docs):
    base = bpe_train(docs, "text", num_merges=6)
    assert bpe_train(docs.repartition(7), "text", num_merges=6) == base
    assert bpe_train(docs.coalesce(1), "text", num_merges=6) == base


def test_early_stop_when_no_pair_is_frequent(spark):
    tiny = spark.createDataFrame([(0, "ab cd")], "doc_id long, text string")
    # every pair occurs once -> below min_pair_freq=2 -> zero merges
    assert bpe_train(tiny, "text", num_merges=10) == []
    # with min_pair_freq=1 it merges until single symbols remain
    got = bpe_train(tiny, "text", num_merges=50, min_pair_freq=1)
    assert 0 < len(got) <= 6


def test_segment_counts_match_reference(docs):
    merges = bpe_train(docs, "text", num_merges=12)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_segment_counts(docs, "doc_id", "text", merges).collect()
    }
    for i, t in enumerate(CORPUS):
        words = _ref_tokenize(t)
        expect_tokens = sum(len(_ref_segment(w, merges)) for w in words)
        assert got[i] == (len(words), expect_tokens), t


def test_validation_errors(docs):
    with pytest.raises(ValueError):
        bpe_train(docs, "text", num_merges=0)


# -- bpe_encode ------------------------------------------------------------


def test_encode_matches_reference_and_decodes(docs, spark):
    from whisper_pandas_spark.operators.bpe_train import (
        bpe_alphabet,
        bpe_encode,
        bpe_vocab,
    )

    merges = bpe_train(docs, "text", 12)
    alpha = bpe_alphabet(docs, "text")
    vocab = bpe_vocab(alpha, merges)
    inv = {i: t for t, i in vocab.items()}
    out = {
        r["doc_id"]: (list(r["ids"]), r["n_tokens"])
        for r in bpe_encode(docs, "doc_id", "text", merges, vocab).collect()
    }
    for doc_id, text in enumerate(CORPUS):
        want_syms = [
            s for w in _ref_tokenize(text) for s in _ref_segment(w, merges)
        ]
        ids, n = out[doc_id]
        assert n == len(ids) == len(want_syms)
        assert [inv[i] for i in ids] == want_syms
        # decode: joining symbols and splitting on END recovers the words
        assert "".join(inv[i] for i in ids).split(END)[:-1] == _ref_tokenize(
            text
        )


def test_encode_consistent_with_segment_counts(docs):
    from whisper_pandas_spark.operators.bpe_train import (
        bpe_alphabet,
        bpe_encode,
        bpe_vocab,
    )

    merges = bpe_train(docs, "text", 8)
    vocab = bpe_vocab(bpe_alphabet(docs, "text"), merges)
    enc = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_encode(docs, "doc_id", "text", merges, vocab).collect()
    }
    seg = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_segment_counts(docs, "doc_id", "text", merges).collect()
    }
    assert enc == seg


def test_encode_unknown_chars_get_unk_id(spark):
    from whisper_pandas_spark.operators.bpe_train import (
        bpe_encode,
        bpe_vocab,
    )

    train = spark.createDataFrame([(0, "aa ab")], "doc_id long, text string")
    merges = []  # no merges: every char is its own token
    vocab = bpe_vocab(["a", "b", END], merges)
    new = spark.createDataFrame([(0, "az")], "doc_id long, text string")
    row = bpe_encode(new, "doc_id", "text", merges, vocab, unk_id=-7).collect()[0]
    assert list(row["ids"]) == [vocab["a"], -7, vocab[END]]


def test_encode_empty_doc_yields_empty_ids(spark):
    from whisper_pandas_spark.operators.bpe_train import (
        bpe_encode,
        bpe_vocab,
    )

    df = spark.createDataFrame(
        [(0, "ab ab"), (1, "!!! ..."), (2, "")],
        "doc_id long, text string",
    )
    vocab = bpe_vocab(["a", "b", END], [])
    out = {
        r["doc_id"]: (list(r["ids"]), r["n_tokens"])
        for r in bpe_encode(df, "doc_id", "text", [], vocab).collect()
    }
    assert set(out) == {0, 1, 2}  # no silently dropped documents
    assert out[1] == ([], 0) and out[2] == ([], 0)
    assert out[0][1] == 6  # a b </w> a b </w>
