"""Unigram-LM tokenizer (operators/unigram.py): EM fit, pruning,
Viterbi encoding, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whisper_pandas_spark.operators.unigram import (
    unigram_encode_words,
    unigram_token_count,
    unigram_train,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, "abab abab cd cd abab"),
            (1, "abab cd ef abab"),
            (2, "abababab cd"),
            (3, "ef ef abab cd"),
        ],
        "id long, text string",
    )


def test_em_learns_repeated_piece_and_encodes_with_it(spark, corpus):
    vocab = unigram_train(corpus, "text", vocab_size=10, max_piece_len=4)
    logp = {r["piece"]: r["logp"] for r in vocab.collect()}
    # the dominant bigram-pair word is learned as ONE piece and beats
    # its character decomposition
    assert "abab" in logp
    assert logp["abab"] > logp["a"] + logp["b"] + logp["a"] + logp["b"]
    words = spark.createDataFrame(
        [("abab",), ("abababab",), ("cd",), ("zq",)], ["word"]
    )
    toks = {
        r["word"]: r["tokens"]
        for r in unigram_encode_words(words, vocab).collect()
    }
    assert toks["abab"] == ["abab"]
    assert toks["abababab"] == ["abab", "abab"]
    assert toks["cd"] == ["cd"]
    assert toks["zq"] is None  # chars outside the corpus: unsegmentable
    # segmentations concatenate back to the word
    for w, t in toks.items():
        if t is not None:
            assert "".join(t) == w


def test_vocab_bound_chars_kept_and_determinism(spark, corpus):
    vocab = unigram_train(corpus, "text", vocab_size=8, max_piece_len=4)
    rows = sorted((r["piece"], r["logp"]) for r in vocab.collect())
    chars = {p for p, _ in rows if len(p) == 1}
    assert {"a", "b", "c", "d", "e", "f"} <= chars  # every corpus char
    assert len(rows) <= max(8, len(chars)) + len(chars)
    assert len([p for p, _ in rows if len(p) > 1]) <= 8

    # partitioning must not change the fit (decimal-folded E-step)
    v2 = unigram_train(
        corpus.repartition(7), "text", vocab_size=8, max_piece_len=4
    )
    assert rows == sorted((r["piece"], r["logp"]) for r in v2.collect())


def test_token_count_budget_and_unseg(spark, corpus):
    vocab = unigram_train(corpus, "text", vocab_size=10, max_piece_len=4)
    counts = {
        r["id"]: (r["n_words"], r["n_tokens"], r["n_unseg"])
        for r in unigram_token_count(corpus, "id", "text", vocab).collect()
    }
    assert counts[2] == (2, 3, 0)  # abababab -> 2 pieces, cd -> 1
    assert counts[0] == (5, 5, 0)
    # encoding OTHER text under this vocab: unknown chars count as unseg
    other = spark.createDataFrame([(9, "abab zq cd")], "id long, text string")
    got = unigram_token_count(other, "id", "text", vocab).collect()[0]
    assert (got["n_words"], got["n_unseg"]) == (3, 1)
    assert got["n_tokens"] == 2  # abab + cd; zq contributes nothing


def test_validation_errors(spark, corpus):
    with pytest.raises(ValueError):
        unigram_train(corpus, "text", vocab_size=0)
    with pytest.raises(ValueError):
        unigram_train(corpus, "text", vocab_size=5, shrink=1.5)
    with pytest.raises(ValueError):
        unigram_train(corpus, "text", vocab_size=5, max_piece_len=0)
    empty = spark.createDataFrame([], "id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        unigram_train(empty, "text", vocab_size=5)
