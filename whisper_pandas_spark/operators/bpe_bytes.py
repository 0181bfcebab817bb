"""Byte-level BPE (GPT-2 style) training and token counting.

Extends operators/bpe_train.py's character-level path to the byte level
— what production tokenizers actually ship (Radford et al. 2019, "GPT-2";
the byte-level trick is public: every UTF-8 byte maps to a printable
Unicode stand-in character, so BPE operates on byte sequences with NO
unknown token, and any text round-trips losslessly):

- **Pre-tokenization** uses the engine's existing GPT-2-style regex
  (operators/textstats.py:BPE_REGEX — the Java∩RE2 dialect subset, so
  Spark and DuckDB extract identical pre-tokens). Pre-tokens keep their
  leading space, the GPT-2 convention.
- **Byte alphabet**: each pre-token's UTF-8 bytes map through
  :func:`bytes_to_unicode` (the public GPT-2 table: printable bytes map
  to themselves, the 68 others to U+0100.. in byte order), so symbols
  are single printable characters and NEVER contain a space — which is
  what makes the oracle's string-replace merge replay airtight.
- **Merge application order**: merges apply IN TRAINING ORDER, one full
  left-to-right non-overlapping pass each (the same pass
  bpe_train._merge_syms makes). This equals the rank-greedy encoder
  whenever no pair formed by a merge outranks a pair already pending —
  which holds by construction DURING training (a pair involving a merge
  output can only be learned after that output exists, so its rank is
  strictly later), and is pytest-asserted against an independent
  rank-greedy reference on the corpus and on random inputs.

Scale shape (identical to the word-level path): one corpus shuffle for
the pre-token vocabulary, per-merge-iteration one partial-agg exchange
+ a 1-row driver top-1 + one Arrow pass (checkpointed, constant plan
depth); counting re-encodes only UNIQUE pre-tokens (Zipf-small) and
joins back. The driver never holds more than the merge list.

No reference-repo parity: whisper_pandas has no text surface; this
backs SURVEY.md §2.10 X4 / §2.11.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whisper_pandas_spark.operators.bpe_train import (
    _merge_syms,
    collect_vocab,
    learn_merges,
    learn_merges_local,
)
from whisper_pandas_spark.operators.textstats import BPE_REGEX


@lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """The public GPT-2 byte→unicode stand-in table: bytes that are
    printable and not whitespace-like (``!..~``, ``¡..¬``, ``®..ÿ``)
    map to themselves; the remaining 68 bytes map, in ascending byte
    order, to code points 256, 257, … — all stand-ins are single
    non-space characters, so space works as a symbol separator."""
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    table: dict[int, str] = {}
    n = 0
    for b in range(256):
        if b in keep:
            table[b] = chr(b)
        else:
            table[b] = chr(256 + n)
            n += 1
    return table


def pretoken_syms(w: str) -> list[str]:
    """A pre-token's initial symbol sequence: its UTF-8 bytes, each
    mapped through :func:`bytes_to_unicode`. No end-of-word marker —
    the leading-space convention carries word boundaries instead."""
    table = bytes_to_unicode()
    return [table[b] for b in w.encode("utf-8")]


def _pretoken_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the corpus' GPT-2-style pre-tokens — the one
    corpus-level shuffle of training."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_REGEX), F.lit(0))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_bytes_train(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    min_pair_freq: int = 2,
    distributed: bool = False,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` byte-level merges from the corpus; returns
    the ordered merge list (stops early below ``min_pair_freq``).

    The pre-token histogram is always built distributed (the one corpus
    shuffle). The merge loop defaults to the driver-local path over the
    collected Zipf-bounded histogram (bpe_train.learn_merges_local) —
    a production 32k–50k-merge vocabulary is then a local loop instead
    of tens of thousands of sequential Spark jobs. ``distributed=True``
    opts back into the one-Spark-iteration-per-merge loop for corpora
    whose unique pre-token table cannot collect. Bit-identical merge
    lists either way (property-tested)."""
    import pandas as pd

    def to_syms(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    "syms": [pretoken_syms(w) for w in pdf["word"]],
                    "freq": pdf["freq"],
                }
            )

    vocab = _pretoken_vocab(df, text_col).mapInPandas(
        to_syms, "syms array<string>, freq long"
    )
    if distributed:
        return learn_merges(vocab, num_merges, min_pair_freq)
    return learn_merges_local(collect_vocab(vocab), num_merges, min_pair_freq)


def apply_merges(syms: list[str], merges: list[tuple[str, str]]) -> list[str]:
    """Apply a merge table in training order (one full pass per merge —
    see the module docstring for the rank-greedy equivalence)."""
    for a, b in merges:
        if len(syms) < 2:
            break
        syms = _merge_syms(syms, a, b)
    return syms


def bpe_bytes_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Per-document byte-level token statistics under a learned merge
    table: (doc_id, n_pretokens, n_bytes, n_tokens). ``n_bytes`` is the
    UTF-8 byte count of the matched pre-tokens (= token count before
    any merge), so ``n_bytes - n_tokens`` is exactly the number of
    merge operations the encoder performed on the document.

    The encode pass runs once per UNIQUE pre-token (one Arrow pass with
    the merge list in the closure), then per-pre-token counts join back
    to the positional stream and aggregate per document — two exchanges
    (distinct pre-tokens; the per-doc agg), independent of merge count.
    Documents with no pre-token (NULL/empty text) report zero counts
    rather than dropping out.
    """
    import pandas as pd

    # explode_outer: a pre-token-less document (NULL/empty text) keeps
    # ONE carrier row with a NULL word, so the zero-count backfill
    # happens inside the per-doc aggregate and the corpus-sized
    # distinct-ids left join (a third scan + join) disappears
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_REGEX), F.lit(0))
        ).alias("word"),
    )
    uniq = words.where(F.col("word").isNotNull()).select("word").distinct()

    def enc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n_bytes = []
            n_toks = []
            for w in pdf["word"]:
                syms = pretoken_syms(w)
                n_bytes.append(len(syms))
                n_toks.append(len(apply_merges(syms, merges)))
            yield pd.DataFrame(
                {"word": pdf["word"], "nb": n_bytes, "nt": n_toks}
            )

    lengths = uniq.mapInPandas(enc, "word string, nb long, nt long")
    # left join: only the carrier rows miss; count("word")/coalesced
    # sums turn them into the old backfill zeros
    return (
        words.join(lengths, "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count("word").cast("bigint").alias("n_pretokens"),
            F.coalesce(F.sum("nb"), F.lit(0)).cast("bigint").alias("n_bytes"),
            F.coalesce(F.sum("nt"), F.lit(0)).cast("bigint").alias("n_tokens"),
        )
    )


def bpe_bytes_vocab(merges: list[tuple[str, str]]) -> dict[str, int]:
    """token -> id under the GPT-2 id convention: the 256 byte stand-ins
    first (ids 0..255 in BYTE order — the stand-in table is a bijection,
    so byte value IS the id), then each merge's output in training order
    (a later merge that reproduces an existing output keeps the first
    id)."""
    table = bytes_to_unicode()
    vocab = {table[b]: b for b in range(256)}
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    return vocab


def bpe_bytes_encode_ids(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Encode every document to its byte-level BPE id sequence:
    (doc_id, n_tokens BIGINT, ids_csv STRING — comma-joined ids in
    document order). Byte fallback means NO unknown id can ever occur:
    every symbol is either a base byte (id 0..255) or a merge output.

    Same two-exchange shape as :func:`bpe_bytes_counts`: the merge loop
    runs once per UNIQUE pre-token (Arrow pass, merges + vocab in the
    closure), per-pre-token id strings join back to the POSITIONAL
    pre-token stream, and each document reassembles with one
    sort_array-over-structs aggregation — order-correct under any
    partitioning, no window. Documents with no pre-token keep a row
    with ids_csv = '' (callers zip output back to the corpus).
    """
    import pandas as pd

    vocab = bpe_bytes_vocab(merges)
    # posexplode_outer carrier rows replace the distinct-ids backfill
    # join, exactly as in bpe_bytes_counts above
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode_outer(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_REGEX), F.lit(0))
        ).alias("pos", "word"),
    )
    uniq = words.where(F.col("word").isNotNull()).select("word").distinct()

    def enc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for w in pdf["word"]:
                syms = apply_merges(pretoken_syms(w), merges)
                out.append(",".join(str(vocab[s]) for s in syms))
            yield pd.DataFrame({"word": pdf["word"], "wid": out})

    encoded = uniq.mapInPandas(enc, "word string, wid string")
    assembled = (
        words.join(encoded, "word", "left")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("word").isNotNull(),
                                F.struct("pos", "wid"),
                            )
                        )
                    ),
                    lambda s: s["wid"],
                ),
                ",",
            ).alias("ids_csv")
        )
    )
    n_tokens = F.when(F.col("ids_csv") == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("ids_csv"), ","))
    )
    return assembled.select(
        "doc_id", n_tokens.cast("bigint").alias("n_tokens"), "ids_csv"
    )
