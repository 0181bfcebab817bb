"""WordPiece tokenizer: likelihood-scored merge training + the BERT
greedy longest-match-first encoder (Wu et al. 2016, "Google's Neural
Machine Translation System"; the training scoring and the encode loop
follow the public algorithm as documented by the HuggingFace
tokenizers course and BERT's reference WordpieceTokenizer).

Completes the repo's tokenizer matrix — word-BPE (frequency-merge),
byte-BPE (GPT-2), unigram-LM (SentencePiece), **WordPiece (BERT)** —
with the two things the others don't have: the ``score =
freq(ab) / (freq(a) * freq(b))`` merge objective (merges that maximize
corpus likelihood under a unigram model, not raw pair frequency) and
greedy longest-match-first ENCODING (inference never replays merges;
it scans the vocab for the longest matching prefix).

Scale shape (same contract as operators/bpe_train.py):

- corpus -> (unique word, freq) histogram: ONE corpus-level shuffle,
  Zipf-bounded result;
- training: driver-local loop over the once-collected histogram
  (:func:`wordpiece_train_local`) — Spark-job count constant in the
  merge count, the r11-verdict-blessed BPE pattern;
- encoding: the greedy loop runs once per UNIQUE pre-token (Arrow
  mapInPandas pass with the piece set in the closure), per-word id
  strings join back to the positional pre-token stream, and each
  document reassembles with one sort_array-over-structs aggregation —
  two exchanges total, independent of vocab size.

Determinism: merge selection ties break (a, b) ascending after the
score comparison (exact-integer operands -> bit-identical IEEE
division on any engine), so the vocab is a pure function of the
corpus; ids are ranks in the lexicographically sorted piece list.

No reference parity: whisper_pandas has no text surface (SURVEY §2.10
X4 extension).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whisper_pandas_spark.functions.text import tokenize
from whisper_pandas_spark.operators.bpe_train import _word_vocab

CONT = "##"
UNK_ID = -1
MAX_WORD_CHARS = 24  # BERT's max_input_chars_per_word guard (it uses 100)


def word_syms(word: str) -> list[str]:
    """Initial WordPiece units: first char plain, the rest ##-prefixed."""
    return [word[0]] + [CONT + c for c in word[1:]]


def wordpiece_train_local(
    vocab_rows: list[tuple[list[str], int]],
    num_merges: int,
    min_pair_freq: int = 2,
) -> list[str]:
    """Learn the piece vocabulary from a collected (syms, freq)
    histogram. Returns the FULL piece list: every initial unit plus one
    merged piece per executed merge (merge of (a, b) yields
    ``a + b[2:]`` — the right element of an in-word adjacent pair is
    always a continuation, so the product keeps a's prefix status).

    Selection per merge: among pairs with count >= ``min_pair_freq``,
    maximize ``count(ab) / (count(a) * count(b))`` (exact-integer
    operands, one IEEE division — replayable bit-for-bit in SQL), ties
    by (a, b) ascending. Statistics are recomputed per merge (clarity
    over the BPE module's incremental heap; the loop is driver-local
    over the Zipf-bounded histogram either way, and the scored
    objective invalidates every pair touching a or b on each step,
    which makes incremental bookkeeping far less effective than for
    raw-frequency BPE).
    """
    if num_merges < 0:
        raise ValueError(f"num_merges must be >= 0, got {num_merges}")
    words = [list(syms) for syms, _ in vocab_rows]
    freqs = [int(f) for _, f in vocab_rows]
    pieces: set[str] = {u for w in words for u in w}

    for _ in range(num_merges):
        pair_n: dict[tuple[str, str], int] = {}
        unit_n: dict[str, int] = {}
        for w, f in zip(words, freqs):
            for u in w:
                unit_n[u] = unit_n.get(u, 0) + f
            for p in zip(w, w[1:]):
                pair_n[p] = pair_n.get(p, 0) + f
        best = None
        for (a, b), n in pair_n.items():
            if n < min_pair_freq:
                continue
            score = n / (unit_n[a] * unit_n[b])
            key = (-score, a, b)
            if best is None or key < best[0]:
                best = (key, a, b)
        if best is None:
            break
        _, a, b = best
        if not b.startswith(CONT):  # structural invariant (see docstring)
            raise AssertionError(f"right pair element not a continuation: {b!r}")
        ab = a + b[len(CONT):]  # the product drops b's ## — it is one unit now
        words = [
            _merge_syms_wp(w, a, b, ab) if _contains_pair(w, a, b) else w
            for w in words
        ]
        pieces.add(ab)
    return sorted(pieces)


def _merge_syms_wp(syms: list[str], a: str, b: str, ab: str) -> list[str]:
    """Left-to-right non-overlapping merge (a, b) -> ab. Unlike BPE's
    _merge_syms the product is NOT a+b: b's ## continuation prefix is
    absorbed (``ab = a + b[2:]``)."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _contains_pair(w: list[str], a: str, b: str) -> bool:
    return any(x == a and y == b for x, y in zip(w, w[1:]))


def wordpiece_train(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    min_pair_freq: int = 2,
) -> list[str]:
    """Corpus -> piece vocabulary: one distributed histogram shuffle,
    one bounded collect, driver-local merge loop."""
    vocab = _word_vocab(df, text_col).select(
        F.expr(
            "concat(array(substr(word, 1, 1)),"
            " IF(length(word) >= 2,"
            "    transform(sequence(2, length(word)),"
            "              i -> concat('##', substr(word, i, 1))),"
            "    slice(array(''), 1, 0)))"
        ).alias("syms"),
        "freq",
    )
    rows = [(list(r["syms"]), int(r["freq"])) for r in vocab.collect()]
    return wordpiece_train_local(rows, num_merges, min_pair_freq)


def greedy_encode(
    word: str, piece_set: set[str], max_word_chars: int = MAX_WORD_CHARS
) -> list[str] | None:
    """BERT's WordpieceTokenizer loop: longest vocab piece matching the
    remaining prefix, ##-context after the first piece. Returns None
    for UNK (over-long words; a no-match cannot occur when encoding the
    training corpus, since every char position generates its unit)."""
    if len(word) > max_word_chars:
        return None
    toks: list[str] = []
    i = 0
    while i < len(word):
        for ln in range(len(word) - i, 0, -1):
            cand = word[i : i + ln]
            piece = cand if i == 0 else CONT + cand
            if piece in piece_set:
                toks.append(piece)
                i += ln
                break
        else:
            return None
    return toks


def wordpiece_encode_ids(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pieces: list[str],
    max_word_chars: int = MAX_WORD_CHARS,
) -> DataFrame:
    """Encode every document to its WordPiece id sequence:
    ``(doc_id, n_pretokens, n_tokens, n_unk, ids_csv)`` — ids are ranks
    in the sorted piece list, UNK words contribute one {UNK_ID} id.

    Same two-exchange shape as bpe_bytes_encode_ids: greedy loop once
    per UNIQUE pre-token (Arrow pass), positional join back,
    sort_array-over-structs reassembly; docs stay on their partitions.
    """
    import pandas as pd

    piece_set = set(pieces)
    ids = {p: i for i, p in enumerate(sorted(piece_set))}

    # posexplode_outer carrier rows: a pre-token-less document (NULL
    # text, or tokenize's single '' token for alnum-free text) keeps ONE
    # row with a NULL/'' word, so the zero-count backfill happens inside
    # the per-doc aggregate itself and the corpus-sized distinct-ids
    # left join (a third scan + sort-merge join) disappears from the
    # plan. No F.filter on the array — HOF lambdas are CodegenFallback
    # (interpreted per element); tokenize never produces interior
    # empties, so '' only appears as the lone element of an empty
    # tokenization and the real positions are unchanged.
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode_outer(tokenize(F.col(text_col))).alias("pos", "word"),
    )
    _real = F.col("word").isNotNull() & (F.col("word") != "")
    uniq = words.where(_real).select("word").distinct()

    def enc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_ids, out_nt, out_unk = [], [], []
            for w in pdf["word"]:
                toks = greedy_encode(w, piece_set, max_word_chars)
                if toks is None:
                    out_ids.append(str(UNK_ID))
                    out_nt.append(1)
                    out_unk.append(1)
                else:
                    out_ids.append(",".join(str(ids[t]) for t in toks))
                    out_nt.append(len(toks))
                    out_unk.append(0)
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "wid": out_ids,
                    "nt": out_nt,
                    "unk": out_unk,
                }
            )

    encoded = uniq.mapInPandas(enc, "word string, wid string, nt long, unk long")
    # left join: every real word matches (encoded covers each distinct
    # word); only the carrier rows come back NULL, and the when()-guarded
    # aggregates skip them, reproducing the old left-join zero backfill
    return (
        words.join(encoded, "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.when(_real, 1)).cast("bigint").alias("n_pretokens"),
            F.coalesce(F.sum("nt"), F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce(F.sum("unk"), F.lit(0)).cast("bigint").alias("n_unk"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(_real, F.struct("pos", "wid"))
                        )
                    ),
                    lambda s: s["wid"],
                ),
                ",",
            ).alias("ids_csv"),
        )
    )
