"""T5-style span corruption (Raffel et al. 2020 §3.1.4): mask
contiguous token spans, replace each with a sentinel, emit the
(corrupted input, target) pair — the seq2seq pre-training objective's
data-prep step.

Extension beyond the reference (no text surface). Completes the
training-data story the packing/tokenizer operators start: documents
-> tokens -> (inputs, targets) pairs ready for an encoder-decoder
trainer.

Determinism (the repo's no-RNG-state rule): T5 samples span starts
iid; a distributed, engine-replayable variant must not depend on RNG
state or row order, so spans here are BLOCK-randomized — positions
partition into fixed blocks of ``block`` tokens, and each block masks
one span of ``span_len`` tokens at offset ``md5(doc:block) %
(block - span_len + 1)``. This yields the same corruption RATE
(span_len / block, default 3/20 = 15%, T5's rate) with per-doc
placement driven by the md5 family — a pure function of (doc id, block
index) that any engine reproduces, spans never overlap by
construction, and every doc/epoch re-derives identically (resume-safe).

Output convention (T5): the input keeps unmasked tokens with one
``<X_k>`` sentinel per masked span (k = block index — unique within
the doc); the target is the concatenation of ``<X_k>`` + the masked
tokens, ending with ``<EOS>``.

Scale shape: ONE zero-shuffle projection — block arithmetic, md5
offsets, and both output sequences are array expressions over the
token array; a document never leaves its partition. (The higher-order
transforms are CodegenFallback-interpreted — same documented trade as
the C4 rules: constant per-token work beats a corpus-wide exchange.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whisper_pandas_spark.functions.text import tokenize

BLOCK = 20
SPAN_LEN = 3
EOS_TOKEN = "<eos>"


def _offset_sql(doc_sql: str, block_sql: str, block: int, span_len: int) -> str:
    """md5-driven span offset within a block: hash % (block - span_len + 1)."""
    space = block - span_len + 1
    return (
        f"(cast(conv(substring(md5(concat('span:', cast({doc_sql} as string),"
        f" ':', cast({block_sql} as string))), 1, 15), 16, 10) as bigint)"
        f" % {space})"
    )


def span_corrupt(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block: int = BLOCK,
    span_len: int = SPAN_LEN,
) -> DataFrame:
    """(id, n_tokens, n_masked, n_spans, input_text, target_text).

    Only FULL blocks mask a span (a trailing partial block stays
    unmasked — the deterministic analogue of T5 dropping a partial
    span), so ``n_masked = n_spans * span_len`` exactly.
    """
    if not (0 < span_len < block):
        raise ValueError(f"need 0 < span_len < block, got {span_len}/{block}")
    toks = tokenize(F.col(text_col))
    off = _offset_sql(id_col, "(i div %d)" % block, block, span_len)
    # classify each position: mask iff inside its block's span AND the
    # block is full; sentinel position = the span's first token
    masked = (
        f"transform(t, (x, i) -> CASE"
        f" WHEN (i div {block}) * {block} + {block} <= size(t)"
        f"  AND i % {block} >= {off} AND i % {block} < {off} + {span_len}"
        f" THEN (i div {block}) + 1 ELSE 0 END)"
    )
    out = df.select(
        F.col(id_col),
        toks.alias("t"),
    ).select(
        F.col(id_col),
        F.expr("filter(t, x -> x != '')").alias("t"),
    ).select(
        F.col(id_col),
        F.size("t").alias("n_tokens"),
        F.col("t"),
        F.expr(masked).alias("m"),
    )
    # the sentinel emits at the span's FIRST masked position: i%block == off
    input_text = F.expr(
        f"array_join(filter(transform(t, (x, i) ->"
        f" CASE WHEN m[i] = 0 THEN x"
        f"      WHEN i % {block} = {off} THEN concat('<X_', m[i], '>')"
        f"      ELSE '' END), x -> x != ''), ' ')"
    )
    target_text = F.expr(
        f"concat(array_join(filter(transform(t, (x, i) ->"
        f" CASE WHEN m[i] = 0 THEN ''"
        f"      WHEN i % {block} = {off} THEN"
        f"        concat('<X_', m[i], '> ', x)"
        f"      ELSE x END), x -> x != ''), ' '),"
        f" IF(size(filter(m, v -> v != 0)) > 0, ' ', ''), '{EOS_TOKEN}')"
    )
    return out.select(
        F.col(id_col),
        "n_tokens",
        F.expr("size(filter(m, v -> v != 0))").alias("n_masked"),
        F.expr("size(array_distinct(filter(m, v -> v != 0)))").alias("n_spans"),
        input_text.alias("input_text"),
        target_text.alias("target_text"),
    )
