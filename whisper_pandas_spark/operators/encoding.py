"""Mojibake repair (ftfy-class encoding fix): undo UTF-8 bytes that
were mis-decoded as cp1252/latin-1 and re-encoded — the one standard
web-corpus cleaning stage ahead of the C4/HTML chain (VERDICT r13
missing #3). Double-encoded UTF-8 and cp1252-in-UTF-8 are endemic in
real crawls; the repair is the public round-trip: re-encode the
mangled text through the 8-bit codec it was wrongly decoded with,
then decode the recovered bytes as UTF-8.

Pinned-table doctrine: the ONLY non-trivial mapping is cp1252's
C1 range (0x80-0x9F), where cp1252 places printable glyphs
(Euro sign, curly quotes, dashes, dagger, ...) that latin-1 leaves as
control characters. That public table is pinned below as two aligned
literal strings driving a codegen ``translate`` — no charset library
in the loop, and the DuckDB oracle needs no charset machinery at all
(the registry entry plants the corruption in-query, so the oracle's
expected output is simply the original text).

The whole repair is ONE codegen expression (translate / rlike /
is_valid_utf8 / encode / decode / CASE) — scan-shaped, no Python, no
shuffle. Application is guarded three ways so legitimate text never
mangles:

1. after down-translating cp1252 specials, every char must be
   <= U+00FF (otherwise the text can't be an 8-bit mis-decode at all
   — and latin-1 encoding would silently '?'-replace);
2. a multi-byte UTF-8 lead byte (U+00C2-U+00F4 as latin-1) must be
   present (ASCII fast-path);
3. the recovered bytes must be VALID UTF-8 (``is_valid_utf8``; Spark
   4's strict ``decode`` raises on malformed input, so the guard also
   makes the expression total). Real accented text ("café", "pâte")
   fails #3 — a lone latin-1 é/â is never a valid UTF-8 sequence.

One pass undoes one mis-decode; :func:`fix_encoding` applies the
expression ``passes`` times (default 2, ftfy's bounded-loop shape) so
doubly-corrupted text also recovers. Each extra pass is a no-op on
already-clean text by guard #2/#3.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The public cp1252 0x80-0x9F table (undefined slots 81 8D 8F 90 9D
# stay as C1 controls). Two ALIGNED literals: translate(s, CP1252_C1,
# LATIN1_C1) maps glyph -> original byte value; the reverse argument
# order simulates the corruption.
CP1252_C1 = (
    "€‚ƒ„…†‡ˆ‰Š"
    "‹ŒŽ‘’“”•–—"
    "˜™š›œžŸ"
)
LATIN1_C1 = (
    "\x80\x82\x83\x84\x85\x86\x87\x88\x89\x8a"
    "\x8b\x8c\x8e\x91\x92\x93\x94\x95\x96\x97"
    "\x98\x99\x9a\x9b\x9c\x9e\x9f"
)

# chars <= U+00FF (guard #1) and a multi-byte UTF-8 lead (guard #2)
_ALL_8BIT = "^[\\x00-ÿ]*$"
_HAS_LEAD = "[Â-ô]"


def _fix_once(col: Column) -> Column:
    pre = F.translate(col, CP1252_C1, LATIN1_C1)
    bytes_ = F.encode(pre, "ISO-8859-1")
    apply_ = (
        pre.rlike(_ALL_8BIT)
        & pre.rlike(_HAS_LEAD)
        & F.call_function("is_valid_utf8", bytes_)
    )
    return F.when(apply_, F.decode(bytes_, "UTF-8")).otherwise(col)


def fix_encoding(col: Column, passes: int = 2) -> Column:
    """Repaired text: *passes* bounded rounds of the single-pass
    mojibake fix (2 undoes a double mis-decode; each round is a no-op
    on clean text)."""
    if passes < 1:
        raise ValueError("passes must be >= 1")
    out = col
    for _ in range(passes):
        out = _fix_once(out)
    return out


def corrupt_encoding(col: Column) -> Column:
    """Simulate one cp1252 mis-decode of *col*'s UTF-8 bytes (the
    fixture/corruption side: decode the bytes as latin-1, then lift
    defined C1 slots to their cp1252 glyphs). Exactly inverted by one
    :func:`_fix_once` pass; used by the registry entry and tests to
    plant mojibake deterministically in-query."""
    return F.translate(
        F.decode(F.encode(col, "UTF-8"), "ISO-8859-1"),
        LATIN1_C1,
        CP1252_C1,
    )
