"""PII redaction over text columns (LLM-pipeline; extension beyond the
reference — whisper_pandas.py has no text surface).

Training corpora are scrubbed of personal identifiers before anything
else touches them, and at 100 TB the scrub must be a SCAN-SHAPED pass:
pure codegen regex expressions, zero shuffles, zero Python. This module
redacts the three canonical machine-matchable identifier classes —
emails, IPv4 addresses, phone numbers — and counts each, so the
downstream pipeline can gate on PII density as a quality signal.

Cross-engine contract (same discipline as operators/textstats.py): every
regex stays inside the Java ∩ RE2 common subset — no backreferences, no
lookaround — so the DuckDB oracle applies the literal same patterns and
the results are byte-identical. Patterns are applied in a FIXED order
(email → ipv4 → phone) on both engines; counts are taken on the
original text before any replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Java ∩ RE2 portable patterns (no lookaround, no backreferences).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+\d{1,3}[- ]\d{3}[- ]\d{4}"

REDACTIONS: list[tuple[str, str, str]] = [
    ("n_emails", EMAIL_RE, "<EMAIL>"),
    ("n_ipv4", IPV4_RE, "<IP>"),
    ("n_phones", PHONE_RE, "<PHONE>"),
]


def pii_redact(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4 / phone numbers and count each class.

    Output: (doc_id, clean_text, n_emails, n_ipv4, n_phones). Counts are
    over the ORIGINAL text; replacements apply sequentially in the fixed
    REDACTIONS order (so an email's digits can never be double-counted
    as a phone fragment after substitution — both engines substitute in
    the same order and see the same intermediate strings).

    Scale: one narrow projection — regexp_count/regexp_replace are
    whole-stage-codegen JVM expressions; partitioning passes through
    untouched, nothing shuffles, nothing visits Python.
    """
    text = F.col(text_col)
    cols = [F.col(id_col).alias("doc_id")]
    clean = text
    for cnt_name, pat, token in REDACTIONS:
        cols.append(F.regexp_count(text, F.lit(pat)).cast("bigint").alias(cnt_name))
        clean = F.regexp_replace(clean, pat, token)
    return df.select(*cols[:1], clean.alias("clean_text"), *cols[1:])
