"""URL normalization + registered-domain keying (VERDICT r11 task #6).

CCNet-style crawl pipelines key per-domain quotas, mixtures, and dedup
scopes on the REGISTERED domain (the public-suffix-plus-one label:
``shop.example.co.uk`` -> ``example.co.uk``), not the raw host. This
module provides that key with pure string built-ins — every expression
is JVM-side codegen (regexp_extract / split / element_at / when), no
Python in the hot path, so at 100 TB the normalization is a free rider
on whatever scan produces the URL column, and the domain key feeds
straight into the existing per-key operators
(operators/sampling.py:mixture_sample / per_group_quota) as a plain
grouping column.

Public-suffix handling is an explicit, documented HEURISTIC: a
shortlist of the common two-label public suffixes (the full Mozilla
Public Suffix List is ~9k rules and belongs in a broadcast lookup
table; the shortlist keeps the operator dependency-free and the rule
observable). Unknown two-label suffixes fall back to last-two-labels —
the same default the PSL itself specifies for unlisted TLDs.

Normalization rules (documented contract, asserted by golden tests):
- scheme: the ``<alpha><alnum+.->*://`` prefix, lowercased; absent ->
  ``http`` (scheme-relative and bare-host URLs).
- host: the authority with userinfo (through the last ``@``) and port
  (after ``:``) stripped, lowercased, trailing dots removed. IPv6
  literals are out of scope (documented; they parse as-is with their
  brackets and never match the suffix rules).
- path: authority remainder up to ``?``/``#``; empty -> ``/``.
- registered_domain: the host itself for IPv4 literals and single-label
  hosts; last THREE labels when the last two are a listed public
  suffix; last TWO labels otherwise.

No reference-repo parity: whisper_pandas has no URL surface; this backs
SURVEY.md §2.11 (training-data pipeline extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Common two-label public suffixes (heuristic shortlist — see module
# docstring). github.io is a PSL "private" suffix, included to show the
# mechanism covers private registries too.
SUFFIX2 = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "com.br", "net.br", "org.br", "gov.br",
    "com.mx", "com.ar", "com.co", "com.pe", "com.ve",
    "co.za", "org.za", "web.za",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.kr", "or.kr", "ne.kr",
    "com.sg", "com.my", "com.ph", "com.vn", "co.th", "co.id",
    "com.tr", "com.sa", "com.eg", "co.il",
    "co.nz", "net.nz", "org.nz",
    "com.hk", "com.tw", "org.tw",
    "github.io", "gitlab.io", "blogspot.com",
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_IPV4_RE = r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$"


def registered_domain(host: Column) -> Column:
    """Registered domain from a normalized host column (heuristic
    shortlist — module docstring)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last1 = F.element_at(labels, -1)
    last2 = F.concat_ws(".", F.element_at(labels, -2), last1)
    last3 = F.concat_ws(".", F.element_at(labels, -3), last2)
    is_ip = host.rlike(_IPV4_RE)
    return (
        F.when(is_ip | (n <= 1), host)
        .when((n >= 3) & last2.isin(*SUFFIX2), last3)
        .otherwise(last2)
    )


def url_key_df(df: DataFrame, url_col: str) -> DataFrame:
    """Append (scheme, host, path, reg_domain) to *df* — the keying
    projection. One codegen-only select; no shuffle, no Python."""
    scheme_raw = F.regexp_extract(F.col(url_col), _SCHEME_RE, 1)
    with_rest = df.withColumn(
        "_rest",
        F.when(scheme_raw == "", F.col(url_col)).otherwise(
            F.substring(
                F.col(url_col), F.length(scheme_raw) + F.lit(4), F.lit(1 << 30)
            )
        ),
    )
    authority = F.regexp_extract(F.col("_rest"), r"^([^/?#]*)", 1)
    out = (
        with_rest.withColumn(
            "scheme",
            F.when(scheme_raw == "", F.lit("http")).otherwise(
                F.lower(scheme_raw)
            ),
        )
        .withColumn("_auth", authority)
        .withColumn(
            "host",
            F.regexp_replace(
                F.lower(
                    F.element_at(
                        F.split(
                            F.element_at(F.split(F.col("_auth"), "@"), -1),
                            ":",
                        ),
                        1,
                    )
                ),
                r"\.+$",
                "",
            ),
        )
        .withColumn(
            "_pathq",
            F.substring(
                F.col("_rest"),
                F.length(F.col("_auth")) + F.lit(1),
                F.lit(1 << 30),
            ),
        )
        .withColumn(
            "path",
            F.when(
                F.regexp_extract(F.col("_pathq"), r"^([^?#]*)", 1) == "",
                F.lit("/"),
            ).otherwise(F.regexp_extract(F.col("_pathq"), r"^([^?#]*)", 1)),
        )
        .withColumn("reg_domain", registered_domain(F.col("host")))
    )
    return out.drop("_rest", "_auth", "_pathq")
