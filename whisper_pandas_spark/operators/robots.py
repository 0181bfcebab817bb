"""robots.txt parsing + URL evaluation (RFC 9309, the Robots
Exclusion Protocol) — the crawl-politeness surface the crawl stack
(WARC/WET/WAT/CDX/ZIPNUM) did not yet cover. A selective re-crawl
pipeline fetches robots.txt per registered domain FIRST and evaluates
every candidate URL against it before touching payload shards.

Scope (documented contract, pytest-pinned):

- **Group selection**: rules belong to the nearest preceding
  ``User-agent:`` line; evaluation uses the ``*`` group (agent-name
  matching is a caller parameter in a full crawler — the group
  TRACKING is the load-bearing part, and the fixture plants a
  specific-agent group whose rules must NOT leak into ``*``).
- **Line syntax**: ``Allow:`` / ``Disallow:`` case-insensitive,
  ``#`` comments stripped, blank/unknown lines ignored, values
  trimmed. An EMPTY ``Disallow:`` value means "no restriction"
  (RFC 9309 §2.2.2) and produces no rule.
- **Matching**: literal path-prefix match; the LONGEST matching rule
  wins; on a length tie Allow wins (RFC 9309 §2.2.2); no matching
  rule means allowed. The ``*``/``$`` wildcard extension is out of
  scope and documented (values containing them would need the
  greedy-match automaton; the fixture plants none).

Everything is JVM codegen: split/trim/CASE for the parse,
one domain equi-join + startswith post-filter for the evaluation
(never a cartesian — rules-per-domain is a small constant, the
robots file size), one per-URL window for the longest-match pick.
At 100 TB the rules table is domains x rules — millions of rows at
web scale, still the SMALL side; broadcast it and the URL corpus
never shuffles at all.

No reference-repo parity: whisper_pandas has no crawl surface; backs
SURVEY.md §2.11 next to the CommonCrawl rows Y156-Y166.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(robots: DataFrame, domain_col: str, text_col: str) -> DataFrame:
    """Parse robots.txt bodies into ``(domain, ua, prefix, is_allow)``
    rule rows. One posexplode over split lines; group membership via
    a running last-non-null window over the User-agent lines."""
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "raw"),
    ).select(
        "domain",
        "pos",
        # strip comments, then whitespace (RFC 9309 §2.1)
        F.trim(F.element_at(F.split(F.col("raw"), "#"), 1)).alias("line"),
    )
    ua_val = F.when(
        F.lower(F.col("line")).startswith("user-agent:"),
        F.trim(F.expr("substr(line, 12)")),
    )
    w = (
        Window.partitionBy("domain")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = lines.select(
        "domain",
        "pos",
        "line",
        F.last(ua_val, ignorenulls=True).over(w).alias("ua"),
    )
    is_allow = F.lower(F.col("line")).startswith("allow:")
    is_dis = F.lower(F.col("line")).startswith("disallow:")
    return (
        tagged.filter((is_allow | is_dis) & F.col("ua").isNotNull())
        .select(
            "domain",
            "ua",
            F.when(is_allow, F.trim(F.expr("substr(line, 7)")))
            .otherwise(F.trim(F.expr("substr(line, 10)")))
            .alias("prefix"),
            is_allow.cast("int").alias("is_allow"),
        )
        # empty value = no restriction (RFC 9309): no rule row
        .filter(F.col("prefix") != "")
    )


def evaluate_urls(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str,
    domain_col: str,
    path_col: str,
    user_agent: str = "*",
) -> DataFrame:
    """Verdict per URL against the *user_agent* rule group:
    ``(id, domain, path, allowed, rule)`` — longest matching prefix
    wins, Allow wins length ties, no match means allowed; ``rule`` is
    the winning ``A:``/``D:``-tagged prefix (NULL when none)."""
    r = (
        rules.filter(F.col("ua") == user_agent)
        .select(
            F.col("domain").alias("r_domain"),
            F.col("prefix"),
            F.col("is_allow"),
        )
    )
    j = urls.select(
        F.col(id_col).alias("id"),
        F.col(domain_col).alias("domain"),
        F.col(path_col).alias("path"),
    ).join(
        F.broadcast(r),
        (F.col("domain") == F.col("r_domain"))
        & F.col("path").startswith(F.col("prefix")),
        "left",
    )
    w = Window.partitionBy("id").orderBy(
        F.length("prefix").desc(),
        F.col("is_allow").desc(),
        F.col("prefix"),
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "id",
            "domain",
            "path",
            F.when(F.col("prefix").isNull(), F.lit(1))
            .otherwise(F.col("is_allow"))
            .cast("int")
            .alias("allowed"),
            F.when(
                F.col("prefix").isNotNull(),
                F.concat(
                    F.when(F.col("is_allow") == 1, F.lit("A:")).otherwise(
                        F.lit("D:")
                    ),
                    F.col("prefix"),
                ),
            ).alias("rule"),
        )
    )


def parse_crawl_delay(
    robots: DataFrame, domain_col: str, text_col: str, default_s: int
) -> DataFrame:
    """Per-domain ``Crawl-delay`` (seconds) for the ``*`` group —
    the de-facto extension directive Heritrix/Nutch honor. Returns
    ``(domain, delay_s)`` with *default_s* where absent/invalid;
    multiple declarations take the MAX (the conservative read)."""
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "raw"),
    ).select(
        "domain",
        "pos",
        F.trim(F.element_at(F.split(F.col("raw"), "#"), 1)).alias("line"),
    )
    ua_val = F.when(
        F.lower(F.col("line")).startswith("user-agent:"),
        F.trim(F.expr("substr(line, 12)")),
    )
    w = (
        Window.partitionBy("domain")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = lines.select(
        "domain",
        "line",
        F.last(ua_val, ignorenulls=True).over(w).alias("ua"),
    )
    declared = (
        tagged.filter(
            F.lower(F.col("line")).startswith("crawl-delay:")
            & (F.col("ua") == "*")
        )
        .select(
            "domain",
            F.expr("try_cast(trim(substr(line, 13)) AS BIGINT)").alias(
                "d"
            ),
        )
        .filter(F.col("d").isNotNull() & (F.col("d") >= 0))
        .groupBy("domain")
        .agg(F.max("d").alias("delay_s"))
    )
    doms = robots.select(F.col(domain_col).alias("domain")).distinct()
    return doms.join(declared, "domain", "left").select(
        "domain",
        F.coalesce(F.col("delay_s"), F.lit(default_s))
        .cast("bigint")
        .alias("delay_s"),
    )


def politeness_schedule(
    allowed_urls: DataFrame,
    delays: DataFrame,
    id_col: str,
    domain_col: str,
) -> DataFrame:
    """Fetch plan per allowed URL: ``(id, domain, slot, fetch_at_s,
    delay_s)`` — one fetch per delay window per domain, slots in a
    deterministic (id) order, ``fetch_at_s = slot * delay_s`` seconds
    after the domain's crawl start. One window per domain; the
    per-domain makespan is (n-1)*delay by construction."""
    w = Window.partitionBy(domain_col).orderBy(id_col)
    return (
        allowed_urls.join(F.broadcast(delays), domain_col)
        .select(
            F.col(id_col).alias("id"),
            F.col(domain_col).alias("domain"),
            (F.row_number().over(w) - 1).cast("bigint").alias("slot"),
            "delay_s",
        )
        .select(
            "id",
            "domain",
            "slot",
            (F.col("slot") * F.col("delay_s")).alias("fetch_at_s"),
            "delay_s",
        )
    )
