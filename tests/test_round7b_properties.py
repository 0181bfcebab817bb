"""Property tests for the round-7 second/third-wave operators: each is
checked against an independent brute-force Python/numpy reference on
random inputs — the same strategy the as-of join (vs pd.merge_asof) and
BM25 (vs brute force) use. These cover the semantic space the single
DuckDB oracle fixture can't."""

from __future__ import annotations

import sys
from pathlib import Path

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# -- CUSUM changepoint vs brute force -----------------------------------------

series = st.lists(
    st.integers(min_value=-1000, max_value=1000), min_size=3, max_size=40
)

# 2024-01-01 00:00:00 UTC.  Timestamps are built by EPOCH ARITHMETIC
# (base + d*86400), never by formatting day-of-month strings: the r8
# suite broke on draws of >=32 points because f"2024-01-{d+1}" constructs
# the invalid date 2024-01-32.  The session timezone is pinned to UTC
# (session.py), so date_trunc('day') of a midnight-UTC epoch is exact and
# the changepoint assertion can stay on epoch values end to end.
_EPOCH_BASE = 1_704_067_200


def _check_changepoint(spark, ys):
    from whisper_pandas_spark.operators.changepoint import changepoint_max_cusum

    rows = [
        ("g", _EPOCH_BASE + d * 86400, y / 1000.0) for d, y in enumerate(ys)
    ]
    df = spark.createDataFrame(rows, "k string, epoch long, v double").select(
        "k", F.timestamp_seconds("epoch").alias("ts"), "v"
    )
    got = (
        changepoint_max_cusum(df, ["k"], "ts", "v", scale=1000)
        .select(
            "n_buckets",
            "s_n",
            "d_stat",
            F.unix_timestamp("cp_bucket").alias("cp_epoch"),
        )
        .collect()[0]
    )

    n = len(ys)
    s = 0
    s_n = sum(ys)
    best = None  # (d_abs, t)
    for t, y in enumerate(ys[:-1], start=1):
        s += y
        d = abs(n * s - t * s_n)
        if best is None or d > best[0]:
            best = (d, t)
    assert got.n_buckets == n
    assert got.s_n == s_n
    assert got.d_stat == best[0]
    assert got.cp_epoch == _EPOCH_BASE + (best[1] - 1) * 86400


@SLOW
@given(ys=series)
def test_changepoint_matches_bruteforce(spark, ys):
    _check_changepoint(spark, ys)


def test_changepoint_regression_over_31_points(spark):
    """Pinned regression for the r8 calendar bug: any draw of >=32 points
    used to construct '2024-01-32' and throw CAST_INVALID_INPUT before the
    operator ran.  40 points spans two month boundaries under the old
    string scheme."""
    ys = [(-1) ** d * (d * 37 % 1000) for d in range(40)]
    _check_changepoint(spark, ys)


# -- robust MAD vs brute force --------------------------------------------------

values = st.lists(
    st.integers(min_value=-500, max_value=500), min_size=1, max_size=60
)


@SLOW
@given(xs=values)
def test_robust_mad_matches_bruteforce(spark, xs):
    from whisper_pandas_spark.operators.robust import robust_mad_stats

    df = spark.createDataFrame(
        [("g", x / 1000.0) for x in xs], "k string, v double"
    )
    got = robust_mad_stats(df, ["k"], "v", scale=1000, k=3).collect()[0]

    def pick_median(vals):
        # smallest value whose cumulative count reaches ceil(n/2)
        sv = sorted(vals)
        import math

        return sv[math.ceil(len(sv) / 2) - 1]

    med = pick_median(xs)
    devs = [abs(x - med) for x in xs]
    mad = pick_median(devs)
    n_out = sum(1 for d in devs if d > 3 * mad)
    assert (got.n, got.med_micro, got.mad_micro, got.n_outliers) == (
        len(xs),
        med,
        mad,
        n_out,
    )


# -- equi-depth binning vs brute force -------------------------------------------


@SLOW
@given(
    xs=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=60),
    b=st.integers(min_value=2, max_value=6),
)
def test_equidepth_bins_match_bruteforce(spark, xs, b):
    import math

    from whisper_pandas_spark.operators.binning import equidepth_bins

    df = spark.createDataFrame([("g", x) for x in xs], "k string, v long")
    got = {
        (r.v, r.bucket)
        for r in equidepth_bins(df, ["k"], "v", b).select("v", "bucket").collect()
    }

    sv = sorted(xs)
    n = len(sv)
    edges = []
    for j in range(1, b):
        rank = (j * n + b - 1) // b  # integer ceil(j*n/b)
        edges.append(sv[rank - 1])
    want = {(x, 1 + sum(1 for e in edges if e < x)) for x in xs}
    assert got == want
    # labels in range and monotone with value
    labs = sorted(want)
    for (v1, b1), (v2, b2) in zip(labs, labs[1:]):
        assert b1 <= b2 and 1 <= b1 <= b


# -- item-item CF vs brute force --------------------------------------------------

baskets = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),  # basket
        st.integers(min_value=0, max_value=6),  # item
    ),
    min_size=1,
    max_size=60,
)


@SLOW
@given(pairs=baskets)
def test_item_cf_matches_bruteforce(spark, pairs):
    from collections import defaultdict

    from whisper_pandas_spark.operators.itemcf import item_similarity_topk

    df = spark.createDataFrame(list(set(pairs)), "b long, it long")
    got = {
        (r.item, r.rnk): (r.neighbor, r.c_ij, r.sim)
        for r in item_similarity_topk(df, "b", "it", k=3, min_pairs=1).collect()
    }

    inc = set(pairs)
    by_basket = defaultdict(set)
    cnt = defaultdict(int)
    for b, i in inc:
        by_basket[b].add(i)
        cnt[i] += 1
    co = defaultdict(int)
    for b, items in by_basket.items():
        for i in items:
            for j in items:
                if i != j:
                    co[(i, j)] += 1
    want = {}
    by_i = defaultdict(list)
    for (i, j), c in co.items():
        sim = c / (cnt[i] * cnt[j]) ** 0.5
        by_i[i].append((-sim, -c, j))
    for i, lst in by_i.items():
        for rnk, (nsim, nc, j) in enumerate(sorted(lst)[:3], start=1):
            want[(i, rnk)] = (j, -nc, -nsim)
    assert got == want


# -- transition matrix vs brute force -----------------------------------------------

events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # user
        st.integers(min_value=0, max_value=50),  # time (unique-ified below)
        st.sampled_from(["a", "b", "c"]),        # state
    ),
    min_size=2,
    max_size=50,
)


@SLOW
@given(evs=events)
def test_transition_matrix_matches_bruteforce(spark, evs):
    from collections import defaultdict

    from whisper_pandas_spark.operators.paths import transition_matrix

    rows = [(u, i, s) for i, (u, _, s) in enumerate(evs)]  # eid = total order
    df = spark.createDataFrame(rows, "u long, eid long, s string").select(
        "u", F.col("eid").cast("timestamp").alias("ts"), "eid", "s"
    )
    got = {
        (r.src, r.dst): (r.n, r.n_src, r.p)
        for r in transition_matrix(df, "u", "ts", "s", tiebreak_col="eid").collect()
    }

    per_user = defaultdict(list)
    for u, eid, s in rows:
        per_user[u].append((eid, s))
    steps = defaultdict(int)
    for u, lst in per_user.items():
        lst.sort()
        for (_, s1), (_, s2) in zip(lst, lst[1:]):
            steps[(s1, s2)] += 1
    totals = defaultdict(int)
    for (s1, _), c in steps.items():
        totals[s1] += c
    want = {
        k: (c, totals[k[0]], c / totals[k[0]]) for k, c in steps.items()
    }
    assert got == want


# -- label propagation vs brute force ------------------------------------------------

graphs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=25,
)


@SLOW
@given(edges=graphs, iters=st.integers(min_value=0, max_value=3))
def test_label_propagation_matches_bruteforce(spark, edges, iters):
    from collections import Counter, defaultdict

    from whisper_pandas_spark.operators.graph import label_propagation

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.label for r in label_propagation(df, iters=iters).collect()
    }

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    nodes = set(adj)
    if not nodes:
        assert got == {}
        return
    labels = {n: n for n in nodes}
    for _ in range(iters):
        new = {}
        for n in nodes:
            if not adj[n]:
                new[n] = labels[n]
                continue
            cnt = Counter(labels[m] for m in adj[n])
            best = max(cnt.values())
            new[n] = min(l for l, c in cnt.items() if c == best)
        labels = new
    assert got == labels


# -- negative sampling vs brute force ------------------------------------------------

inters = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=20,
)


@SLOW
@given(pairs=inters, k=st.integers(min_value=1, max_value=4))
def test_negative_samples_match_bruteforce(spark, pairs, k):
    import hashlib
    from collections import defaultdict

    from whisper_pandas_spark.operators.negatives import negative_samples

    n_items = 10
    df = spark.createDataFrame(list(set(pairs)), "u long, it long")
    got = {
        (r.user, r.rnk): r.item
        for r in negative_samples(
            df, "u", "it", n_items, k=k, oversample=4, seed=0
        ).collect()
    }

    pos = defaultdict(set)
    for u, it in pairs:
        pos[u].add(it)
    want = {}
    for u in pos:
        seen, rnk = set(), 0
        for i in range(1, k * 4 + 1):
            h = int(hashlib.md5(f"0:{u}:{i}".encode()).hexdigest()[:8], 16)
            item = h % n_items
            if item in seen or item in pos[u]:
                continue
            seen.add(item)
            rnk += 1
            want[(u, rnk)] = item
            if rnk == k:
                break
    assert got == want


# -- Cavnar–Trenkle language ID vs brute force ---------------------------------

ct_corpus = st.lists(
    st.tuples(
        st.sampled_from(["aa", "bb", "cc"]),           # label
        st.text(alphabet="abc xyz", min_size=0, max_size=24),
    ),
    min_size=1,
    max_size=10,
)


@SLOW
@given(docs=ct_corpus)
def test_langid_matches_bruteforce(spark, docs):
    """Trained profiles + out-of-place argmin vs an independent Python
    reference, including degenerate draws: empty texts (no n-grams ->
    document unclassifiable, dropped), languages whose every text is too
    short (no profile -> never predicted), rank ties (count DESC, gram
    ASC on both sides)."""
    from collections import Counter, defaultdict

    from whisper_pandas_spark.operators.langid import (
        classify_language,
        train_and_classify,
        train_language_profiles,
    )

    ns, k = (2, 3), 5  # tiny profile so ties and penalties actually bind

    rows = [(i, lang, text) for i, (lang, text) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    prof = train_language_profiles(df, "lang", "text", ns=ns, k=k)
    got = {
        r.doc_id: (r.pred_lang, r.lang_dist)
        for r in classify_language(
            df, "doc_id", "text", prof, ns=ns, k=k
        ).collect()
    }
    # the one-explode fused path must be bit-identical to train+classify
    fused = {
        r.doc_id: (r.pred_lang, r.lang_dist)
        for r in train_and_classify(
            df, "doc_id", "lang", "text", ns=ns, k=k
        ).collect()
    }
    assert fused == got

    def grams(t: str) -> list[str]:
        t = t.lower()
        return [
            t[i : i + n] for n in ns for i in range(len(t) - n + 1)
        ]

    def rank_profile(counts: Counter) -> dict[str, int]:
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return {g: r + 1 for r, (g, _) in enumerate(ranked)}

    lang_counts: dict[str, Counter] = defaultdict(Counter)
    for _i, lang, text in rows:
        lang_counts[lang].update(grams(text))
    profiles = {
        lang: rank_profile(c) for lang, c in lang_counts.items() if c
    }

    want = {}
    for i, _lang, text in rows:
        dprof = rank_profile(Counter(grams(text)))
        if not dprof or not profiles:
            continue  # unclassifiable: no n-grams (or no trained profile)
        best = None
        for cand in sorted(profiles):
            p = profiles[cand]
            d = sum(
                abs(dr - p[g]) if g in p else k for g, dr in dprof.items()
            )
            if best is None or d < best[0]:
                best = (d, cand)
        want[i] = (best[1], best[0])
    assert got == want


# -- PassJoin candidate generation vs all-pairs --------------------------------

fuzzy_corpus = st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=30),
    min_size=2,
    max_size=12,
)


@SLOW
@given(
    texts=fuzzy_corpus,
    k=st.integers(min_value=1, max_value=5),
)
def test_passjoin_lossless_vs_allpairs(spark, texts, k):
    """The pigeonhole + shift-aware substring selection must be LOSSLESS
    for any inputs and any threshold: fuzzy_pairs_passjoin returns
    EXACTLY the all-pairs fuzzy_pairs result — including empty-norm
    docs, strings shorter than k+1 (the short-string branch), and
    length gaps right at the +-k boundary.  Guards the round-9
    |sh| + |delta - sh| <= k pruning in particular."""
    from whisper_pandas_spark.operators.dedup import (
        fuzzy_pairs,
        fuzzy_pairs_passjoin,
    )

    rows = [(i, "blk", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    def snap(out):
        return sorted(
            (r["doc_i"], r["doc_j"], r["edit_dist"]) for r in out.collect()
        )

    blocked = snap(fuzzy_pairs(df, "doc_id", "text", "lang", max_edit=k))
    passj = snap(fuzzy_pairs_passjoin(df, "doc_id", "text", "lang", max_edit=k))
    assert passj == blocked


# -- percentileOfSeries vs brute-force NIST pick --------------------------------

pos_frames = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),    # series index
        st.integers(min_value=0, max_value=4),    # slot index
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
    ),
    min_size=1,
    max_size=30,
)


@SLOW
@given(points=pos_frames, q=st.integers(min_value=1, max_value=100))
def test_percentile_of_series_matches_bruteforce(spark, points, q):
    """graphite percentileOfSeries: per timestamp, the NIST rank pick
    (ceil(q/100*(n+1)) into the sorted non-null values, clamped) across
    series — checked against a direct Python replay, including all-null
    slots (no output row) and duplicate (series, slot) draws."""
    import math
    from collections import defaultdict

    from whisper_pandas_spark.functions import graphite as g

    rows = [
        (f"s{si}", slot * 10, None if v is None else v / 2.0)
        for si, slot, v in points
    ]
    df = spark.createDataFrame(
        rows, "metric string, epoch long, value double"
    ).select("metric", F.timestamp_seconds("epoch").alias("timestamp"), "value")

    got = {
        int(r["timestamp"].timestamp()): r["value"]
        for r in g.percentile_of_series(df, q).collect()
    }

    by_ts = defaultdict(list)
    for m, ep, v in rows:
        if v is not None:
            by_ts[ep].append(v)
    want = {}
    for ep, vals in by_ts.items():
        sv = sorted(vals)
        rank = min(max(math.ceil(q / 100.0 * (len(sv) + 1)), 1), len(sv))
        want[ep] = sv[rank - 1]
    assert got == want
