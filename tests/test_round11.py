"""Round-11 operator tests: Gopher/Dolma repetition profile, byte-level
BPE."""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F


# -- python reference ----------------------------------------------------------


def _ref_profile(text: str) -> dict:
    """Brute-force reference of operators/repetition.py:repetition_profile
    (same tokenizer, same counting conventions, same thresholds)."""
    from whisper_pandas_spark.operators.repetition import (
        BULLET_LINE_MAX,
        ELLIPSIS_LINE_MAX,
        SYMBOL_WORD_MAX,
        TOP_SHARE_MAX,
    )

    cleaned = re.sub("[^a-z0-9]+", " ", text.lower()).strip()
    toks = cleaned.split(" ")
    n_words = len(toks)
    out = {"n_words": n_words, "n_lines": text.count("\n") + 1}
    shares = {}
    for n in (2, 3, 4):
        grams = [
            " ".join(toks[i : i + n]) for i in range(max(n_words - n + 1, 0))
        ]
        total = len(grams)
        if total:
            from collections import Counter

            c = Counter(grams)
            shares[f"dup{n}_share"] = round(
                (total - len(c)) / total, 6
            )
            shares[f"top{n}_share"] = round(max(c.values()) / total, 6)
        else:
            shares[f"dup{n}_share"] = None
            shares[f"top{n}_share"] = None
    symbol = (
        text.count("#")
        + len(re.findall(r"\.\.\.", text))
        + text.count("…")
    )
    n_lines = out["n_lines"]
    bullets = len(re.findall("\n[ \t]*[-*•]", "\n" + text))
    ell = len(re.findall("(?:\\.\\.\\.|…)[ \t\r]*\n", text + "\n"))
    shares["symbol_word_ratio"] = (
        round(symbol / n_words, 6) if n_words else None
    )
    shares["bullet_line_frac"] = round(bullets / n_lines, 6)
    shares["ellipsis_line_frac"] = round(ell / n_lines, 6)
    out.update(shares)
    gate = (
        (shares["top2_share"] or 0.0) <= TOP_SHARE_MAX[2]
        and (shares["top3_share"] or 0.0) <= TOP_SHARE_MAX[3]
        and (shares["top4_share"] or 0.0) <= TOP_SHARE_MAX[4]
        and (shares["symbol_word_ratio"] or 0.0) <= SYMBOL_WORD_MAX
        and (shares["bullet_line_frac"] or 0.0) <= BULLET_LINE_MAX
        and (shares["ellipsis_line_frac"] or 0.0) <= ELLIPSIS_LINE_MAX
    )
    out["pass_repetition"] = gate
    return out


def _run_profile(spark, texts):
    from whisper_pandas_spark.operators.repetition import repetition_profile

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r.doc_id: r.asDict()
        for r in repetition_profile(df, "doc_id", "text").collect()
    }


def _assert_matches(got: dict, want: dict, doc_id, text):
    float_keys = [
        k
        for k in want
        if k.endswith("_share") or k.endswith("_ratio") or k.endswith("_frac")
    ]
    for k, v in want.items():
        g = got[k]
        if k in float_keys:
            if v is None:
                assert g is None, (doc_id, k, g, repr(text))
            else:
                assert g is not None and abs(g - v) <= 1e-6, (
                    doc_id,
                    k,
                    g,
                    v,
                    repr(text),
                )
        else:
            assert g == v, (doc_id, k, g, v, repr(text))


def test_repetition_profile_crafted_edges(spark):
    texts = [
        # heavy bigram repetition: "ha ha ha..." -> top2 share near 1
        "ha " * 30,
        # bullet list with mixed markers and indentation
        "- alpha beta\n  * gamma delta\n• epsilon zeta\nplain line",
        # ellipsis-ending lines, ASCII and Unicode, CRLF and trailing spaces
        "first line...\nsecond… \nthird... \r\nclean end",
        # symbols: hashes and ellipses inline
        "head # tag ## more... mid… tail",
        # no duplicate n-grams at all
        "one two three four five six seven",
        # single word (no n-grams -> NULL shares, passes gate)
        "solo",
        # empty-ish punctuation-only text
        "!!! ???",
        # dup 3-grams without dup 4-grams
        "a b c x a b c y a b c",
        # text ending in ellipsis without trailing newline
        "trailing dots...",
    ]
    got = _run_profile(spark, texts)
    assert set(got) == set(range(len(texts)))
    for i, t in enumerate(texts):
        _assert_matches(got[i], _ref_profile(t), i, t)


def test_repetition_profile_random_property(spark):
    rng = random.Random(1109)
    vocab = ["aa", "bb", "cc", "dd", "spark", "row", "#", "...", "…"]
    seps = [" ", " ", " ", "\n", "\n- ", "...\n", "\t"]
    texts = []
    for _ in range(40):
        n = rng.randrange(1, 60)
        parts = []
        for _ in range(n):
            parts.append(rng.choice(vocab))
            parts.append(rng.choice(seps))
        texts.append("".join(parts))
    got = _run_profile(spark, texts)
    for i, t in enumerate(texts):
        _assert_matches(got[i], _ref_profile(t), i, t)


def test_repetition_gate_thresholds(spark):
    # a document that trips ONLY the top-2-gram rule, and one that trips
    # ONLY the symbol rule — the gate is the AND of independent rules
    repetitive = "spam eggs " * 50 + "x y z w v u t s r q"
    symbolic = " ".join(f"w{i}" for i in range(20)) + " ###"
    clean = " ".join(f"u{i} v{i}" for i in range(40))
    got = _run_profile(spark, [repetitive, symbolic, clean])
    assert got[0]["pass_repetition"] is False
    assert got[0]["top2_share"] > 0.20
    assert got[1]["pass_repetition"] is False
    assert got[1]["symbol_word_ratio"] > 0.10
    assert got[2]["pass_repetition"] is True


def test_repetition_profile_registry_entry(spark, sf_dir):
    from whisper_pandas_spark.registry import QUERIES

    df = QUERIES["text_repetition_profile"](spark, sf_dir)
    rows = df.limit(50).collect()
    assert rows, "entry must produce rows on the documents table"
    cols = set(df.columns)
    assert {
        "doc_id",
        "dup2_share",
        "top4_share",
        "symbol_word_ratio",
        "pass_repetition",
    } <= cols
    # the synthetic corpus has a ~30-word vocabulary, so across 50 docs
    # SOME bigram repetition is certain (77 draws from ~900 pairs
    # needn't collide in any single doc, but not in none of them)
    assert any(r.dup2_share and r.dup2_share > 0 for r in rows)


# -- byte-level BPE ------------------------------------------------------------


def _ref_bpe_train(words_freq, num_merges, min_pair_freq=2):
    """Brute-force single-node byte-level BPE trainer (same tie-break:
    freq desc, then (a, b) lexicographically ascending)."""
    from collections import Counter

    from whisper_pandas_spark.operators.bpe_bytes import pretoken_syms
    from whisper_pandas_spark.operators.bpe_train import _merge_syms

    vocab = [(pretoken_syms(w), f) for w, f in words_freq.items()]
    merges = []
    for _ in range(num_merges):
        cnt = Counter()
        for syms, f in vocab:
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] += f
        if not cnt:
            break
        # freq desc, then (a, b) lexicographically ascending
        best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        if best[1] < min_pair_freq:
            break
        a, b = best[0]
        merges.append((a, b))
        vocab = [(_merge_syms(list(s), a, b), f) for s, f in vocab]
    return merges


def _rank_greedy(syms, merges):
    from whisper_pandas_spark.operators.bpe_train import _merge_syms

    rank = {m: i for i, m in enumerate(merges)}
    syms = list(syms)
    while True:
        best, br = None, len(rank)
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and r < br:
                best, br = (syms[i], syms[i + 1]), r
        if best is None:
            return syms
        syms = _merge_syms(syms, best[0], best[1])


def test_bytes_to_unicode_table():
    from whisper_pandas_spark.operators.bpe_bytes import bytes_to_unicode

    t = bytes_to_unicode()
    assert len(t) == 256
    assert len(set(t.values())) == 256  # injective
    assert all(len(v) == 1 for v in t.values())
    # no stand-in is a space (the separator the oracle's replay relies on)
    assert " " not in t.values()
    assert t[ord("a")] == "a" and t[ord("!")] == "!"
    assert t[32] == chr(256 + 32) and t[10] == chr(256 + 10)
    assert t[173] == chr(323)  # soft hyphen, the last excluded byte


def test_pretoken_syms_non_ascii():
    from whisper_pandas_spark.operators.bpe_bytes import (
        bytes_to_unicode,
        pretoken_syms,
    )

    inv = {v: k for k, v in bytes_to_unicode().items()}
    for w in [" café", "naïve", "héllo", "日本", "a\U0001F600b"]:
        syms = pretoken_syms(w)
        assert len(syms) == len(w.encode("utf-8"))
        assert bytes(inv[s] for s in syms).decode("utf-8") == w


def test_bpe_bytes_train_matches_reference(spark):
    from collections import Counter

    import re

    from whisper_pandas_spark.operators.bpe_bytes import bpe_bytes_train
    from whisper_pandas_spark.operators.textstats import BPE_REGEX

    texts = [
        "the cat sat on the mat",
        "the cat ate the rat",
        "that hat is the cat's hat",
        "statistics that matter",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    words = Counter()
    for t in texts:
        words.update(re.findall(BPE_REGEX, t))
    want = _ref_bpe_train(words, 12, 2)
    got = bpe_bytes_train(df, "text", 12, 2)
    assert got == want
    assert len(got) >= 4  # 'th'/'at' families guarantee learnable merges


def test_bpe_bytes_sequential_equals_rank_greedy(spark):
    import re
    import random as rnd

    from whisper_pandas_spark.operators.bpe_bytes import (
        apply_merges,
        bpe_bytes_train,
        pretoken_syms,
    )
    from whisper_pandas_spark.operators.textstats import BPE_REGEX

    texts = [
        "aaa aaaa aa aaa baab abab",
        "the theme there then at hat that",
        "123 12 312 31 23",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_bytes_train(df, "text", 10, 2)
    assert merges
    pretokens = {w for t in texts for w in re.findall(BPE_REGEX, t)}
    rng = rnd.Random(11)
    randoms = [
        "".join(rng.choice("abthe 123") for _ in range(rng.randrange(1, 12))).strip()
        or "a"
        for _ in range(200)
    ]
    for w in sorted(pretokens) + randoms:
        syms = pretoken_syms(w)
        assert apply_merges(syms, merges) == _rank_greedy(syms, merges), w


def test_bpe_bytes_counts_invariants(spark):
    from whisper_pandas_spark.operators.bpe_bytes import (
        bpe_bytes_counts,
        bpe_bytes_train,
    )

    texts = ["the cat sat on the mat", "", None, "the the the"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_bytes_train(df, "text", 8, 2)
    rows = {r.doc_id: r for r in bpe_bytes_counts(df, "doc_id", "text", merges).collect()}
    assert set(rows) == {0, 1, 2, 3}  # empty and NULL docs keep a row
    assert rows[1].n_pretokens == rows[1].n_tokens == rows[1].n_bytes == 0
    assert rows[2].n_pretokens == 0
    for r in rows.values():
        assert r.n_tokens <= r.n_bytes  # merges only shrink
        assert r.n_pretokens <= r.n_tokens or r.n_pretokens == 0
    # doc 0: merges learned from 'the' repetition must compress it
    assert rows[0].n_tokens < rows[0].n_bytes


def test_bpe_bytes_registry_entry(spark, sf_dir):
    from whisper_pandas_spark.registry import ORACLES, QUERIES

    assert "text_bpe_bytes" in QUERIES and "text_bpe_bytes" in ORACLES
    df = QUERIES["text_bpe_bytes"](spark, sf_dir)
    rows = df.limit(20).collect()
    assert rows and all(r.n_tokens <= r.n_bytes for r in rows)


# -- BFS / k-core on adversarially skewed graphs (VERDICT r10 task #7) ---------
# The round-10 random-graph properties are degree-uniform; these pin
# exact frontier sizes and peel-round counts on a 10k-leaf star (the
# power-law hub extreme) and a bridged clique chain.


def _sym_edges(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sorted(set(rows)), "src long, dst long")


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node long")


def test_bfs_star_frontier_sizes(spark):
    from whisper_pandas_spark.operators.graph import bfs_distances

    n_leaves = 10_000
    star = _sym_edges(spark, [(0, i) for i in range(1, n_leaves + 1)])
    # from the hub: frontier sizes [1, 10000] — one round floods the graph
    by_dist = {
        r.dist: r.cnt
        for r in bfs_distances(star, _nodes(spark, [0]), max_hops=3)
        .groupBy("dist")
        .agg(__import__("pyspark").sql.functions.count("*").alias("cnt"))
        .collect()
    }
    assert by_dist == {0: 1, 1: n_leaves}
    # from one leaf: frontiers [1, 1, 9999] — the hub fans the third
    # round out to every remaining leaf in ONE join
    by_dist = {
        r.dist: r.cnt
        for r in bfs_distances(star, _nodes(spark, [7]), max_hops=3)
        .groupBy("dist")
        .agg(__import__("pyspark").sql.functions.count("*").alias("cnt"))
        .collect()
    }
    assert by_dist == {0: 1, 1: 1, 2: n_leaves - 1}


def test_bfs_clique_chain_distances(spark):
    from whisper_pandas_spark.operators.graph import bfs_distances

    # 10 cliques of 5; node c*10+j, bridge j=0; bridges form a path
    pairs = []
    for c in range(10):
        ids = [c * 10 + j for j in range(5)]
        pairs += [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        if c < 9:
            pairs.append((c * 10, (c + 1) * 10))
    g = _sym_edges(spark, pairs)
    dist = {
        r.node: r.dist
        for r in bfs_distances(g, _nodes(spark, [0]), max_hops=20).collect()
    }
    # bridge of clique c is c hops out; its clique-mates one more
    for c in range(10):
        assert dist[c * 10] == c
        for j in range(1, 5):
            assert dist[c * 10 + j] == c + 1
    assert len(dist) == 50


def test_kcore_star_peels_in_two_rounds(spark):
    from whisper_pandas_spark.operators.graph import kcore

    star = _sym_edges(spark, [(0, i) for i in range(1, 10_001)])
    # round 1 deletes every leaf (deg 1 < 2); round 2 deletes the hub
    # (deg 0 among survivors) — pinned via the max_rounds budget. A
    # truncated budget reports the degree the final round FILTERED on
    # (the pre-peel degree): in-subgraph degrees hold at the fixpoint.
    after1 = kcore(star, k=2, max_rounds=1).collect()
    assert [(r.node, r.deg) for r in after1] == [(0, 10_000)]
    assert kcore(star, k=2, max_rounds=2).collect() == []
    # k=1: everything survives, hub degree intact
    deg = {r.node: r.deg for r in kcore(star, k=1, max_rounds=3).collect()}
    assert deg[0] == 10_000 and len(deg) == 10_001
    assert all(d == 1 for n, d in deg.items() if n != 0)


def test_kcore_clique_chain_rounds(spark):
    from whisper_pandas_spark.operators.graph import kcore

    pairs = []
    for c in range(10):
        ids = [c * 10 + j for j in range(5)]
        pairs += [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        if c < 9:
            pairs.append((c * 10, (c + 1) * 10))
    g = _sym_edges(spark, pairs)
    # k=4: every K5 member has in-clique degree 4 -> the whole graph IS
    # the 4-core, converged in one round (more rounds change nothing)
    one = sorted((r.node, r.deg) for r in kcore(g, k=4, max_rounds=1).collect())
    many = sorted((r.node, r.deg) for r in kcore(g, k=4, max_rounds=8).collect())
    assert one == many and len(one) == 50
    # interior bridges carry their 2 bridge edges on top of the clique 4
    degs = dict(one)
    assert degs[10] == 6 and degs[0] == 5 and degs[1] == 4
    # k=5: round 1 peels non-bridge members (deg 4), round 2 the now
    # bare bridges -> empty; max_rounds=1 must show the half-peeled state
    half = sorted(r.node for r in kcore(g, k=5, max_rounds=1).collect())
    assert half == [0] + [c * 10 for c in range(1, 9)] + [90]
    assert kcore(g, k=5, max_rounds=2).collect() == []


# -- Bloom filter ---------------------------------------------------------------


def _bloom_modules():
    from whisper_pandas_spark.operators.sketches import (
        bloom_contains,
        bloom_rollup,
        bloom_shard_sketches,
    )

    return bloom_shard_sketches, bloom_rollup, bloom_contains


def test_bloom_never_false_negative(spark):
    build, _, contains = _bloom_modules()
    rng = random.Random(23)
    vals = sorted({rng.randrange(10_000) for _ in range(300)})
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, item long")
    # tiny m forces heavy collision: the one-sided law must still hold
    sk = build(df, ("grp",), "item", k=3, m=64)
    probes = spark.createDataFrame([(v,) for v in vals], "item long")
    rows = contains(sk, ("grp",), probes, "item", k=3, m=64).collect()
    assert len(rows) == len(vals)
    assert all(r.maybe_present for r in rows)  # inserted -> never negative


def test_bloom_false_positives_only_when_absent(spark):
    build, _, contains = _bloom_modules()
    present = list(range(0, 2000, 2))  # evens
    df = spark.createDataFrame([("g", v) for v in present], "grp string, item long")
    sk = build(df, ("grp",), "item", k=3, m=4096)
    absent = list(range(1, 2000, 2))  # odds
    probes = spark.createDataFrame([(v,) for v in absent], "item long")
    rows = contains(sk, ("grp",), probes, "item", k=3, m=4096).collect()
    # ~1000 insertions into 4096 bits at k=3: some false positives are
    # near-certain, but most absent probes must read absent
    fp = sum(1 for r in rows if r.maybe_present)
    assert 0 < fp < len(rows) // 2


def test_bloom_rollup_equals_direct_build(spark):
    build, rollup, _ = _bloom_modules()
    rng = random.Random(31)
    rows = [(f"shard{rng.randrange(4)}", rng.randrange(500)) for _ in range(1200)]
    df = spark.createDataFrame(rows, "shard string, item long")
    shards = build(df, ("shard",), "item", k=2, m=256)
    merged = rollup(shards.withColumn("shard", F.lit("all")), ("shard",))
    direct = build(
        df.withColumn("shard", F.lit("all")), ("shard",), "item", k=2, m=256
    )
    assert {r.bit for r in merged.collect()} == {r.bit for r in direct.collect()}
    # idempotent: merging the merge changes nothing (replay safety)
    again = rollup(merged.unionByName(merged), ("shard",))
    assert again.count() == merged.count()


def test_bloom_validation_and_registry(spark, sf_dir):
    build, _, _ = _bloom_modules()
    df = spark.createDataFrame([("g", 1)], "grp string, item long")
    with pytest.raises(ValueError):
        build(df, ("grp",), "item", k=0)
    with pytest.raises(ValueError):
        build(df, ("grp",), "item", m=1)
    from whisper_pandas_spark.registry import ORACLES, QUERIES

    assert "sketch_bloom_membership" in ORACLES
    rows = QUERIES["sketch_bloom_membership"](spark, sf_dir).collect()
    assert len(rows) == 40
    for r in rows:
        if r.truly_present:
            assert r.maybe_present  # one-sided error


def test_stream_bloom_idempotent_under_full_replay(spark, tmp_path):
    from whisper_pandas_spark.operators.merge import current_version_path
    from whisper_pandas_spark.streaming.sketches import stream_bloom_update

    rows = [("g", i, (i * 37) % 400) for i in range(500)]
    df = spark.createDataFrame(rows, "grp string, seq long, item long")
    d = str(tmp_path)
    df.filter(F.col("seq") % 2 == 0).coalesce(1).write.parquet(f"{d}/c/f1")
    df.filter(F.col("seq") % 2 == 1).coalesce(1).write.parquet(f"{d}/c/f2")

    def run(ckpt):
        sdf = (
            spark.readStream.schema("grp string, seq long, item long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/c/*")
        )
        q = stream_bloom_update(
            sdf, f"{d}/state", ("grp",), "item", k=3, m=512,
            checkpoint_dir=ckpt,
        )
        q.processAllAvailable()
        q.stop()

    run(f"{d}/ck1")
    bits1 = {
        r.bit
        for r in spark.read.parquet(current_version_path(f"{d}/state")).collect()
    }
    # full reprocess (fresh checkpoint => every batch replays): the
    # union-distinct merge law must leave the state bit-identical
    run(f"{d}/ck2")
    bits2 = {
        r.bit
        for r in spark.read.parquet(current_version_path(f"{d}/state")).collect()
    }
    assert bits1 == bits2
    # and it equals the direct batch build
    from whisper_pandas_spark.operators.sketches import bloom_shard_sketches

    direct = {
        r.bit for r in bloom_shard_sketches(df, ("grp",), "item", k=3, m=512).collect()
    }
    assert bits1 == direct


def test_bloom_contamination_is_superset_of_exact(spark):
    from whisper_pandas_spark.operators.decontam import (
        bloom_contamination,
        ngram_contamination,
    )

    rng = random.Random(47)
    vocab = [f"w{i}" for i in range(60)]
    mk = lambda n: " ".join(rng.choice(vocab) for _ in range(n))
    heldout_texts = [mk(30) for _ in range(10)]
    train_texts = [mk(40) for _ in range(60)]
    # plant exact leakage: three train docs embed a heldout passage
    for i in (3, 17, 42):
        train_texts[i] = train_texts[i] + " " + heldout_texts[i % 10]
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "doc_id long, text string"
    )
    heldout = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(heldout_texts)],
        "doc_id long, text string",
    )
    exact = {
        r.doc_id: r.n_shared
        for r in ngram_contamination(train, heldout).collect()
    }
    # tiny filter (high FP rate) to stress the superset property hard
    flagged = {
        r.doc_id: r.n_flagged
        for r in bloom_contamination(train, heldout, k=3, m=2048).collect()
    }
    assert set(exact) <= set(flagged)  # no false negatives, ever
    for d, n in exact.items():
        assert flagged[d] >= n  # per-doc counts dominate the exact ones
    assert {3, 17, 42} <= set(exact)  # the planted leaks were caught
    # a big filter approaches exactness: no spurious DOC at m=2^20
    precise = {
        r.doc_id
        for r in bloom_contamination(train, heldout, k=3, m=1 << 20).collect()
    }
    assert set(exact) <= precise


def test_bpe_bytes_ids_roundtrip_and_consistency(spark):
    from whisper_pandas_spark.operators.bpe_bytes import (
        bpe_bytes_counts,
        bpe_bytes_encode_ids,
        bpe_bytes_train,
        bpe_bytes_vocab,
        bytes_to_unicode,
    )

    texts = ["the cat sat on the mat", "that hat is the cat's hat", "", None]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_bytes_train(df, "text", 10, 2)
    vocab = bpe_bytes_vocab(merges)
    inv_tok = {v: k for k, v in vocab.items()}
    inv_byte = {v: k for k, v in bytes_to_unicode().items()}
    ids = {r.doc_id: r for r in bpe_bytes_encode_ids(df, "doc_id", "text", merges).collect()}
    counts = {r.doc_id: r for r in bpe_bytes_counts(df, "doc_id", "text", merges).collect()}
    assert set(ids) == {0, 1, 2, 3}
    for d in (2, 3):
        assert ids[d].ids_csv == "" and ids[d].n_tokens == 0
    import re

    from whisper_pandas_spark.operators.textstats import BPE_REGEX

    for d in (0, 1):
        r = ids[d]
        assert r.n_tokens == counts[d].n_tokens  # two encoders agree
        toks = [inv_tok[int(x)] for x in r.ids_csv.split(",")]
        # byte-level decode is LOSSLESS over the matched pre-tokens
        decoded = bytes(
            inv_byte[c] for t in toks for c in t
        ).decode("utf-8")
        assert decoded == "".join(re.findall(BPE_REGEX, texts[d]))
        # no unknown ids, base ids are raw bytes
        assert all(0 <= int(x) < len(vocab) for x in r.ids_csv.split(","))
