"""Corpus-curation ops: stratified sampling, domain mix, repetition
metrics, token-budget shard packing (sparkcrawl/curation.py, textops.
rep_metrics). The DuckDB oracle covers value parity at sf0.001/0.01
(queries stratified_sample / domain_mix / rep_metrics / shard_packing);
these tests pin the properties the oracle can't see: independence from
partitioning, plan shape, and hand-computed edge cases."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sparkcrawl import curation, textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"w{i % 7} " * (i % 5 + 1) + f"tail{i}",
         ["en", "de", "fr", "zh"][i % 4], f"src{i % 3}", 10 + i)
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------


def test_stratified_sample_matches_hashlib_reference(spark, docs):
    """The kept set equals an independent Python md5 re-derivation —
    sampling is a pure function of (salt, doc_id, lang), so any external
    auditor can reproduce it exactly."""
    rates = {"en": 0.5, "de": 0.25, "fr": 0.25}
    got = {
        r["doc_id"]
        for r in curation.stratified_sample(docs, rates).collect()
    }
    expect = set()
    for i in range(200):
        lang = ["en", "de", "fr", "zh"][i % 4]
        bucket = hashlib.md5(f"samp:{i}".encode()).hexdigest()[:4]
        thr = curation.rate_threshold(rates.get(lang, 0.125))
        if bucket < thr:
            expect.add(i)
    assert got == expect
    # rate sanity on the uniform md5 buckets: en keeps about half
    en_total = 50
    en_kept = sum(1 for i in expect if i % 4 == 0)
    assert 0.3 * en_total <= en_kept <= 0.7 * en_total


def test_stratified_sample_no_shuffle(spark, docs):
    """A sampling decision must never move data: the plan is scan + filter
    + project, with no Exchange."""
    plan = curation.stratified_sample(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_rate_threshold_bounds():
    assert curation.rate_threshold(0.5) == "8000"
    assert curation.rate_threshold(0.0) == "0000"
    assert curation.rate_threshold(1.0) == "ffff"
    with pytest.raises(ValueError):
        curation.rate_threshold(1.5)


# ---------------------------------------------------------------------------
# domain mix
# ---------------------------------------------------------------------------


def test_domain_mix_shares_sum_to_one(spark, docs):
    rows = curation.domain_mix(docs).collect()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    assert sum(r["n_docs"] for r in rows) == 200
    # chars aggregate per cell matches a direct recount
    direct = {
        (r["source"], r["lang"]): r["s"]
        for r in docs.groupBy("source", "lang")
        .agg(F.sum("n_chars").alias("s")).collect()
    }
    for r in rows:
        assert r["total_chars"] == direct[(r["source"], r["lang"])]


# ---------------------------------------------------------------------------
# repetition metrics
# ---------------------------------------------------------------------------


def test_rep_metrics_hand_computed(spark):
    d = spark.createDataFrame(
        [
            (1, "a a a b"),      # 4 toks, 2 distinct; bigrams a-a a-a a-b
            (2, "x"),            # single token: no bigrams
            (3, "p q r s"),      # all distinct, all bigrams unique
            (4, "z z"),          # one bigram
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textops.rep_metrics(d).collect()}
    assert got[1]["dup_token_ratio"] == 0.5
    assert got[1]["top_bigram_share"] == round(2 / 3, 6)
    assert got[2]["dup_token_ratio"] == 0.0
    assert got[2]["top_bigram_share"] == 0.0
    assert got[3]["dup_token_ratio"] == 0.0
    assert got[3]["top_bigram_share"] == round(1 / 3, 6)
    assert got[4]["dup_token_ratio"] == 0.5
    assert got[4]["top_bigram_share"] == 1.0


# ---------------------------------------------------------------------------
# shard packing
# ---------------------------------------------------------------------------


def _tok_counts(docs):
    return textops.with_tokens(docs).select(
        "doc_id", F.size("tokens").alias("n_tokens")
    )


def test_pack_shards_matches_pandas_cumsum(spark, docs):
    out = curation.pack_shards(_tok_counts(docs), budget=16).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ref = _tok_counts(docs).toPandas().sort_values("doc_id") \
        .reset_index(drop=True)
    cum = ref["n_tokens"].cumsum()
    assert (out["cum_tokens"] == cum).all()
    assert (out["shard_id"] == (cum - ref["n_tokens"]) // 16).all()
    # shards are contiguous runs in doc order
    assert (out["shard_id"].diff().dropna() >= 0).all()


def test_pack_shards_identical_across_shuffle_widths(spark, docs):
    """The running total is a pure function of the ordered corpus — the
    range-partition width (1 / 3 / 8) must not leak into values."""
    toks = _tok_counts(docs)
    results = []
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for w in ("1", "3", "8"):
            spark.conf.set("spark.sql.shuffle.partitions", w)
            results.append(
                sorted(
                    map(tuple, curation.pack_shards(toks, 16).collect())
                )
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert results[0] == results[1] == results[2]


def test_pack_shards_window_partitions_by_pid(spark, docs):
    """Same guard as dense_seq: the cumulative window runs per range
    partition, never over a single global partition."""
    plan = curation.pack_shards(_tok_counts(docs), 16)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "hashpartitioning(_pid" in plan
    assert "SinglePartition" not in plan


def test_pack_shards_rejects_bad_budget(spark, docs):
    with pytest.raises(ValueError):
        curation.pack_shards(_tok_counts(docs), 0)

# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------


def test_pii_scrub_hand_computed(spark):
    rows = [
        (0, "mail a.b+c@ex-ample.co.uk now"),
        (1, "call 555-123-4567 or 555-000-1111"),
        (2, "host 192.168.0.1 up"),
        (3, "none here"),
        (4, "x@y.io at 10.0.0.7 tel 123-456-7890"),
        (5, ""),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_email"], r["n_phone"], r["n_ipv4"], r["scrubbed"])
        for r in curation.pii_scrub(d).collect()
    }
    assert got[0] == (1, 0, 0, "mail <EMAIL> now")
    assert got[1] == (0, 2, 0, "call <PHONE> or <PHONE>")
    assert got[2] == (0, 0, 1, "host <IPV4> up")
    assert got[3] == (0, 0, 0, "none here")
    assert got[4] == (1, 1, 1, "<EMAIL> at <IPV4> tel <PHONE>")
    assert got[5] == (0, 0, 0, "")


def test_pii_scrub_no_shuffle_no_udf(spark):
    """One fused projection: no Exchange, no Python in the plan."""
    d = spark.createDataFrame([(1, "a@b.co")], "doc_id long, text string")
    plan = curation.pii_scrub(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_pii_scrub_earlier_class_not_double_counted(spark):
    """An email's host looks nothing like an ip here, but a phone-ish
    email local part must be consumed by the email pass only."""
    d = spark.createDataFrame(
        [(1, "reach 555-123-4567@ex.com ok")], "doc_id long, text string"
    )
    r = curation.pii_scrub(d).collect()[0]
    assert (r["n_email"], r["n_phone"]) == (1, 0)
    assert r["scrubbed"] == "reach <EMAIL> ok"


# ---------------------------------------------------------------------------
# cross-document boilerplate
# ---------------------------------------------------------------------------


def test_boilerplate_ngrams_hand_computed(spark):
    """'the end' appears in 3 docs of src0 -> boilerplate there; the same
    bigram in src1 appears once -> clean (blocking is per source)."""
    rows = [
        (0, "alpha beta the end", "src0"),
        (1, "gamma delta the end", "src0"),
        (2, "zz yy the end", "src0"),
        (3, "the end", "src1"),
        (4, "solo", "src1"),  # 1 token -> 0 grams
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_boiler"], r["boiler_frac"])
        for r in textops.boilerplate_ngrams(d, n=2, min_docs=3).collect()
    }
    assert got[0] == (3, 1, round(1 / 3, 6))
    assert got[1] == (3, 1, round(1 / 3, 6))
    assert got[2] == (3, 1, round(1 / 3, 6))
    assert got[3] == (1, 0, 0.0)
    assert got[4] == (0, 0, 0.0)


def test_boilerplate_counts_distinct_docs_not_occurrences(spark):
    """A doc repeating a gram 10 times counts ONCE toward min_docs — the
    per-doc array_distinct is what makes COUNT(*) == COUNT(DISTINCT doc)."""
    rows = [
        (0, "spam ham " * 10, "s"),  # 'spam ham' many times, one doc
        (1, "clean words here", "s"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r["n_boiler"]
           for r in textops.boilerplate_ngrams(d, 2, 2).collect()}
    assert out[0] == 0 and out[1] == 0


def test_pii_scrub_matches_python_re_reference(spark):
    """Third engine: the scrub chain re-implemented with Python `re` on a
    200-doc fragment-pool corpus must agree with the JVM regex path on
    every count and every scrubbed byte (the duckdb oracle already pins
    RE2; this pins the Java-regex dialect from the other side)."""
    import random
    import re

    frags = [
        "a@b.co", "u.v+w_x%9@ex-ample.org.uk", "not@an", "x@y.z",
        "555-123-4567", "555-12-4567", "1555-123-45678", "1.2.3.4",
        "10.0.0.300", "1.2.3.4.5", "999.88.7", "plain words", "a-b@c",
        "trailing@dot.co.", "12-34-56", "@@", "", "word 7.7.7.7word",
    ]
    rng = random.Random(42)
    rows = [
        (i, " ".join(rng.choice(frags) for _ in range(rng.randint(0, 8))))
        for i in range(200)
    ]

    def ref(t):
        counts = []
        for name, pat in curation.PII_PATTERNS:
            counts.append(len(re.findall(pat, t)))
            t = re.sub(pat, f"<{name.upper()}>", t)
        return (*counts, t)

    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_email"], r["n_phone"], r["n_ipv4"], r["scrubbed"])
        for r in curation.pii_scrub(d).collect()
    }
    for i, t in rows:
        assert got[i] == ref(t), (i, t, got[i], ref(t))


def test_gopher_rules_per_rule(spark):
    """Each Gopher rule flips the gate independently on constructed docs;
    boundary cases sit exactly ON the integer-form thresholds."""
    from sparkcrawl.curation import gopher_rules

    base = ("the cat and dog that run with joy have " * 5).strip()  # 45w
    pad = " ".join(f"w{i}" for i in range(5))  # 5 alpha words -> 50 total
    rows = [
        (0, base + " " + pad),                       # passes everything
        (1, base),                                   # 45 words < 50
        (2, base + " " + pad + " ##########"),       # 51w, 11 symbols
        (3, ("xx " * 25 + "the of " + "x " * 23).strip()),  # mean len 2ish
        (4, base + " " + pad + "\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j\n- k"),
        (5, "one... two...\n" + base + " " + pad),   # ellipsis lines
        (6, ("123 456 " * 26).strip() + " the of"),  # digits: alpha frac low
        (7, (base + " " + pad).replace("the ", "cat ").replace("and ", "dog ")
             .replace("that ", "run ").replace("with ", "joy ")
             .replace("have ", "fun ")),             # no stopwords
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(d).collect()}

    assert got[0]["passes_gopher"] is True
    assert got[0]["n_words"] == 50 and got[0]["n_stop_hits"] >= 2
    assert got[1]["passes_gopher"] is False          # word-count floor
    assert got[2]["passes_gopher"] is False          # symbol ratio > 0.1
    assert got[2]["symbol_to_word"] > 0.1
    assert got[3]["passes_gopher"] is False          # mean word len < 3
    assert got[3]["mean_word_len"] < 3
    assert got[4]["passes_gopher"] is False          # >90% bullet lines
    assert got[4]["bullet_line_frac"] > 0.9
    assert got[5]["passes_gopher"] is False          # >30% ellipsis lines
    assert got[5]["ellipsis_line_frac"] > 0.3
    assert got[6]["passes_gopher"] is False          # alpha words < 80%
    assert got[6]["alpha_word_frac"] < 0.8
    assert got[7]["passes_gopher"] is False          # < 2 stopword hits
    assert got[7]["n_stop_hits"] < 2


def test_gopher_rules_integer_boundaries(spark):
    """Thresholds are inclusive exactly as the integer forms state: a doc
    sitting exactly AT a boundary passes (symbol ratio == 0.1, mean word
    length == 3.0 and == 10.0)."""
    from sparkcrawl.curation import gopher_rules

    # 50 words, each 3 chars, incl. 2 stopwords -> mean len exactly 3.0;
    # exactly 5 '#' symbols -> ratio exactly 0.1 (10*5 <= 50)
    words = ["the", "and"] + ["cat"] * 43 + ["#oo"] * 5
    assert len(words) == 50 and all(len(w) == 3 for w in words)
    at3 = " ".join(words)
    # mean exactly 10.0: the(3)+and(3)+47x10-char+one 24-char = 500 chars
    words10 = ["the", "and"] + ["alphabetic"] * 47 + ["a" * 24]
    assert len(words10) == 50
    assert sum(len(w) for w in words10) == 10 * 50
    d = spark.createDataFrame(
        [(0, at3), (1, " ".join(words10))], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(d).collect()}
    assert got[0]["passes_gopher"] is True
    assert got[0]["mean_word_len"] == 3.0
    assert got[0]["symbol_to_word"] == 0.1
    assert got[1]["passes_gopher"] is True
    assert got[1]["mean_word_len"] == 10.0


def test_dsir_weights_python_reference(spark):
    """dsir_weights vs an independent hashlib/math reference implementing
    the same contract (md5-3-hex bucket, Laplace counts, micro-nat
    quantized per-bucket log ratio, exact integer per-doc sums)."""
    import hashlib
    import math
    from collections import Counter

    from sparkcrawl.curation import dsir_weights

    rows = [
        (0, "good clean prose about the topic", True),
        (1, "good clean prose about the topic", True),
        (2, "spam spam buy now spam buy", False),
        (3, "five distinct rare words here", False),
        (4, "one", False),  # no bigrams -> weight 0, not target_like
    ]
    B = 4096

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:3], 16)

    feats = {
        i: [
            bucket(f"{a} {b}")
            for a, b in zip(t.lower().split(), t.lower().split()[1:])
        ]
        for i, t, _ in rows
    }
    cnt_r = Counter(b for f in feats.values() for b in f)
    cnt_t = Counter(b for i, _, tgt in rows if tgt for b in feats[i])
    nr, nt = sum(cnt_r.values()), sum(cnt_t.values())
    lam = {
        b: round(
            math.log((cnt_t[b] + 1) * (nr + B) / ((c + 1) * (nt + B)))
            * 1_000_000
        )
        for b, c in cnt_r.items()
    }
    expect = {
        i: (tgt, len(feats[i]), sum(lam[b] for b in feats[i]))
        for i, _, tgt in rows
    }

    d = spark.createDataFrame(
        rows, "doc_id long, text string, is_target boolean"
    )
    got = {
        r["doc_id"]: (
            r["is_target"], r["n_feats"], r["weight_q"], r["target_like"]
        )
        for r in dsir_weights(d).collect()
    }
    assert len(got) == len(rows)
    for i, (tgt, nf, w) in expect.items():
        assert got[i] == (tgt, nf, w, w > 0), (i, got[i], (tgt, nf, w))
    # At unit scale the Laplace prior dominates: a bucket is net-positive
    # only when every occurrence is target (cnt_t == cnt_r), so the pure
    # target docs score target_like and every raw-exclusive doc lands
    # negative. (At corpus scale counts dwarf the +1 and the gate behaves
    # like the paper's ratio.)
    assert got[0][3] and got[1][3]
    assert not got[2][3] and not got[3][3] and not got[4][3]
    # 4 distinct once-seen bigrams beat the spam doc's repeated ones
    assert got[3][2] > got[2][2]


def test_c4_line_filters_per_rule(spark):
    """Each C4 predicate flips independently on constructed docs; the
    cleaned text is exactly the kept lines rejoined."""
    from sparkcrawl.curation import c4_line_filters

    good = "this line has plenty of words and ends properly."
    rows = [
        (0, f"{good}\nanother decent sentence with enough words!\n"
            'a third quoted keeper with five words"'),
        (1, f"{good}\ntiny line."),                    # 1 kept < 3
        (2, f"{good}\n{good}\nno terminal punctuation on this one"),
        (3, f"{good}\n{good}\n{good} lorem IPSUM here."),  # phrase flag
        (4, f"{good}\n{good}\nif (x) {{ return; }} done."),  # brace
        (5, f"{good}\n{good}\nthis line mentions xxx and xxx again."),
        (6, ""),                                       # degenerate
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in c4_line_filters(d).collect()}

    assert got[0]["passes_c4"] is True
    assert got[0]["n_kept_lines"] == 3
    assert got[0]["clean_text"] == rows[0][1]  # every line kept verbatim
    assert got[1]["passes_c4"] is False and got[1]["n_kept_lines"] == 1
    assert got[2]["passes_c4"] is False and got[2]["n_kept_lines"] == 2
    assert got[3]["passes_c4"] is False and got[3]["has_phrase_flag"]
    assert got[4]["passes_c4"] is False and got[4]["has_brace"]
    assert got[5]["passes_c4"] is False and got[5]["n_badwords"] == 2
    # doc 5's badword line still counts as a KEPT line (ends '.')
    assert got[5]["n_kept_lines"] == 3
    assert got[6]["n_kept_lines"] == 0 and got[6]["clean_text"] == ""


def test_deterministic_shuffle_matches_hashlib_and_widths(spark, docs):
    """The permutation equals an independent hashlib re-derivation and is
    identical across shuffle widths (pure function of the data)."""
    expect = sorted(
        (hashlib.md5(f"shuf:{i}".encode()).hexdigest(), i)
        for i in range(200)
    )
    want = {i: pos + 1 for pos, (_, i) in enumerate(expect)}

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for w in ("1", "4"):
            spark.conf.set("spark.sql.shuffle.partitions", w)
            got = {
                r["doc_id"]: r["pos"]
                for r in curation.deterministic_shuffle(docs).collect()
            }
            results.append(got)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert results[0] == want and results[1] == want


def _fuzz_texts(n=200):
    """Seeded adversarial strings: unicode, CRLF, tabs, punctuation runs,
    empty/whitespace-only lines, long tokens."""
    import random

    rng = random.Random(99)
    frags = [
        "word", "the", "and", "of", "...", "…", "#", "##", "{", "}",
        "•", "-", "*", '"', "!", "?", ".", "xxx", "LOREM", "ipsum",
        "JavaScript", "héllo", "wörld", "日本語", "a" * 40, "", " ", "\t",
    ]
    texts = []
    for _ in range(n):
        n_lines = rng.randint(0, 6)
        lines = []
        for _ in range(n_lines):
            k = rng.randint(0, 12)
            lines.append(" ".join(rng.choice(frags) for _ in range(k)))
        sep = rng.choice(["\n", "\n", "\n"])
        texts.append(sep.join(lines))
    return texts


def test_c4_fuzz_matches_python_reference(spark):
    """c4_line_filters on 200 seeded adversarial docs == an independent
    Python implementation of the same contract, field for field."""
    from sparkcrawl.curation import (
        C4_DEFAULT_BADWORDS, C4_PHRASE_FLAGS, C4_TERMINALS, c4_line_filters,
    )
    import re

    texts = _fuzz_texts()
    d = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in c4_line_filters(d).collect()}

    # NB: the engine contract is SPACES-ONLY trim — Spark's trim/rtrim
    # and DuckDB's trim/rtrim both strip 0x20 only (they agree with each
    # other), so the reference must use strip(' ')/rstrip(' '), not the
    # all-whitespace Python default.
    ws = re.compile(r"\s+")
    for i, t in enumerate(texts):
        lines = t.split("\n")
        kept = [
            line for line in lines
            if len(ws.split(line.strip(" "))) >= 5
            and line.rstrip(" ")[-1:] in C4_TERMINALS
        ]
        low = t.lower()
        has_phrase = any(p in low for p in C4_PHRASE_FLAGS)
        has_brace = "{" in t
        toks = [x.lower() for x in ws.split(t.strip(" "))]
        n_bad = sum(1 for x in toks if x in C4_DEFAULT_BADWORDS)
        passes = (
            len(kept) >= 3 and not has_phrase and not has_brace
            and n_bad == 0
        )
        g = got[i]
        assert g["n_lines"] == len(lines), (i, repr(t))
        assert g["n_kept_lines"] == len(kept), (i, repr(t), kept)
        assert g["clean_text"] == "\n".join(kept), (i, repr(t))
        assert g["has_phrase_flag"] == has_phrase
        assert g["has_brace"] == has_brace
        assert g["n_badwords"] == n_bad
        assert g["passes_c4"] == passes, (i, repr(t))


def test_gopher_fuzz_matches_python_reference(spark):
    """gopher_rules on the seeded adversarial docs == an independent
    Python implementation of the integer-form contract (spaces-only trim,
    non-overlapping '...' counting)."""
    import re

    from sparkcrawl.curation import GOPHER_BULLETS, GOPHER_STOPWORDS, \
        gopher_rules

    texts = _fuzz_texts()
    d = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(d).collect()}

    ws = re.compile(r"\s+")
    for i, t in enumerate(texts):
        toks = ws.split(t.strip(" "))
        n = len(toks)
        sum_len = sum(len(x) for x in toks)
        toks_l = [x.lower() for x in toks]
        n_alpha = sum(1 for x in toks if re.search("[A-Za-z]", x))
        n_stop = sum(1 for s in GOPHER_STOPWORDS if s in toks_l)
        n_sym = (t.count("#") + t.count("...") + t.count("…"))
        lines = t.split("\n")
        n_lines = len(lines)
        n_bullet = sum(
            1 for line in lines if line.lstrip(" ")[:1] in GOPHER_BULLETS
        )
        n_ellip = sum(
            1 for line in lines
            if line.rstrip(" ").endswith("...")
            or line.rstrip(" ").endswith("…")
        )
        passes = (
            50 <= n <= 100_000
            and 3 * n <= sum_len <= 10 * n
            and 10 * n_sym <= n
            and 10 * n_bullet <= 9 * n_lines
            and 10 * n_ellip <= 3 * n_lines
            and 5 * n_alpha >= 4 * n
            and n_stop >= 2
        )
        g = got[i]
        assert g["n_words"] == n, (i, repr(t))
        assert g["n_stop_hits"] == n_stop, (i, repr(t))
        assert g["passes_gopher"] == passes, (i, repr(t), g)


def test_line_dedup_hand_computed(spark):
    """Shared lines drop, unique lines survive in order, whitespace-only
    lines always survive, fully-boilerplate docs come back empty."""
    rows = [
        (0, "NAV BAR\nreal content zero\n\nFOOTER"),
        (1, "NAV BAR\nreal content one\nFOOTER"),
        (2, "NAV BAR\nFOOTER"),          # nothing unique -> empty
        (3, "standalone document"),       # untouched
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean_text"])
        for r in curation.line_dedup(d, min_docs=2).collect()
    }
    assert got[0] == (4, 2, "real content zero\n")
    assert got[1] == (3, 1, "real content one")
    assert got[2] == (2, 0, "")
    assert got[3] == (1, 1, "standalone document")


def test_line_dedup_within_doc_repeats_dont_count(spark):
    """A line repeated WITHIN one doc is not cross-doc boilerplate — the
    per-doc-distinct pairing keeps it (distinct-doc count = 1)."""
    rows = [
        (0, "echo echo line\necho echo line\nbody zero"),
        (1, "body one"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["clean_text"]
        for r in curation.line_dedup(d, min_docs=2).collect()
    }
    assert got[0] == "echo echo line\necho echo line\nbody zero"


def test_dsir_resample_gumbel_python_reference(spark):
    """dsir_resample vs a hashlib/math reference of the Gumbel top-k key:
    key_q = floor((weight_q/1e6 - ln(-ln((md5int+0.5)/2^32))) * 1e6 + 0.5)
    (tie-stable HALF_UP in all three implementations), top-k by
    (key_q desc, doc_id) — and invariant to input partitioning."""
    import hashlib
    import math

    from sparkcrawl.curation import dsir_resample, dsir_weights

    rows = [
        (i, f"word{i % 5} common text number {i} tail", i % 3 == 0)
        for i in range(40)
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, is_target boolean"
    )
    weights = {
        r["doc_id"]: r["weight_q"] for r in dsir_weights(d).collect()
    }

    def key_q(i):
        u = (
            int(hashlib.md5(f"gum:{i}".encode()).hexdigest()[:8], 16) + 0.5
        ) / 2**32
        return math.floor(
            (weights[i] / 1_000_000 - math.log(-math.log(u))) * 1_000_000
            + 0.5
        )

    expect = sorted(
        ((key_q(i), i) for i, _, _ in rows), key=lambda t: (-t[0], t[1])
    )[:10]
    got = dsir_resample(d, k=10).collect()
    assert [(r["key_q"], r["doc_id"]) for r in got] == expect
    assert all(r["weight_q"] == weights[r["doc_id"]] for r in got)
    got_wide = dsir_resample(d.repartition(7, "text"), k=10).collect()
    assert [tuple(r) for r in got_wide] == [tuple(r) for r in got]


def test_dsir_weights_n_buckets_must_match_hash_width(spark):
    """dsir_weights hashes features to 16^w buckets via a w-hex-char md5
    prefix; the Laplace smoothing uses n_buckets as B. The two must agree,
    so non-power-of-16 bucket counts are rejected instead of silently
    producing wrong lam values."""
    import pytest as _pytest

    from sparkcrawl.curation import dsir_weights

    d = spark.createDataFrame(
        [(1, "alpha beta gamma", True), (2, "delta beta gamma", False)],
        "doc_id long, text string, is_target boolean",
    )
    with _pytest.raises(ValueError):
        dsir_weights(d, n_buckets=1000)
    # a power of 16 works and weights stay integer-quantized
    rows = {r["doc_id"]: r for r in dsir_weights(d, n_buckets=256).collect()}
    assert set(rows) == {1, 2}
