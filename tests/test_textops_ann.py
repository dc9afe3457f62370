"""Unit tests: dedup families, ANN search, multimodal plumbing, export."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sparkcrawl import annsearch, multimodal, textops
from sparkcrawl.export import RECORDS_PER_FILE, corpus_lines


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),  # near dup
        (3, "completely different words entirely here now"),
        (4, ""),  # empty
        (5, "tiny"),  # < shingle size
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    d = _docs(spark)
    kept = {r["doc_id"] for r in textops.dedup_exact(d).collect()}
    assert kept == {0, 2, 3, 4, 5}  # doc 1 collapses into 0
    groups = {
        r["content_md5"]: (r["n_docs"], r["keep_doc_id"])
        for r in textops.exact_dup_groups(d).collect()
    }
    dup_md5 = hashlib.md5(
        b"the quick brown fox jumps over the lazy dog"
    ).hexdigest()
    assert groups[dup_md5] == (2, 0)


def test_shingles_and_minhash(spark):
    d = _docs(spark)
    sh = {
        r["doc_id"]: r["shingles"]
        for r in textops.with_shingles(d, 3).collect()
    }
    assert sh[0][0] == "the quick brown"
    assert sh[0][-1] == "the lazy dog"
    assert len(sh[0]) == 9 - 2
    assert sh[4] == [] or sh[4] == [""]  # degenerate
    assert sh[5] == []
    sig = {
        r["doc_id"]: r["minhash"]
        for r in textops.minhash_signatures(d, n_hashes=8).collect()
    }
    assert sig[0] == sig[1]  # identical docs -> identical signatures
    # near-dup shares most minhashes
    same = sum(1 for a, b in zip(sig[0], sig[2]) if a == b)
    assert same >= 4


def test_lsh_and_jaccard(spark):
    d = _docs(spark)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in textops.lsh_candidate_pairs(d, n_hashes=16, bands=8).collect()
    }
    assert (0, 1) in pairs  # exact dups always collide
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in textops.jaccard_pairs(d, threshold=0.1).collect()
    }
    assert jac[(0, 1)] == 1.0
    assert 0.4 <= jac[(0, 2)] < 1.0


def test_simhash(spark):
    # pigeonhole blocking on 4x16-bit chunks guarantees recall only for
    # hamming <= 3 — use long docs where a 1-word edit moves ~3 bits
    long_a = " ".join(f"w{i}" for i in range(50))
    long_b = " ".join(f"w{i}" if i != 25 else "XX" for i in range(50))
    d = spark.createDataFrame(
        [(0, long_a), (1, long_a), (2, long_b),
         (3, "completely different words entirely here now")],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in textops.simhash_near_dups(d, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0  # identical
    assert (0, 2) in pairs and 0 < pairs[(0, 2)] <= 3  # near dup
    assert (0, 3) not in pairs  # unrelated


def test_lang_quality_fingerprint(spark):
    d = _docs(spark)
    lang = {
        r["doc_id"]: r["lang_guess"]
        for r in textops.with_lang_id(d).collect()
    }
    assert lang[0] == "en"
    q = {
        r["doc_id"]: r["n_tokens"] for r in textops.with_quality(d).collect()
    }
    assert q[0] == 9
    fp = {
        r["doc_id"]: r["fingerprint"]
        for r in textops.with_fingerprint(d).collect()
    }
    assert fp[0] == fp[1] != fp[2]


def test_ann_brute_vs_lsh(spark):
    import random

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)], f"l{i % 3}")
        for i in range(200)
    ]
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    q = rows[7][1]
    exact = [r["vec_id"] for r in annsearch.brute_force_topk(e, q, 5).collect()]
    assert exact[0] == 7  # self-similarity = 1.0
    approx = annsearch.lsh_bucketed_topk(e, q, 5).collect()
    assert approx[0]["vec_id"] == 7  # same bucket as itself
    # recall sanity: every approx hit is a real vector with cosine <= 1
    assert all(-1.0 <= r["cosine"] <= 1.0001 for r in approx)
    cents = annsearch.pairwise_topk_per_label(e).collect()
    assert len(cents) == 200


def test_ann_ivf_and_near_dup(spark):
    import random

    rng = random.Random(11)

    def vec():
        return [rng.uniform(-1, 1) for _ in range(16)]

    base = [vec() for _ in range(40)]
    rows = []
    vid = 0
    for b in base:
        rows.append((vid, b, f"l{vid % 3}"))
        vid += 1
        # a jittered near-duplicate of each base vector (high cosine)
        rows.append(
            (vid, [x + rng.uniform(-0.05, 0.05) for x in b], f"l{vid % 3}")
        )
        vid += 1
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )

    # ivf_topk: probing ALL cells must equal brute force exactly
    q = rows[4][1]
    exact = [
        (r["vec_id"], r["cosine"])
        for r in annsearch.brute_force_topk(e, q, 10).collect()
    ]
    ivf_all = [
        (r["vec_id"], r["cosine"])
        for r in annsearch.ivf_topk(e, q, k=10, nprobe=1 << 8).collect()
    ]
    assert ivf_all == exact
    # modest probing still finds the query vector itself first
    ivf = annsearch.ivf_topk(e, q, k=10, nprobe=16).collect()
    assert ivf[0]["vec_id"] == 4 and ivf[0]["cosine"] == 1.0

    # embedding_near_dup: banded candidates + exact cosine threshold
    got = annsearch.embedding_near_dup(
        e, threshold=0.9, n_bands=4, band_bits=4
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    # every reported pair truly has cosine >= 0.9 (exact filter)
    assert all(r["cosine"] >= 0.9 for r in got)
    # recall vs brute force: planted dup pairs (2i, 2i+1) mostly recovered —
    # a pair this similar agrees on most sign bits, so some band collides
    planted = {(2 * i, 2 * i + 1) for i in range(40)}
    truth = {
        (r["id_a"], r["id_b"])
        for r in annsearch.embedding_near_dup(
            e, threshold=0.9, n_bands=1, band_bits=0
        ).collect()
    }
    planted_true = planted & truth
    assert planted_true  # fixture sanity: jitter kept pairs above 0.9
    recall = len(pairs & planted_true) / len(planted_true)
    assert recall >= 0.8
    # precision is 1.0 by construction (exact cosine on candidates)
    assert pairs <= truth


def test_ivf_kmeans_beats_sign_buckets(spark):
    """Trained-centroid IVF (kmeans_cells): on clustered data, probing ONE
    trained cell recalls the brute-force top-k better than the
    data-oblivious sign buckets probing four cells; training is
    bit-deterministic (fixed init/iters, quantized means)."""
    import random

    rng = random.Random(5)
    # cluster structure lives in dims 8..15; dims 0..7 (the sign-LSH dims)
    # hover near zero, so jitter scatters each cluster across many sign
    # buckets — the regime where data-oblivious cells lose to trained ones
    centers = [
        [rng.uniform(-0.05, 0.05) for _ in range(8)]
        + [rng.uniform(-1, 1) for _ in range(8)]
        for _ in range(8)
    ]
    rows = [
        (vid, [x + rng.uniform(-0.15, 0.15) for x in centers[vid % 8]], "l")
        for vid in range(400)
    ]
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    q = rows[3][1]
    exact = {
        r["vec_id"] for r in annsearch.brute_force_topk(e, q, 20).collect()
    }

    km = annsearch.ivf_topk_kmeans(
        e, q, k=20, nprobe=1, k_cells=8, iters=4
    ).collect()
    r_km = len({r["vec_id"] for r in km} & exact) / len(exact)

    sg = annsearch.ivf_topk(e, q, k=20, nprobe=4).collect()
    r_sg = len({r["vec_id"] for r in sg} & exact) / len(exact)

    # trained cells recover the query's cluster with ONE probe...
    assert r_km >= 0.9
    assert km[0]["vec_id"] == 3 and km[0]["cosine"] == 1.0
    # ...and beat the sign-bucket baseline even when it probes 4 cells
    assert r_km > r_sg

    # determinism: identical centroids on a re-train over a reshuffled frame
    c1 = annsearch.kmeans_cells(e, k_cells=8, iters=4)
    c2 = annsearch.kmeans_cells(e.repartition(7), k_cells=8, iters=4)
    assert c1 == c2


def test_multimodal_plumbing(spark):
    media = multimodal.synth_media(spark, 30)
    feats = multimodal.decode_features(media).collect()
    assert len(feats) == 30
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[0]["n_bytes"] == 64
    assert len(by_id[0]["feature"]) == 8
    assert abs(sum(by_id[0]["feature"]) - 1.0) < 0.01  # histogram sums to ~1
    plan = multimodal.frame_sample_plan(media, every_n=10).collect()
    vids = [r for r in media.collect() if r["kind"] == "video"
            and int(r["meta"]["n_frames"]) > 0]
    assert len(plan) == sum(
        len(range(0, int(v["meta"]["n_frames"]), 10)) for v in vids
    )


def test_multimodal_resize(spark):
    media = multimodal.synth_media(spark, 12)
    t = multimodal.resize_thumbs(media, width=4, height=2).collect()
    by_id = {r["media_id"]: r for r in t}
    # only image rows (media_id % 3 == 0), every thumb exactly w*h bytes
    assert set(by_id) == {0, 3, 6, 9}
    assert all(len(r["thumb"]) == 8 for r in t)
    # nearest-neighbor stride of the deterministic payload
    pay = bytes(((3 * 131 + j * 17) % 256) for j in range(64 + 3))
    want = bytes(pay[(k * len(pay)) // 8] for k in range(8))
    assert bytes(by_id[3]["thumb"]) == want
    assert by_id[3]["n_bytes_in"] == 67


def test_corpus_lines(spark):
    d = spark.createDataFrame(
        [("http://a:80/", "line1\nline2\rline3")],
        "url_norm string, text string",
    )
    out = corpus_lines(d).collect()
    assert out[0]["value"] == "http://a:80/$$$line1line2line3"
    assert RECORDS_PER_FILE == 10_000


def test_dup_spans_brute_force(spark):
    """dup_spans vs a pure-Python ExactSubstr reference on constructed docs:
    window union + merged-span counts, within-doc repetition counted,
    short/empty docs degenerate to zero."""
    n = 3
    rows = [
        # doc 0 and 1 share the leading 5 tokens -> dup windows at 0..2
        (0, "alpha beta gamma delta epsilon zeta unique0 only0"),
        (1, "alpha beta gamma delta epsilon eta unique1 only1"),
        # doc 2: within-doc repetition of 'x y z' -> counts toward >=2
        (2, "x y z pad2a pad2b pad2c x y z tail2"),
        (3, "totally disjoint tokens here nothing shared anywhere"),
        (4, ""),
        (5, "a b"),  # shorter than n
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    # brute-force reference
    toks = {i: (t.split() if t.strip() else [""]) for i, t in rows}
    grams: dict[tuple, int] = {}
    for ts in toks.values():
        for p in range(max(0, len(ts) - n + 1)):
            g = tuple(ts[p:p + n])
            grams[g] = grams.get(g, 0) + 1
    expect = {}
    for i, ts in toks.items():
        pos = [
            p for p in range(max(0, len(ts) - n + 1))
            if grams[tuple(ts[p:p + n])] >= 2
        ]
        cover = set()
        for p in pos:
            cover.update(range(p, p + n))
        spans = 0
        prev = None
        for p in pos:
            if prev is None or p - prev > n:
                spans += 1
            prev = p
        expect[i] = (len(ts), spans, len(cover))

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_spans"], r["n_dup_tokens"])
        for r in textops.dup_spans(d, n=n).collect()
    }
    assert got == expect
    # sanity on the constructed fixture itself: dups exist where intended
    assert got[0][2] > 0 and got[1][2] > 0 and got[2][1] == 2
    assert got[3] == (7, 0, 0) and got[5] == (2, 0, 0)


def test_unigram_surprisal_reference(spark):
    """unigram_surprisal vs an independent Python reference with the same
    quantization contract (round(ln(N/cnt)*1e6) per distinct token, exact
    integer per-doc sums, floor-division mean)."""
    import math
    from collections import Counter

    rows = [
        (0, "a a b"),
        (1, "a c"),
        (2, "b b a"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    cnt = Counter(w for _, t in rows for w in t.split())
    n = sum(cnt.values())
    surp = {w: round(math.log(n / c) * 1_000_000) for w, c in cnt.items()}
    expect = {}
    for i, t in rows:
        toks = t.split()
        s = sum(surp[w] for w in toks)
        expect[i] = (len(toks), s, s // len(toks))

    got = {
        r["doc_id"]: (r["n_tokens"], r["sum_surp_q"], r["mean_surp_q"])
        for r in textops.unigram_surprisal(d).collect()
    }
    assert got == expect
    # rarer tokens -> higher mean surprisal: doc 1 holds the unique 'c'
    assert got[1][2] > got[0][2]


def test_semantic_dedup_planted(spark):
    """semantic_dedup drops planted exact-duplicate embeddings (cosine 1.0
    within the same cell) and keeps the min-id representative; vectors far
    from everything survive."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(8)]))
    # plant: 50 and 51 are exact copies of 0; 52 a copy of 1
    rows.append((50, list(rows[0][1])))
    rows.append((51, list(rows[0][1])))
    rows.append((52, list(rows[1][1])))
    d = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = {r["vec_id"]: r for r in annsearch.semantic_dedup(
        d, threshold=0.999, k_cells=4, iters=2
    ).collect()}
    assert len(out) == len(rows)
    # copies land in the originals' cells and are dropped; originals kept
    assert out[50]["cell"] == out[0]["cell"]
    assert not out[50]["is_kept"] and not out[51]["is_kept"]
    assert not out[52]["is_kept"]
    assert out[0]["is_kept"] and out[1]["is_kept"]
    # at 0.999 nothing else collides in 8-dim random space
    assert sum(not r["is_kept"] for r in out.values()) == 3


def test_bm25_search_python_reference(spark):
    """bm25_search vs an independent Python BM25 with the same
    quantization contract; ranking favors rare-term and short-doc hits."""
    import math

    rows = [
        (0, "apple banana apple cherry"),
        (1, "apple apple apple apple apple apple apple apple"),
        (2, "banana cherry durian"),
        (3, "durian durian"),
        (4, "plain words only here"),
    ]
    terms = ["apple", "durian"]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    toks = {i: t.split() for i, t in rows}
    n, sum_dl = len(rows), sum(len(v) for v in toks.values())
    avgdl = sum_dl / n
    df = {
        t: sum(1 for v in toks.values() if t in v) for t in terms
    }
    expect = {}
    for i, v in toks.items():
        s, hit = 0, 0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            hit += 1
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            raw = idf * (tf * 2.2) / (
                tf + 1.2 * (1.0 - 0.75 + 0.75 * len(v) / avgdl)
            )
            s += round(raw * 1_000_000)
        if hit:
            expect[i] = (hit, s)

    got = {
        r["doc_id"]: (r["n_terms_hit"], r["score_q"])
        for r in textops.bm25_search(d, terms, k=10).collect()
    }
    assert got == expect
    # doc 4 has no query terms -> absent
    assert 4 not in got
    # tf saturation + length normalization: the 8x-apple doc tops, the
    # short dense durian doc beats the mixed docs with tf=1 hits
    order = sorted(expect, key=lambda i: (-expect[i][1], i))
    assert order[:2] == [1, 3]


def test_ann_join_topk_self_retrieval_and_recall(spark):
    """ann_join_topk: every query drawn from the corpus retrieves ITSELF
    at rank 1 (its own cell is by construction its top-ranked probe), and
    probing all cells reproduces exact brute-force top-k."""
    import random

    rng = random.Random(13)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = e.filter(F.col("vec_id") % 30 == 0)  # 4 queries

    got = annsearch.ann_join_topk(
        e, qs, k=3, nprobe=2, k_cells=8, iters=2
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 30, 60, 90}
    for qid, rs in by_q.items():
        assert sorted(r["rank"] for r in rs) == [1, 2, 3]
        top = min(rs, key=lambda r: r["rank"])
        assert top["vec_id"] == qid and top["cosine"] == 1.0

    # nprobe = all cells ==> exact brute force (same rounding + tie rule)
    full = annsearch.ann_join_topk(
        e, qs, k=3, nprobe=8, k_cells=8, iters=2
    ).collect()
    vecs = {i: v for i, v in rows}

    def cos(a, b):
        import math
        d = sum(x * y for x, y in zip(a, b))
        return round(
            d / (math.sqrt(sum(x * x for x in a))
                 * math.sqrt(sum(y * y for y in b))), 6
        )

    for qid in (0, 30, 60, 90):
        want = sorted(
            ((cos(vecs[qid], v), i) for i, v in vecs.items()),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        got_q = sorted(
            ((r["cosine"], r["vec_id"]) for r in full
             if r["query_id"] == qid),
            key=lambda t: (-t[0], t[1]),
        )
        assert got_q == want, (qid, got_q, want)


def test_chunk_docs_reference(spark):
    """chunk_docs vs a plain-Python window reference: full coverage, exact
    overlap, short-tail and single-chunk edges; every token position is
    covered by at least one chunk."""
    import pytest

    rows = [
        (0, " ".join(f"t{i}" for i in range(10))),  # 10 toks
        (1, " ".join(f"t{i}" for i in range(4))),   # == chunk -> 1 chunk
        (2, "a b"),                                  # < chunk
        (3, " ".join(f"t{i}" for i in range(9))),   # exact stride multiple
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in textops.chunk_docs(d, chunk_tokens=4, overlap=1).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_tok"], r["n_tokens"], r["chunk_text"])
        )

    stride = 3
    for i, t in rows:
        toks = t.split()
        n = len(toks)
        n_chunks = 1 if n <= 4 else -(-(n - 4) // stride) + 1
        want = []
        for c in range(n_chunks):
            s = c * stride
            piece = toks[s : s + 4]
            want.append((c, s, len(piece), " ".join(piece)))
        assert sorted(got[i]) == want, (i, got[i], want)
        # coverage: every token index in some chunk
        covered = set()
        for c, s, k, _ in want:
            covered.update(range(s, s + k))
        assert covered == set(range(n))

    with pytest.raises(ValueError):
        textops.chunk_docs(d, chunk_tokens=4, overlap=4)


def test_normalize_text_reference(spark):
    """normalize_text vs a Python reference of the identical contract on
    constructed unicode docs."""
    import unicodedata

    rows = [
        (0, "plain ascii stays put"),
        (1, "compose café now"),            # NFC -> café
        (2, "“curly” ‘q’ — –  end"),
        (3, "zero​width‌‍﻿gone"),
        (4, "ctrl\x07\x00here\ttab\nkeeps"),
        (5, "cr\r\nlf and bare\rcr"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["norm_text"], r["was_changed"])
        for r in textops.normalize_text(d).collect()
    }

    def ref(t):
        import re
        t = unicodedata.normalize("NFC", t)
        t = t.replace("\r\n", "\n")
        t = re.sub("[\x00-\x08\x0b-\x1f\x7f]", "", t)
        t = re.sub("[​-‍﻿]", "", t)
        for a, b in (("‘", "'"), ("’", "'"), ("“", '"'),
                     ("”", '"'), ("–", "-"), ("—", "-"),
                     (" ", " ")):
            t = t.replace(a, b)
        return t

    for i, t in rows:
        assert got[i] == (ref(t), ref(t) != t), (i, repr(t), got[i])
    assert got[0] == ("plain ascii stays put", False)
    assert got[1][0] == "compose café now"
    assert got[2][0] == '"curly" \'q\' - -  end'
    assert got[3][0] == "zerowidthgone"
    assert got[4][0] == "ctrlhere\ttab\nkeeps"
    assert got[5][0] == "cr\nlf and barecr"


def test_assign_cells_join_path_equals_expression_path(spark):
    """The broadcast-join argmax (large-k_cells path) assigns every vector
    the SAME cell as the fused literal-expression path — forced A/B on
    identical centroids by toggling the threshold."""
    import random

    from sparkcrawl import annsearch as A

    rng = random.Random(21)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(150)
    ]
    d = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("_e"),
    )
    cents = [list(rows[i][1]) for i in range(20)]

    expr = {
        r["vec_id"]: r["cell"]
        for r in A.assign_cells(d, cents).collect()
    }
    orig = A.ASSIGN_JOIN_THRESHOLD
    try:
        A.ASSIGN_JOIN_THRESHOLD = 0  # force the join path
        join = {
            r["vec_id"]: r["cell"]
            for r in A.assign_cells(d, cents, id_col="vec_id").collect()
        }
    finally:
        A.ASSIGN_JOIN_THRESHOLD = orig
    assert join == expr and len(expr) == 150


def test_backoff_surprisal_reference(spark):
    """backoff_surprisal vs an independent Python Stupid-Backoff
    implementation with the same quantization contract; out-of-domain
    bigrams hit the backoff path, in-domain docs score lower."""
    import math
    from collections import Counter

    rows = [
        (0, "the cat sat on the mat", True),
        (1, "the cat ran on the mat", True),
        (2, "the cat sat on the mat", False),   # pure in-domain
        (3, "quantum flux melts the cat", False),  # OOV + unseen bigrams
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, is_target boolean"
    )
    Q, A = 1_000_000, 0.4

    train = [t.split() for _, t, tgt in rows if tgt]
    uni = Counter(w for ws in train for w in ws)
    big = Counter(
        (ws[i], ws[i + 1]) for ws in train for i in range(len(ws) - 1)
    )
    prevc = Counter(ws[i] for ws in train for i in range(len(ws) - 1))
    n, v = sum(uni.values()), len(uni) + 1

    def s_first(w):
        return round(-math.log((uni.get(w, 0) + 1) / (n + v)) * Q)

    def s_pair(p, w):
        if (p, w) in big:
            return round(-math.log(big[(p, w)] / prevc[p]) * Q), False
        return (
            round(-math.log(A * (uni.get(w, 0) + 1) / (n + v)) * Q),
            True,
        )

    expect = {}
    for i, t, _ in rows:
        ws = t.split()
        total, nb = s_first(ws[0]), 0
        for p, w in zip(ws, ws[1:]):
            s, b = s_pair(p, w)
            total += s
            nb += b
        expect[i] = (len(ws), nb, total, total // len(ws))

    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_backoff"], r["sum_surp_q"], r["mean_surp_q"]
        )
        for r in textops.backoff_surprisal(d).collect()
    }
    assert got == expect
    assert got[2][1] == 0                 # in-domain: no backoff
    assert got[3][1] >= 2                 # OOV doc: backoff fired
    assert got[3][3] > got[2][3]          # ...and scores noisier
