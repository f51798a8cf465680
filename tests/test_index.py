"""build_vocab / tfidf_top_terms / inverted_index: python-replay
parity, histogram-threshold equivalence, posting caps."""

import math
from collections import Counter

import pytest

from neo4j_graph_algorithms_spark.pipeline.index import (
    build_vocab, inverted_index, tfidf_top_terms,
)


def _docs(spark, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")


TEXTS = [
    "a b c a a",
    "b c d d",
    "a e e e e f",
    "c c c b",
    "",
]


def test_build_vocab_order_and_threshold(spark):
    df = _docs(spark, TEXTS)
    full = {r["token"]: (r["count"], r["token_id"])
            for r in build_vocab(df).collect()}
    counts = Counter(t for x in TEXTS for t in x.split(" ") if t)
    exp_order = sorted(counts, key=lambda t: (-counts[t], t))
    for i, t in enumerate(exp_order):
        assert full[t] == (counts[t], i), t
    # max_size path must equal the plain top-k prefix
    top3 = {r["token"]: r["token_id"]
            for r in build_vocab(df, max_size=3).collect()}
    assert top3 == {t: i for i, t in enumerate(exp_order[:3])}
    # min_count filter
    mc = {r["token"] for r in build_vocab(df, min_count=4).collect()}
    assert mc == {t for t, c in counts.items() if c >= 4}


def test_tfidf_python_replay(spark):
    df = _docs(spark, TEXTS)
    n = len(TEXTS)
    tf = Counter()
    for i, x in enumerate(TEXTS):
        for t in x.split(" "):
            if t:
                tf[(i, t)] += 1
    dfreq = Counter(t for (_, t) in tf)
    scored = [
        (i, t, c, dfreq[t], round(c * math.log(n / dfreq[t]), 9))
        for (i, t), c in tf.items()
    ]
    exp = {}
    for i in range(n):
        rows = sorted((r for r in scored if r[0] == i),
                      key=lambda r: (-r[4], r[1]))[:3]
        exp[i] = [(r[1], r[2], r[3], round(r[4], 6)) for r in rows]
    got = {}
    for r in tfidf_top_terms(df, k=3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["term"], r["tf"], r["df"], r["score"]))
    for i in exp:
        assert sorted(got.get(i, [])) == sorted(exp[i]), i
    assert 4 not in got  # empty doc has no terms


def test_inverted_index_cap_and_df(spark):
    df = _docs(spark, TEXTS)
    out = {r["token"]: r for r in inverted_index(
        df, max_postings=2).collect()}
    # 'c' appears in docs 0,1,3 → df=3, postings capped to [0,1]
    assert out["c"]["df"] == 3 and out["c"]["postings"] == [0, 1]
    assert out["e"]["df"] == 1 and out["e"]["postings"] == [2]
    assert out["a"]["df"] == 2 and out["a"]["postings"] == [0, 2]


def test_cooccurrence_pmi_python_replay(spark):
    import math
    from collections import Counter

    from neo4j_graph_algorithms_spark.pipeline.index import cooccurrence_pmi

    texts = ["a b a b c", "b c c", "a a a", "x"]
    got = {(r["term_a"], r["term_b"]): (r["n_pair"], r["pmi"]) for r in
           cooccurrence_pmi(_docs(spark, texts), window=2,
                            min_count=1).collect()}
    pairs = Counter()
    uni = Counter()
    for t in texts:
        toks = [x for x in t.split(" ") if x]
        uni.update(toks)
        for i in range(len(toks)):
            for j in range(i + 1, min(i + 2, len(toks) - 1) + 1):
                pairs[tuple(sorted((toks[i], toks[j])))] += 1
    np_, nt = sum(pairs.values()), sum(uni.values())
    assert set(got) == set(pairs)
    for (a, b), c in pairs.items():
        exp = math.log((c / np_) / ((uni[a] / nt) * (uni[b] / nt)))
        assert got[(a, b)][0] == c and got[(a, b)][1] == pytest.approx(exp)
    # min_count filter drops singletons
    got2 = {(r["term_a"], r["term_b"]) for r in
            cooccurrence_pmi(_docs(spark, texts), window=2,
                             min_count=2).collect()}
    assert got2 == {k for k, c in pairs.items() if c >= 2}
