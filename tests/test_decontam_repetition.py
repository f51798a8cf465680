"""repetition_scores + ngram_decontaminate: python-replay parity on
hand-built fixtures, edge cases (short docs, no overlap, full overlap),
and the custom-eval-set path."""

import hashlib

import pytest

from neo4j_graph_algorithms_spark.pipeline.decontam import (
    benchmark_sample, ngram_decontaminate,
)
from neo4j_graph_algorithms_spark.pipeline.text import repetition_scores


def _docs(spark, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")


def _py_repetition(text):
    toks = [t for t in text.split(" ") if t]
    bgs = [f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)]
    if not bgs:
        top = dup = 0.0
    else:
        counts = {}
        for b in bgs:
            counts[b] = counts.get(b, 0) + 1
        top = round(max(counts.values()) / len(bgs), 6)
        dup = round(sum(c for c in counts.values() if c > 1) / len(bgs), 6)
    best = run = 0
    prev = None
    for t in toks:
        run = run + 1 if t == prev else 1
        best = max(best, run)
        prev = t
    return top, dup, best


@pytest.mark.parametrize("text,exp_run", [
    ("a b c d", 1),
    ("a a a b b c", 3),
    ("spam spam spam spam", 4),
    ("x", 1),
    ("", 0),
    ("a b a b a b", 1),  # repeated bigram, no token run
])
def test_repetition_known_fixtures(spark, text, exp_run):
    out = repetition_scores(_docs(spark, [text])).collect()[0]
    top, dup, best = _py_repetition(text)
    assert out["max_token_run"] == exp_run == best
    assert out["top_bigram_frac"] == pytest.approx(top)
    assert out["dup_bigram_frac"] == pytest.approx(dup)


def test_repetition_python_replay_random(spark):
    import random

    rng = random.Random(11)
    vocab = ["a", "b", "c", "dd", "eee"]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))
             for _ in range(30)]
    got = {r["doc_id"]: r for r in
           repetition_scores(_docs(spark, texts)).collect()}
    for i, t in enumerate(texts):
        top, dup, best = _py_repetition(t)
        assert got[i]["top_bigram_frac"] == pytest.approx(top), i
        assert got[i]["dup_bigram_frac"] == pytest.approx(dup), i
        assert got[i]["max_token_run"] == best, i


def test_benchmark_sample_is_md5_order(spark):
    df = _docs(spark, [f"doc {i}" for i in range(12)])
    got = sorted(r["doc_id"] for r in
                 benchmark_sample(df, k=4).select("doc_id").collect())
    exp = sorted(sorted(range(12),
                        key=lambda i: (hashlib.md5(str(i).encode())
                                       .hexdigest(), i))[:4])
    assert got == exp


def test_decontaminate_with_explicit_eval(spark):
    corpus = _docs(spark, [
        "w1 w2 w3 w4 w5",        # 3 shingles, all hit -> 1.0
        "w1 w2 w3 zz yy xx",     # 4 shingles, 1 hit -> 0.25
        "aa bb cc dd",           # 2 shingles, 0 hit -> 0.0
        "q r",                   # too short: 0 shingles
    ])
    ev = spark.createDataFrame(
        [(100, "w1 w2 w3 w4 w5 w6", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    got = {r["doc_id"]: r for r in ngram_decontaminate(
        corpus, ev, n=3, threshold=0.2).collect()}
    assert len(got) == 4
    assert (got[0]["n_shingles"], got[0]["n_hit"]) == (3, 3)
    assert got[0]["overlap_frac"] == 1.0 and got[0]["contaminated"]
    assert (got[1]["n_shingles"], got[1]["n_hit"]) == (4, 1)
    assert got[1]["overlap_frac"] == 0.25 and got[1]["contaminated"]
    assert (got[2]["n_shingles"], got[2]["n_hit"]) == (2, 0)
    assert not got[2]["contaminated"]
    assert (got[3]["n_shingles"], got[3]["overlap_frac"]) == (0, 0.0)


def test_decontaminate_excludes_eval_docs_and_derives_default(spark):
    df = _docs(spark, [f"tok{i} tok{i+1} tok{i+2} tok{i+3}"
                       for i in range(30)])
    out = ngram_decontaminate(df, eval_k=5, threshold=0.2)
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    ev_ids = {r["doc_id"] for r in
              benchmark_sample(df, k=5).select("doc_id").collect()}
    assert len(ids) == 25 and not (ids & ev_ids)
    # overlapping token windows: doc i shares shingle "tok{i+1} .. tok{i+3}"
    # with doc i+1, so docs adjacent to an eval doc must show hits
    got = {r["doc_id"]: r["n_hit"] for r in out.collect()}
    for e in ev_ids:
        for nb in (e - 1, e + 1):
            if nb in got:
                assert got[nb] >= 1, (e, nb)
