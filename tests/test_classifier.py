"""Model-based quality filtering (pipeline/classifier.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.pipeline.classifier import (
    N_FEATURES,
    WSCALE,
    quality_classifier_score,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "alpha beta gamma delta"),
    (2, ""),                       # empty → sigmoid(bias)
    (3, "  spaced   out   words "),
    (4, "repeat repeat repeat repeat"),
]


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _pseudo_w(i: int) -> int:
    return (i * 2654435761 + 1013904223) % (2 * WSCALE) - WSCALE


def _toks(text: str):
    return [t for t in text.split(" ") if t]


def _expected(bias=0.0):
    import math

    out = {}
    for doc_id, text in DOCS:
        ts = _toks(text)
        n = len(ts)
        m = sum(_pseudo_w(_h8(t) % N_FEATURES) for t in ts)
        x = (m / (n * WSCALE) if n else 0.0) + bias
        out[doc_id] = (n, m, round(1.0 / (1.0 + math.exp(-x)), 9),
                       m >= -bias * n * WSCALE)
    return out


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_default_path_matches_python_replay(spark, docs):
    got = {r.doc_id: (r.n_tokens, r.margin_num, r.score, r.keep)
           for r in quality_classifier_score(docs).collect()}
    assert got == _expected()


def test_bias_shifts_scores_and_keep(spark, docs):
    got = {r.doc_id: (r.n_tokens, r.margin_num, r.score, r.keep)
           for r in quality_classifier_score(docs, bias=0.7).collect()}
    assert got == _expected(bias=0.7)
    # empty doc: sigmoid(0.7) > 0.5 → kept
    assert got[2][3] is True


def test_trained_weights_path(spark, docs):
    # a tiny "trained" model: weight only the features of 'alpha'/'beta'
    idxs = {t: _h8(t) % N_FEATURES for t in
            ["alpha", "beta", "the", "fox"]}
    w = {idxs["alpha"]: 0.5, idxs["beta"]: -0.25,
         idxs["the"]: 0.125, idxs["fox"]: 0.0625}
    wdf = spark.createDataFrame(list(w.items()), "idx long, w double")
    got = {r.doc_id: r for r in
           quality_classifier_score(docs, weights=wdf).collect()}
    import math

    for doc_id, text in DOCS:
        ts = _toks(text)
        n = len(ts)
        s = sum(w.get(_h8(t) % N_FEATURES, 0.0) for t in ts)
        mnum = round(s * WSCALE)
        x = mnum / (n * WSCALE) if n else 0.0
        r = got[doc_id]
        assert r.n_tokens == n
        assert r.margin_num == mnum, (doc_id, r.margin_num, mnum)
        assert r.score == pytest.approx(
            round(1.0 / (1.0 + math.exp(-x)), 9), abs=1e-9)


def test_default_path_is_map_only(spark, docs):
    plan = quality_classifier_score(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
