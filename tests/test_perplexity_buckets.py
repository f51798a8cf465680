"""CCNet head/middle/tail perplexity bucketing (pipeline/text.py)."""

import numpy as np

from neo4j_graph_algorithms_spark.pipeline.text import (
    ngram_lm_score,
    perplexity_buckets,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, "
                                       "text string")


def test_terciles_per_language(spark):
    # 9 docs per lang with clearly separable scores; each tercile gets 3
    rows = []
    for li, lang in enumerate(["en", "de"]):
        for i in range(9):
            # cleaner docs repeat common trigrams; noisier docs vary
            base = "abcabcabc" * (10 - i) + "".join(
                chr(100 + ((i * 7 + j + 13 * li) % 20)) for j in range(i * 6))
            rows.append((li * 9 + i, lang, base))
    docs = _docs(spark, rows)
    out = perplexity_buckets(docs).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        counts = {"head": 0, "middle": 0, "tail": 0}
        for r in rs:
            counts[r.bucket] += 1
        assert counts == {"head": 3, "middle": 3, "tail": 3}, (lang, counts)
        # head scores <= middle <= tail
        h = max(r.cross_entropy for r in rs if r.bucket == "head")
        m = [r.cross_entropy for r in rs if r.bucket == "middle"]
        t = min(r.cross_entropy for r in rs if r.bucket == "tail")
        assert h <= min(m) and max(m) <= t


def test_thresholds_match_numpy_quantiles(spark):
    rows = [(i, "en", "xyzw" * (i + 2) + "q" * i) for i in range(12)]
    docs = _docs(spark, rows)
    scores = {r.doc_id: r.cross_entropy
              for r in ngram_lm_score(docs).collect()}
    vals = np.array([scores[i] for i in range(12)])
    t1 = round(float(np.quantile(vals, 1 / 3)), 6)
    t2 = round(float(np.quantile(vals, 2 / 3)), 6)
    out = {r.doc_id: r.bucket for r in perplexity_buckets(docs).collect()}
    for i in range(12):
        want = ("head" if scores[i] <= t1
                else "middle" if scores[i] <= t2 else "tail")
        assert out[i] == want, (i, scores[i], t1, t2, out[i])


def test_train_corpus_scoring(spark):
    train = _docs(spark, [(100, "en", "the cat sat on the mat " * 5)])
    docs = _docs(spark, [
        (0, "en", "the cat sat on the mat"),
        (1, "en", "zq jx vw kp fh dn"),
    ])
    out = {r.doc_id: r.cross_entropy
           for r in perplexity_buckets(docs, train=train).collect()}
    # in-distribution text scores lower cross-entropy than gibberish
    assert out[0] < out[1]
