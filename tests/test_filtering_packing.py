"""pii_scrub / c4_quality_filter / mix_corpus / pack_sequences:
python-replay parity on hand-built fixtures plus the scale invariants
(shard-count independence of packing, exact mixture proportions)."""

import hashlib
import re

import pytest

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.pipeline.filtering import (
    EMAIL_RE, IPV4_RE, PHONE_RE, c4_quality_filter, pii_scrub,
)
from neo4j_graph_algorithms_spark.pipeline.packing import pack_sequences
from neo4j_graph_algorithms_spark.pipeline.sampling import mix_corpus


def _docs(spark, texts, sources=None):
    rows = [
        (i, t, "en", (sources or ["s"] * len(texts))[i], len(t))
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")


def test_pii_scrub_known(spark):
    texts = [
        "mail me at alice.smith+x@sub.example.co.uk today",
        "server 192.168.1.254 and 10.0.0.1 up",
        "call +1-555-123-4567 or +49-89-1234567 now",
        "mixed bob@ex.org at 8.8.8.8 tel +1-555-0000000",
        "nothing to scrub here 12345 plain",
    ]
    got = {r["doc_id"]: r for r in pii_scrub(_docs(spark, texts)).collect()}
    for i, t in enumerate(texts):
        s1 = re.sub(EMAIL_RE, "<EMAIL>", t)
        s2 = re.sub(IPV4_RE, "<IP>", s1)
        s3 = re.sub(PHONE_RE, "<PHONE>", s2)
        assert got[i]["clean_text"] == s3, i
        assert got[i]["n_emails"] == len(re.findall(EMAIL_RE, t)), i
        assert got[i]["n_ips"] == len(re.findall(IPV4_RE, s1)), i
        assert got[i]["n_phones"] == len(re.findall(PHONE_RE, s2)), i
    assert got[0]["n_emails"] == 1 and got[0]["clean_text"].count("<EMAIL>") == 1
    assert got[1]["n_ips"] == 2
    assert got[2]["n_phones"] == 2
    assert got[4]["clean_text"] == texts[4]


def test_c4_filter_rules(spark):
    texts = [
        " ".join(["ok"] * 10),                # too short
        " ".join(["ok"] * 40),                # keep
        " ".join(["ok"] * 39) + " dup",       # blocklisted
        " ".join(["extraordinarily"] * 40),   # mean word len too high
        "",                                   # empty
    ]
    got = {r["doc_id"]: r for r in c4_quality_filter(
        _docs(spark, texts), min_words=40, max_mean_word_len=4.5,
        blocklist=("dup", "slow")).collect()}
    assert [got[i]["keep"] for i in range(5)] == [
        False, True, False, False, False]
    assert got[2]["blocklist_hits"] == 1
    assert got[4]["n_words"] == 0 and got[4]["mean_word_len"] == 0.0
    assert got[1]["n_words"] == 40 and got[1]["mean_word_len"] == 2.0


def _hash20(doc_id, seed=0):
    h = hashlib.md5(f"{doc_id}#smp{seed}".encode()).hexdigest()[:8]
    return int(h, 16) % (1 << 20)


def test_mix_corpus_exact_proportions(spark):
    # 40 docs in a, 30 in b, 10 in c; targets 50/25/25 → binding
    # stratum is c: scale = 10/.25 = 40 → k = 20/10/10
    sources = ["a"] * 40 + ["b"] * 30 + ["c"] * 10
    df = _docs(spark, [f"t {i}" for i in range(80)], sources)
    out = mix_corpus(df, {"a": 0.5, "b": 0.25, "c": 0.25}, by="source")
    got = out.groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in got} == {
        "a": 20, "b": 10, "c": 10}
    # survivors = smallest sample hash per stratum (python replay)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    for src, k in [("a", 20), ("b", 10), ("c", 10)]:
        ids = [i for i, s in enumerate(sources) if s == src]
        exp = set(sorted(ids, key=lambda i: (_hash20(i), i))[:k])
        assert {i for i in kept if sources[i] == src} == exp, src


def test_mix_corpus_total_cap_and_drop(spark):
    sources = ["a"] * 40 + ["b"] * 30 + ["c"] * 10
    df = _docs(spark, [f"t {i}" for i in range(80)], sources)
    out = mix_corpus(df, {"a": 0.5, "b": 0.5}, by="source", total=20)
    got = {r["source"]: r["count"]
           for r in out.groupBy("source").count().collect()}
    assert got == {"a": 10, "b": 10}  # c dropped (share 0), cap binds
    with pytest.raises(ValueError):
        mix_corpus(df, {}, by="source")


def test_pack_sequences_python_replay_and_shard_invariance(spark):
    texts = ["w " * (i % 7) for i in range(50)]  # 0..6 tokens each
    df = _docs(spark, texts, None)
    budget = 10
    for shards in (1, 4, 32):
        got = {r["doc_id"]: r for r in pack_sequences(
            df, budget=budget, n_shards=shards).collect()}
        cum = 0
        for i, t in enumerate(texts):
            n = len([x for x in t.split(" ") if x])
            r = got[i]
            assert r["n_tokens"] == n, i
            assert r["start_chunk"] == cum // budget, (shards, i)
            end = (cum + n - 1) // budget if n > 0 else cum // budget
            assert r["end_chunk"] == end, (shards, i)
            assert r["offset_in_chunk"] == cum % budget, (shards, i)
            cum += n
    with pytest.raises(ValueError):
        pack_sequences(df, budget=0)


def test_pack_sequences_no_global_window(spark):
    # the cumsum window must be partitioned (by shard) — a global
    # Window.orderBy would serialize the whole corpus into one task
    df = _docs(spark, [f"a b c {i}" for i in range(20)], None)
    plan = pack_sequences(df, budget=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "partitionBy" not in plan  # sanity: plan string form
    for line in plan.splitlines():
        if "Window" in line:
            assert "_shard" in line, line


def test_weighted_sample_exact_properties(spark):
    """A-ES: deterministic, exact-k, weight-monotone inclusion (heavy
    rows win far more often across seeds), python-replay exact."""
    import hashlib
    import math

    from neo4j_graph_algorithms_spark.pipeline.sampling import (
        weighted_sample_exact,
    )

    rows = [(i, 100.0 if i < 10 else 1.0) for i in range(110)]
    docs = spark.createDataFrame(rows, "doc_id long, w double")

    def replay(seed, k):
        pris = {}
        for i, w in rows:
            h = int(hashlib.md5(
                f"{i}#wsmp{seed}".encode()).hexdigest()[:15], 16)
            u = (h + 1) / float(1 << 60)
            pris[i] = (round(math.log(u) / w, 12), -i)
        return {i for i, _ in
                sorted(pris.items(), key=lambda kv: (-kv[1][0], -kv[1][1]))
                [:k]}

    heavy_hits = 0
    for seed in range(6):
        got = {r.doc_id for r in
               weighted_sample_exact(docs, 20, weight_col="w",
                                     seed=seed).collect()}
        assert len(got) == 20
        assert got == replay(seed, 20), seed
        heavy_hits += len(got & set(range(10)))
    # heavy items (w=100) should be sampled almost always:
    # expected ~10 per seed; loose bound
    assert heavy_hits >= 0.8 * 6 * 10


def test_weighted_sample_stratified_and_zero_weight(spark):
    from neo4j_graph_algorithms_spark.pipeline.sampling import (
        weighted_sample_exact,
    )

    rows = [(i, float(i % 5 + 1) if i % 7 else 0.0, f"s{i % 2}")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, w double, g string")
    out = weighted_sample_exact(docs, 5, weight_col="w", by="g",
                                seed=1).collect()
    per = {}
    for r in out:
        per.setdefault(r.g, []).append(r.doc_id)
        assert r.w > 0           # zero-weight rows excluded
    assert all(len(v) == 5 for v in per.values())
