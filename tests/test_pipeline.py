"""Pipeline-layer unit tests: dedup, ANN, text analysis, multimodal
plumbing, streaming smoke."""

import pytest

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.pipeline.dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_signatures,
    simhash_signatures,
    token_jaccard_pairs,
)
from neo4j_graph_algorithms_spark.pipeline.ann import (
    cosine_knn_bruteforce,
    cosine_knn_lsh,
    sign_lsh_buckets,
)
from neo4j_graph_algorithms_spark.pipeline.text import (
    language_id,
    one_hot_lang,
    quality_scores,
    token_stats,
)
from neo4j_graph_algorithms_spark.pipeline.multimodal import (
    attach_metadata,
    extract_image_features,
    frame_sample,
)


def _docs(spark):
    rows = [
        (0, "the quick brown fox", "en"),
        (1, "the quick brown fox", "en"),      # exact dup of 0
        (2, "the quick brown foxes jumps", "en"),
        (3, "der schnelle braune fuchs und der hund", "de"),
        (4, "completely different words entirely unique", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_duplicates(spark):
    res = exact_duplicates(_docs(spark)).collect()
    groups = {r["min_doc_id"]: r["n_docs"] for r in res}
    assert groups[0] == 2  # docs 0,1 identical
    assert len(res) == 4


def test_minhash_identical_docs_same_signature(spark):
    sigs = {r["doc_id"]: (r["h0"], r["h1"], r["h2"], r["h3"])
            for r in minhash_signatures(_docs(spark)).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[4]


def test_minhash_lsh_catches_exact_dups(spark):
    cands = {(r["doc_a"], r["doc_b"])
             for r in minhash_lsh_candidates(_docs(spark)).collect()}
    assert (0, 1) in cands


def test_simhash_similar_docs_close(spark):
    sigs = {r["doc_id"]: r["simhash"]
            for r in simhash_signatures(_docs(spark)).collect()}
    assert sigs[0] == sigs[1]
    # hamming distance between near-dups smaller than to unrelated doc
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sigs[0], sigs[2]) <= ham(sigs[0], sigs[4]) + 2


def test_token_jaccard_pairs(spark):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in token_jaccard_pairs(_docs(spark), threshold=0.99).collect()}
    assert pairs == {(0, 1): 1.0}


def test_token_stats_and_quality(spark):
    stats = {r["doc_id"]: r for r in token_stats(_docs(spark)).collect()}
    assert stats[0]["n_tokens"] == 4
    assert stats[3]["n_tokens"] == 7
    assert stats[3]["n_distinct_tokens"] == 6  # 'der' twice
    q = {r["doc_id"]: r for r in quality_scores(_docs(spark)).collect()}
    assert 0 <= q[0]["quality"] <= 1


def test_language_id(spark):
    pred = {r["doc_id"]: r["pred_lang"]
            for r in language_id(_docs(spark)).collect()}
    assert pred[0] == "en"
    assert pred[3] == "de"


def test_one_hot(spark):
    row = {r["doc_id"]: r for r in one_hot_lang(_docs(spark)).collect()}
    assert row[3]["lang_de"] == 1 and row[3]["lang_en"] == 0


def _emb(spark, n=40, dim=8):
    import numpy as np

    rng = np.random.RandomState(3)
    rows = [(i, rng.randn(dim).astype("float32").tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_knn_bruteforce_matches_numpy(spark):
    import numpy as np

    emb = _emb(spark)
    got = cosine_knn_bruteforce(emb, n_queries=5, k=3).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    for q in range(5):
        sims = sorted(
            ((float(vecs[q] @ v / (np.linalg.norm(vecs[q]) * np.linalg.norm(v))), i)
             for i, v in vecs.items() if i != q),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        mine = sorted([r for r in got if r["query_id"] == q],
                      key=lambda r: r["rank"])
        assert [r["neighbor_id"] for r in mine] == [i for _, i in sims]


def test_lsh_buckets_and_ann(spark):
    emb = _emb(spark)
    buckets = sign_lsh_buckets(emb, n_bits=4)
    assert buckets.agg(F.sum("n_vecs")).first()[0] == 40
    res = cosine_knn_lsh(emb, k=3, n_bits=2)
    # every returned neighbor shares the query's bucket; ranks start at 1
    assert res.filter(F.col("rank") < 1).count() == 0


def test_multimodal_plumbing(spark):
    rows = [(i, bytes(range(0, 256)) * (i + 1)) for i in range(4)]
    df = spark.createDataFrame(rows, "item_id long, payload binary")
    meta = attach_metadata(df)
    m = meta.select("meta.n_bytes").collect()
    assert [r["n_bytes"] for r in m] == [256, 512, 768, 1024]
    feats = extract_image_features(df, fake=True).collect()
    assert all(len(r["features"]) == 16 for r in feats)
    assert all(abs(sum(r["features"]) - 1.0) < 1e-5 for r in feats)
    # real decode path raises from the workers
    with pytest.raises(Exception):
        extract_image_features(df, fake=False).collect()
    frames = frame_sample(df, every_n_bytes=256).groupBy("item_id").count()
    assert {r["item_id"]: r["count"] for r in frames.collect()} == \
        {0: 1, 1: 2, 2: 3, 3: 4}


def test_streaming_windowed_counts(spark, tmp_path):
    from neo4j_graph_algorithms_spark.streaming import run_stream_once

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events_dir = str(tmp_path / "events")
    src.write.parquet(events_dir)
    out = run_stream_once(spark, events_dir, query_name="t_ev")
    batch = (
        src.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert out.count() == batch.count()
    assert out.agg(F.sum("n")).first()[0] == src.count()
