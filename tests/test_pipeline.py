"""Pipeline-layer unit tests: dedup, ANN, text analysis, multimodal
plumbing, streaming smoke."""

import pytest

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.pipeline.dedup import (
    dedup_clusters,
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_signatures,
    simhash_signatures,
    token_jaccard_pairs,
)
from neo4j_graph_algorithms_spark.pipeline.ann import (
    cosine_knn_bruteforce,
    cosine_knn_lsh,
    embedding_near_dup,
    ivf_knn,
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


def test_dedup_clusters_canonical_and_singletons(spark):
    # pair graph: {0,1,2} transitively linked (0-1, 1-2), {5,6} linked,
    # 3 and 4 in no pair → singleton clusters
    docs = spark.createDataFrame(
        [(i, q) for i, q in [(0, 5.0), (1, 9.0), (2, 9.0),
                             (3, 1.0), (4, 2.0), (5, 7.0), (6, 3.0)]],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "doc_a long, doc_b long")
    out = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
           for r in dedup_clusters(docs, pairs, quality_col="quality").collect()}
    assert len(out) == 7
    # transitive cluster {0,1,2}: min-label 0; canonical = best quality
    # 9.0 tie between 1 and 2 → lowest doc_id (1) wins
    assert out[0] == (0, 0) and out[1] == (0, 1) and out[2] == (0, 0)
    assert out[5] == (5, 1) and out[6] == (5, 0)  # 7.0 > 3.0
    for s in (3, 4):  # singletons are their own canonical
        assert out[s] == (s, 1)
    # no quality column → lowest doc_id canonical everywhere
    out2 = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
            for r in dedup_clusters(docs, pairs).collect()}
    assert out2[0] == (0, 1) and out2[1] == (0, 0) and out2[5] == (5, 1)


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


def test_token_jaccard_hot_token_prune_bounds_candidates(spark):
    # 30 docs sharing one stopword-grade token; without the df prune the
    # inverted-index join yields C(30,2)=435 candidate rows from that
    # token alone — with df_cutoff the hot token never enters the join
    rows = [(i, f"common unique{i}a unique{i}b") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pruned = token_jaccard_pairs(docs, threshold=0.0, df_cutoff=10)
    assert pruned.count() == 0  # no pairs share a surviving token
    unpruned = token_jaccard_pairs(docs, threshold=0.0, df_cutoff=None)
    assert unpruned.count() == 435  # the blowup the prune prevents
    # prune also removes the token from the set sizes (Jaccard over the
    # PRUNED sets): two docs sharing 1-of-3 tokens with the shared one
    # pruned score nothing; sharing 2-of-3 with one pruned score 1/3
    rows2 = [(0, "hot a b"), (1, "hot a c")] + \
        [(i, "hot x" + str(i)) for i in range(2, 20)]
    docs2 = spark.createDataFrame(rows2, "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in token_jaccard_pairs(docs2, threshold=0.0,
                                        df_cutoff=5).collect()}
    assert got == {(0, 1): pytest.approx(1.0 / 3.0)}


def test_minhash_production_params_recall(spark):
    # planted near-dups: pairs with token-Jaccard ~0.8-0.9 must be
    # recalled by the 128-perm / 16-band LSH at rate >= 0.9
    rows = []
    for d in range(25):
        # doc 2d: 40 tokens; doc 2d+1: same but 4 swapped -> J = 36/44 ~ 0.82
        toks_a = [f"d{d}tok{i}" for i in range(40)]
        toks_b = toks_a[:36] + [f"d{d}alt{i}" for i in range(4)]
        rows.append((2 * d, " ".join(toks_a)))
        rows.append((2 * d + 1, " ".join(toks_b)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cands = {(r["doc_a"], r["doc_b"])
             for r in minhash_lsh_candidates(docs).collect()}
    hits = sum((2 * d, 2 * d + 1) in cands for d in range(25))
    assert hits / 25 >= 0.9


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


def test_embedding_near_dup_planted_pairs(spark):
    import numpy as np

    # 30 random vectors + 3 planted near-dup pairs (tiny perturbations)
    rng = np.random.RandomState(7)
    rows = [(i, rng.randn(8).astype("float32").tolist()) for i in range(30)]
    for j in range(3):
        base = np.array(rows[j][1], dtype=np.float64)
        near = base + rng.randn(8) * 0.01
        rows.append((100 + j, near.astype("float32").tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = embedding_near_dup(emb, threshold=0.95, n_bits=2).collect()
    found = {(r["vec_a"], r["vec_b"]) for r in got}
    # near-identical vectors land in the same sign bucket (2 bits →
    # high recall) and survive the exact cosine filter
    assert {(j, 100 + j) for j in range(3)} <= found
    assert all(r["sim"] >= 0.95 for r in got)
    # random non-planted pairs don't reach 0.95 in 8 dims
    assert found == {(j, 100 + j) for j in range(3)}


def test_ngram_jaccard_order_sensitivity(spark):
    from neo4j_graph_algorithms_spark.pipeline.dedup import token_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog tonight"
    shuffled = "dog the over quick lazy jumps brown tonight fox the"
    near = "the quick brown fox jumps over the lazy dog today"
    docs = spark.createDataFrame(
        [(0, base), (1, shuffled), (2, near), (3, "entirely different words here")],
        "doc_id long, text string",
    )
    # token sets of 0 and 1 are identical -> token jaccard 1.0
    tok = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in token_jaccard_pairs(docs, threshold=0.5).collect()}
    assert tok[(0, 1)] == 1.0
    # 3-gram shingles: shuffle destroys every window; near-dup keeps most
    tri = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in token_jaccard_pairs(docs, threshold=0.0, ngram=3).collect()}
    assert (0, 1) not in tri          # no shared shingle at all
    assert tri[(0, 2)] > 0.7          # 7 of 8 windows shared
    # short docs (< n tokens) produce no shingles and no pairs
    short = spark.createDataFrame([(0, "a b"), (1, "a b")],
                                  "doc_id long, text string")
    assert token_jaccard_pairs(short, threshold=0.0, ngram=3).count() == 0


def test_ivf_knn_degenerate_and_bounded(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    rows = [(i, rng.randn(8).astype("float32").tolist()) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # one cell, one probe -> exhaustive search == brute force exactly
    ivf1 = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
        for r in ivf_knn(emb, n_queries=6, k=4,
                         n_centroids=1, n_probe=1).collect())
    bf = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
        for r in cosine_knn_bruteforce(emb, n_queries=6, k=4).collect())
    assert ivf1 == bf
    # multi-cell: every query row obeys the contract; recall < 1 allowed
    res = ivf_knn(emb, n_queries=6, k=4, n_centroids=8, n_probe=2).collect()
    by_q = {}
    for r in res:
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["sim"]))
    for q, rs in by_q.items():
        rs.sort()
        assert [r for r, _ in rs] == list(range(1, len(rs) + 1))
        sims = [s for _, s in rs]
        assert sims == sorted(sims, reverse=True)
    # probing more cells can only add candidates: top-1 sim is monotone
    res_all = ivf_knn(emb, n_queries=6, k=4, n_centroids=8, n_probe=8).collect()
    top_all = {r["query_id"]: r["sim"] for r in res_all if r["rank"] == 1}
    top_2p = {r["query_id"]: r["sim"] for r in res if r["rank"] == 1}
    for q in top_2p:
        assert top_all[q] >= top_2p[q]


def test_simhash_near_dup_matches_exhaustive(spark):
    from neo4j_graph_algorithms_spark.pipeline.dedup import (
        simhash_near_dup, simhash_signatures)

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",   # near dup of 0
        "alpha beta gamma delta epsilon zeta eta theta",  # exact dup of 0
        "one two three four five six seven eight nine",
        "completely unrelated words in this document here",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in simhash_near_dup(docs, n_bits=16, max_hamming=3,
                                     n_bands=4).collect()}
    # exhaustive ground truth from the signatures themselves
    sigs = {r["doc_id"]: r["simhash"]
            for r in simhash_signatures(docs, n_bits=16).collect()}
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin((sigs[a] ^ sigs[b]) & 0xFFFF).count("1")
            if d <= 3:
                want[(a, b)] = d
    # pigeonhole completeness: banded == exhaustive, exactly
    assert got == want
    assert got[(0, 2)] == 0  # exact dup found at distance 0


def test_bpe_token_stats_vs_python(spark):
    import re

    from neo4j_graph_algorithms_spark.pipeline.text import (
        BPE_PATTERN, bpe_token_stats)

    texts = ["Hello, world! it's 42 degrees  x  e=mc2",
             "the the the", "", "a-b-c 12x7"]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got = {r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"],
                         r["n_distinct_bpe"])
           for r in bpe_token_stats(docs).collect()}
    for i, t in enumerate(texts):
        pieces = re.findall(BPE_PATTERN, t)
        ws = [x for x in t.split(" ") if x]
        assert got[i] == (len(ws), len(pieces), len(set(pieces))), t


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


def _make_bmp(w, h, seed):
    """Minimal uncompressed 24-bit bottom-up BMP."""
    import numpy as np

    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)  # RGB
    stride = ((w * 3 + 3) // 4) * 4
    body = bytearray()
    for row in px[::-1]:  # bottom-up
        line = row[:, ::-1].tobytes()  # RGB -> BGR
        body += line + b"\x00" * (stride - len(line))
    off = 14 + 40
    header = (b"BM" + (off + len(body)).to_bytes(4, "little") + b"\x00" * 4
              + off.to_bytes(4, "little"))
    dib = ((40).to_bytes(4, "little") + w.to_bytes(4, "little", signed=True)
           + h.to_bytes(4, "little", signed=True) + (1).to_bytes(2, "little")
           + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
           + len(body).to_bytes(4, "little") + b"\x00" * 16)
    return bytes(header + dib + body), px


def test_real_bmp_decode_through_kernel(spark):
    import numpy as np

    payloads, oracle = [], {}
    for i, (w, h) in enumerate([(5, 3), (7, 4), (16, 16)]):
        buf, px = _make_bmp(w, h, seed=i)
        payloads.append((i, buf))
        lum = (px[:, :, 0].astype(np.uint32) * 299
               + px[:, :, 1].astype(np.uint32) * 587
               + px[:, :, 2].astype(np.uint32) * 114) // 1000
        hist = np.bincount((lum >> 4).ravel(), minlength=16).astype(np.float64)
        oracle[i] = (w, h, hist / hist.sum())
    df = spark.createDataFrame(payloads, "item_id long, payload binary")
    got = {r["item_id"]: r
           for r in extract_image_features(df, fake=False).collect()}
    for i, (w, h, feats) in oracle.items():
        assert (got[i]["width"], got[i]["height"]) == (w, h)
        assert np.allclose(got[i]["features"], feats, atol=1e-6)


def test_resize_images_nearest_neighbor(spark):
    import numpy as np

    from neo4j_graph_algorithms_spark.pipeline.multimodal import (
        resize_images,
        resize_nn,
    )

    payloads, oracle = [], {}
    for i, (w, h) in enumerate([(10, 6), (3, 9), (16, 16)]):
        buf, px = _make_bmp(w, h, seed=20 + i)
        payloads.append((i, buf))
        oracle[i] = (w, h, resize_nn(px, 4, 4))
    df = spark.createDataFrame(payloads, "item_id long, payload binary")
    got = {r["item_id"]: r
           for r in resize_images(df, out_w=4, out_h=4).collect()}
    for i, (w, h, small) in oracle.items():
        r = got[i]
        assert (r["width"], r["height"]) == (w, h)
        assert (r["out_width"], r["out_height"]) == (4, 4)
        assert bytes(r["pixels"]) == small.tobytes()
    # identity resize reproduces the decoded image exactly
    buf, px = _make_bmp(5, 4, seed=31)
    df1 = spark.createDataFrame([(0, buf)], "item_id long, payload binary")
    r = resize_images(df1, out_w=5, out_h=4).first()
    assert bytes(r["pixels"]) == px.tobytes()
    # fake path runs the same plumbing for non-BMP payloads
    dfx = spark.createDataFrame(
        [(0, bytes(range(256)) * 8)], "item_id long, payload binary")
    rf = resize_images(dfx, out_w=2, out_h=2, fake=True).first()
    assert len(bytes(rf["pixels"])) == 2 * 2 * 3


def test_decode_bmp_roundtrip_and_unsupported():
    import numpy as np

    from neo4j_graph_algorithms_spark.pipeline.multimodal import decode_bmp

    buf, px = _make_bmp(6, 2, seed=9)
    w, h, decoded = decode_bmp(buf)
    assert (w, h) == (6, 2)
    assert np.array_equal(decoded, px)
    with pytest.raises(NotImplementedError):
        decode_bmp(b"\x89PNG" + b"\x00" * 60)


def _make_ppm(w, h, seed, gray=False, comment=False):
    """Minimal binary PPM (P6) / PGM (P5), optional header comment."""
    import numpy as np

    rng = np.random.RandomState(seed)
    if gray:
        px = rng.randint(0, 256, size=(h, w, 1), dtype=np.uint8)
        magic = b"P5"
        body = px.tobytes()
        rgb = np.repeat(px, 3, axis=2)
    else:
        rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        magic = b"P6"
        body = rgb.tobytes()
    cmt = b"# synthetic fixture\n" if comment else b""
    header = magic + b"\n" + cmt + f"{w} {h}\n255\n".encode()
    return header + body, rgb


def test_real_pnm_decode_through_kernel(spark):
    import numpy as np

    payloads, oracle = [], {}
    fixtures = [
        _make_ppm(6, 4, seed=1),                      # P6 plain
        _make_ppm(5, 7, seed=2, comment=True),        # P6 with comment
        _make_ppm(8, 3, seed=3, gray=True),           # P5 grayscale
    ]
    for i, (buf, rgb) in enumerate(fixtures):
        payloads.append((i, buf))
        lum = (rgb[:, :, 0].astype(np.uint32) * 299
               + rgb[:, :, 1].astype(np.uint32) * 587
               + rgb[:, :, 2].astype(np.uint32) * 114) // 1000
        hist = np.bincount((lum >> 4).ravel(), minlength=16).astype(np.float64)
        oracle[i] = (rgb.shape[1], rgb.shape[0], hist / hist.sum())
    df = spark.createDataFrame(payloads, "item_id long, payload binary")
    got = {r["item_id"]: r
           for r in extract_image_features(df, fake=False).collect()}
    for i, (w, h, feats) in oracle.items():
        assert (got[i]["width"], got[i]["height"]) == (w, h)
        assert np.allclose(got[i]["features"], feats, atol=1e-6)


def test_decode_pnm_roundtrip_and_dispatch():
    import numpy as np

    from neo4j_graph_algorithms_spark.pipeline.multimodal import (
        decode_image,
        decode_pnm,
    )

    buf, rgb = _make_ppm(4, 3, seed=5, comment=True)
    w, h, px = decode_pnm(buf)
    assert (w, h) == (4, 3)
    assert np.array_equal(px, rgb)
    # grayscale replicates channels
    gbuf, grgb = _make_ppm(3, 2, seed=6, gray=True)
    _, _, gpx = decode_pnm(gbuf)
    assert np.array_equal(gpx, grgb)
    # dispatcher routes by magic; unknown magic raises
    assert np.array_equal(decode_image(buf)[2], rgb)
    bbuf, bpx = _make_bmp(4, 2, seed=7)
    assert np.array_equal(decode_image(bbuf)[2], bpx)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG" + b"\x00" * 60)
    with pytest.raises(NotImplementedError):
        decode_pnm(b"P6\n2 2\n65535\n" + b"\x00" * 24)  # 16-bit maxval
    with pytest.raises(ValueError):
        decode_pnm(b"P6\n10 10\n255\n" + b"\x00" * 5)  # truncated


def _make_wav(n_frames, rate=8000, nch=1, seed=0):
    import io
    import wave

    import numpy as np

    rng = np.random.RandomState(seed)
    data = rng.randint(-32768, 32767,
                       size=(n_frames, nch)).astype("<i2")
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(data.tobytes())
    return bio.getvalue(), data


def test_extract_audio_features_wav(spark):
    import numpy as np

    from neo4j_graph_algorithms_spark.pipeline.multimodal import (
        decode_wav,
        extract_audio_features,
    )

    payloads, oracle = [], {}
    for i, (nf, rate, nch) in enumerate([(1600, 8000, 1), (800, 16000, 2)]):
        buf, data = _make_wav(nf, rate, nch, seed=40 + i)
        payloads.append((i, buf))
        oracle[i] = (data, rate, nch, nf)
    df = spark.createDataFrame(payloads, "item_id long, payload binary")
    got = {r["item_id"]: r for r in extract_audio_features(df).collect()}
    for i, (data, rate, nch, nf) in oracle.items():
        r = got[i]
        assert (r["n_channels"], r["sample_rate"], r["n_samples"]) == \
            (nch, rate, nf)
        assert abs(r["duration_sec"] - nf / rate) < 1e-9
        mono = data.astype(np.int64).sum(axis=1) // nch
        rms = float(np.sqrt(np.mean(mono.astype(np.float64) ** 2)))
        assert abs(r["rms"] - rms) < 1e-6
        assert abs(sum(r["features"]) - 1.0) < 1e-5
    # decode_wav round-trips the exact PCM samples
    buf, data = _make_wav(100, 8000, 2, seed=50)
    nch, rate, samples = decode_wav(buf)
    assert (nch, rate) == (2, 8000)
    assert np.array_equal(samples, data)
    # non-WAV payloads raise NotImplementedError (surfaced via Py4J)
    with pytest.raises(Exception, match="RIFF|NotImplemented"):
        extract_audio_features(
            spark.createDataFrame([(0, b"notawav" * 10)],
                                  "item_id long, payload binary")
        ).collect()


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    from neo4j_graph_algorithms_spark.streaming.events import (
        run_stateful_sessions_once,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events_dir = str(tmp_path / "ev_state")
    src.write.parquet(events_dir)
    closed = run_stateful_sessions_once(spark, events_dir).persist()
    # batch oracle: per-user session count via the lag-gap rule; the
    # stateful operator emits CLOSED sessions only, so per user it must
    # see (n_sessions - 1) rows, and every closed session respects the gap
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = (
        src.withColumn("_prev", F.lag("ts").over(w))
        .withColumn(
            "_new",
            (F.col("_prev").isNull()
             | (F.unix_timestamp("ts") - F.unix_timestamp("_prev") > 1800))
            .cast("int"))
        .groupBy("user_id").agg(F.sum("_new").alias("n_sessions"))
    )
    got = {r["user_id"]: r["cnt"] for r in
           closed.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
           .collect()}
    for r in batch.collect():
        assert got.get(r["user_id"], 0) == r["n_sessions"] - 1
    # every emitted session is internally gap-consistent and non-empty
    bad = closed.filter(
        (F.col("n_events") < 1)
        | (F.col("session_end") < F.col("session_start"))).count()
    assert bad == 0
    closed.unpersist()


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


# ---- deterministic sampling (pipeline/sampling.py) ----------------------

def _lang_docs(spark):
    rows = [(i, f"text {i}", ["en", "de", "fr"][i % 3]) for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_sample_documents_deterministic_and_rate(spark):
    from neo4j_graph_algorithms_spark.pipeline.sampling import sample_documents

    docs = _lang_docs(spark)
    a = {r["doc_id"] for r in sample_documents(docs, 0.5, seed=7).collect()}
    b = {r["doc_id"] for r in sample_documents(docs, 0.5, seed=7).collect()}
    assert a == b  # same rows every run
    assert 0.35 <= len(a) / 300 <= 0.65
    # different seed -> different (but overlapping) set
    c = {r["doc_id"] for r in sample_documents(docs, 0.5, seed=8).collect()}
    assert c != a
    # fraction monotonicity: the 0.25 sample is a subset of the 0.5 one
    d = {r["doc_id"] for r in sample_documents(docs, 0.25, seed=7).collect()}
    assert d <= a


def test_sample_documents_per_stratum_rates(spark):
    from neo4j_graph_algorithms_spark.pipeline.sampling import sample_documents

    docs = _lang_docs(spark)
    out = sample_documents(docs, by="lang",
                           fractions={"en": 0.2, "de": 0.8}).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], 0)
        by_lang[r["lang"]] += 1
    assert by_lang["fr"] == 100          # absent stratum keeps everything
    assert by_lang["de"] > by_lang["en"]
    assert 5 <= by_lang["en"] <= 40      # ~20 of 100
    import pytest as _pt
    with _pt.raises(ValueError):
        sample_documents(docs, fractions={"en": 0.5}).collect()
    with _pt.raises(ValueError):
        sample_documents(docs).collect()


def test_stratified_sample_exact_k(spark):
    from neo4j_graph_algorithms_spark.pipeline.sampling import (
        stratified_sample_exact,
    )

    docs = _lang_docs(spark)
    out = stratified_sample_exact(docs, 7, by="lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert {k: len(v) for k, v in by_lang.items()} == {
        "en": 7, "de": 7, "fr": 7}
    # deterministic
    out2 = stratified_sample_exact(docs, 7, by="lang").collect()
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in out2}
    # k > stratum size -> whole stratum
    small = docs.filter("doc_id < 5")
    assert stratified_sample_exact(small, 100, by="lang").count() == 5


def test_stratified_sample_prefilter_consistent(spark):
    from neo4j_graph_algorithms_spark.pipeline.sampling import (
        stratified_sample_exact,
    )

    docs = _lang_docs(spark)
    # the prefilter is itself deterministic, so the prefiltered variant
    # still returns exactly k per stratum and the same set every run
    pre = {r["doc_id"]
           for r in stratified_sample_exact(
               docs, 2, by="lang", prefilter_fraction=0.9).collect()}
    pre2 = {r["doc_id"]
            for r in stratified_sample_exact(
                docs, 2, by="lang", prefilter_fraction=0.9).collect()}
    assert pre == pre2 and len(pre) == 6
    # and every prefiltered pick is drawn from the prefilter survivors
    from neo4j_graph_algorithms_spark.pipeline.sampling import (
        sample_documents,
    )
    survivors = {r["doc_id"]
                 for r in sample_documents(docs, 0.9, seed=1).collect()}
    assert pre <= survivors


def test_ngram_lm_score_heldout_smoothing(spark):
    """Held-out train: every gram of the scored doc is UNSEEN, so each
    gets P = α/(α·V) = 1/V and cross_entropy = ln(V) exactly; a doc of
    pure training text must score strictly lower. Docs shorter than n
    chars are absent."""
    import math

    from neo4j_graph_algorithms_spark.pipeline.text import ngram_lm_score

    train = spark.createDataFrame(
        [(0, "abcabcabc")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "xyzxy"), (2, "abcabc"), (3, "ab")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           ngram_lm_score(docs, train=train).collect()}
    # train grams: abc, bca, cab -> continuations {a,b,c} -> V=3
    assert 3 not in out  # too short: no trigrams
    assert out[1]["n_ngrams"] == 3
    assert out[1]["cross_entropy"] == round(math.log(3.0), 6)
    assert out[2]["cross_entropy"] < out[1]["cross_entropy"]


def test_temperature_mix_flattens(spark):
    from neo4j_graph_algorithms_spark.pipeline.sampling import (
        temperature_mix,
    )

    rows = ([(i, f"t{i}", "en") for i in range(64)]
            + [(100 + i, f"t{i}", "sw") for i in range(4)])
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    # alpha=1 keeps natural proportions exactly -> everything survives
    assert temperature_mix(docs, by="lang", alpha=1.0).count() == 68
    # alpha=0.5: w = (8, 2); binding stratum sw (4/2=2 < 64/8=8)
    # -> k_en = floor(8*2) = 16, k_sw = floor(2*2) = 4
    out = temperature_mix(docs, by="lang", alpha=0.5)
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {"en": 16, "sw": 4}
    # deterministic survivor set
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in
         temperature_mix(docs, by="lang", alpha=0.5).collect()}
    assert a == b
    with pytest.raises(ValueError):
        temperature_mix(docs, alpha=0.0)


def test_duplicate_span_scores_cross_doc_only(spark):
    from neo4j_graph_algorithms_spark.pipeline.dedup import (
        duplicate_span_scores,
    )

    shared = "A" * 8  # one full k=8 chunk, shared verbatim
    docs = spark.createDataFrame(
        [
            (1, shared + "unique-1" + "B" * 8),   # chunks: shared, uniq, B*8
            (2, shared + "unique-2" + "zz"),      # shared, uniq (tail dropped)
            (3, "C" * 8 + "C" * 8),               # intra-doc repeat ONLY
            (4, "short"),                          # < k chars -> absent
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           duplicate_span_scores(docs, k=8).collect()}
    assert 4 not in out
    assert out[1]["n_chunks"] == 3 and out[1]["dup_chunks"] == 1
    assert out[1]["dup_frac"] == 0.333333
    assert out[2]["n_chunks"] == 2 and out[2]["dup_chunks"] == 1
    # intra-doc repetition alone must NOT count (countDistinct doc > 1)
    assert out[3]["dup_chunks"] == 0 and out[3]["dup_frac"] == 0.0


def test_keep_latest_per_key_with_tiebreak(spark):
    from neo4j_graph_algorithms_spark.pipeline.dedup import keep_latest

    rows = [
        ("u1", 1, "2024-01-01 00:00:00", "a"),
        ("u1", 2, "2024-01-02 00:00:00", "b"),   # latest for u1
        ("u2", 3, "2024-01-05 00:00:00", "c"),
        ("u2", 4, "2024-01-05 00:00:00", "d"),   # ts tie -> higher id wins
        ("u3", 5, "2024-01-03 00:00:00", "e"),
    ]
    df = spark.createDataFrame(
        rows, "url string, snap int, ts string, body string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["url"]: (r["snap"], r["body"]) for r in
           keep_latest(df, ["url"], "ts", tiebreak=["snap"]).collect()}
    assert got == {"u1": (2, "b"), "u2": (4, "d"), "u3": (5, "e")}


def test_containment_catches_nested_doc_jaccard_misses(spark):
    from neo4j_graph_algorithms_spark.pipeline.dedup import (
        containment_pairs,
        token_jaccard_pairs,
    )

    short = "alpha beta gamma delta"
    long_ = short + " " + " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, short), (2, long_), (3, "unrelated text entirely")],
        "doc_id long, text string")
    cont = {(r["doc_a"], r["doc_b"]): r["containment"] for r in
            containment_pairs(docs, threshold=0.9).collect()}
    assert cont == {(1, 2): 1.0}  # short fully nested in long
    jac = token_jaccard_pairs(docs, threshold=0.5).collect()
    assert jac == []              # Jaccard 4/44 — invisible to it


def test_lsh_recall_eval(spark):
    from neo4j_graph_algorithms_spark.pipeline.dedup import (
        lsh_recall_eval,
        minhash_lsh_candidates,
        token_jaccard_pairs,
    )

    rows = (
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(4)]
        + [(10 + i, f"unique text number {i} with words w{i} x{i}")
           for i in range(6)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = lsh_recall_eval(docs, threshold=0.8, n_hashes=4,
                          bands=2).collect()[0]
    truth = token_jaccard_pairs(docs, threshold=0.8)
    cand = minhash_lsh_candidates(docs, n_hashes=4, bands=2)
    nt, nc = truth.count(), cand.count()
    nh = truth.select("doc_a", "doc_b").join(
        cand, ["doc_a", "doc_b"]).count()
    assert (out.n_true, out.n_candidates, out.n_hit) == (nt, nc, nh)
    # the 4 identical docs: all 6 pairs are true AND candidates
    assert out.n_true >= 6 and out.n_hit >= 6
    assert out.recall == (1.0 if nt == 0 else round(nh / nt, 6))
    assert 0.0 <= out.candidate_precision <= 1.0


def test_lsh_recall_eval_empty_truth(spark):
    from neo4j_graph_algorithms_spark.pipeline.dedup import (
        lsh_recall_eval,
    )

    docs = spark.createDataFrame(
        [(i, f"totally distinct {i} {i*7} {i*13}") for i in range(5)],
        "doc_id long, text string")
    out = lsh_recall_eval(docs, threshold=0.9, n_hashes=4,
                          bands=2).collect()[0]
    assert out.n_true == 0 and out.recall == 1.0
