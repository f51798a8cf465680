"""BPE merge training vs the classic in-memory algorithm
(pipeline/bpe.py vs Sennrich et al. 2016 reference procedure)."""

from collections import Counter

from neo4j_graph_algorithms_spark.pipeline.bpe import bpe_train


def _ref_bpe(texts, n_merges):
    """Textbook BPE: vocab of symbol tuples × freq; per round count
    adjacent pairs, merge argmax (count desc, pair asc) left-to-right
    non-overlapping."""
    wf = Counter(w for t in texts for w in t.split() if w)
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in wf.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += f
        if not pairs:
            break
        (left, right), cnt = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, left, right, left + right, cnt))
        new_vocab = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == left
                        and sym[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def _spark_bpe(spark, texts, n_merges):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    return [(r.merge_rank, r.left, r.right, r.merged, r.pair_count)
            for r in bpe_train(docs, n_merges=n_merges)
            .orderBy("merge_rank").collect()]


def test_textbook_corpus(spark):
    # the Sennrich paper's canonical low/lower/newest/widest example
    texts = ["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3]
    want = _ref_bpe(texts, 8)
    got = _spark_bpe(spark, texts, 8)
    assert got == want


def test_repeated_chars_nonoverlap(spark):
    # runs of identical symbols: non-overlapping left-to-right merge
    texts = ["aaaa aaa aaaaaa baab"]
    want = _ref_bpe(texts, 6)
    got = _spark_bpe(spark, texts, 6)
    assert got == want


def test_multi_doc_weighting(spark):
    texts = ["the cat sat", "the mat", "the the the"]
    want = _ref_bpe(texts, 10)
    got = _spark_bpe(spark, texts, 10)
    assert got == want


def test_early_stop_degenerate(spark):
    # single 1-char word: after merging (x, </w>) no pairs remain
    got = _spark_bpe(spark, ["x"], 5)
    assert got == [(1, "x", "</w>", "x</w>", 1)]


def test_sentinel_stripped(spark):
    got = _spark_bpe(spark, ["a|b a|b"], 1)
    # '|' removed -> word 'ab'
    assert got[0][1:3] == ("a", "b") and got[0][4] == 2


def test_encode_matches_ref_token_counts(spark):
    from neo4j_graph_algorithms_spark.pipeline.bpe import (
        bpe_encode,
        bpe_train,
    )

    texts = ["low lower lowest", "new newer newest", "low new"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges = bpe_train(docs, n_merges=5)
    got = {r.doc_id: (r.n_words, r.n_tokens)
           for r in bpe_encode(docs, merges).collect()}

    # reference: apply the same merges left-to-right per word
    pairs = [(r.left, r.right) for r in
             merges.orderBy("merge_rank").collect()]

    def enc(word):
        sym = list(word) + ["</w>"]
        for l_, r_ in pairs:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l_ and sym[i + 1] == r_:
                    out.append(l_ + r_)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return len(sym)

    for i, t in enumerate(texts):
        ws = [w for w in t.split() if w]
        assert got[i] == (len(ws), sum(enc(w) for w in ws))


def test_encode_empty_doc_and_list_merges(spark):
    from neo4j_graph_algorithms_spark.pipeline.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(0, "ab ab"), (1, "")], "doc_id long, text string")
    got = {r.doc_id: (r.n_words, r.n_tokens)
           for r in bpe_encode(docs, [("a", "b"), ("ab", "</w>")])
           .collect()}
    assert got[0] == (2, 2)   # 'ab' -> [ab</w>]
    assert got[1] == (0, 0)
