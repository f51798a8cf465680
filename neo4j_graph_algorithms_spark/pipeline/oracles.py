"""DuckDB oracle SQL for the pipeline operators.

Each statement reproduces its Spark counterpart **bit-for-bit**: the
same whitespace tokenizer, the same md5-derived integer hashes, the same
formulas with the same operand order, the same rounding. Keep in sync
with dedup.py / text.py / ann.py.
"""

from __future__ import annotations

from neo4j_graph_algorithms_spark.pipeline.dedup import MERSENNE31, perm_consts
from neo4j_graph_algorithms_spark.pipeline.text import LANGS, LANG_PROFILES, STOPWORDS

_TOKS = (
    "toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), "
    "x -> x <> '')) AS tok FROM documents)"
)

# mirrors dedup._h8 + dedup._perm_col: one 32-bit md5 base hash per
# token, n universal-hash permutations (a_k·h + b_k) mod (2^31−1)
_HASHED = (
    "hashed AS (SELECT doc_id, "
    "('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks)"
)


def _h15(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def _perm_sql(k: int) -> str:
    a, b = perm_consts(k)
    return f"({a} * h + {b}) % {MERSENNE31}"


def _sql_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def kmeans_unrolled_cte(k: int, iterations: int) -> str:
    """CTE chain replaying kmeans.kmeans_fit(k, iterations) verbatim:
    md5-sample init (c0), per-iteration argmin assignment (a{i}, ties
    to the smaller centroid id — identical comparator to the Spark
    fold's, list_distance being the monotone sqrt of its dist2) and
    9-dp-rounded mean update with empty-cluster carryover (c{i}), then
    the final assignment af against c{iterations}. Ends with ``af``
    exposing (id, v, cell, dist)."""
    parts = [
        "nb AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v "
        "FROM embeddings)",
        "c0 AS (SELECT CAST(row_number() OVER (ORDER BY m, id) - 1 "
        "AS BIGINT) AS cid, v AS cv FROM "
        "(SELECT id, v, md5(CAST(id AS VARCHAR)) AS m FROM nb "
        f"ORDER BY m, id LIMIT {k}))",
    ]

    def assign(name: str, cents: str) -> list[str]:
        return [
            f"d_{name} AS (SELECT nb.id, nb.v, c.cid, "
            f"list_distance(nb.v, c.cv) AS dist "
            f"FROM nb CROSS JOIN {cents} c)",
            f"{name} AS (SELECT id, v, cid AS cell, dist FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY id "
            f"ORDER BY dist ASC, cid ASC) AS rn FROM d_{name}) "
            f"WHERE rn = 1)",
        ]

    for i in range(1, iterations + 1):
        parts += assign(f"a{i}", f"c{i-1}")
        parts += [
            # unnest(range(...)) fans each vector out to (cell,pos,val);
            # avg is grouped exactly like the Spark posexplode+avg
            f"m{i} AS (SELECT cell, ord, round(avg(v[ord]), 9) AS mu "
            f"FROM (SELECT cell, v, unnest(range(1, len(v) + 1)) AS ord "
            f"FROM a{i}) GROUP BY cell, ord)",
            f"cm{i} AS (SELECT cell AS cid, list(mu ORDER BY ord) AS cv "
            f"FROM m{i} GROUP BY cell)",
            f"c{i} AS (SELECT p.cid, coalesce(cm.cv, p.cv) AS cv "
            f"FROM c{i-1} p LEFT JOIN cm{i} cm ON cm.cid = p.cid)",
        ]
    parts += assign("af", f"c{iterations}")
    return ",\n".join(parts)


def pipeline_oracles() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["exact_dedup"] = """
        SELECT md5(text) AS fingerprint, count(*) AS n_docs,
               min(doc_id) AS min_doc_id
        FROM documents GROUP BY 1
    """

    minhash_aggs = ", ".join(
        f"min({_perm_sql(k)}) AS h{k}" for k in range(4)
    )
    sql["minhash_signatures"] = f"""
        WITH {_TOKS}, {_HASHED}
        SELECT doc_id, {minhash_aggs}
        FROM hashed GROUP BY doc_id
    """

    sql["minhash_lsh_candidates"] = f"""
        WITH {_TOKS}, {_HASHED},
        sigs AS (SELECT doc_id, {minhash_aggs} FROM hashed GROUP BY doc_id),
        c1 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sigs a
               JOIN sigs b ON a.h0 = b.h0 AND a.h1 = b.h1 AND a.doc_id < b.doc_id),
        c2 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sigs a
               JOIN sigs b ON a.h2 = b.h2 AND a.h3 = b.h3 AND a.doc_id < b.doc_id)
        SELECT DISTINCT doc_a, doc_b FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2)
    """
    # streaming maintenance must converge to the batch answer
    sql["streaming_near_dup"] = sql["minhash_lsh_candidates"]

    # mirrors dedup.simhash_signatures(n_bits=16): one salted 60-bit
    # hash per 16-bit block — block 0 salt '#s0'
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(16)
    )
    sig_expr = " + ".join(
        f"CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(16)
    )
    # mirrors dedup.dedup_clusters over minhash_lsh_candidates(4, 2):
    # pairs → min-label connected components (recursive CTE) → canonical
    # = highest whitespace-token count, ties lowest doc_id. Docs in no
    # pair are singleton clusters (seeded by the non-recursive branch).
    sql["dedup_clusters"] = f"""
        WITH RECURSIVE {_TOKS}, {_HASHED},
        sigs AS (SELECT doc_id, {minhash_aggs} FROM hashed GROUP BY doc_id),
        c1 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sigs a
               JOIN sigs b ON a.h0 = b.h0 AND a.h1 = b.h1 AND a.doc_id < b.doc_id),
        c2 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sigs a
               JOIN sigs b ON a.h2 = b.h2 AND a.h3 = b.h3 AND a.doc_id < b.doc_id),
        cand AS (SELECT DISTINCT doc_a, doc_b
                 FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2)),
        sym AS (SELECT doc_a AS s, doc_b AS d FROM cand
                UNION SELECT doc_b, doc_a FROM cand),
        r(id, lab) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT sym.d, r.lab FROM r JOIN sym ON sym.s = r.id AND sym.d <> r.lab
        ),
        comp AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM r GROUP BY id),
        q AS (SELECT doc_id,
                     len(list_filter(string_split(text, ' '), x -> x <> '')) AS n
              FROM documents),
        ranked AS (SELECT comp.cluster_id, comp.doc_id,
                          row_number() OVER (PARTITION BY comp.cluster_id
                                             ORDER BY q.n DESC, comp.doc_id) AS rn
                   FROM comp JOIN q USING (doc_id)),
        canon AS (SELECT cluster_id, doc_id AS c FROM ranked WHERE rn = 1)
        SELECT comp.doc_id AS doc_id, comp.cluster_id AS cluster_id,
               CAST(comp.doc_id = canon.c AS INTEGER) AS is_canonical
        FROM comp JOIN canon USING (cluster_id)
    """

    sql["simhash_signatures"] = f"""
        WITH {_TOKS},
        hashed AS (SELECT doc_id, {_h15("tok || '#s0'")} AS h FROM toks),
        sums AS (SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id)
        SELECT doc_id, CAST({sig_expr} AS BIGINT) AS simhash FROM sums
    """

    # mirrors dedup.simhash_near_dup(n_bits=16, max_hamming=3): with
    # n_bands = max_hamming+1 the banded join is pigeonhole-complete,
    # so the oracle computes the mathematically-equal exhaustive
    # popcount(xor) filter over all pairs
    sql["simhash_near_dup"] = f"""
        WITH {_TOKS},
        hashed AS (SELECT doc_id, {_h15("tok || '#s0'")} AS h FROM toks),
        sums AS (SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id),
        sig AS (SELECT doc_id, CAST({sig_expr} AS BIGINT) AS simhash FROM sums)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """

    # mirrors dedup.ensemble_dedup_clusters(n_hashes=4, bands=2,
    # simhash_bits=16, max_hamming=3): candidate pairs = exact-text
    # STAR edges (group-min ↔ member) ∪ minhash-LSH bands ∪ exhaustive
    # simhash Hamming (= the pigeonhole-complete banded join), then the
    # same min-label WCC + quality-ranked canonical as dedup_clusters
    sql["ensemble_dedup"] = f"""
        WITH RECURSIVE {_TOKS}, {_HASHED},
        sigs AS (SELECT doc_id, {minhash_aggs} FROM hashed GROUP BY doc_id),
        c1 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sigs a
               JOIN sigs b ON a.h0 = b.h0 AND a.h1 = b.h1 AND a.doc_id < b.doc_id),
        c2 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sigs a
               JOIN sigs b ON a.h2 = b.h2 AND a.h3 = b.h3 AND a.doc_id < b.doc_id),
        sh_hashed AS (SELECT doc_id, {_h15("tok || '#s0'")} AS h FROM toks),
        sh_sums AS (SELECT doc_id, {bit_sums} FROM sh_hashed GROUP BY doc_id),
        sh_sig AS (SELECT doc_id, CAST({sig_expr} AS BIGINT) AS simhash
                   FROM sh_sums),
        sh AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM sh_sig a JOIN sh_sig b ON a.doc_id < b.doc_id
               WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
        fp AS (SELECT doc_id, md5(text) AS f FROM documents),
        fmin AS (SELECT f, min(doc_id) AS m FROM fp GROUP BY f),
        ex AS (SELECT fmin.m AS doc_a, fp.doc_id AS doc_b
               FROM fp JOIN fmin USING (f) WHERE fp.doc_id <> fmin.m),
        cand AS (SELECT DISTINCT doc_a, doc_b FROM (
                 SELECT * FROM ex UNION ALL SELECT * FROM c1
                 UNION ALL SELECT * FROM c2 UNION ALL SELECT * FROM sh)),
        sym AS (SELECT doc_a AS s, doc_b AS d FROM cand
                UNION SELECT doc_b, doc_a FROM cand),
        r(id, lab) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT sym.d, r.lab FROM r JOIN sym ON sym.s = r.id AND sym.d <> r.lab
        ),
        comp AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM r GROUP BY id),
        q AS (SELECT doc_id,
                     len(list_filter(string_split(text, ' '), x -> x <> '')) AS n
              FROM documents),
        ranked AS (SELECT comp.cluster_id, comp.doc_id,
                          row_number() OVER (PARTITION BY comp.cluster_id
                                             ORDER BY q.n DESC, comp.doc_id) AS rn
                   FROM comp JOIN q USING (doc_id)),
        canon AS (SELECT cluster_id, doc_id AS c FROM ranked WHERE rn = 1)
        SELECT comp.doc_id AS doc_id, comp.cluster_id AS cluster_id,
               CAST(comp.doc_id = canon.c AS INTEGER) AS is_canonical
        FROM comp JOIN canon USING (cluster_id)
    """

    # mirrors text.bpe_token_stats: whitespace words + BPE-ish regex
    # pieces (leftmost-first alternation — identical in RE2 and Java)
    sql["bpe_token_stats"] = r"""
        WITH e AS (SELECT doc_id,
                          regexp_extract_all(text,
                              ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+') AS bpe,
                          list_filter(string_split(text, ' '),
                                      x -> x <> '') AS ws
                   FROM documents)
        SELECT doc_id,
               CAST(len(ws) AS INTEGER) AS n_ws_tokens,
               CAST(len(bpe) AS INTEGER) AS n_bpe_tokens,
               CAST(len(list_distinct(bpe)) AS INTEGER) AS n_distinct_bpe
        FROM e
    """

    # mirrors dedup.token_jaccard_pairs(df_cutoff=1000): hot tokens
    # (document frequency > 1000) dropped before sizes AND the join
    sql["token_jaccard_pairs"] = f"""
        WITH {_TOKS},
        dt0 AS (SELECT DISTINCT doc_id, tok FROM toks),
        rare AS (SELECT tok FROM dt0 GROUP BY tok HAVING count(*) <= 1000),
        dt AS (SELECT doc_id, dt0.tok FROM dt0 JOIN rare ON rare.tok = dt0.tok),
        sizes AS (SELECT doc_id, count(*) AS n FROM dt GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                  FROM dt a JOIN dt b ON a.tok = b.tok AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        j AS (SELECT i.doc_a, i.doc_b,
                     round(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 6) AS jaccard
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.doc_a
              JOIN sizes sb ON sb.doc_id = i.doc_b)
        SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.8
    """

    # mirrors dedup.containment_pairs(df_cutoff=1000, threshold=0.8):
    # same pruned posting self-join, score = i / least(na, nb)
    sql["containment_pairs"] = f"""
        WITH {_TOKS},
        dt0 AS (SELECT DISTINCT doc_id, tok FROM toks),
        rare AS (SELECT tok FROM dt0 GROUP BY tok HAVING count(*) <= 1000),
        dt AS (SELECT doc_id, dt0.tok FROM dt0 JOIN rare ON rare.tok = dt0.tok),
        sizes AS (SELECT doc_id, count(*) AS n FROM dt GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                  FROM dt a JOIN dt b ON a.tok = b.tok AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        c AS (SELECT i.doc_a, i.doc_b,
                     round(CAST(i.i AS DOUBLE) / least(sa.n, sb.n), 6)
                       AS containment
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.doc_a
              JOIN sizes sb ON sb.doc_id = i.doc_b)
        SELECT doc_a, doc_b, containment FROM c WHERE containment >= 0.8
    """

    # mirrors dedup.token_jaccard_pairs(ngram=3, threshold=0.8): unit =
    # word 3-gram shingles (contiguous, space-joined), same df prune
    sql["ngram_jaccard_pairs"] = """
        WITH tl AS (SELECT doc_id,
                           list_filter(string_split(text, ' '), x -> x <> '') AS t
                    FROM documents),
        sh AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 3
                   THEN list_transform(range(1, len(t) - 1),
                                       i -> array_to_string(t[i:i+2], ' '))
                   ELSE CAST([] AS VARCHAR[]) END) AS tok FROM tl),
        dt0 AS (SELECT DISTINCT doc_id, tok FROM sh),
        rare AS (SELECT tok FROM dt0 GROUP BY tok HAVING count(*) <= 1000),
        dt AS (SELECT doc_id, dt0.tok FROM dt0 JOIN rare ON rare.tok = dt0.tok),
        sizes AS (SELECT doc_id, count(*) AS n FROM dt GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                  FROM dt a JOIN dt b ON a.tok = b.tok AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        j AS (SELECT i.doc_a, i.doc_b,
                     round(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 6) AS jaccard
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.doc_a
              JOIN sizes sb ON sb.doc_id = i.doc_b)
        SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.8
    """

    # mirrors ann.ivf_knn(n_queries=20, k=5, n_centroids=16, n_probe=4):
    # identical centroid sample (md5-ordered), assignment and probe
    # ranking (cosine desc, cent_id asc), rerank (sim desc, id asc)
    sql["ivf_knn"] = """
        WITH base AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        nb AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS n FROM base),
        cents AS (SELECT id AS cent_id, v AS cv, n AS cn FROM nb
                  ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT 16),
        ca AS (SELECT nb.id, nb.v, nb.n, c.cent_id,
                      list_dot_product(nb.v, c.cv) / (nb.n * c.cn) AS cs
               FROM nb CROSS JOIN cents c),
        ar AS (SELECT *, row_number() OVER (PARTITION BY id
                        ORDER BY cs DESC, cent_id ASC) AS _ar FROM ca),
        assigned AS (SELECT cent_id AS cell, id, v, n FROM ar WHERE _ar = 1),
        probes AS (SELECT cent_id AS cell, id AS query_id, v AS qv, n AS qn
                   FROM ar WHERE id < 20 AND _ar <= 4),
        sims AS (SELECT p.query_id, a.id AS neighbor_id,
                        list_dot_product(p.qv, a.v) / (p.qn * a.n) AS s
                 FROM assigned a JOIN probes p
                   ON a.cell = p.cell AND a.id <> p.query_id),
        r AS (SELECT query_id, neighbor_id, s,
                     CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY s DESC, neighbor_id ASC) AS INTEGER) AS rank
              FROM sims)
        SELECT query_id, neighbor_id, rank, round(s, 5) + 0.0 AS sim
        FROM r WHERE rank <= 5
    """

    sql["token_stats"] = f"""
        WITH {_TOKS}
        SELECT doc_id, count(*) AS n_tokens,
               count(DISTINCT tok) AS n_distinct_tokens,
               round(avg(length(tok)), 6) AS avg_token_len
        FROM toks GROUP BY doc_id
    """

    sql["quality_scores"] = f"""
        WITH {_TOKS},
        agg AS (SELECT doc_id, count(*) AS n, count(DISTINCT tok) AS nd,
                       sum(CASE WHEN tok IN ({_sql_list(STOPWORDS)})
                           THEN 1 ELSE 0 END) AS ns
                FROM toks GROUP BY doc_id)
        SELECT doc_id,
               round(CAST(ns AS DOUBLE) / n, 6) AS stop_ratio,
               round(CAST(nd AS DOUBLE) / n, 6) AS ttr,
               round(0.4 * (CAST(ns AS DOUBLE) / n)
                     + 0.3 * (CAST(nd AS DOUBLE) / n)
                     + 0.3 * least(1.0, CAST(n AS DOUBLE) / 200.0), 6) AS quality
        FROM agg
    """

    lang_scores = ", ".join(
        f"sum(CASE WHEN tok IN ({_sql_list(LANG_PROFILES[lang])}) "
        f"THEN 1 ELSE 0 END) AS s_{lang}"
        for lang in LANGS
    )
    cases = []
    for lang in LANGS:
        conds = " AND ".join(
            f"s_{lang} >= s_{other}" for other in LANGS if other != lang
        )
        cases.append(f"WHEN {conds} THEN '{lang}'")
    sql["language_id"] = f"""
        WITH {_TOKS},
        scored AS (SELECT doc_id, {lang_scores} FROM toks GROUP BY doc_id)
        SELECT doc_id, CASE {' '.join(cases)} ELSE '{LANGS[-1]}' END AS pred_lang
        FROM scored
    """

    sql["doc_fingerprints"] = """
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(
                   list_filter(string_split(text, ' '), x -> x <> ''))), ' ')) AS fp
        FROM documents
    """

    onehot_cols = ", ".join(
        f"CASE WHEN lang = '{lang}' THEN 1 ELSE 0 END AS lang_{lang}"
        for lang in LANGS
    )
    sql["one_hot_lang"] = f"SELECT doc_id, {onehot_cols} FROM documents"

    sql["cosine_knn"] = """
        WITH base AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        nb AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS n FROM base),
        q AS (SELECT id AS query_id, v AS qv, n AS qn FROM nb WHERE id < 50),
        sims AS (SELECT q.query_id, b.id AS neighbor_id,
                        list_dot_product(q.qv, b.v) / (q.qn * b.n) AS s
                 FROM q JOIN nb b ON b.id <> q.query_id),
        r AS (SELECT query_id, neighbor_id, s,
                     CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY s DESC, neighbor_id ASC) AS INTEGER) AS rank
              FROM sims)
        SELECT query_id, neighbor_id, rank, round(s, 5) + 0.0 AS sim
        FROM r WHERE rank <= 5
    """

    # mirrors ann.sign_lsh_buckets(n_bits=8, seed=42) on 64-dim vectors:
    # identical hyperplane constants (same RandomState draw) and the
    # same left-to-right summation order as Spark's aggregate() fold,
    # so the projection doubles are bit-identical
    from neo4j_graph_algorithms_spark.pipeline.ann import hyperplanes

    planes = hyperplanes(8, 64, 42)
    bits = []
    for j in range(8):
        proj = "0.0"
        for d in range(64):
            proj = (f"({proj} + (CAST(embedding[{d + 1}] AS DOUBLE) * "
                    f"{float(planes[j][d])!r}))")
        bits.append(f"CASE WHEN {proj} > 0 THEN {1 << j} ELSE 0 END")
    bucket_expr = " + ".join(bits)
    sql["lsh_sign_buckets"] = f"""
        WITH b AS (SELECT vec_id, CAST({bucket_expr} AS BIGINT) AS bucket
                   FROM embeddings)
        SELECT bucket, count(*) AS n_vecs, min(vec_id) AS min_vec_id
        FROM b GROUP BY bucket
    """

    # mirrors ann.embedding_near_dup(threshold=0.3, n_bits=8, seed=42):
    # candidates share a sign-LSH bucket (identical bucket constants as
    # lsh_sign_buckets), exact cosine filter on the raw double, round
    # only for output — same as the Spark side
    sql["embedding_near_dup"] = f"""
        WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                          CAST({bucket_expr} AS BIGINT) AS bucket
                   FROM embeddings),
        nb AS (SELECT vec_id, v, bucket, sqrt(list_dot_product(v, v)) AS n
               FROM b),
        cand AS (SELECT a.vec_id AS vec_a, bq.vec_id AS vec_b,
                        list_dot_product(a.v, bq.v) / (a.n * bq.n) AS s
                 FROM nb a JOIN nb bq
                   ON a.bucket = bq.bucket AND a.vec_id < bq.vec_id)
        SELECT vec_a, vec_b, round(s, 5) + 0.0 AS sim
        FROM cand WHERE s >= 0.3
    """


    # mirrors sampling.sample_documents(by='lang',
    # fractions={'en': 0.5, 'zh': 0.25}, seed=0): hash threshold over
    # the md5-derived 32-bit hash of (doc_id || '#smp0'), mod 2^20
    _smp = ("('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#smp0'), 1, 8))"
            "::BIGINT % 1048576")
    sql["sample_documents"] = f"""
        SELECT doc_id, lang FROM documents
        WHERE {_smp} < CASE WHEN lang = 'en' THEN 524288
                            WHEN lang = 'zh' THEN 262144
                            ELSE 1048576 END
    """

    # mirrors sampling.stratified_sample_exact(k=10, by='lang', seed=0)
    sql["stratified_sample"] = f"""
        WITH h AS (SELECT doc_id, lang, {_smp} AS hv FROM documents),
        r AS (SELECT doc_id, lang,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY hv, doc_id) AS rk
              FROM h)
        SELECT doc_id, lang FROM r WHERE rk <= 10
    """

    # mirrors dedup.duplicate_span_scores(k=20): non-overlapping 20-char
    # chunks (full chunks only), duplicated = same chunk text in >1 doc
    sql["duplicate_span_scores"] = """
        WITH ch AS (
            SELECT doc_id, substr(text, CAST(i * 20 + 1 AS INT), 20) AS c
            FROM documents,
                 UNNEST(generate_series(
                     0, CAST(floor(length(text) / 20) AS BIGINT) - 1))
                 AS t(i)
        ),
        sh AS (SELECT c, count(DISTINCT doc_id) AS nd FROM ch GROUP BY c)
        SELECT doc_id, count(*) AS n_chunks,
               CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dup_chunks,
               round(CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS dup_frac
        FROM ch JOIN sh USING (c)
        GROUP BY doc_id
    """

    # mirrors text.ngram_lm_score (n=3, alpha=1, self-trained): char
    # trigram counts → context counts → add-1-smoothed conditional ln P,
    # V = distinct observed continuation chars (model-sized subquery).
    # Self-training makes every scored gram seen, so inner joins match
    # the Spark left-join+coalesce form value-for-value.
    sql["ngram_lm_score"] = """
        WITH grams AS (
            SELECT doc_id, substr(text, i, 3) AS g
            FROM documents,
                 UNNEST(generate_series(1, length(text) - 2)) AS t(i)
        ),
        tric AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
        ctxc AS (SELECT substr(g, 1, 2) AS ctx, sum(c) AS cc
                 FROM tric GROUP BY 1),
        vv AS (SELECT count(DISTINCT substr(g, 3, 1)) AS v FROM tric)
        SELECT doc_id, count(*) AS n_ngrams,
               round(-sum(ln((c + 1.0) /
                             (cc + 1.0 * (SELECT v FROM vv))))
                     / count(*), 6) AS cross_entropy
        FROM grams
        JOIN ctxc ON substr(g, 1, 2) = ctx
        JOIN tric USING (g)
        GROUP BY doc_id
    """

    # mirrors text.repetition_scores: bigram = word 2-gram (same
    # shingle rule as ngram_jaccard's 3-gram), run lengths via
    # gaps-and-islands (pos − row_number over (doc, tok)) — equals the
    # Spark fold's longest consecutive same-token run
    sql["repetition_scores"] = """
        WITH tl AS (SELECT doc_id,
                           list_filter(string_split(text, ' '), x -> x <> '') AS t
                    FROM documents),
        bg AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 2
                   THEN list_transform(range(1, len(t)),
                                       i -> array_to_string(t[i:i+1], ' '))
                   ELSE CAST([] AS VARCHAR[]) END) AS b FROM tl),
        bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
        agg AS (SELECT doc_id, max(c) AS top, sum(c) AS total,
                       sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
                FROM bc GROUP BY doc_id),
        tp AS (SELECT doc_id, unnest(t) AS tok,
                      unnest(range(1, len(t) + 1)) AS pos FROM tl),
        runs AS (SELECT doc_id, tok,
                        pos - row_number() OVER (PARTITION BY doc_id, tok
                                                 ORDER BY pos) AS g
                 FROM tp),
        mr AS (SELECT doc_id, max(cnt) AS max_run FROM
                   (SELECT doc_id, count(*) AS cnt FROM runs
                    GROUP BY doc_id, tok, g)
               GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(round(CAST(a.top AS DOUBLE) / a.total, 6), 0.0)
                   AS top_bigram_frac,
               coalesce(round(CAST(a.dup AS DOUBLE) / a.total, 6), 0.0)
                   AS dup_bigram_frac,
               CAST(coalesce(m.max_run, 0) AS BIGINT) AS max_token_run
        FROM documents d
        LEFT JOIN agg a USING (doc_id)
        LEFT JOIN mr m USING (doc_id)
    """

    # mirrors decontam.ngram_decontaminate(n=3, eval_k=20,
    # threshold=0.2): benchmark = 20 smallest md5(doc_id) docs (the
    # kmeans/ivf sampling rule), overlap = distinct-3-gram hit ratio
    sql["decontaminate"] = """
        WITH tl AS (SELECT doc_id,
                           list_filter(string_split(text, ' '), x -> x <> '') AS t
                    FROM documents),
        shs AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 3
                   THEN list_transform(range(1, len(t) - 1),
                                       i -> array_to_string(t[i:i+2], ' '))
                   ELSE CAST([] AS VARCHAR[]) END) AS sh FROM tl),
        ds AS (SELECT DISTINCT doc_id, sh FROM shs),
        ev AS (SELECT doc_id FROM documents
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 20),
        evsh AS (SELECT DISTINCT sh FROM ds JOIN ev USING (doc_id)),
        rest AS (SELECT doc_id FROM documents
                 WHERE doc_id NOT IN (SELECT doc_id FROM ev)),
        agg AS (SELECT d.doc_id, count(*) AS n_shingles,
                       sum(CASE WHEN e.sh IS NOT NULL THEN 1 ELSE 0 END)
                           AS n_hit
                FROM ds d JOIN rest USING (doc_id)
                LEFT JOIN evsh e ON e.sh = d.sh
                GROUP BY d.doc_id),
        o AS (SELECT r.doc_id,
                     CAST(coalesce(a.n_shingles, 0) AS BIGINT) AS n_shingles,
                     CAST(coalesce(a.n_hit, 0) AS BIGINT) AS n_hit,
                     CASE WHEN coalesce(a.n_shingles, 0) > 0
                          THEN round(CAST(a.n_hit AS DOUBLE) / a.n_shingles, 6)
                          ELSE 0.0 END AS overlap_frac
              FROM rest r LEFT JOIN agg a USING (doc_id))
        SELECT doc_id, n_shingles, n_hit, overlap_frac,
               overlap_frac >= 0.2 AS contaminated
        FROM o
    """

    # mirrors kmeans.kmeans_fit(k=8, iterations=3): final labels only
    # (integer outputs — float parity is exercised through them, since
    # one flipped distance comparison anywhere flips a label)
    _KM = kmeans_unrolled_cte(8, 3)
    sql["kmeans_clusters"] = f"""
        WITH {_KM}
        SELECT id AS vec_id, cell AS cluster FROM af
    """

    # mirrors kmeans.semantic_dedup(k=8, iterations=3): survivor =
    # member nearest its final centroid, ties to the smaller id
    sql["semantic_dedup"] = f"""
        WITH {_KM},
        rn AS (SELECT cell, id, row_number() OVER (PARTITION BY cell
                      ORDER BY dist ASC, id ASC) AS rk,
                      count(*) OVER (PARTITION BY cell) AS size
               FROM af)
        SELECT cell AS cluster, id AS survivor_id, size
        FROM rn WHERE rk = 1
    """

    # mirrors filtering.pii_scrub over the driver query's synthesized
    # PII (text || deterministic email/phone/IP per doc_id — the base
    # corpus has none, synthesis de-vacuates the check). Patterns are
    # the Java-regex ∩ RE2 dialect, replayed verbatim; DuckDB needs the
    # explicit 'g' flag (Spark's regexp_replace is global by default).
    _piit = ("text || ' contact doc' || CAST(doc_id AS VARCHAR) || "
             "'@mail.example.com or +1-555-' || CAST(doc_id AS VARCHAR) || "
             "' at 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1 end'")
    _em = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    _ip = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
    _ph = r"\+[0-9][0-9-]{6,}[0-9]"
    sql["pii_scrub"] = f"""
        WITH t0 AS (SELECT doc_id, {_piit} AS t FROM documents),
        t1 AS (SELECT doc_id, t,
                      regexp_replace(t, '{_em}', '<EMAIL>', 'g') AS s1
               FROM t0),
        t2 AS (SELECT doc_id, t, s1,
                      regexp_replace(s1, '{_ip}', '<IP>', 'g') AS s2
               FROM t1)
        SELECT doc_id,
               regexp_replace(s2, '{_ph}', '<PHONE>', 'g') AS clean_text,
               CAST(len(regexp_extract_all(t, '{_em}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(s1, '{_ip}')) AS BIGINT)
                   AS n_ips,
               CAST(len(regexp_extract_all(s2, '{_ph}')) AS BIGINT)
                   AS n_phones
        FROM t2
    """

    # mirrors _q_curation_e2e: the pii_scrub chain (same synthesized
    # PII), the c4_filter gate (same params) over the SCRUBBED text,
    # then exact dedup keeping the min-doc_id survivor per fingerprint
    sql["curation_e2e"] = f"""
        WITH t0 AS (SELECT doc_id, {_piit} AS t FROM documents),
        t1 AS (SELECT doc_id,
                      regexp_replace(t, '{_em}', '<EMAIL>', 'g') AS s1
               FROM t0),
        t2 AS (SELECT doc_id,
                      regexp_replace(s1, '{_ip}', '<IP>', 'g') AS s2
               FROM t1),
        sc AS (SELECT d.doc_id,
                      regexp_replace(t2.s2, '{_ph}', '<PHONE>', 'g')
                          AS text,
                      d.lang, d.source
               FROM documents d JOIN t2 USING (doc_id)),
        tl AS (SELECT doc_id, list_filter(string_split(text, ' '),
                                          x -> x <> '') AS tk
               FROM sc),
        m AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_words,
                     CASE WHEN len(tk) > 0 THEN round(
                         CAST(list_sum(list_transform(tk,
                                                      x -> length(x)))
                              AS DOUBLE) / len(tk), 9)
                          ELSE 0.0 END AS mwl,
                     CAST(len(list_filter(tk,
                         x -> x IN ('dup', 'slow'))) AS BIGINT) AS bh
              FROM tl),
        kept AS (SELECT sc.* FROM sc JOIN m USING (doc_id)
                 WHERE n_words >= 40 AND n_words <= 100000
                   AND mwl <= 4.5 AND bh = 0),
        fp AS (SELECT md5(text) AS f, min(doc_id) AS doc_id
               FROM kept GROUP BY 1)
        SELECT k.doc_id, k.lang, k.source
        FROM kept k JOIN fp ON k.doc_id = fp.doc_id
    """

    # mirrors filtering.c4_quality_filter(min_words=40,
    # max_mean_word_len=4.5, blocklist=('dup', 'slow')) — all rows kept
    # with their keep flag, so the hash check proves every rule
    sql["c4_filter"] = """
        WITH tl AS (SELECT doc_id,
                           list_filter(string_split(text, ' '),
                                       x -> x <> '') AS t
                    FROM documents),
        m AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_words,
                     CASE WHEN len(t) > 0 THEN round(
                         CAST(list_sum(list_transform(t, x -> length(x)))
                              AS DOUBLE) / len(t), 9)
                          ELSE 0.0 END AS mean_word_len,
                     CAST(len(list_filter(t,
                         x -> x IN ('dup', 'slow'))) AS BIGINT)
                         AS blocklist_hits
              FROM tl)
        SELECT doc_id, n_words, mean_word_len, blocklist_hits,
               (n_words >= 40 AND n_words <= 100000
                AND mean_word_len <= 4.5
                AND blocklist_hits = 0) AS keep
        FROM m
    """

    # mirrors sampling.mix_corpus({'src0': .4, 'src1': .3, 'src2': .2,
    # 'src3': .1}, by='source', seed=0): scale = min_s n_s/p_s in IEEE
    # DOUBLE (both engines), k_s = floor(p_s*scale), survivors = hash
    # order per stratum
    sql["mix_corpus"] = f"""
        WITH pos(source, p) AS (VALUES
            ('src0', CAST(0.4 AS DOUBLE)), ('src1', CAST(0.3 AS DOUBLE)),
            ('src2', CAST(0.2 AS DOUBLE)), ('src3', CAST(0.1 AS DOUBLE))),
        cnt AS (SELECT d.source, CAST(count(*) AS DOUBLE) AS n
                FROM documents d JOIN pos USING (source)
                GROUP BY d.source),
        sc AS (SELECT min(n / p) AS scale FROM cnt JOIN pos USING (source)),
        ks AS (SELECT source,
                      CAST(floor(p * (SELECT scale FROM sc)) AS BIGINT) AS k
               FROM pos),
        h AS (SELECT d.*, {_smp} AS hv FROM documents d
              JOIN ks USING (source)),
        r AS (SELECT *, row_number() OVER (PARTITION BY source
                            ORDER BY hv, doc_id) AS rk FROM h)
        SELECT doc_id, text, lang, source, n_chars
        FROM r JOIN ks USING (source) WHERE rk <= k
    """

    # mirrors sampling.temperature_mix(by='lang', alpha=0.5) →
    # mix_corpus with UNNORMALIZED weights w = pow(n, 0.5): the same
    # pow/div/min/mul/floor chain the Python driver computes (no
    # normalizing sum → no summation-order hazard), then the standard
    # per-stratum hash-order top-k
    sql["temperature_mix"] = f"""
        WITH cnt AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n
                     FROM documents GROUP BY lang),
        w AS (SELECT lang, pow(n, 0.5) AS wt, n FROM cnt),
        sc AS (SELECT min(n / wt) AS scale FROM w),
        ks AS (SELECT lang, CAST(floor(wt * (SELECT scale FROM sc))
                                 AS BIGINT) AS k FROM w),
        h AS (SELECT d.*, {_smp} AS hv FROM documents d
              JOIN ks USING (lang)),
        r AS (SELECT *, row_number() OVER (PARTITION BY lang
                            ORDER BY hv, doc_id) AS rk FROM h)
        SELECT doc_id, text, lang, source, n_chars
        FROM r JOIN ks USING (lang) WHERE rk <= k
    """

    # mirrors index.build_vocab(max_size=40): histogram thresholding
    # then token_id < 40 equals a plain top-40 by (count DESC, token)
    sql["vocab_top"] = """
        WITH t AS (SELECT unnest(list_filter(string_split(text, ' '),
                                             x -> x <> '')) AS token
                   FROM documents),
        c AS (SELECT token, count(*) AS count FROM t GROUP BY token),
        r AS (SELECT token, count,
                     CAST(row_number() OVER (ORDER BY count DESC,
                                             token ASC) - 1 AS BIGINT)
                         AS token_id
              FROM c)
        SELECT token, count, token_id FROM r WHERE token_id < 40
    """

    # mirrors index.tfidf_top_terms(k=3): 9-dp-rounded score ranks,
    # 6-dp exposed
    sql["tfidf_top_terms"] = """
        WITH t AS (SELECT doc_id,
                          unnest(list_filter(string_split(text, ' '),
                                             x -> x <> '')) AS term
                   FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM t GROUP BY doc_id, term),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                     round(tf.tf * ln(
                         CAST((SELECT count(*) FROM documents) AS DOUBLE)
                         / df.df), 9) AS s
              FROM tf JOIN df USING (term)),
        r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                            ORDER BY s DESC, term ASC) AS rk FROM s)
        SELECT doc_id, term, tf, df, round(s, 6) AS score
        FROM r WHERE rk <= 3
    """

    # mirrors index.inverted_index(max_postings=50): true df, capped
    # sorted posting arrays
    sql["inverted_index"] = """
        WITH td AS (SELECT DISTINCT doc_id, token FROM
                    (SELECT doc_id,
                            unnest(list_filter(string_split(text, ' '),
                                               x -> x <> '')) AS token
                     FROM documents)),
        dfq AS (SELECT token, count(*) AS df FROM td GROUP BY token),
        r AS (SELECT token, doc_id,
                     row_number() OVER (PARTITION BY token
                                        ORDER BY doc_id) AS rk
              FROM td),
        p AS (SELECT token,
                     array_to_string(list(CAST(doc_id AS VARCHAR)
                                          ORDER BY doc_id), ',') AS postings
              FROM r WHERE rk <= 50 GROUP BY token)
        SELECT dfq.token, dfq.df, p.postings FROM dfq JOIN p USING (token)
    """

    # mirrors index.cooccurrence_pmi(window=3, min_count=2): the oracle
    # generates pair instances by positional self-join (the Spark side
    # does it in-row — different physical path, same multiset)
    sql["cooccurrence_pmi"] = """
        WITH tl AS (SELECT doc_id,
                           list_filter(string_split(text, ' '),
                                       x -> x <> '') AS t FROM documents),
        tp AS (SELECT doc_id, unnest(t) AS tok,
                      unnest(range(1, len(t) + 1)) AS pos FROM tl),
        pi AS (SELECT least(x.tok, y.tok) AS a, greatest(x.tok, y.tok) AS b
               FROM tp x JOIN tp y ON x.doc_id = y.doc_id
               AND y.pos > x.pos AND y.pos <= x.pos + 3),
        pc AS (SELECT a, b, count(*) AS n_pair FROM pi GROUP BY a, b),
        uni AS (SELECT tok, count(*) AS c FROM tp GROUP BY tok),
        tot AS (SELECT CAST(sum(n_pair) AS DOUBLE) AS np FROM pc),
        nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tp)
        SELECT pc.a AS term_a, pc.b AS term_b, pc.n_pair,
               round(ln((pc.n_pair / tot.np)
                        / ((ca.c / nt.n) * (cb.c / nt.n))), 6) + 0.0 AS pmi
        FROM pc CROSS JOIN tot CROSS JOIN nt
        JOIN uni ca ON pc.a = ca.tok JOIN uni cb ON pc.b = cb.tok
        WHERE pc.n_pair >= 2
    """

    # mirrors pca.covariance_matrix: independent recomputation of the
    # second moments by explode + per-vector self-join (the Spark side
    # accumulates per-partition Gram blocks — different physical path).
    # Components are quantized to integer-valued doubles (round(x·1e4),
    # matching the driver query) so every moment sum is EXACT on both
    # engines — no float-addition-order hazard under round(cov, 6)
    sql["pca_covariance"] = """
        WITH e AS (SELECT vec_id,
                          list_transform(embedding::DOUBLE[],
                                         x -> round(x * 10000)) AS v
                   FROM embeddings),
        x AS (SELECT vec_id, unnest(v) AS val,
                     unnest(range(0, len(v))) AS pos FROM e),
        p AS (SELECT a.pos AS i, b.pos AS j, sum(a.val * b.val) AS sxy
              FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2),
        m AS (SELECT pos AS k, sum(val) AS sx FROM x GROUP BY 1),
        c AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM e)
        SELECT p.i, p.j,
               round((p.sxy - mi.sx * mj.sx / c.n) / (c.n - 1), 6) + 0.0 AS cov
        FROM p CROSS JOIN c
        JOIN m mi ON p.i = mi.k JOIN m mj ON p.j = mj.k
    """

    # mirrors packing.pack_sequences(budget=256): the two-phase
    # sharded prefix sum equals one global window cumsum exactly
    sql["pack_sequences"] = """
        WITH c AS (SELECT doc_id,
                          CAST(len(list_filter(string_split(text, ' '),
                                               x -> x <> '')) AS BIGINT)
                              AS n_tokens
                   FROM documents),
        p AS (SELECT doc_id, n_tokens,
                     coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS cum
              FROM c)
        SELECT doc_id, n_tokens,
               CAST(cum // 256 AS BIGINT) AS start_chunk,
               CAST(CASE WHEN n_tokens > 0
                    THEN (cum + n_tokens - 1) // 256
                    ELSE cum // 256 END AS BIGINT) AS end_chunk,
               CAST(cum % 256 AS BIGINT) AS offset_in_chunk
        FROM p
    """

    return sql
