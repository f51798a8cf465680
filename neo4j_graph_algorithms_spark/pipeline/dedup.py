"""Document deduplication: exact, MinHash+LSH, SimHash, token-Jaccard.

Scale notes (the point of each design):

- exact: one hash-aggregate on md5(text) — never materializes pairs.
- MinHash+LSH: per-doc signature of min-hashes, banded; candidate
  pairs appear only through ONE equality self-join on
  (band_id, band_key) posting rows — the all-pairs space is never
  generated, and the shuffle count is independent of the band count.
  Permutations are universal hashes ``(a_k·h + b_k) mod (2^31−1)``
  over ONE md5-derived 32-bit base hash per token — one md5 per token
  occurrence instead of ``n_hashes`` salted md5s, so the signature
  aggregation is 1 string hash + n_hashes codegen'd multiply-add-mods
  per token (the dominant cost at 128 permutations drops ~an order of
  magnitude). Operand bounds keep every intermediate under 2^63, so
  the arithmetic is exact (no wrap) in both Spark and DuckDB.
  Production defaults: 128 permutations × 16 bands of 8 rows (the
  S-curve threshold ≈ (1/16)^(1/8) ≈ 0.71 Jaccard); the driver's
  oracle-matched config (4 hashes, 2×2 bands) stays available by
  parameter.
- SimHash: sign fingerprint from md5-derived token hashes (default 64
  bits, packed into a signed BIGINT with bit 63 as the sign bit); docs
  sharing a fingerprint are near-dup candidates via one group-by.
- token-Jaccard: inverted-index join on shared tokens prunes to pairs
  with ≥1 common token; tokens whose document frequency exceeds
  ``df_cutoff`` are dropped FIRST — without that prune one
  stopword-grade token shared by k docs yields k² candidate rows.

All hashes derive from ``md5`` so the DuckDB oracle reproduces them
bit-for-bit (portable across engines, unlike murmur/xxhash builtins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "keep_latest",
    "containment_pairs",
    "ensemble_near_dup_pairs",
    "ensemble_dedup_clusters",
    "tokens_expr",
    "shingles_expr",
    "exact_duplicates",
    "minhash_signatures",
    "band_postings",
    "minhash_lsh_candidates",
    "simhash_signatures",
    "simhash_near_dup",
    "token_jaccard_pairs",
    "dedup_clusters",
    "duplicate_span_scores",
    "lsh_recall_eval",
]

N_MINHASH = 128
MINHASH_BANDS = 16
SIMHASH_BITS = 64
TOKEN_DF_CUTOFF = 1000


def tokens_expr(text: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped (the one canonical
    tokenizer shared with the oracles — keep in sync with oracles.py)."""
    return F.filter(F.split(text, " "), lambda x: x != "")


def shingles_expr(text: Column, n: int) -> Column:
    """Word n-gram shingles: every contiguous n-token window, joined
    with a single space (docs shorter than n tokens yield no shingles).
    All-JVM array expressions — no Python in the path."""
    toks = tokens_expr(text)
    m = F.size(toks) - (n - 1)
    seq = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    # sequence(1, m) DESCENDS for m < 1 — guard explicitly
    return F.when(m >= 1, seq).otherwise(
        F.array().cast("array<string>"))


def _h15(col: Column) -> Column:
    """Portable 60-bit integer hash: first 15 hex chars of md5 → bigint
    (DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


MERSENNE31 = (1 << 31) - 1


def perm_consts(k: int) -> tuple[int, int]:
    """Deterministic universal-hash constants for permutation ``k``:
    odd multiplier ``a < 2^30`` and offset ``b < 2^31−1``. Fixed
    integer arithmetic — any SQL engine replays the same constants.

    The modulus is the Mersenne prime 2^31−1, deliberately SMALLER
    than the 32-bit base-hash universe: ``a·h`` exceeds the modulus by
    ~2^31 multiples, so the mod genuinely permutes (Carter-Wegman
    pairwise independence over ``h mod p``). A modulus ≫ a·h would
    wrap at most once, leaving every "permutation" nearly monotone in
    ``h`` — all minima would land on the same token and LSH recall
    collapses (caught by test_minhash_production_params_recall).
    Bounds: ``a·h + b < 2^30·2^32 + 2^31 < 2^63`` — no signed-64
    overflow in Spark or DuckDB."""
    a = ((k * 2654435761 + 1013904223) % ((1 << 30) - 1)) | 1
    b = (k * 2246822519 + 3266489917) % MERSENNE31
    return a, b


def _h8(col: Column) -> Column:
    """Portable 32-bit base hash: first 8 hex chars of md5 → bigint
    (DuckDB: ('0x' || substr(md5(x),1,8))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _perm_col(k: int) -> Column:
    """Permutation ``k`` applied to the base-hash column ``h`` —
    pure codegen'd integer arithmetic, no string hashing."""
    a, b = perm_consts(k)
    return (F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MERSENNE31)


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(fingerprint, n_docs, min_doc_id) — one row per distinct text."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("fingerprint"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


def _doc_tokens(docs: DataFrame, text_col: str, ngram: int = 1) -> DataFrame:
    col = (tokens_expr(F.col(text_col)) if ngram <= 1
           else shingles_expr(F.col(text_col), ngram))
    return docs.select("doc_id", F.explode(col).alias("tok"))


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       n_hashes: int = N_MINHASH) -> DataFrame:
    """(doc_id, h0..h{n-1}) — min over tokens of universal-hash
    permutations of one md5-derived 32-bit base hash per token (see
    module docstring; one md5 total, not one per permutation)."""
    toks = _doc_tokens(docs, text_col)
    hashed = toks.select("doc_id", _h8(F.col("tok")).alias("h"))
    aggs = [F.min(_perm_col(k)).alias(f"h{k}") for k in range(n_hashes)]
    return hashed.groupBy("doc_id").agg(*aggs)


def band_postings(docs: DataFrame, *, text_col: str = "text",
                  n_hashes: int = N_MINHASH,
                  bands: int = MINHASH_BANDS) -> DataFrame:
    """(doc_id, band, bkey) LSH posting rows: band b's key is rows
    h{b·r}..h{b·r+r−1} of the MinHash signature, r = n_hashes // bands.

    ONE pass over the signatures: explode an array of (band, key)
    structs — a per-band union would re-run the n_hashes-aggregation
    once per band (Catalyst does not dedup the common subplan).
    Per-doc function of the text alone, so postings computed batch by
    batch equal postings computed over the whole corpus — the property
    streaming near-dup maintenance relies on."""
    if n_hashes % bands != 0:
        raise ValueError("n_hashes must be divisible by bands")
    r = n_hashes // bands
    sigs = minhash_signatures(docs, text_col, n_hashes)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("|", *[F.col(f"h{b * r + i}").cast("string")
                               for i in range(r)]).alias("bkey"),
        )
        for b in range(bands)
    ]
    return (
        sigs.select("doc_id", F.explode(F.array(*band_structs)).alias("p"))
        .select("doc_id", F.col("p.band").alias("band"),
                F.col("p.bkey").alias("bkey"))
    )


def minhash_lsh_candidates(docs: DataFrame, text_col: str = "text",
                           n_hashes: int = N_MINHASH,
                           bands: int = MINHASH_BANDS) -> DataFrame:
    """Near-dup candidate pairs (doc_a < doc_b) sharing at least one
    LSH band (band b = rows h{b*r}..h{b*r+r-1}, r = n_hashes // bands).

    Scale shape: signatures become (doc_id, band_id, band_key) posting
    rows, candidates come from ONE equality self-join on
    (band_id, band_key) — per-band joins would cost ``bands`` shuffles,
    this costs one regardless of the band count."""
    # both sides of the self-join read the postings — checkpoint so the
    # signature aggregation runs once, not once per side
    posting = band_postings(docs, text_col=text_col, n_hashes=n_hashes,
                            bands=bands).localCheckpoint(eager=False)
    a = posting.select(F.col("doc_id").alias("doc_a"), "band", "bkey")
    b_ = posting.select(F.col("doc_id").alias("doc_b"), "band", "bkey")
    return (
        a.join(b_, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def simhash_signatures(docs: DataFrame, text_col: str = "text",
                       n_bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash) — sign-aggregated token-hash fingerprint.

    ``n_bits`` up to 64; the 60-bit md5-derived hash is re-salted per
    16-bit block so bits past 60 stay independent. Bit 63 packs as the
    BIGINT sign bit (two's complement), so 64-bit signatures fit the
    column without overflow."""
    if not 1 <= n_bits <= 64:
        raise ValueError("n_bits must be in 1..64")
    toks = _doc_tokens(docs, text_col)
    # salt a fresh 60-bit hash per 16-bit block (bits beyond one md5
    # prefix's 60 would otherwise be zero)
    n_blocks = (n_bits + 15) // 16
    for blk in range(n_blocks):
        toks = toks.withColumn(
            f"_h{blk}", _h15(F.concat(F.col("tok"), F.lit(f"#s{blk}"))))
    aggs = []
    for j in range(n_bits):
        blk, off = j // 16, j % 16
        bit = F.shiftright(F.col(f"_h{blk}"), off).bitwiseAND(F.lit(1))
        aggs.append(
            F.sum(F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))).alias(f"b{j}")
        )
    sums = toks.groupBy("doc_id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for j in range(n_bits):
        contrib = -(1 << 63) if j == 63 else (1 << j)
        sig = sig + F.when(F.col(f"b{j}") > 0, F.lit(contrib)).otherwise(F.lit(0))
    return sums.select("doc_id", sig.alias("simhash"))


def simhash_near_dup(docs: DataFrame, *, max_hamming: int = 3,
                     n_bits: int = SIMHASH_BITS, n_bands: int | None = None,
                     text_col: str = "text") -> DataFrame:
    """(doc_a, doc_b, hamming) for pairs whose SimHash signatures differ
    in at most ``max_hamming`` bits — the banded Hamming candidate join.

    The signature is split into ``n_bands`` equal bit-bands; docs
    sharing ANY band value become candidates through one equality
    self-join on (band, value) posting rows — the all-pairs space is
    never generated. By pigeonhole, a pair at Hamming distance d has at
    least one identical band whenever d < n_bands, so with the default
    ``n_bands = max_hamming + 1`` the banded result is EXACTLY the
    exhaustive ``popcount(xor) <= max_hamming`` filter (recall 1.0, not
    approximate) — which is what the DuckDB oracle computes.

    At 100 TB: one signature aggregation + one equality join keyed on
    (band, value); candidates per band bucket are near-dups by
    construction, so bucket fan-out stays bounded on real corpora.
    """
    if n_bands is None:
        n_bands = max_hamming + 1
    if n_bits % n_bands != 0:
        raise ValueError(f"n_bits={n_bits} not divisible by n_bands={n_bands}")
    width = n_bits // n_bands
    mask = (1 << width) - 1
    # both self-join sides read the signatures; cache so the signature
    # aggregation runs once per action (exchange-reuse does not fire
    # through the aliased join sides — measured 2 scans without it)
    sig = simhash_signatures(docs, text_col, n_bits).persist()
    bands = F.array(*[
        F.shiftrightunsigned(F.col("simhash"), b * width)
        .bitwiseAND(F.lit(mask)) for b in range(n_bands)
    ])
    posts = sig.select(
        "doc_id", "simhash", F.posexplode(bands).alias("band", "val"))
    a, b = posts.alias("a"), posts.alias("b")
    cand = (
        a.join(b, ["band", "val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.simhash").alias("_sa"),
                F.col("b.simhash").alias("_sb"))
        .distinct()  # a pair may collide in several bands
    )
    ham = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return (
        cand.select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_clusters(docs: DataFrame, pairs: DataFrame, *,
                   quality_col: str | None = None,
                   doc_col: str = "doc_id",
                   max_iterations: int = 50) -> DataFrame:
    """Final step of a dedup pipeline: candidate pairs → duplicate
    clusters → one canonical survivor per cluster.

    ``pairs`` is any (doc_a, doc_b) near-dup candidate table
    (minhash_lsh_candidates / simhash_near_dup / token_jaccard_pairs /
    ann.embedding_near_dup). Returns (doc_id, cluster_id, is_canonical)
    for EVERY doc in ``docs`` — docs in no pair are singleton clusters
    and their own canonical. ``cluster_id`` is the minimum doc_id in the
    cluster (the WCC min-label). The canonical doc is the cluster member
    with the highest ``quality_col`` (ties → lowest doc_id); with no
    quality column the lowest doc_id wins.

    Scale shape: connected components run ONLY over pair endpoints —
    on a 10^12-doc corpus the candidate-endpoint set is orders of
    magnitude smaller than the corpus, and the full doc table is touched
    by exactly one left join + one aggregation. Canonical selection is a
    groupBy-min over a struct key (map-side partial agg), NOT a window
    over cluster_id — a boilerplate mega-cluster would make one window
    partition hot, while the agg stays skew-tolerant.
    """
    from neo4j_graph_algorithms_spark.operators.wcc import connected_components

    endpoints = (
        pairs.select(F.col("doc_a").alias("id"))
        .union(pairs.select(F.col("doc_b").alias("id")))
        .distinct()
    )
    edges = pairs.select(F.col("doc_a").alias("src"),
                         F.col("doc_b").alias("dst"))
    labels = connected_components(
        endpoints, edges, max_iterations=max_iterations).components

    cols = [F.col(doc_col).alias("doc_id")]
    # quality sorts DESCENDING via a negated struct field (struct min =
    # lexicographic, so (-quality, doc_id) min == best quality, then id)
    q = (-F.col(quality_col).cast("double") if quality_col
         else F.lit(0.0))
    cols.append(q.alias("_negq"))
    base = (
        docs.select(*cols)
        .join(labels.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id", "_negq",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    canon = (
        base.groupBy("cluster_id")
        .agg(F.min(F.struct(F.col("_negq").alias("q"),
                            F.col("doc_id").alias("d"))).alias("_k"))
        .select("cluster_id", F.col("_k.d").alias("_canon"))
    )
    return (
        base.join(canon, "cluster_id")
        .select(
            "doc_id", "cluster_id",
            (F.col("doc_id") == F.col("_canon")).cast("int").alias("is_canonical"),
        )
    )


def token_jaccard_pairs(docs: DataFrame, *, threshold: float = 0.8,
                        text_col: str = "text",
                        df_cutoff: int | None = TOKEN_DF_CUTOFF,
                        ngram: int = 1) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with token-set Jaccard ≥
    threshold over the df-pruned token sets — inverted-index join, no
    all-pairs blowup.

    ``df_cutoff`` drops tokens appearing in more than that many
    documents BEFORE the self-join (and from the set sizes, so the
    score is Jaccard over the pruned sets): a token shared by k docs
    contributes k² candidate rows, so one stopword-grade token would
    otherwise dominate the join output. None disables the prune.

    ``ngram`` > 1 switches the unit from single tokens to word n-gram
    shingles (n-gram Jaccard — the order-sensitive near-dup measure:
    shuffled text shares tokens but not shingles).

    The pruned posting list feeds three plan branches (set sizes + both
    self-join sides); Spark's exchange-reuse does not collapse them
    (measured: 8 parquet scans without the cache), so it is persisted —
    computed once per action, spill-safe (MEMORY_AND_DISK); callers
    holding the result long-term may ``spark.catalog.clearCache()``."""
    toks = _doc_tokens(docs, text_col, ngram).distinct()
    if df_cutoff is not None:
        rare = (
            toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= int(df_cutoff)).select("tok")
        )
        toks = toks.join(rare, "tok", "left_semi")
    toks = toks.persist()
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = toks.select(F.col("doc_id").alias("doc_a"), "tok")
    b = toks.select(F.col("doc_id").alias("doc_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n", "nb"), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(
                F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= float(threshold))
    )


def duplicate_span_scores(
    docs: DataFrame,
    *,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_chunks, dup_chunks, dup_frac): cross-document
    repeated-substring signal — the chunked form of Lee et al. 2022's
    exact-substring dedup ("Deduplicating Training Data Makes Language
    Models Better"). Each doc is split into NON-overlapping ``k``-char
    chunks (full chunks only); a chunk counts as duplicated when its
    exact text also occurs in at least one OTHER document; ``dup_frac``
    is the duplicated share of the doc's chunks.

    Chunk alignment makes this an approximation of the suffix-array
    method (an unaligned copy can straddle boundaries and shift by up
    to k−1 chars) — the suffix-array scan is inherently sequential,
    while this is two hash shuffles; halve ``k`` to tighten recall.

    100-TB shape: the chunk table is corpus_chars/k rows (NOT per-char);
    one chunk-keyed aggregation with map-side combine (output =
    distinct-chunk-sized) + one chunk-keyed join back + one doc-keyed
    aggregation. Intra-doc repeats do NOT mark a chunk duplicated
    (countDistinct doc_id > 1), keeping this orthogonal to the in-row
    :func:`~neo4j_graph_algorithms_spark.pipeline.text.repetition_scores`.
    Docs shorter than ``k`` chars have no chunks and are absent.
    """
    text = F.col(text_col)
    m = F.floor(F.length(text) / k).cast("int")
    seq = F.transform(
        F.sequence(F.lit(0), m - 1),
        lambda i: F.substring(text, i * k + 1, k),
    )
    # sequence(0, m-1) DESCENDS for m < 1 — guard explicitly
    chunks_arr = F.when(m >= 1, seq).otherwise(
        F.array().cast("array<string>"))
    chunks = docs.select("doc_id", F.explode(chunks_arr).alias("chunk"))
    share = chunks.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("_nd"))
    return (
        chunks.join(share, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("_nd") > 1, 1).otherwise(0))
            .cast("long").alias("dup_chunks"),
        )
        .select(
            "doc_id", "n_chunks", "dup_chunks",
            F.round(F.col("dup_chunks").cast("double")
                    / F.col("n_chunks"), 6).alias("dup_frac"),
        )
    )


def keep_latest(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    *,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Latest-snapshot dedup: one row per ``keys`` group — the row with
    the greatest ``ts_col`` (ties broken by ``tiebreak`` columns
    descending, so the result is deterministic when timestamps
    collide). THE Common-Crawl re-crawl rule: a URL captured in several
    crawls keeps only its newest capture before any graph build or
    text-pipeline stage.

    One window keyed by ``keys`` — a single hash shuffle, map-side
    combinable rank, no self-join. Key-partitioned (never a global
    window), so it scales with the key cardinality like every other
    keyed aggregation here.
    """
    from pyspark.sql.window import Window

    order = [F.desc(ts_col)] + [F.desc(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def containment_pairs(docs: DataFrame, *, threshold: float = 0.8,
                      text_col: str = "text",
                      df_cutoff: int | None = TOKEN_DF_CUTOFF,
                      ngram: int = 1) -> DataFrame:
    """(doc_a, doc_b, containment) for pairs whose token-set
    MAX-containment ``|A∩B| / min(|A|,|B|)`` ≥ threshold — the
    asymmetric near-dup measure (Broder's resemblance-vs-containment
    distinction): a short document embedded verbatim in a long one has
    containment ≈ 1 while its Jaccard can be arbitrarily small, so a
    Jaccard-only dedup pass keeps the nested copy. Same inverted-index
    shape as :func:`token_jaccard_pairs` (df-pruned posting self-join —
    one shuffle, no all-pairs), same ``df_cutoff``/``ngram`` knobs.
    """
    toks = _doc_tokens(docs, text_col, ngram).distinct()
    if df_cutoff is not None:
        rare = (
            toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= int(df_cutoff)).select("tok")
        )
        toks = toks.join(rare, "tok", "left_semi")
    toks = toks.persist()
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = toks.select(F.col("doc_id").alias("doc_a"), "tok")
    b = toks.select(F.col("doc_id").alias("doc_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n", "nb"), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(F.col("i").cast("double") / F.least("na", "nb"), 6)
            .alias("containment"),
        )
        .filter(F.col("containment") >= float(threshold))
    )


def ensemble_near_dup_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_hashes: int = N_MINHASH,
    bands: int = MINHASH_BANDS,
    simhash_bits: int = SIMHASH_BITS,
    max_hamming: int = 3,
    simhash_bands: int | None = None,
) -> DataFrame:
    """Multi-signal near-dup candidates — the union a production corpus
    dedup actually runs (e.g. the RefinedWeb/Dolma recipe: exact hash
    FIRST, then fuzzy MinHash, with SimHash as the cheap third vote):

    - ``via_exact``   — byte-identical text (md5 fingerprint),
    - ``via_minhash`` — shares a MinHash-LSH band (Jaccard-sensitive),
    - ``via_simhash`` — SimHash Hamming distance <= ``max_hamming``
      (cosine/bag-of-words-sensitive).

    Returns distinct ``(doc_a, doc_b, via_exact, via_minhash,
    via_simhash)`` with doc_a < doc_b and 0/1 signal flags (a pair can
    carry several).

    Scale shape: each signal is its own bounded-fan-out candidate join
    (hash agg star edges / one banded posting self-join / one banded
    posting self-join); the union is a 3-way unionAll + one
    map-side-combinable max() agg — no all-pairs stage anywhere. Exact
    duplicates emit STAR edges (group min ↔ member), not the quadratic
    within-group clique: downstream clustering only needs connectivity,
    and a 10^6-copy boilerplate group must not cost 10^12 pairs.
    """
    # star edges: (group-min, member) per fingerprint group
    fmin = (docs.select("doc_id", F.md5(F.col(text_col)).alias("_f"))
            .groupBy("_f").agg(F.min("doc_id").alias("_m")))
    ex = (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("_f"))
        .join(fmin, "_f")
        .filter(F.col("doc_id") != F.col("_m"))
        .select(F.col("_m").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    mh = minhash_lsh_candidates(docs, text_col=text_col,
                                n_hashes=n_hashes, bands=bands)
    sh = simhash_near_dup(docs, text_col=text_col, n_bits=simhash_bits,
                          max_hamming=max_hamming,
                          n_bands=simhash_bands).select("doc_a", "doc_b")

    def tag(df, e, m, s):
        return df.select(
            "doc_a", "doc_b",
            F.lit(e).alias("via_exact"),
            F.lit(m).alias("via_minhash"),
            F.lit(s).alias("via_simhash"),
        )

    return (
        tag(ex, 1, 0, 0)
        .unionAll(tag(mh, 0, 1, 0))
        .unionAll(tag(sh, 0, 0, 1))
        .groupBy("doc_a", "doc_b")
        .agg(F.max("via_exact").alias("via_exact"),
             F.max("via_minhash").alias("via_minhash"),
             F.max("via_simhash").alias("via_simhash"))
    )


def ensemble_dedup_clusters(
    docs: DataFrame,
    *,
    text_col: str = "text",
    quality_col: str | None = None,
    n_hashes: int = N_MINHASH,
    bands: int = MINHASH_BANDS,
    simhash_bits: int = SIMHASH_BITS,
    max_hamming: int = 3,
    simhash_bands: int | None = None,
) -> DataFrame:
    """End-to-end multi-signal dedup: :func:`ensemble_near_dup_pairs`
    → :func:`dedup_clusters` (WCC over pair endpoints only, canonical
    by quality then lowest id). Same output contract as
    ``dedup_clusters``: (doc_id, cluster_id, is_canonical) for EVERY
    doc."""
    pairs = ensemble_near_dup_pairs(
        docs, text_col=text_col, n_hashes=n_hashes, bands=bands,
        simhash_bits=simhash_bits, max_hamming=max_hamming,
        simhash_bands=simhash_bands,
    ).select("doc_a", "doc_b")
    return dedup_clusters(docs, pairs, quality_col=quality_col)


def lsh_recall_eval(
    docs: DataFrame,
    *,
    threshold: float = 0.8,
    n_hashes: int = 128,
    bands: int = 16,
    df_cutoff: int | None = TOKEN_DF_CUTOFF,
    text_col: str = "text",
    spark=None,
) -> DataFrame:
    """Tuning harness for the (n_hashes, bands) choice: compare the
    LSH candidate pairs against ground truth (exact token-Jaccard at
    ``threshold``) on the SAME corpus. One summary row:

        (n_true, n_candidates, n_hit, recall, candidate_precision)

    ``recall`` is the metric LSH theory bounds (1 − (1 − s^r)^b at
    similarity s); ``candidate_precision`` tells you what the verify
    stage downstream will pay per candidate. Both defined as 1.0 when
    their denominator is empty.

    Known asymmetry: ground truth is Jaccard over the ``df_cutoff``-
    PRUNED token sets, while the LSH side hashes the full token set
    (MinHash has no df prune). A candidate pair whose similarity lives
    in tokens above the cutoff counts against precision even though the
    banding behaved correctly on the full sets — so at aggressive
    cutoffs ``candidate_precision`` is a (slight) UNDER-estimate of the
    banding choice alone. Pass ``df_cutoff=None`` to measure pure
    banding; the default keeps the cutoff because that pruned truth is
    what the verify stage downstream actually computes. Run on a SAMPLE at 100 TB — ground
    truth is the quadratic exact join this harness exists to avoid;
    recall estimated on a deterministic-hash sample transfers because
    LSH candidacy is per-pair, independent of the rest of the corpus.
    """
    spark = spark or docs.sparkSession
    truth = token_jaccard_pairs(docs, threshold=threshold,
                                df_cutoff=df_cutoff, text_col=text_col)
    cand = minhash_lsh_candidates(docs, text_col=text_col,
                                  n_hashes=n_hashes, bands=bands)
    n_true = truth.count()
    n_cand = cand.count()
    n_hit = truth.select("doc_a", "doc_b").join(
        cand, ["doc_a", "doc_b"]).count()
    recall = 1.0 if n_true == 0 else round(n_hit / n_true, 6)
    prec = 1.0 if n_cand == 0 else round(n_hit / n_cand, 6)
    return spark.createDataFrame(
        [(int(n_true), int(n_cand), int(n_hit), float(recall),
          float(prec))],
        "n_true long, n_candidates long, n_hit long, recall double, "
        "candidate_precision double")
