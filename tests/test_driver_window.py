"""Driver check-window invariants (no Spark needed).

The harness verifies only the FIRST 50 entries of ``queries()`` against
their DuckDB oracles, so the dict order is a curated proof surface
(VERDICT r2 "what's wrong" #1; VERDICT r3 next-round #1 rotated the
window onto the entries that had never held a driver row). These tests
pin the curation rules so a future append can't silently push a family
out of the proof surface or ship a new entry without gate evidence:

1. every operator family keeps a row in the window OR is already
   driver-proven by a prior round's committed CORRECTNESS artifact
   (family evidence never regresses to pytest-only);
2. every window entry is oracle-backed;
3. every registry entry added after round 4 must enter the window
   (the safety net the r3 verdict asked for — next-round #9).
"""

import json
import os

import __spark_entry__ as em

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAMILIES = {
    "pagerank": ["pagerank", "pagerank_weighted", "pagerank_dangling",
                 "pagerank_batch_ppr", "katz", "ppr_sweep_cut"],
    "kcore": ["k_core"],
    "trustrank": ["spam_mass", "anti_trust_rank"],
    "pages_e2e": ["pages_pagerank_e2e", "pages_extract_edges",
                  "pages_host_pagerank"],
    "anchors": ["anchor_stats"],
    "wcc": ["wcc", "streaming_wcc", "wcc_stats"],
    "labelprop": ["label_propagation", "label_propagation_seeded"],
    "triangles": ["triangles_per_node", "triangles_sampled",
                  "balanced_triads", "butterfly_count"],
    "traversal": ["bfs_from_0", "dfs_from_0", "sssp_from_0",
                  "shortest_path", "k_shortest_paths", "random_walks",
                  "random_walks_weighted", "landmark_distances"],
    "centrality": ["eigenvector", "hits", "salsa", "degree_in",
                   "closeness", "betweenness", "betweenness_sampled",
                   "opic_importance"],
    "community": ["scc", "louvain_onelevel", "louvain_twolevel",
                  "infomap_fixedmerges", "louvain_invariants",
                  "infomap_invariants", "modularity",
                  "community_compare", "community_conductance",
                  "bowtie_classes"],
    "spanning": ["spanning_tree", "k_spanning_tree"],
    "scalars": ["scalar_functions"],
    "linkpred": ["link_prediction"],
    "similarity": ["jaccard_categories", "euclidean_similarity",
                   "pearson_similarity", "cosine_knn", "coupling_pairs",
                   "similarity_overlap"],
    "sinks": ["relationship_writeback"],
    "catalog": ["graph_catalog_projection"],
    "registry": ["algo_list"],
    "hyperball": ["hyperball_balls", "hyperball_anf",
                  "effective_diameter", "approx_eccentricity"],
    "dedup": ["exact_dedup", "minhash_lsh_candidates", "dedup_clusters",
              "token_jaccard_pairs", "ngram_jaccard_pairs",
              "simhash_near_dup", "duplicate_span_scores",
              "containment_pairs", "ensemble_dedup", "lsh_eval"],
    "ann": ["lsh_sign_buckets", "embedding_near_dup", "ivf_knn"],
    "kmeans": ["kmeans_clusters", "semantic_dedup"],
    "text": ["token_stats", "bpe_token_stats", "quality_scores",
             "language_id", "doc_fingerprints", "one_hot_lang",
             "repetition_scores", "ngram_lm_score"],
    "decontam": ["decontaminate"],
    "filtering": ["pii_scrub", "c4_filter", "curation_e2e"],
    "indexing": ["vocab_top", "tfidf_top_terms", "inverted_index",
                 "cooccurrence_pmi"],
    "pca": ["pca_covariance"],
    "graphstats": ["degree_histogram", "graph_summary", "powerlaw_fit",
                   "diameter_sweep", "rewire_null_model"],
    "cocitation": ["cocitation_pairs"],
    "ktruss": ["k_truss"],
    "mis": ["maximal_independent_set", "greedy_coloring",
            "vertex_cover"],
    "matching": ["maximal_matching", "coarsen_matching",
                 "multilevel_bisect"],
    "redirects": ["resolve_redirects"],
    "embedding_prep": ["node2vec_pairs"],
    "mixing": ["mix_corpus", "temperature_mix"],
    "packing": ["pack_sequences"],
    "sampling": ["sample_documents", "stratified_sample",
                 "weighted_sample"],
    "events": ["events_window", "events_sessionize", "events_latest"],
    "urlnorm": ["canonical_urls", "url_dedup", "streaming_url_dedup"],
    "lines": ["line_dedup", "boilerplate_scores"],
    "simrank": ["simrank"],
    "projection": ["random_projection"],
    "refinement": ["louvain_refined"],
    "perplexity": ["perplexity_buckets"],
    "bpe": ["bpe_train", "bpe_encode"],
    "wtf": ["who_to_follow"],
    "hostextra": ["mirror_hosts", "crawl_frontier"],
    "sketches": ["hll_source_distinct", "cms_heavy_hitters",
                 "streaming_cms"],
    "warc": ["warc_roundtrip"],
    "classifier": ["quality_classifier"],
    "multimodal": ["image_features", "audio_features", "frame_sample"],
}

# Registry as of the end of round 4. Anything added after this point
# MUST sit inside the window (test_new_entries_enter_the_window) so no
# future operator ships with pytest-only evidence.
R4_REGISTRY = {
    "all_shortest_paths", "anchor_stats", "anti_trust_rank",
    "approx_eccentricity", "articlerank", "as_vector", "astar_path",
    "balanced_triads", "betweenness", "betweenness_sampled",
    "bfs_from_0", "boilerplate_scores", "bowtie_classes", "bpe_encode",
    "bpe_token_stats", "bpe_train", "butterfly_count", "c4_filter",
    "canonical_urls", "closeness", "closeness_wf",
    "clustering_coefficient", "coarsen_matching", "cocitation_pairs",
    "community_compare", "community_conductance", "containment_pairs",
    "cooccurrence_pmi", "cosine_knn", "coupling_pairs",
    "crawl_frontier", "curation_e2e", "dangalchev", "decontaminate",
    "dedup_clusters", "degree_histogram", "degree_in",
    "degree_in_weighted", "degree_out", "densest_subgraph",
    "dfs_from_0", "diameter_sweep", "doc_fingerprints",
    "duplicate_span_scores", "effective_diameter", "eigenvector",
    "eigenvector_l1norm", "embedding_near_dup", "ensemble_dedup",
    "euclidean_similarity", "events_latest", "events_sessionize",
    "events_window", "exact_dedup", "graph_summary", "greedy_coloring",
    "harmonic", "hits", "hll_source_distinct", "hyperball_anf",
    "hyperball_balls", "infomap", "infomap_fixedmerges",
    "infomap_invariants", "inverted_index", "ivf_knn",
    "jaccard_categories", "jaccard_degree_cutoff", "k_core",
    "k_shortest_paths", "k_spanning_tree", "k_truss", "katz",
    "kmeans_clusters", "label_propagation", "label_propagation_seeded",
    "landmark_distances", "language_id", "line_dedup",
    "link_prediction", "louvain", "louvain_invariants",
    "louvain_onelevel", "louvain_refined", "louvain_twolevel",
    "lsh_eval", "lsh_sign_buckets", "maximal_independent_set",
    "maximal_matching", "minhash_lsh_candidates", "minhash_signatures",
    "mirror_hosts", "mix_corpus", "modularity", "multilevel_bisect",
    "ngram_jaccard_pairs", "ngram_lm_score", "node2vec_pairs",
    "one_hot_lang", "opic_importance", "pack_sequences", "pagerank",
    "pagerank_batch_ppr", "pagerank_csr", "pagerank_dangling",
    "pagerank_delta", "pagerank_incremental", "pagerank_personalized",
    "pagerank_tolerance", "pagerank_topk", "pagerank_weighted",
    "pages_extract_edges", "pages_host_graph", "pages_host_pagerank",
    "pages_pagerank_e2e", "pca_covariance", "pearson_similarity",
    "perplexity_buckets", "pii_scrub", "powerlaw_fit", "ppr_sweep_cut",
    "quality_scores", "random_projection", "random_walks",
    "random_walks_weighted", "repetition_scores", "resolve_redirects",
    "rewire_null_model", "salsa", "sample_documents",
    "scalar_functions", "scc", "semantic_dedup", "shortest_path",
    "simhash_near_dup", "simhash_signatures", "simrank", "spam_mass",
    "spanning_tree", "sssp_from_0", "stratified_sample",
    "streaming_near_dup", "streaming_url_dedup", "streaming_wcc",
    "temperature_mix", "tfidf_top_terms", "token_jaccard_pairs",
    "token_stats", "triangle_global", "triangle_list",
    "triangles_incremental", "triangles_per_node", "triangles_sampled",
    "url_dedup", "vertex_cover", "vocab_top", "warc_roundtrip", "wcc",
    "wcc_incremental",
    "wcc_stats", "wcc_threshold", "weighted_sample", "who_to_follow",
}


def _proven_in_prior_rounds() -> set[str]:
    """Entries all-green in a committed driver CORRECTNESS artifact."""
    proven = set()
    for fname in sorted(os.listdir(_REPO)):
        if not (fname.startswith("CORRECTNESS_r") and
                fname.endswith(".json")):
            continue
        with open(os.path.join(_REPO, fname)) as fh:
            rec = json.load(fh)
        for k, v in rec.items():
            if (isinstance(v, dict) and v.get("rows_match")
                    and v.get("schema_match")
                    and v.get("hash_match") and not v.get("err")):
                proven.add(k)
    return proven


def test_window_is_exactly_50():
    assert len(list(em.queries())[:50]) == 50
    assert em._WINDOW == list(em.queries())[:50]


def test_every_family_keeps_evidence():
    """A family row must be in THIS round's window or already proven by
    a recorded driver gate — rotating a family fully out of the window
    is fine only once its members carry permanent artifact evidence."""
    window = set(list(em.queries())[:50])
    proven = _proven_in_prior_rounds()
    for fam, members in FAMILIES.items():
        assert (window | proven) & set(members), \
            f"family {fam} has neither a window row nor prior proof"


def test_core_four_always_in_window():
    assert {"pagerank", "wcc", "label_propagation",
            "triangles_per_node"} <= set(list(em.queries())[:50])


def test_every_window_entry_is_oracle_checked():
    window = list(em.queries())[:50]
    oracles = em.oracle_sql()
    missing = [k for k in window if k not in oracles]
    assert not missing, f"window entries without oracle: {missing}"


def test_every_oracle_has_a_query():
    q = em.queries()
    dangling = [k for k in em.oracle_sql() if k not in q]
    assert not dangling, dangling


def test_every_family_member_is_registered():
    q = set(em.queries())
    for fam, members in FAMILIES.items():
        unknown = [m for m in members if m not in q]
        assert not unknown, f"family {fam} lists unregistered {unknown}"


def test_new_entries_enter_the_window():
    """VERDICT r3 next-round #9: anything added to the registry after
    this round must take a window slot (and thus a driver row) in the
    round that introduces it."""
    window = set(list(em.queries())[:50])
    newcomers = set(em.queries()) - R4_REGISTRY
    outside = sorted(newcomers - window)
    assert not outside, \
        f"registry entries added after r4 but not in the window: {outside}"


def test_window_oracles_have_driver_safe_types():
    """The two r4 red rows were both pandas-serialization hazards the
    fetchall()-based rehearsal couldn't see: an uncast SUM(BIGINT)
    widening to HUGEINT (float64 in the driver's ``.df()``), and a raw
    LIST column (unhashable in the driver's ``sort_values``). Lint
    every window oracle's result schema via DuckDB DESCRIBE (binding
    only, no data, no Spark): no HUGEINT/DECIMAL numerics, no
    LIST/STRUCT/MAP columns may reach the driver compare."""
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'/root/testdata/sf0.001/{t}.parquet'")
    oracles = em.oracle_sql()
    bad = []
    for k in list(em.queries())[:50]:
        desc = con.execute(f"DESCRIBE {oracles[k]}").fetchall()
        for row in desc:
            col, typ = row[0], row[1].upper()
            if ("HUGEINT" in typ or "DECIMAL" in typ or "[]" in typ
                    or typ.startswith(("STRUCT", "MAP", "LIST"))):
                bad.append((k, col, typ))
    assert not bad, f"driver-unsafe oracle column types in window: {bad}"


def test_rows_only_entries_are_documented_tail():
    # the only registry entries without oracles must be the documented
    # data-dependent ones, and they must sit OUTSIDE the window (their
    # invariant twins louvain_invariants/infomap_invariants carry the
    # window evidence for those code paths)
    q = list(em.queries())
    oracles = em.oracle_sql()
    no_oracle = [k for k in q if k not in oracles]
    assert set(no_oracle) <= {"louvain", "infomap"}, no_oracle
    for k in no_oracle:
        assert q.index(k) >= 50, f"{k} is rows-only but inside the window"
