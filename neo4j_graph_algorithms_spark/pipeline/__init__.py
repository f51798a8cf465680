"""Training-data pipeline operators over the ``documents`` /
``embeddings`` tables: deduplication (exact, MinHash-LSH, SimHash,
n-gram Jaccard), similarity search (brute-force + LSH-bucketed ANN),
and text analysis (language-ID, quality scoring, token stats,
fingerprinting).

Everything is expressed with built-in JVM-side column functions
(higher-order array functions, md5, bit ops) — no Python in the hot
path — and every hash is an md5-derived integer so the DuckDB oracle
can reproduce values bit-exactly (see :mod:`.oracles`).
"""
