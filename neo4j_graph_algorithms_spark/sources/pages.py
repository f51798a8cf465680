"""Deterministic synthetic Common-Crawl-style pages table (fixture
"pages-small", FIXTURES.md §10).

Schema per BASELINE.json input_hint:
``url string, warc_ts timestamp, html binary, text string, lang string``.

Every value is a pure function of the page index ``i`` (stateless
splitmix64-style integer mixing — no RNG objects), so generation is

- **order- and partition-independent**: the same row is produced no
  matter how ``spark.range`` splits the index space — a requirement for
  reproducing the table at any scale/parallelism;
- **vectorized**: NumPy over Arrow batches via ``mapInPandas``; and
- **re-derivable in the driver**: :func:`expected_edges` recomputes the
  exact link list in plain NumPy so extraction can be tested for
  byte-exact equality against the generator.

Link structure: out-degree ~ truncated power law (Zipf-ish via inverse
CDF), targets biased toward low page indices (``floor(N·u²)``) so
in-degree is heavy-tailed — real web-graph hubs — exercising the skew
paths (AQE skew-join, hub splitting).
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

__all__ = ["generate_pages", "expected_edges", "page_url", "page_text"]

_EPOCH = datetime(2020, 1, 1, tzinfo=timezone.utc).timestamp()
_LANGS = np.array(["en", "de", "fr"])
_MAX_DEG_DEFAULT = 64

_WORDS = {
    "en": "the quick brown fox jumps over the lazy dog near the riverbank",
    "de": "der schnelle braune fuchs springt ueber den faulen hund am flussufer",
    "fr": "le rapide renard brun saute par dessus le chien paresseux pres de la rive",
}


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized stateless hash (uint64 in/out)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


def _uniform(x: np.ndarray) -> np.ndarray:
    """uint64 hash → float64 uniform in [0, 1)."""
    return (_mix64(x) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def page_url(i: int | np.ndarray, n_hosts: int = 1) -> "np.ndarray | str":
    """URL of page ``i``. ``n_hosts > 1`` shards pages across synthetic
    hosts ``h{i % n_hosts}.example.org`` (deterministic in ``i`` alone)
    so host-level rollups (operators/hostgraph.py) have real multi-host
    structure; the default 1 keeps the original single-host byte-exact
    URL every existing oracle replays."""
    if n_hosts <= 1:
        if isinstance(i, np.ndarray):
            return np.char.add("https://example.org/p/", i.astype(str))
        return f"https://example.org/p/{i}"
    if isinstance(i, np.ndarray):
        host = np.char.add(np.char.add("https://h", (i % n_hosts).astype(str)),
                           ".example.org/p/")
        return np.char.add(host, i.astype(str))
    return f"https://h{i % n_hosts}.example.org/p/{i}"


def page_text(i: int, lang: str) -> str:
    base = _WORDS[lang]
    reps = 3 + (i % 5)
    return " ".join(f"{base} page {i} segment {k}" for k in range(reps))


def _out_degree(idx: np.ndarray, seed: int, max_degree: int) -> np.ndarray:
    """Truncated Zipf-ish out-degree: P(deg ≥ k) ∝ k^-1.  deg in [0, max]."""
    u = _uniform(idx.astype(np.uint64) ^ np.uint64(seed * 0x1234567) ^ np.uint64(0xDEAD))
    # inverse CDF of a discrete power law on [1, max]; ~8% dangling pages
    dangling = _uniform(idx.astype(np.uint64) ^ np.uint64(0xBEEF)) < 0.08
    deg = np.floor(np.exp(u * np.log(max_degree))).astype(np.int64)
    deg[dangling] = 0
    return np.clip(deg, 0, max_degree)


def _targets_for(i: int, deg: int, n: int, seed: int) -> np.ndarray:
    """Deterministic link targets of page i (may contain duplicates —
    dedup is the engine's job, per AdjacencyCompression semantics)."""
    if deg == 0:
        return np.empty(0, dtype=np.int64)
    j = np.arange(deg, dtype=np.uint64)
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        h = np.uint64(i) * np.uint64(0x9E3779B97F4A7C15) ^ (j + np.uint64(seed))
    u = _uniform(h)
    # quadratic bias toward low indices → heavy-tailed in-degree (hubs)
    t = np.floor(n * u * u).astype(np.int64)
    return np.clip(t, 0, n - 1)


def _rows_for_indices(idx: np.ndarray, n: int, seed: int,
                      max_degree: int, n_hosts: int = 1) -> pd.DataFrame:
    degs = _out_degree(idx, seed, max_degree)
    urls, ts, htmls, texts, langs = [], [], [], [], []
    for i, deg in zip(idx.tolist(), degs.tolist()):
        lang = _LANGS[i % 3]
        text = page_text(i, lang)
        targets = _targets_for(i, deg, n, seed)
        anchors = "".join(
            f'<a href="{page_url(t, n_hosts)}">link-{k}</a>'
            for k, t in enumerate(targets.tolist())
        )
        html = (
            f"<html><head><title>Page {i}</title></head>"
            f'<body><p>{text}</p><div class="links">{anchors}</div></body></html>'
        )
        urls.append(page_url(i, n_hosts))
        ts.append(pd.Timestamp(_EPOCH + i, unit="s", tz="UTC"))
        htmls.append(html.encode("utf-8"))
        texts.append(text)
        langs.append(lang)
    return pd.DataFrame(
        {"url": urls, "warc_ts": ts, "html": htmls, "text": texts, "lang": langs}
    )


def generate_pages(
    spark: SparkSession,
    n: int,
    *,
    seed: int = 42,
    max_degree: int = _MAX_DEG_DEFAULT,
    n_hosts: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Pages DataFrame of ``n`` synthetic pages (deterministic in ``n``
    and ``seed`` only). Scales by partitioning the index range."""
    num_partitions = num_partitions or max(
        2, int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            if len(idx):
                yield _rows_for_indices(idx, n, seed, max_degree, n_hosts)

    rng = spark.range(0, n, 1, num_partitions)
    return rng.mapInPandas(
        gen, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def expected_edges(n: int, *, seed: int = 42,
                   max_degree: int = _MAX_DEG_DEFAULT,
                   n_hosts: int = 1) -> pd.DataFrame:
    """The generator's own (src_url, dst_url) link list, recomputed in
    driver NumPy — the oracle for extraction correctness (duplicates
    preserved; the engine dedups downstream)."""
    idx = np.arange(n, dtype=np.int64)
    degs = _out_degree(idx, seed, max_degree)
    srcs, dsts = [], []
    for i, deg in zip(idx.tolist(), degs.tolist()):
        for t in _targets_for(i, deg, n, seed).tolist():
            srcs.append(page_url(i, n_hosts))
            dsts.append(page_url(t, n_hosts))
    return pd.DataFrame({"src_url": srcs, "dst_url": dsts})
