"""Rehearse the driver's CORRECTNESS gate before the driver runs it.

Replays the first 50 ``queries()`` entries (or all, or a named subset)
against their DuckDB ``oracle_sql()`` twins at the driver's scale
(sf0.01) IN ONE SHARED SparkSession — the same conditions as the real
gate, which is what surfaces cross-query session-state interactions a
per-query pytest cannot (this harness caught the pca_covariance
zero-sign flip that 8 isolated runs missed).

Usage:
    python tools/replay_window.py                 # window (first 50)
    python tools/replay_window.py --all           # every oracle-backed entry
    python tools/replay_window.py pagerank wcc    # named queries
    SF_DIR=/root/testdata/sf0.001 python tools/replay_window.py

Writes per-query results to replay_window.json next to this file and
prints one line per query; exit code 1 if anything mismatches.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _canon(pdf):
    """Driver-faithful canonicalization: the real gate converts BOTH
    sides to pandas (Spark ``.toPandas()``, DuckDB ``.df()``) and then
    sorts/hashes the frame. Replaying through pandas is what reproduces
    the two r4 serialization hazards the old fetchall()-based compare
    silently papered over:

    - DuckDB HUGEINT (e.g. an uncast SUM(BIGINT)) becomes **float64**
      in ``.df()`` while Spark's long stays int64 — repr(3.3e9) !=
      str(3300000000), so the mismatch is visible here exactly as it is
      in the driver (r4 red row ``hyperball_anf``).
    - list/array columns make ``DataFrame.sort_values`` raise
      TypeError (unhashable) — we deliberately do NOT catch it, so a
      window query emitting a raw array column fails rehearsal the way
      it failed the driver (r4 red row ``inverted_index``).

    Returns row-sorted, column-name-sorted value strings; floats via
    repr so -0.0/0.0 and 1-ulp diffs stay visible.
    """
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    out = []
    for row in pdf.itertuples(index=False, name=None):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from neo4j_graph_algorithms_spark.session import get_spark

    sf = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    run_all = "--all" in sys.argv

    qs = entry.queries()
    oracles = entry.oracle_sql()
    if args:
        keys = args
    elif run_all:
        keys = [k for k in qs if k in oracles]
    else:
        keys = [k for k in list(qs)[:50]]

    spark = get_spark(master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.driver.memory": "48g"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"parquet_scan('{sf}/{t}.parquet')")

    results: dict[str, dict] = {}
    for k in keys:
        t0 = time.time()
        rec: dict = {}
        try:
            sdf = qs[k](spark, sf)
            spdf = sdf.toPandas()  # the driver's serialization path
            scols = list(spdf.columns)
            if k in oracles:
                opdf = con.execute(oracles[k]).df()
                ocols = list(opdf.columns)
                rec["spark_rows"], rec["oracle_rows"] = len(spdf), len(opdf)
                rec["rows_match"] = len(spdf) == len(opdf)
                rec["schema_match"] = sorted(scols) == sorted(ocols)
                if rec["rows_match"] and rec["schema_match"]:
                    a, b = _canon(spdf), _canon(opdf)
                    rec["hash_match"] = a == b
                    if not rec["hash_match"]:
                        rec["first_diffs"] = [
                            (x, y) for x, y in zip(a, b) if x != y][:3]
                else:
                    rec["hash_match"] = False
                    rec["spark_cols"], rec["oracle_cols"] = scols, ocols
            else:
                _canon(spdf)  # rows-only entries still must survive pandas
                rec["spark_rows"] = len(spdf)
                rec["hash_match"] = None  # rows-only entry
            rec["err"] = None
        except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
            rec["err"] = f"{type(ex).__name__}: {ex}"
            rec["trace"] = traceback.format_exc()[-1500:]
        rec["sec"] = round(time.time() - t0, 1)
        results[k] = rec
        ok = rec.get("hash_match")
        status = "OK" if ok else ("rows-only" if ok is None else "FAIL")
        print(f"{k}: {status} ({rec['sec']}s)", flush=True)

    bad = [k for k, v in results.items() if v.get("hash_match") is False
           or v.get("err")]
    print(f"=== {len(results) - len(bad)}/{len(results)} green ===")
    if bad:
        print("FAILING:", bad)
    with open(os.path.join(os.path.dirname(__file__),
                           "replay_window.json"), "w") as f:
        json.dump(results, f, indent=1, default=str)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
