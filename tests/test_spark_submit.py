"""The north-rule deployment path end-to-end: package → spark-submit
--py-files → multi-executor (local-cluster) run → JSON metrics + parquet
sink. The package must be importable from the zip ALONE (cwd is neutral,
so nothing shadows it)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_make_pyfiles_zip(tmp_path):
    sys.path.insert(0, REPO)
    from submit.make_pyfiles import build

    out = build(str(tmp_path / "nga.zip"))
    import zipfile

    names = zipfile.ZipFile(out).namelist()
    assert "neo4j_graph_algorithms_spark/__init__.py" in names
    assert "neo4j_graph_algorithms_spark/operators/pagerank.py" in names
    assert not any("__pycache__" in n for n in names)


def test_spark_submit_local_cluster(tmp_path):
    """2 real executor JVMs; flagship pages→extract→rank path; ranks
    written through the parquet sink and readable back."""
    sys.path.insert(0, REPO)
    from submit.make_pyfiles import build

    zip_path = build(str(tmp_path / "nga.zip"))
    out_dir = str(tmp_path / "ranks")
    proc = subprocess.run(
        ["spark-submit", "--master", "local-cluster[2,2,1536]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.executor.memory=1g",
         "--py-files", zip_path,
         os.path.join(REPO, "submit", "pagerank_submit.py"),
         "--pages", "2000", "--max-iters", "5",
         "--shuffle-partitions", "8", "--output", out_dir],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    m = json.loads(line)
    assert m["executors_incl_driver"] == 3  # driver + 2 executor JVMs
    assert m["nodes"] == 2000 and m["supersteps"] == 5
    assert m["edges"] > 0
    assert os.path.exists(os.path.join(out_dir, "_SUCCESS"))
