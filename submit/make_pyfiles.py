#!/usr/bin/env python
"""Build the --py-files zip: the whole package, importable from the
archive root (spark-submit adds the zip itself to sys.path on driver and
executors — no install step anywhere).

    python submit/make_pyfiles.py [dist/nga_spark.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "neo4j_graph_algorithms_spark"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    root = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "nga_spark.zip")
    print(build(out))
