import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo4j_graph_algorithms_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="nga-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


def make_edges(spark, pairs, names=None, weights=None):
    """Edge DataFrame from (src_name, dst_name[, weight]) tuples, names
    mapped to dense ids by insertion order (reference CREATE order)."""
    names = names or []
    idx = {n: i for i, n in enumerate(names)}
    rows = []
    for p in pairs:
        if len(p) == 3:
            s, d, w = p
        else:
            (s, d), w = p, 1.0
        rows.append((idx.get(s, s), idx.get(d, d), float(w)))
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def make_vertices(spark, names, partition=None, weight=None):
    rows = []
    for i, n in enumerate(names):
        rows.append(
            (
                i,
                None if partition is None else partition.get(n),
                None if weight is None else weight.get(n),
            )
        )
    return spark.createDataFrame(rows, "id long, partition long, weight double")
