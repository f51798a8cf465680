"""The rehearsal harness must reproduce the driver's serialization
hazards (VERDICT r4 next-round #1c): the r4 gate went 48/50 while the
fetchall()-based rehearsal said 50/50 because the two comparators
canonicalized differently. These tests pin the pandas-faithful
``_canon`` (shared shape in tools/replay_window.py and
tests/test_oracle_parity.py) against deliberately-injected copies of
both r4 regressions — if a future refactor quietly reverts to a
value-level compare, these fail.
"""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from replay_window import _canon  # noqa: E402


def test_hugeint_widening_is_visible():
    """An uncast SUM(BIGINT) comes back HUGEINT from DuckDB, which
    pandas renders as float64 — the r4 hyperball_anf red row. The
    canonicalizer must distinguish that frame from the int64 Spark
    side even though the VALUES are numerically equal."""
    widened = duckdb.sql(
        "SELECT SUM(CAST(x AS BIGINT)) AS s "
        "FROM (SELECT 3322230000 AS x)").df()
    assert widened["s"].dtype.kind == "f"  # the hazard exists at all
    exact = pd.DataFrame({"s": pd.array([3322230000], dtype="int64")})
    assert _canon(widened) != _canon(exact)


def test_cast_bigint_restores_the_match():
    fixed = duckdb.sql(
        "SELECT CAST(SUM(CAST(x AS BIGINT)) AS BIGINT) AS s "
        "FROM (SELECT 3322230000 AS x)").df()
    exact = pd.DataFrame({"s": pd.array([3322230000], dtype="int64")})
    assert _canon(fixed) == _canon(exact)


def test_array_column_raises_like_the_driver():
    """A list-typed column makes pandas sort_values raise TypeError
    (unhashable) — the r4 inverted_index red row. The canonicalizer
    must NOT swallow it (the old fetchall harness json-dumped lists
    and compared happily)."""
    arr = pd.DataFrame({"t": ["x", "y"], "p": [[1, 2], [3]]})
    with pytest.raises(TypeError):
        _canon(arr)


def test_float_repr_distinguishes_one_ulp():
    a = pd.DataFrame({"x": [0.1 + 0.2]})
    b = pd.DataFrame({"x": [0.3]})
    assert _canon(a) != _canon(b)


def test_negative_zero_is_visible():
    a = pd.DataFrame({"x": [-0.0]})
    b = pd.DataFrame({"x": [0.0]})
    assert _canon(a) != _canon(b)
