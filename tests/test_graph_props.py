"""Property-based coverage for the iterative connected-components operator
(operators/graph.py, q49's engine): label propagation on arbitrary small
graphs — self-loops, parallel/duplicate edges, cycles, and long chains —
must equal a union-find model, with the component label = min node id.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from mapreduce_framework_spark.operators.graph import connected_components
import pytest
# Round 14 (VERDICT r13 item 2): excluded from the driver's default
# pytest run (see pytest.ini); opt in with -m slow.
pytestmark = pytest.mark.slow



def _model_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


_edge = st.tuples(
    st.integers(min_value=0, max_value=12), st.integers(min_value=0, max_value=12)
)
_graph = st.lists(_edge, min_size=1, max_size=20)


@settings(max_examples=15, deadline=None)
@given(edges=_graph)
def test_components_match_union_find(spark_global, edges):
    df = spark_global.createDataFrame([Row(u=u, v=v) for u, v in edges])
    got = {
        r["doc_id"]: r["component"] for r in connected_components(df).collect()
    }
    assert got == _model_components(edges)


def test_long_chain_converges(spark_global):
    """A path graph propagates the min one hop per round — diameter-many
    iterations, just inside MAX_ITERS; the worst convergence shape."""
    n = 16
    df = spark_global.createDataFrame([Row(u=i, v=i + 1) for i in range(n - 1)])
    got = {
        r["doc_id"]: r["component"] for r in connected_components(df).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_diameter_beyond_max_iters_raises(spark_global):
    """Non-convergence is a loud RuntimeError, not a silently-wrong
    labeling (the docstring's max_iters contract)."""
    import pytest

    df = spark_global.createDataFrame([Row(u=i, v=i + 1) for i in range(5)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iters=2)
