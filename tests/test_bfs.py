import pytest

from graftpark import oracles
from graftpark.fixtures import FIXTURES
from graftpark.graph import Graph
from graftpark.kernels.bfs import bfs_parents, bfs_levels


CASES = [
    # (fixture, source, reference-accepted parent arrays from runtests.jl)
    ("g4_cycle", 1, [[1, 1, 1, 2], [1, 1, 1, 3]]),
    ("g4_cycle", 2, [[2, 2, 1, 2], [2, 2, 4, 2]]),
    ("g6_two_comp", 1, [[1, 1, 2, 0, 0, 0]]),
    ("g6_two_comp", 5, [[0, 0, 0, 5, 5, 5]]),
    ("g4_dir", 1, [[1, 1, 2, 3]]),
    ("g4_dir", 2, [[0, 2, 2, 3]]),
    ("g8_two_comp", 4, [[0, 0, 0, 4, 4, 5, 5, 7], [0, 0, 0, 4, 4, 5, 5, 6]]),
    ("g14_dir", 1, [[1, 1, 2, 3, 4, 5, 6, 4, 8, 9, 7, 10, 0, 7], [1, 1, 2, 3, 4, 5, 6, 4, 8, 9, 10, 10, 0, 7]]),
]


@pytest.mark.parametrize("name,source,accepted", CASES)
def test_bfs_parents_reference_fixtures(spark, name, source, accepted):
    n, directed, edges = FIXTURES[name]
    g = Graph.from_edge_list(spark, edges, n=n, directed=directed)
    res = bfs_parents(g, source, directed=directed)
    got = {r["id"]: r["parent"] for r in res.state.collect()}
    as_array = [got.get(v, 0) for v in range(1, n + 1)]  # 0 = unreached sentinel
    assert as_array in accepted, f"{as_array} not in accepted set"
    # engine is deterministic min-parent: must equal the python oracle exactly
    sym = edges if directed else edges + [(v, u) for u, v in edges]
    assert got == oracles.bfs_parents(sym, range(1, n + 1), source, directed=True)
    g.unpersist()


def test_bfs_g30_hub_vertex30_parent(spark):
    n, directed, edges = FIXTURES["g30_hub"]
    g = Graph.from_edge_list(spark, edges, n=n, directed=directed)
    got = {r["id"]: r["parent"] for r in bfs_parents(g, 1).state.collect()}
    assert got[30] in set(range(14, 30))  # runtests.jl:212-227
    assert len(got) == 30
    g.unpersist()


def test_bfs_invalid_source_raises(spark):
    n, directed, edges = FIXTURES["g4_cycle"]
    g = Graph.from_edge_list(spark, edges, n=n, directed=directed)
    for bad in (0, -1, 5):
        with pytest.raises(ValueError):
            bfs_parents(g, bad)
    g.unpersist()


def test_bfs_empty_graph(spark):
    g = Graph.from_edge_list(spark, [])
    assert bfs_parents(g, 1).state.count() == 0


def test_bfs_levels(spark):
    n, directed, edges = FIXTURES["g8_two_comp"]
    g = Graph.from_edge_list(spark, edges, n=n, directed=directed)
    got = {r["id"]: r["level"] for r in bfs_levels(g, 4).collect()}
    assert got == oracles.bfs_levels(edges + [(v, u) for u, v in edges], range(1, n + 1), 4, directed=True)
    g.unpersist()
