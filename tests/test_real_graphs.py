"""Real-graph smoke tests mirroring the reference stress suite
(test/runtests.jl:297-313): the road-network and internet-router
edge-list CSVs plus the Newman GML file shipped with the reference
benchmarks, loaded through the public source formats (S1/S2) and run
through BFS / connected components.
"""

import os

import pytest
from pyspark.sql import functions as F

from graftpark.graph import Graph
from graftpark.kernels.bfs import bfs_levels, bfs_parents
from graftpark.kernels.components import connected_components

DATA = "/root/reference/benchmark/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference benchmark data not present"
)


def test_routers_csv_bfs_and_cc(spark):
    g = Graph.from_csv(spark, f"{DATA}/routers.csv", directed=False)
    n = g.num_vertices()
    assert n > 1000
    # internet AS topology: small diameter, one giant component
    res = bfs_parents(g, 1, max_supersteps=50)
    assert res.supersteps < 50  # frontier emptied (BFS completed)
    reached = res.state.count()
    assert reached > 0.9 * n
    cc = connected_components(g, max_supersteps=50)
    assert cc.converged
    n_comp = cc.state.select("comp").distinct().count()
    assert 1 <= n_comp < 0.1 * n
    giant = cc.state.groupBy("comp").count().agg(F.max("count")).collect()[0][0]
    assert giant == reached  # BFS from vertex 1 spans exactly its component


def test_roads_csv_degrees_and_bounded_bfs(spark):
    g = Graph.from_csv(spark, f"{DATA}/roads.csv", directed=False)
    n = g.num_vertices()
    assert n > 1000
    degs = g.degrees()
    assert degs.count() == n
    # road networks are near-planar: max degree is tiny
    assert degs.agg(F.max("deg")).collect()[0][0] <= 16
    # high-diameter graph: run a bounded BFS and check monotone expansion
    src = g.vertices().agg(F.min("id")).collect()[0][0]
    levels = bfs_levels(g, src, max_supersteps=8)
    by_level = {r["level"]: r["count"] for r in levels.groupBy("level").count().collect()}
    assert by_level[0] == 1 and len(by_level) >= 5


def test_gml_load_bfs(spark):
    g = Graph.from_gml(spark, f"{DATA}/internet_routers_bigger.gml")
    n = g.num_vertices()
    n_edges = g.edges.count()
    assert n > 10000 and n_edges > 2 * 40000  # symmetrized undirected edges
    res = bfs_parents(g, 1, max_supersteps=50)
    assert res.supersteps < 50
    reached = res.state.count()
    assert reached > 0.9 * n


def test_gml_round_trip(spark, tmp_path):
    """to_gml/from_gml export symmetry (reference loadgraph/savegraph
    round-trip, test/runtests.jl:297-313): write the routers graph back
    out as GML, reload, and require the identical vertex and symmetrized
    edge sets."""
    g = Graph.from_csv(spark, f"{DATA}/routers.csv", directed=False)
    out = str(tmp_path / "routers_roundtrip.gml")
    g.to_gml(out, directed=False)
    g2 = Graph.from_gml(spark, out)
    assert g2.num_vertices() == g.num_vertices()
    assert set(map(tuple, g2.vertices().collect())) == set(map(tuple, g.vertices().collect()))
    a = {(r["src"], r["dst"]) for r in g.edges_sym().collect()}
    b = {(r["src"], r["dst"]) for r in g2.edges_sym().collect()}
    assert a == b
    # the file honors the format from_gml parses: flag + node/edge blocks
    head = open(out).read(200)
    assert head.startswith("graph\n[\n  directed 0\n  node\n  [")


def test_gml_round_trip_directed(spark, tmp_path):
    """Directed export preserves edge orientation through the flag."""
    g = Graph(spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src LONG, dst LONG"))
    out = str(tmp_path / "tri.gml")
    g.to_gml(out, directed=True)
    g2 = Graph.from_gml(spark, out)  # directed=None honors the file flag
    assert {(r["src"], r["dst"]) for r in g2.edges.collect()} == {(1, 2), (2, 3), (3, 1)}
