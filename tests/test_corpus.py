import pytest
from pyspark.sql import functions as F

from graftpark import oracles
from graftpark.corpus import corpus_to_graph, extract_edges, synthesize_corpus
from graftpark.fixtures import FIXTURES
from graftpark.graph import Graph, densify_ids
from graftpark.kernels.pagerank import pagerank


def _fixture_edges(spark, name):
    n, directed, edges = FIXTURES[name]
    g = Graph.from_edge_list(spark, edges, n=n, directed=directed)
    return g, n, directed, edges


def test_corpus_sha_invariant_and_determinism(spark):
    g, n, directed, edges = _fixture_edges(spark, "g14_dir")
    corpus = synthesize_corpus(spark, g.edges, g.vertices())
    rows = corpus.collect()
    assert len(rows) == n  # one file per repo, incl. no-import repos
    # per-row invariant: stored sha equals sha2(content) recomputed
    bad = corpus.where(F.sha2(F.col("content"), 256) != F.col("content_sha")).count()
    assert bad == 0
    # deterministic: re-synthesis yields identical shas
    again = {r["repo"]: r["content_sha"] for r in synthesize_corpus(spark, g.edges, g.vertices()).collect()}
    assert again == {r["repo"]: r["content_sha"] for r in rows}


def test_extracted_edges_equal_planted(spark):
    g, n, directed, edges = _fixture_edges(spark, "g14_dir")
    corpus = synthesize_corpus(spark, g.edges, g.vertices())
    got = {
        (r["src_repo"], r["dst_repo"]) for r in extract_edges(corpus).collect()
    }
    expect = {(f"repo_{u:06d}", f"repo_{v:06d}") for u, v in edges}
    assert got == expect
    # sha invariant survives the extraction pipeline (corpus untouched)
    assert corpus.where(F.sha2(F.col("content"), 256) != F.col("content_sha")).count() == 0


def test_corpus_to_graph_roundtrip_and_pagerank_parity(spark):
    # full slice: fixture graph → corpus → extract → densify → PageRank
    # must equal PageRank over the original edge table (SURVEY.md §7 M1)
    g, n, directed, edges = _fixture_edges(spark, "g14_dir")
    corpus = synthesize_corpus(spark, g.edges, g.vertices())
    g2, vertex_map = corpus_to_graph(corpus)
    assert g2.num_vertices() == n
    # dense ids are 1..n in repo-name (= original id) order
    mapping = {r["repo"]: r["id"] for r in vertex_map.collect()}
    assert mapping == {f"repo_{i:06d}": i for i in range(1, n + 1)}
    got_edges = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    assert got_edges == set(edges)
    res = pagerank(g2, tol=0.0, max_supersteps=10)
    got = {r["id"]: r["rank"] for r in res.state.select("id", "rank").collect()}
    expect, _ = oracles.pagerank(edges, range(1, n + 1), tol=0.0, max_iter=10)
    for v in expect:
        assert got[v] == pytest.approx(expect[v], abs=1e-9)
    g2.unpersist()


def test_corpus_dangling_import_becomes_vertex(spark):
    corpus = synthesize_corpus(
        spark, spark.createDataFrame([(1, 2), (1, 99)], "src LONG, dst LONG")
    )
    # repo 99 never has a file row itself unless in vertices; drop it from corpus
    corpus = corpus.where(F.col("repo") != "repo_000099")
    g2, vertex_map = corpus_to_graph(corpus)
    names = {r["repo"] for r in vertex_map.collect()}
    assert "repo_000099" in names  # dangling import still a vertex
    assert g2.num_vertices() == 3


def test_densify_ids_dense_and_ordered(spark):
    df = spark.createDataFrame([("c",), ("a",), ("b",), ("a",)], "name STRING")
    got = {r["name"]: r["id"] for r in densify_ids(df, "name", num_partitions=3).collect()}
    assert got == {"a": 1, "b": 2, "c": 3}
