"""Triangle counting — ordered-wedge join with degree orientation.

No reference analogue; mandated by BASELINE.json `north_rule`, design
per SURVEY.md §2.11 and standard public literature (orient each
undirected edge from the lower-(degree, id) endpoint to the higher, so
each triangle is counted exactly once as a wedge at its lowest-order
vertex plus one closing-edge probe).

Skew: orienting by degree bounds every vertex's out-degree in the
oriented graph by O(sqrt(E)), so hub vertices cannot blow up the wedge
self-join — this is the explicit skew-handling strategy for the
power-law case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graftpark.graph import Graph


def oriented_edges(graph: Graph) -> DataFrame:
    """Canonical undirected edges oriented low→high by key (deg, id),
    with the key packed into one long: key(v) = deg(v)·(n+1) + v."""
    e = graph.edges_sym().where(F.col("src") < F.col("dst"))
    n = graph.num_vertices()
    deg = graph.degrees().select("id", (F.col("deg") * F.lit(n + 1) + F.col("id")).alias("key"))
    keyed = (
        e.join(deg.withColumnRenamed("id", "src").withColumnRenamed("key", "src_key"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("key", "dst_key"), "dst")
    )
    return keyed.select(
        F.when(F.col("src_key") < F.col("dst_key"), F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(F.col("src_key") < F.col("dst_key"), F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.least("src_key", "dst_key").alias("u_key"),
        F.greatest("src_key", "dst_key").alias("v_key"),
    )


def triangle_count(graph: Graph) -> int:
    """Exact global triangle count on the simple undirected graph."""
    d = oriented_edges(graph)
    a, b, c = d.alias("a"), d.alias("b"), d.alias("c")
    wedges = a.join(b, (F.col("a.u") == F.col("b.u")) & (F.col("a.v_key") < F.col("b.v_key")))
    closed = wedges.join(
        c, (F.col("a.v") == F.col("c.u")) & (F.col("b.v") == F.col("c.v"))
    )
    return closed.count()


def triangles_per_vertex(graph: Graph) -> DataFrame:
    """``(id, triangles)`` — each closed wedge credits all three corners."""
    d = oriented_edges(graph)
    a, b, c = d.alias("a"), d.alias("b"), d.alias("c")
    tri = (
        a.join(b, (F.col("a.u") == F.col("b.u")) & (F.col("a.v_key") < F.col("b.v_key")))
        .join(c, (F.col("a.v") == F.col("c.u")) & (F.col("b.v") == F.col("c.v")))
        .select(F.col("a.u").alias("x"), F.col("a.v").alias("y"), F.col("b.v").alias("z"))
    )
    corners = (
        tri.select(F.col("x").alias("id"))
        .union(tri.select(F.col("y").alias("id")))
        .union(tri.select(F.col("z").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count("*").alias("triangles"))
    return (
        graph.vertices()
        .join(counts, "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )
