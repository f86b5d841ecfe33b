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
    # slim V-row key table joined twice: broadcast both probes (degrees()
    # is persisted, so the broadcast build reads the cache, not the
    # aggregation lineage)
    keyed = (
        e.join(F.broadcast(deg.withColumnRenamed("id", "src").withColumnRenamed("key", "src_key")), "src")
        .join(F.broadcast(deg.withColumnRenamed("id", "dst").withColumnRenamed("key", "dst_key")), "dst")
    )
    return keyed.select(
        F.when(F.col("src_key") < F.col("dst_key"), F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(F.col("src_key") < F.col("dst_key"), F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.least("src_key", "dst_key").alias("u_key"),
        F.greatest("src_key", "dst_key").alias("v_key"),
    )


def triangle_count(graph: Graph) -> int:
    """Exact global triangle count on the simple undirected graph.

    Edge-iterator formulation: per oriented edge (u, v), triangles
    closed at that edge = |N⁺(u) ∩ N⁺(v)| via ``array_intersect`` over
    grouped out-adjacency arrays (JVM codegen). The O(Σ out_deg²) wedge
    set is never materialized or shuffled — the plan is two E-row
    adjacency joins; per-array size is bounded O(√E) by the degree
    orientation, so the intersect work matches the wedge count while
    the shuffled bytes stay O(E).
    """
    from pyspark.storagelevel import StorageLevel

    d = oriented_edges(graph).select("u", "v").persist(StorageLevel.MEMORY_AND_DISK)
    adj = d.groupBy("u").agg(F.collect_list("v").alias("nbrs")).persist(StorageLevel.MEMORY_AND_DISK)
    # V-row adjacency (Σ|nbrs| = E longs) broadcasts below ~100M edges:
    # both probes become map-side hash lookups over the cached d — no
    # E-row array shuffle at all. (At larger scale drop the hints and
    # the same plan runs as two co-keyed shuffled-hash joins.)
    closed = (
        d.join(F.broadcast(adj), "u")
        .join(F.broadcast(adj.select(F.col("u").alias("v"), F.col("nbrs").alias("nbrs_v"))), "v")
        .select(F.size(F.array_intersect("nbrs", "nbrs_v")).alias("c"))
    )
    row = closed.agg(F.sum("c")).collect()[0][0]
    d.unpersist()
    adj.unpersist()
    return int(row or 0)


def triangles_per_vertex(graph: Graph) -> DataFrame:
    """``(id, triangles)`` — each triangle credits all three corners.

    Same edge-iterator plan as :func:`triangle_count` (adjacency-array
    ``array_intersect``; the O(Σ out_deg²) wedge set is never built).
    Every triangle is found exactly once, at the oriented edge joining
    its two lowest-key corners; corner credit is emitted in ONE pass by
    exploding, per edge (u, v), the 2 + |N⁺(u) ∩ N⁺(v)| credit structs —
    u and v each earn |intersection|, each closing vertex w earns 1. The
    exploded row count is 2·E + 3·T (T = triangle total), shuffled with
    map-side partial aggregation — no O(√E)-array shuffle and nothing
    proportional to the wedge count.
    """
    d = oriented_edges(graph).select("u", "v")
    adj = d.groupBy("u").agg(F.collect_list("v").alias("nbrs"))
    # see triangle_count for the broadcast-vs-shuffled-hash note
    credits = (
        d.join(F.broadcast(adj), "u")
        .join(F.broadcast(adj.select(F.col("u").alias("v"), F.col("nbrs").alias("nbrs_v"))), "v")
        .select("u", "v", F.array_intersect("nbrs", "nbrs_v").alias("common"))
        .where(F.size("common") > 0)
        .select(
            F.explode(
                F.concat(
                    F.array(
                        F.struct(F.col("u").alias("id"), F.size("common").cast("long").alias("c")),
                        F.struct(F.col("v").alias("id"), F.size("common").cast("long").alias("c")),
                    ),
                    F.transform("common", lambda w: F.struct(w.alias("id"), F.lit(1).cast("long").alias("c"))),
                )
            ).alias("e")
        )
        .select(F.col("e.id").alias("id"), F.col("e.c").alias("c"))
    )
    counts = credits.groupBy("id").agg(F.sum("c").alias("triangles"))
    return (
        graph.vertices()
        .join(counts, "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )
