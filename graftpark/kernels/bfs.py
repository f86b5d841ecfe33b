"""BFS parents — level-synchronous frontier expansion (reference parity).

The canonical Spark formulation of the reference's linear-algebra BFS
(reference: src/traversals/BFS/bfs_BLAS.jl:29-98): per level,

    claims   = edges ⋈ frontier ON src           (P1 masked SpMV)
               → groupBy(dst).agg(min(src))      ("any parent" semiring
                                                  made deterministic: min,
                                                  SURVEY.md §4.1)
    claims   = claims ⟵ anti-join parents        (the complement mask)
    parents ∪= claims; frontier = claims.ids
    stop when frontier empty                     (global reduce,
                                                  bfs_BLAS.jl:62)

The reference's atomic-CAS claim dedup (bfs_par.jl:38) IS the
``groupBy(dst).agg(min)``; per-thread local queues (bfs_par.jl:49-120)
ARE shuffle partitions — no separate operators needed.

parent[source] = source; unreached vertices have no row. Invalid source
raises ValueError (bfs_seq.jl:13-15); empty graph → empty result
(bfs_seq.jl:10-12).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from graftpark.graph import Graph, choose_strategy, maybe_broadcast
from graftpark.loop import LoopResult


def bfs_parents(
    graph: Graph,
    source: int,
    directed: bool = False,
    max_supersteps: int = 10_000,
    num_partitions: int | None = None,
) -> LoopResult:
    """Result state: ``parents(id: long, parent: long)``."""
    spark = graph.spark
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if graph.num_vertices() == 0:
        return LoopResult(state=spark.createDataFrame([], "id LONG, parent LONG"), converged=True)
    if graph.vertices().where(F.col("id") == source).count() == 0:
        raise ValueError(f"invalid BFS source {source}")
    use_bc = choose_strategy(graph.num_vertices())
    graph.persist_for_iteration(n_part, key=None if use_bc else "src")
    edges = graph.edges if directed else graph.edges_sym()

    parents = spark.createDataFrame([(source, source)], "id LONG, parent LONG").repartition(n_part, "id")
    parents = parents.persist(StorageLevel.MEMORY_AND_DISK)
    parents.count()
    frontier = parents.select("id")
    metrics: list[dict] = []
    level = 0
    while level < max_supersteps:
        level += 1
        t0 = time.monotonic()
        claims = (
            edges.join(maybe_broadcast(frontier, use_bc), edges.src == frontier.id)
            .groupBy("dst")
            .agg(F.min("src").alias("parent"))
            .join(parents, F.col("dst") == parents.id, "left_anti")
            .select(F.col("dst").alias("id"), "parent")
        ).localCheckpoint(eager=True)  # flat lineage per level (SURVEY.md §4.3.1)
        active = claims.count()
        metrics.append({"superstep": level, "wall_s": time.monotonic() - t0, "active": active})
        if active == 0:
            break
        new_parents = parents.union(claims).localCheckpoint(eager=True)
        parents.unpersist()
        parents = new_parents
        frontier = claims.select("id")
    return LoopResult(state=parents, metrics=metrics, supersteps=level, converged=True)


def bfs_levels(
    graph: Graph, source: int, directed: bool = False, max_supersteps: int = 10_000
) -> DataFrame:
    """``levels(id, level)`` via the parents loop's claims pipeline."""
    spark = graph.spark
    if graph.num_vertices() == 0:
        return spark.createDataFrame([], "id LONG, level INT")
    if graph.vertices().where(F.col("id") == source).count() == 0:
        raise ValueError(f"invalid BFS source {source}")
    use_bc = choose_strategy(graph.num_vertices())
    graph.persist_for_iteration(key=None if use_bc else "src")
    edges = graph.edges if directed else graph.edges_sym()
    levels = spark.createDataFrame([(source, 0)], "id LONG, level INT").persist(StorageLevel.MEMORY_AND_DISK)
    levels.count()
    frontier = levels.select("id")
    lvl = 0
    while lvl < max_supersteps:
        lvl += 1
        claims = (
            edges.join(maybe_broadcast(frontier, use_bc), edges.src == frontier.id)
            .select("dst")
            .distinct()
            .join(levels, F.col("dst") == levels.id, "left_anti")
            .select(F.col("dst").alias("id"), F.lit(lvl).cast("int").alias("level"))
        ).localCheckpoint(eager=True)
        active = claims.count()
        if active == 0:
            break
        new_levels = levels.union(claims).localCheckpoint(eager=True)
        levels.unpersist()
        levels = new_levels
        frontier = claims.select("id")
    return levels
