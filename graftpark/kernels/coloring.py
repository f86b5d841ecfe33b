"""Vertex coloring — distributed Luby-style MIS layering + greedy oracles.

``mis_coloring`` is the DataFrame translation of the reference's
parallel maximal-independent-set coloring
(reference: src/traversals/coloring/BLAS_coloring.jl:8-90,103-216),
built from the P2-P6 primitive mappings (SURVEY.md §2.2):

outer loop (one color per round, BLAS_coloring.jl:34-89):
    cand = uncolored vertices with static priority weights
    IS   = maximal independent set over cand    (inner loop)
    colors ∪= IS × {round}
inner loop (BLAS_coloring.jl:103-216):
    nbr_max = edges_sym ⋈ cand ON src → groupBy(dst).agg(max(w))   (P2)
    sel     = cand WHERE w > coalesce(nbr_max, -∞)                 (P4 local maxima)
    knocked = neighbors(sel)                                       (P3)
    cand   -= sel ∪ knocked                                        (P4/P5 masked removal)
    until sel empty                                                (P6 reduce)

Determinism: the reference randomizes weights / orders
(BLAS_coloring.jl:31, greedy_coloring_seq.jl:46); we use a static
injective priority  w(v) = deg(v)·(n+1) + (n − v)  — higher degree
wins, ties go to the smaller id — so results are exactly reproducible
(SURVEY.md §4.3.5) and match oracles.mis_coloring.

``greedy_coloring`` ports the sequential variants C1-C5
(greedy_coloring_seq.jl:12-98) as driver-side oracles for small graphs
(the loop-carried dependence makes them inherently sequential).
"""

from __future__ import annotations

import random
import time

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from graftpark import oracles
from graftpark.graph import Graph, choose_strategy, maybe_broadcast
from graftpark.loop import LoopResult


def mis_coloring(
    graph: Graph,
    max_colors: int = 10_000,
    num_partitions: int | None = None,
) -> LoopResult:
    """Result state: ``coloring(id: long, color: int)``; metrics include
    ``num_colors``. Proper coloring over the symmetrized graph."""
    spark = graph.spark
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    n = graph.num_vertices()
    use_bc = choose_strategy(n)
    graph.persist_for_iteration(n_part, key=None if use_bc else "src")
    sym = graph.edges_sym()
    if n == 0:
        return LoopResult(state=spark.createDataFrame([], "id LONG, color INT"), converged=True)

    # static injective priorities (degree-ranked, id tie-break)
    weights = (
        graph.degrees()
        .select("id", (F.col("deg") * F.lit(n + 1) + (F.lit(n) - F.col("id"))).alias("w"))
        .repartition(n_part, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    weights.count()

    colors = spark.createDataFrame([], "id LONG, color INT").persist(StorageLevel.MEMORY_AND_DISK)
    uncolored = weights
    metrics: list[dict] = []
    color = 0
    while color < max_colors:
        remaining = uncolored.count()
        if remaining == 0:
            break
        color += 1
        t0 = time.monotonic()
        cand = uncolored
        is_acc = spark.createDataFrame([], "id LONG")
        inner_rounds = 0
        while True:
            inner_rounds += 1
            nbr_max = (
                sym.join(maybe_broadcast(cand, use_bc), sym.src == cand.id)
                .groupBy("dst")
                .agg(F.max("w").alias("mw"))
            )
            sel = (
                cand.join(nbr_max, cand.id == nbr_max.dst, "left")
                .where(F.col("mw").isNull() | (F.col("w") > F.col("mw")))
                .select(cand.id.alias("id"))
            ).localCheckpoint(eager=True)
            if sel.count() == 0:
                break
            is_acc = is_acc.union(sel).localCheckpoint(eager=True)
            knocked = sym.join(maybe_broadcast(sel, use_bc), sym.src == sel.id).select(sym.dst.alias("id")).distinct()
            removed = sel.select("id").union(knocked).distinct()
            new_cand = cand.join(removed, "id", "left_anti").localCheckpoint(eager=True)
            if cand is not uncolored:
                cand.unpersist()
            cand = new_cand
            if cand.count() == 0:
                break
        colored = is_acc.select("id", F.lit(color).cast("int").alias("color"))
        new_colors = colors.union(colored).localCheckpoint(eager=True)
        n_colored = new_colors.count()
        colors.unpersist()
        colors = new_colors
        new_uncolored = uncolored.join(is_acc, "id", "left_anti").localCheckpoint(eager=True)
        if uncolored is not weights:
            uncolored.unpersist()
        uncolored = new_uncolored
        metrics.append(
            {
                "superstep": color,
                "wall_s": time.monotonic() - t0,
                "active": remaining,
                "inner_rounds": inner_rounds,
                "colored_total": n_colored,
            }
        )
    weights.unpersist()
    if metrics:
        metrics[-1]["num_colors"] = color
    return LoopResult(state=colors, metrics=metrics, supersteps=color, converged=True)


def greedy_coloring(
    graph: Graph,
    order: str = "degree",
    n_times: int = 1,
    seed: int = 42,
    max_collect_edges: int = 5_000_000,
) -> tuple[DataFrame, int]:
    """Sequential greedy coloring (reference C1-C5) — driver-side.

    order: 'natural' | 'degree' (largest-first, greedy_coloring_seq.jl:77)
    | 'random' (seeded shuffle, :46); ``n_times`` keeps the best of n
    restarts (:58-67). Returns (coloring_df, num_colors).
    """
    spark = graph.spark
    n_edges = graph.edges_sym().count()
    if n_edges > max_collect_edges:
        raise ValueError(f"greedy_coloring is a driver-side oracle; graph too large ({n_edges} edges)")
    edges = [(r["src"], r["dst"]) for r in graph.edges_sym().collect()]
    vertices = sorted(r["id"] for r in graph.vertices().collect())
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)

    def make_order(k: int) -> list[int]:
        if order == "natural":
            return list(vertices)
        if order == "degree":
            return sorted(vertices, key=lambda v: (-len(adj[v]), v))
        rng = random.Random(seed + k)
        o = list(vertices)
        rng.shuffle(o)
        return o

    best: dict[int, int] | None = None
    for k in range(n_times):
        colors = oracles.greedy_coloring(edges, vertices, make_order(k))
        if best is None or max(colors.values(), default=0) < max(best.values(), default=0):
            best = colors
    num_colors = max(best.values(), default=0)
    df = spark.createDataFrame([(v, c) for v, c in sorted(best.items())] or [], "id LONG, color INT")
    return df, num_colors
