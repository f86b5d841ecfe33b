"""Connected components — label-min hash propagation.

Schema-A superstep (masked frontier propagation generalized: propagate
the min component label instead of "any parent",
reference: src/traversals/BFS/bfs_BLAS.jl:36-76 / SURVEY.md §2.8):

    nbr_min = edges_sym ⋈ state ON src → groupBy(dst).agg(min(comp))
    comp'   = least(comp, nbr_min)
    stop when changed-count = 0   (the global termination reduce)

Deterministic by construction (min is order-insensitive). Component
label = min vertex id in the component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graftpark.graph import Graph
from graftpark.loop import Checkpointer, LoopResult, iterate, resume_point


def connected_components(
    graph: Graph,
    max_supersteps: int = 50,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    num_partitions: int | None = None,
) -> LoopResult:
    """State: ``(id, comp, prev_comp)``; result = select(id, comp)."""
    spark = graph.spark
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    graph.persist_for_iteration(n_part)
    sym = graph.edges_sym()

    init = (
        graph.vertices()
        .select("id", F.col("id").alias("comp"), F.lit(None).cast("long").alias("prev_comp"))
        .repartition(n_part, "id")
    )
    checkpointer = Checkpointer(checkpoint_dir, every=checkpoint_every) if checkpoint_dir else None
    start, initial_metrics, state0 = 1, None, init
    if resume and checkpointer is not None:
        rp = resume_point(checkpointer, spark)
        if rp is not None:
            state0, last, initial_metrics = rp
            start = last + 1

    def step(state: DataFrame, i: int) -> DataFrame:
        nbr_min = (
            sym.join(state, sym.src == state.id)
            .groupBy("dst")
            .agg(F.min("comp").alias("m"))
        )
        return state.join(nbr_min, state.id == nbr_min.dst, "left").select(
            state.id.alias("id"),
            F.least(state.comp, F.coalesce(F.col("m"), state.comp)).alias("comp"),
            state.comp.alias("prev_comp"),
        )

    def stats(new: DataFrame, prev: DataFrame, i: int) -> dict:
        row = new.agg(
            F.count(F.when(F.col("comp") != F.col("prev_comp"), True)).alias("changed"),
            F.countDistinct("comp").alias("num_components"),
        ).collect()[0]
        return {"delta": float(row["changed"]), "active": int(row["changed"]), "num_components": int(row["num_components"])}

    return iterate(
        state0,
        step,
        stats,
        converged_fn=lambda rec: rec["active"] == 0,
        max_supersteps=max_supersteps,
        checkpointer=checkpointer,
        start_superstep=start,
        initial_metrics=initial_metrics,
    )


def components_df(result: LoopResult) -> DataFrame:
    return result.state.select("id", "comp")
