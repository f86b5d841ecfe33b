"""Label propagation community detection (synchronous, deterministic).

Each superstep every vertex adopts the MODE of its neighbors' labels,
ties broken by MIN label; vertices with no neighbors keep their own.
Same loop skeleton as the reference MIS outer loop
(reference: src/traversals/coloring/BLAS_coloring.jl:34-89 / SURVEY.md §2.9).

The mode-with-min-tie-break is computed shuffle-efficiently as
``groupBy(dst, label).count`` → ``groupBy(dst).agg(max(struct(cnt,
-label)))`` — two partial-aggregating hash shuffles, no window over a
single partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graftpark.graph import Graph
from graftpark.loop import Checkpointer, LoopResult, iterate, resume_point


def label_propagation(
    graph: Graph,
    max_supersteps: int = 20,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    num_partitions: int | None = None,
) -> LoopResult:
    """State: ``(id, label, prev_label)``; result = select(id, label)."""
    spark = graph.spark
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    graph.persist_for_iteration(n_part)
    sym = graph.edges_sym()

    init = (
        graph.vertices()
        .select("id", F.col("id").alias("label"), F.lit(None).cast("long").alias("prev_label"))
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
        counts = (
            sym.join(state, sym.src == state.id)
            .groupBy("dst", "label")
            .agg(F.count("*").alias("cnt"))
        )
        best = (
            counts.groupBy("dst")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("b"))
            .select("dst", (-F.col("b.neg")).alias("new_label"))
        )
        return state.join(best, state.id == best.dst, "left").select(
            state.id.alias("id"),
            F.coalesce(F.col("new_label"), state.label).alias("label"),
            state.label.alias("prev_label"),
        )

    def stats(new: DataFrame, prev: DataFrame, i: int) -> dict:
        row = new.agg(
            F.count(F.when(F.col("label") != F.col("prev_label"), True)).alias("changed"),
            F.countDistinct("label").alias("num_labels"),
        ).collect()[0]
        return {"delta": float(row["changed"]), "active": int(row["changed"]), "num_labels": int(row["num_labels"])}

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


def labels_df(result: LoopResult) -> DataFrame:
    return result.state.select("id", "label")
