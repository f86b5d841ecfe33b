"""Superstep loop spine: iteration, lineage truncation, checkpoint/resume.

Every kernel is a driver-side level-synchronous loop over DataFrames —
the Spark analogue of the reference's kernel lifecycle (frontier
snapshot → parallel expand → barrier → termination reduce,
reference: src/traversals/BFS/bfs_par.jl:30-45, bfs_BLAS.jl:35-77).

Two problems Catalyst does not solve for us (SURVEY.md §4.3):

1. **Iterative plan growth** — each superstep's DataFrame references the
   previous one; after ~20 iterations analysis and task serialization
   dominate. Fix: truncate lineage every ``truncate_every`` supersteps,
   either via ``localCheckpoint(eager=True)`` or — when a durable
   checkpoint directory is configured — by writing state to parquet and
   re-reading it (which doubles as the resume checkpoint).
2. **Convergence probes** — stats (delta, active count) are computed as
   ONE aggregate job on the freshly persisted state, not separate
   count()/collect() probes.

Checkpoint layout (north_rule: resumable with per-partition lineage):

    {run_dir}/superstep=00007/state/*.parquet   (with _SUCCESS marker)
    {run_dir}/superstep=00007/lineage.json      per-partition rows/min/max/hash
    {run_dir}/metrics.jsonl                     one record per superstep
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel


class Checkpointer:
    """Durable parquet checkpoints with per-partition lineage + metrics."""

    def __init__(self, run_dir: str, every: int = 5, id_col: str = "id"):
        self.run_dir = run_dir
        self.every = max(1, every)
        self.id_col = id_col
        os.makedirs(run_dir, exist_ok=True)

    def _step_dir(self, superstep: int) -> str:
        return os.path.join(self.run_dir, f"superstep={superstep:05d}")

    def save(self, state: DataFrame, superstep: int) -> DataFrame:
        """Write state + lineage; return the re-read (lineage-truncated) state."""
        path = os.path.join(self._step_dir(superstep), "state")
        state.write.mode("overwrite").parquet(path)
        reread = state.sparkSession.read.parquet(path)
        # per-partition lineage of the checkpoint as written
        lineage = (
            reread.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.count("*").alias("rows"),
                F.min(self.id_col).alias("min_id"),
                F.max(self.id_col).alias("max_id"),
                # xor-combine: order-insensitive and overflow-free under ANSI mode
                F.expr("bit_xor(xxhash64(struct(*)))").alias("content_hash"),
            )
            .orderBy("partition_id")
            .collect()
        )
        with open(os.path.join(self._step_dir(superstep), "lineage.json"), "w") as f:
            json.dump([r.asDict() for r in lineage], f)
        return reread

    def record_metrics(self, rec: dict) -> None:
        with open(os.path.join(self.run_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

    def latest(self) -> int | None:
        """Last superstep with a complete (_SUCCESS) state write."""
        if not os.path.isdir(self.run_dir):
            return None
        best = None
        for name in os.listdir(self.run_dir):
            if name.startswith("superstep="):
                step = int(name.split("=")[1])
                if os.path.exists(os.path.join(self.run_dir, name, "state", "_SUCCESS")):
                    best = step if best is None else max(best, step)
        return best

    def load(self, spark: SparkSession, superstep: int) -> DataFrame:
        return spark.read.parquet(os.path.join(self._step_dir(superstep), "state"))

    def load_metrics(self) -> list[dict]:
        path = os.path.join(self.run_dir, "metrics.jsonl")
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]


@dataclass
class LoopResult:
    state: DataFrame
    metrics: list[dict] = field(default_factory=list)
    supersteps: int = 0
    converged: bool = False


def iterate(
    initial_state: DataFrame,
    step_fn: Callable[[DataFrame, int], DataFrame],
    stats_fn: Callable[[DataFrame, DataFrame, int], dict],
    converged_fn: Callable[[dict], bool],
    max_supersteps: int = 100,
    checkpointer: Checkpointer | None = None,
    truncate_every: int = 1,
    start_superstep: int = 1,
    initial_metrics: list[dict] | None = None,
    observe_cols: Callable[[], dict] | None = None,
) -> LoopResult:
    """Run a level-synchronous superstep loop.

    ``step_fn(state, i)`` builds the next state (lazy); ``stats_fn(new,
    prev, i)`` returns the convergence record; ``converged_fn(stats)``
    decides termination (the global reduce,
    reference: src/traversals/BFS/bfs_BLAS.jl:62).

    When ``observe_cols`` is given (a thunk returning {name: aggregate
    Column}), the convergence aggregates ride along on the SAME job that
    materializes the new state (``DataFrame.observe``) — zero extra
    actions per superstep; ``stats_fn(observed_row_dict, prev, i)`` then
    just post-processes the observed values.
    """
    from pyspark.sql import Observation

    metrics = list(initial_metrics or [])
    prev = initial_state.persist(StorageLevel.MEMORY_AND_DISK)
    prev.count()
    prev_ckpt_rdd = None
    converged = False
    i = start_superstep - 1
    for i in range(start_superstep, max_supersteps + 1):
        t0 = time.monotonic()
        new = step_fn(prev, i)
        obs = None
        if observe_cols is not None:
            obs = Observation(f"superstep_{i}")
            cols = observe_cols()
            new = new.observe(obs, *[c.alias(name) for name, c in cols.items()])
        new_ckpt_rdd = None
        do_durable = checkpointer is not None and i % checkpointer.every == 0
        if do_durable:
            # parquet write + re-read: durable resume point AND flat lineage
            new = checkpointer.save(new, i)
            new = new.persist(StorageLevel.MEMORY_AND_DISK)
        elif i % truncate_every == 0:
            # eager local checkpoint: materializes AND flattens the logical
            # plan — without this, Catalyst re-analysis of the growing join
            # tree dominates after a handful of supersteps (SURVEY.md §4.3.1)
            new = new.localCheckpoint(eager=True)
            new_ckpt_rdd = _checkpoint_rdd(new)
        else:
            new = new.persist(StorageLevel.MEMORY_AND_DISK)
            new.count()
        stats = stats_fn(obs.get if obs is not None else new, prev, i)
        rec = {"superstep": i, "wall_s": time.monotonic() - t0, **stats}
        metrics.append(rec)
        if checkpointer is not None:
            checkpointer.record_metrics(rec)
        # free the retired state NOW: DataFrame.unpersist does not release
        # localCheckpoint RDD blocks (they otherwise linger until the JVM
        # happens to GC the RDD reference → storage bloat + GC churn)
        prev.unpersist()
        if prev_ckpt_rdd is not None:
            try:
                prev_ckpt_rdd.unpersist(False)
            except Exception:
                pass
        prev, prev_ckpt_rdd = new, new_ckpt_rdd
        if converged_fn(rec):
            converged = True
            break
    return LoopResult(state=prev, metrics=metrics, supersteps=i, converged=converged)


def _checkpoint_rdd(df: DataFrame):
    """The JVM RDD backing a localCheckpoint'ed DataFrame (for unpersist)."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        return plan.rdd()  # LogicalRDD
    except Exception:
        return None


def resume_point(
    checkpointer: Checkpointer, spark: SparkSession
) -> tuple[DataFrame, int, list[dict]] | None:
    """(state, last_superstep, metrics) of the last complete checkpoint."""
    last = checkpointer.latest()
    if last is None:
        return None
    state = checkpointer.load(spark, last)
    metrics = [m for m in checkpointer.load_metrics() if m["superstep"] <= last]
    return state, last, metrics
