#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule.

The target criterion is ≥0.8 throughput scaling efficiency between N
and 4N executors. No real cluster exists in this sandbox, so (per the
driver instruction) we run the SAME PageRank job on the SAME seeded
input at two parallelism levels — local[N] and local[4N], fresh JVM
each — and report throughput (edges/sec per superstep to convergence,
tol 1e-6) at both plus efficiency = throughput_4N / (4 · throughput_N).

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["GRAFTPARK_REPO"])
from graftpark.fixtures import powerlaw_edges_pdf
from graftpark.graph import Graph
from graftpark.session import get_spark
from graftpark.kernels.pagerank import pagerank

cpus = int(os.environ["SPARK_GRAFT_CPUS"])
n_edges = int(os.environ["GRAFTPARK_SCALING_EDGES"])
n_vertices = int(os.environ["GRAFTPARK_SCALING_VERTICES"])
spark = get_spark(master=f"local[{cpus}]", app_name=f"graftpark-scaling-{cpus}", shuffle_partitions=cpus)
pdf = powerlaw_edges_pdf(n_edges, n_vertices, seed=42)
g = Graph(spark.createDataFrame(pdf))
# warm-up run (persists edges, JIT/codegen) excluded from the measurement
pagerank(g, tol=0.0, max_supersteps=1)
e_dir = g.edges.count()
t0 = time.monotonic()
res = pagerank(g, tol=1e-6, max_supersteps=60)
wall = time.monotonic() - t0
walls = [mm["wall_s"] for mm in res.metrics]
mean_step = sum(walls) / len(walls)
print("SCALING_RESULT " + json.dumps({
    "cpus": cpus, "edges": e_dir, "supersteps": res.supersteps,
    "converged": res.converged, "wall_s": round(wall, 3),
    "mean_superstep_s": round(mean_step, 4),
    "edges_per_sec_per_superstep": round(e_dir / mean_step),
}))
spark.stop()
"""


def run_level(cpus: int, n_edges: int, n_vertices: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        GRAFTPARK_SCALING_EDGES=str(n_edges),
        GRAFTPARK_SCALING_VERTICES=str(n_vertices),
        GRAFTPARK_REPO=os.path.dirname(os.path.abspath(__file__)),
    )
    out = subprocess.run(
        [sys.executable, "-c", CHILD], env=env, capture_output=True, text=True, timeout=1200
    )
    for line in out.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line[len("SCALING_RESULT "):])
    raise RuntimeError(f"no result at local[{cpus}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_low = int(os.environ.get("GRAFTPARK_SCALING_N", "8"))
    n_high = 4 * n_low
    n_edges = int(os.environ.get("GRAFTPARK_SCALING_EDGES", "64000000"))
    n_vertices = int(os.environ.get("GRAFTPARK_SCALING_VERTICES", "8000000"))

    t0 = time.monotonic()
    low = run_level(n_low, n_edges, n_vertices)
    high = run_level(n_high, n_edges, n_vertices)
    eff = high["edges_per_sec_per_superstep"] / (4.0 * low["edges_per_sec_per_superstep"])
    result = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "low": low,
        "high": high,
        "criterion": ">=0.8 between N and 4N parallelism",
        "wall_s": round(time.monotonic() - t0, 1),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH/BASELINE.md — measured throughput & scaling

Job: PageRank power iteration (damping 0.85, tol 1e-6) to convergence
on the seeded power-law edge table ({low['edges']:,} directed edges,
{n_vertices:,} vertex id space, out/in-degree exponents 0.7/0.5),
identical input at two parallelism levels, fresh JVM each, warm-up
run excluded. Kernel plan: edges cached co-partitioned by src,
single-shuffle superstep (contribs ∪ carriers → groupBy(dst)),
convergence aggregates via DataFrame.observe (no extra job).

| parallelism | supersteps | mean superstep (s) | edges/sec/superstep |
|---|---|---|---|
| local[{n_low}] | {low['supersteps']} | {low['mean_superstep_s']} | {low['edges_per_sec_per_superstep']:,} |
| local[{n_high}] | {high['supersteps']} | {high['mean_superstep_s']} | {high['edges_per_sec_per_superstep']:,} |

**Scaling efficiency (throughput_4N / (4 x throughput_N)) = {eff:.3f}**
(criterion: >=0.8; sandbox evidence for the N vs 4N executor rule per
BASELINE.json / driver instruction).

Measured {time.strftime('%Y-%m-%d %H:%M:%S')}; see bench.py for the
full headline-query suite (recorded per-round as BENCH_r{{N}}.json).
"""
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
