#!/usr/bin/env python
"""graftpark benchmark harness.

Runs the headline kernels at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:

    {"metric": "total_bench_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "edges_per_sec_per_superstep": ..., "supersteps": {...}}

The primary throughput figure (BASELINE.json `metric`) is
edges/sec per superstep to PageRank convergence (tol 1e-6) on the
power-law graph — reported as `edges_per_sec_per_superstep`.

Workloads (seeded, deterministic; BenchmarkTools-style: graph
materialization is setup, only the kernel is timed —
reference: benchmark/benchmarks.jl:168-198):

- pagerank_sf   : bipartite customer→supplier graph from the sf tables
- pagerank_ba   : seeded Barabási–Albert power-law graph (the skew
                  fixture, reference benchmark/benchmarks.jl:89-94)
- cc_ba / labelprop_ba / bfs_ba / triangles_ba on the same BA graph
"""

from __future__ import annotations

import json
import os
import sys
import time


def make_ba_graph(spark, n_vertices: int, m: int, seed: int = 42):
    import pandas as pd

    from graftpark.fixtures import barabasi_albert
    from graftpark.graph import Graph

    pairs = barabasi_albert(n_vertices, m, seed=seed)
    pdf = pd.DataFrame(pairs, columns=["src", "dst"])
    edges = spark.createDataFrame(pdf)
    return Graph(edges)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ba_n = int(os.environ.get("GRAFTPARK_BENCH_BA_N", "150000"))
    ba_m = int(os.environ.get("GRAFTPARK_BENCH_BA_M", "8"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from graftpark.graph import Graph, edges_from_testdata
    from graftpark.kernels.bfs import bfs_parents
    from graftpark.kernels.components import connected_components
    from graftpark.kernels.labelprop import label_propagation
    from graftpark.kernels.pagerank import pagerank
    from graftpark.kernels.triangles import triangle_count
    from graftpark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="graftpark-bench", shuffle_partitions=cpus)

    queries: dict[str, float] = {}
    supersteps: dict[str, int] = {}
    t_all = time.monotonic()

    # ---- sf-derived bipartite graph --------------------------------
    g_sf = Graph(edges_from_testdata(spark, sf_dir)).persist_for_iteration(cpus)
    n_edges_sf = g_sf.edges.count()
    t0 = time.monotonic()
    res = pagerank(g_sf, tol=1e-6, max_supersteps=60)
    queries["pagerank_sf"] = time.monotonic() - t0
    supersteps["pagerank_sf"] = res.supersteps
    g_sf.unpersist()

    # ---- seeded power-law (Barabási–Albert) graph ------------------
    g_ba = make_ba_graph(spark, ba_n, ba_m).persist_for_iteration(cpus)
    n_edges_ba = g_ba.edges.count()  # canonical directed (min,max) pairs
    n_edges_ba_sym = g_ba.edges_sym().count()

    t0 = time.monotonic()
    res = pagerank(g_ba, tol=1e-6, max_supersteps=60)
    pr_ba_wall = time.monotonic() - t0
    queries["pagerank_ba"] = pr_ba_wall
    supersteps["pagerank_ba"] = res.supersteps
    pr_superstep_walls = [m["wall_s"] for m in res.metrics]
    # primary metric: edges propagated per second per superstep
    eps = n_edges_ba_sym / (sum(pr_superstep_walls) / len(pr_superstep_walls))

    t0 = time.monotonic()
    res = connected_components(g_ba, max_supersteps=60)
    queries["cc_ba"] = time.monotonic() - t0
    supersteps["cc_ba"] = res.supersteps

    t0 = time.monotonic()
    res = label_propagation(g_ba, max_supersteps=5)
    queries["labelprop_ba"] = time.monotonic() - t0
    supersteps["labelprop_ba"] = res.supersteps

    t0 = time.monotonic()
    res = bfs_parents(g_ba, 1)
    queries["bfs_ba"] = time.monotonic() - t0
    supersteps["bfs_ba"] = res.supersteps

    t0 = time.monotonic()
    tri = triangle_count(g_ba)
    queries["triangles_ba"] = time.monotonic() - t0

    total = time.monotonic() - t_all
    out = {
        "metric": "total_bench_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": sf,
        "cpus": cpus,
        "edges_per_sec_per_superstep": round(eps),
        "ba_graph": {"n": ba_n, "m": ba_m, "edges": n_edges_ba, "edges_sym": n_edges_ba_sym, "triangles": tri},
        "sf_edges": n_edges_sf,
        "supersteps": supersteps,
        "pagerank_ba_mean_superstep_sec": round(sum(pr_superstep_walls) / len(pr_superstep_walls), 4),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
