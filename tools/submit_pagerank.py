#!/usr/bin/env python
"""spark-submit entry point: packed PageRank from a --py-files zip.

The north rule requires the engine to run "via spark-submit --py-files
on a multi-executor cluster". This job script carries NO repo-path
setup: ``import graftpark`` must resolve from the ``--py-files``
artifact that spark-submit puts on the driver's and every Python UDF
worker's path — exactly how a real cluster deployment ships the engine.

    python tools/make_pyfiles_zip.py /tmp/graftpark.zip
    $SPARK_HOME/bin/spark-submit \
        --master local-cluster[2,2,1500] \
        --py-files /tmp/graftpark.zip \
        --conf spark.sql.shuffle.partitions=8 \
        tools/submit_pagerank.py --n 800 --m 3 --seed 7 \
        --block-dir /tmp/gp-submit-blocks --supersteps 8

Prints one ``SUBMIT_RESULT {json}`` line: executor count, the module
path graftpark actually imported from, and the full rank vector.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=800)
    ap.add_argument("--m", type=int, default=3)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--supersteps", type=int, default=8)
    ap.add_argument("--strategy", default="packed")
    ap.add_argument("--block-dir", required=True)
    ap.add_argument("--num-partitions", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("graftpark-submit").getOrCreate()

    # resolves from the --py-files zip (this script adds no repo path)
    import graftpark
    from graftpark.fixtures import barabasi_albert
    from graftpark.graph import Graph
    from graftpark.kernels.pagerank import pagerank, ranks_df

    # force a job so all executors register before we count them
    spark.range(1000).repartition(args.num_partitions).count()
    n_members = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()

    g = Graph.from_edge_list(spark, barabasi_albert(args.n, args.m, seed=args.seed),
                             n=args.n, directed=False)
    res = pagerank(g, tol=0.0, max_supersteps=args.supersteps,
                   strategy=args.strategy, block_dir=args.block_dir,
                   num_partitions=args.num_partitions)
    ranks = {int(r["id"]): float(r["rank"]) for r in ranks_df(res).collect()}
    print("SUBMIT_RESULT " + json.dumps({
        "executors": n_members,
        "module": getattr(graftpark, "__file__", "") or "",
        "supersteps": res.supersteps,
        "ranks": ranks,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
