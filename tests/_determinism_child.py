"""Child process for the cross-parallelism determinism test: run the
three iterative kernels at the given master/shuffle setting and print
one JSON line of full-precision results. (Separate process because one
JVM cannot host two local[N] masters.)"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(master: str, shuffle: int) -> None:
    from graftpark.fixtures import barabasi_albert
    from graftpark.graph import Graph
    from graftpark.kernels.components import connected_components
    from graftpark.kernels.labelprop import label_propagation
    from graftpark.kernels.pagerank import pagerank
    from graftpark.session import get_spark

    spark = get_spark(master=master, app_name="determinism-child", shuffle_partitions=shuffle)
    g = Graph.from_edge_list(spark, barabasi_albert(3000, 3, seed=11), n=3000, directed=False)
    pr = {r["id"]: r["rank"] for r in pagerank(g, tol=1e-8, max_supersteps=40).state.collect()}
    cc = {r["id"]: r["comp"] for r in connected_components(g).state.collect()}
    lp = {r["id"]: r["label"] for r in label_propagation(g, max_supersteps=5).state.collect()}
    out = {str(k): (pr[k], cc[k], lp[k]) for k in pr}
    print("RESULT:" + json.dumps(out, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
