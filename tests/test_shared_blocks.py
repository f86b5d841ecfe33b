"""Shared-storage block_dir semantics across INDEPENDENT Spark
processes — the sandbox stand-in for multiple executors sharing one
HDFS/S3 block directory.

Process A (the test session) builds the CSR blocks and runs packed
PageRank; process B (a fresh JVM + its own Python worker pool, at a
different parallelism) points at the same block_dir, must REUSE the
blocks (fingerprint-validated, no rebuild — asserted via an unchanged
generation token) and produce the same ranks.
"""

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys
sys.path.insert(0, os.environ["GP_REPO"])
from graftpark.fixtures import barabasi_albert
from graftpark.graph import Graph
from graftpark.kernels.pagerank import pagerank, ranks_df
from graftpark.session import get_spark

# deliberately different master/shuffle config from the parent session:
# a second "executor" has its own JVM and worker pool, only the storage
# (block_dir) is shared
spark = get_spark(master="local[2]", app_name="gp-exec-b", shuffle_partitions=2)
g = Graph.from_edge_list(spark, barabasi_albert(1500, 4, seed=11), n=1500, directed=False)
res = pagerank(g, tol=0.0, max_supersteps=6, strategy="packed",
               block_dir=os.environ["GP_BLK"], num_partitions=8)
ranks = {int(r["id"]): round(float(r["rank"]), 12) for r in ranks_df(res).collect()}
print("CHILD_RANKS " + json.dumps(ranks))
spark.stop()
"""


def test_packed_block_dir_shared_across_processes(spark, tmp_path):
    from graftpark.fixtures import barabasi_albert
    from graftpark.graph import Graph
    from graftpark.kernels.pagerank import pagerank, ranks_df

    g = Graph.from_edge_list(spark, barabasi_albert(1500, 4, seed=11), n=1500, directed=False)
    d = str(tmp_path / "blk")
    res = pagerank(g, tol=0.0, max_supersteps=6, strategy="packed",
                   block_dir=d, num_partitions=8)
    a = {int(r["id"]): float(r["rank"]) for r in ranks_df(res).collect()}
    with open(os.path.join(d, "meta.json")) as f:
        token = json.load(f)["token"]

    env = dict(os.environ, GP_REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
               GP_BLK=d)
    out = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                         capture_output=True, text=True, timeout=600)
    lines = [l for l in out.stdout.splitlines() if l.startswith("CHILD_RANKS ")]
    assert lines, f"child produced no ranks:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    b = {int(k): v for k, v in json.loads(lines[0][len("CHILD_RANKS "):]).items()}

    # storage reused, not rebuilt: generation token unchanged
    with open(os.path.join(d, "meta.json")) as f:
        assert json.load(f)["token"] == token
    # identical results from the second process
    assert set(a) == set(b)
    assert all(abs(a[k] - b[k]) < 1e-9 for k in a)
