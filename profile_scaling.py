#!/usr/bin/env python
"""One-off profiler: where does the per-superstep serial time go?

Runs PageRank supersteps on the seeded power-law graph at one
parallelism level with the Spark UI enabled, then dumps per-stage
executorRunTime / executorCpuTime / GC / scheduler metrics from the
REST API. Not part of the engine; a measurement tool.
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
n_edges = int(os.environ.get("GRAFTPARK_SCALING_EDGES", "16000000"))
n_vertices = int(os.environ.get("GRAFTPARK_SCALING_VERTICES", "2000000"))
max_steps = int(os.environ.get("GRAFTPARK_PROFILE_STEPS", "6"))

from graftpark.fixtures import powerlaw_edges_pdf
from graftpark.graph import Graph
from graftpark.session import get_spark
from graftpark.kernels.pagerank import pagerank

extra = {"spark.ui.enabled": "true", "spark.ui.showConsoleProgress": "false"}
for kv in os.environ.get("GRAFTPARK_PROFILE_CONF", "").split(";"):
    if "=" in kv:
        k, v = kv.split("=", 1)
        extra[k] = v
n_buckets = int(os.environ.get("GRAFTPARK_PROFILE_BUCKETS", "0")) or cpus
spark = get_spark(
    master=f"local[{cpus}]",
    app_name=f"graftpark-profile-{cpus}",
    shuffle_partitions=n_buckets,
    extra=extra,
)
import tempfile

strategy = os.environ.get("GRAFTPARK_PROFILE_STRATEGY", "auto")
block_dir = os.environ.get("GRAFTPARK_PROFILE_BLOCKS") or tempfile.mkdtemp(
    prefix="graftpark-profile-blocks-"
)
data = os.environ.get("GRAFTPARK_PROFILE_DATA")
if data:
    g = Graph(spark.read.parquet(data), assume_normalized=True)
else:
    pdf = powerlaw_edges_pdf(n_edges, n_vertices, seed=42)
    g = Graph(spark.createDataFrame(pdf))
pagerank(g, tol=0.0, max_supersteps=1, strategy=strategy, block_dir=block_dir)  # warm-up

import datetime
loop_start_utc = datetime.datetime.now(datetime.timezone.utc)
t0 = time.monotonic()
res = pagerank(g, tol=1e-6, max_supersteps=max_steps, strategy=strategy, block_dir=block_dir)
wall = time.monotonic() - t0

walls = [m["wall_s"] for m in res.metrics]
print(f"PROFILE cpus={cpus} wall={wall:.2f} steps={res.supersteps} "
      f"mean_step={sum(walls)/len(walls):.3f} walls={[round(w,2) for w in walls]}")

app_id = spark.sparkContext.applicationId
base = f"http://localhost:4040/api/v1/applications/{app_id}"
stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
jobs = json.load(urllib.request.urlopen(f"{base}/jobs"))
print(f"jobs={len(jobs)} stages={len(stages)}")

tot = {}
for s in stages:
    for k in ("executorRunTime", "executorCpuTime", "jvmGcTime",
              "executorDeserializeTime", "resultSerializationTime",
              "shuffleWriteTime", "shuffleFetchWaitTime"):
        tot[k] = tot.get(k, 0) + s.get(k, 0)
# cpu & shuffleWrite are ns, others ms
print(json.dumps({
    "executorRunTime_s": round(tot["executorRunTime"] / 1e3, 1),
    "executorCpuTime_s": round(tot["executorCpuTime"] / 1e9, 1),
    "jvmGcTime_s": round(tot["jvmGcTime"] / 1e3, 1),
    "deserializeTime_s": round(tot["executorDeserializeTime"] / 1e3, 1),
    "shuffleWriteTime_s": round(tot["shuffleWriteTime"] / 1e9, 1),
    "fetchWait_s": round(tot["shuffleFetchWaitTime"] / 1e3, 1),
    "wall_in_loop_s": round(wall, 1),
    "ideal_parallel_s": round(tot["executorRunTime"] / 1e3 / cpus, 1),
}))

def parse_ts(s):
    return datetime.datetime.strptime(s[:-3] + "+0000", "%Y-%m-%dT%H:%M:%S.%f%z")

in_loop = [s for s in stages if "submissionTime" in s
           and parse_ts(s["submissionTime"]) >= loop_start_utc]
loop_tot = {"run": 0.0, "cpu": 0.0, "gc": 0.0}
print(f"--- stages submitted during measured loop ({len(in_loop)}) ---")
for s in sorted(in_loop, key=lambda s: s["submissionTime"]):
    rel = (parse_ts(s["submissionTime"]) - loop_start_utc).total_seconds()
    loop_tot["run"] += s["executorRunTime"] / 1e3
    loop_tot["cpu"] += s["executorCpuTime"] / 1e9
    loop_tot["gc"] += s["jvmGcTime"] / 1e3
    print(f"  +{rel:6.1f}s stage {s['stageId']:3d} tasks={s['numCompleteTasks']:5d} "
          f"run={s['executorRunTime']/1e3:7.1f}s cpu={s['executorCpuTime']/1e9:7.1f}s "
          f"gc={s['jvmGcTime']/1e3:5.1f}s in={s.get('inputRecords',0):>9} "
          f"sr={s.get('shuffleReadRecords',0):>9} sw={s.get('shuffleWriteRecords',0):>9}")
print(f"loop totals: run={loop_tot['run']:.1f}s cpu={loop_tot['cpu']:.1f}s "
      f"gc={loop_tot['gc']:.1f}s wall={wall:.1f}s cores={cpus} "
      f"parallel_occupancy={loop_tot['run']/wall/cpus:.2f}")
spark.stop()
