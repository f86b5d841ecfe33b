"""North-rule deployment path: spark-submit --py-files on multi-executor.

Packages graftpark as a zip (tools/make_pyfiles_zip.py), then runs
tools/submit_pagerank.py through pyspark's own spark-submit against
``local-cluster[2,2,1500]`` — two separate executor JVMs whose Python
UDF workers must import the engine from the shipped artifact. The
subprocess env strips PYTHONPATH and runs outside the repo cwd, so a
successful import can only come from the --py-files zip (asserted via
the reported module path). Ranks are checked against the pure-python
oracle (fixed 8 supersteps, exact to 1e-9).

Runs in a subprocess: the pytest session already owns a local[4]
SparkContext and one JVM cannot host two masters.
"""

import json
import os
import subprocess
import sys

import pyspark

from graftpark import oracles
from graftpark.fixtures import barabasi_albert


def test_spark_submit_py_files_local_cluster(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    from make_pyfiles_zip import build_zip

    zip_path = build_zip(str(tmp_path / "graftpark.zip"), repo_root=repo)
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.setdefault("SPARK_HOME", os.path.dirname(os.path.abspath(pyspark.__file__)))
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    n, m, seed, k = 800, 3, 7, 8
    cmd = [
        submit,
        "--master", "local-cluster[2,2,1500]",
        "--conf", "spark.executor.memory=1200m",
        "--conf", "spark.driver.memory=2g",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
        os.path.join(repo, "tools", "submit_pagerank.py"),
        "--n", str(n), "--m", str(m), "--seed", str(seed),
        "--supersteps", str(k),
        "--block-dir", str(tmp_path / "blocks"),
    ]
    out = subprocess.run(cmd, env=env, cwd=str(tmp_path),
                         capture_output=True, text=True, timeout=900)
    lines = [l for l in out.stdout.splitlines() if l.startswith("SUBMIT_RESULT ")]
    assert lines, f"spark-submit failed:\n{out.stdout[-3000:]}\n{out.stderr[-3000:]}"
    got = json.loads(lines[0][len("SUBMIT_RESULT "):])

    assert got["executors"] >= 3  # driver + 2 executor JVMs
    # the engine really came from the shipped artifact, not a repo mount
    assert "graftpark.zip" in got["module"], got["module"]
    assert got["supersteps"] == k

    pairs = barabasi_albert(n, m, seed=seed)
    oracle_edges = pairs + [(v, u) for u, v in pairs]
    expect, _ = oracles.pagerank(oracle_edges, range(1, n + 1), tol=0.0, max_iter=k)
    ranks = {int(i): v for i, v in got["ranks"].items()}
    assert set(ranks) == set(expect)
    assert max(abs(ranks[v] - expect[v]) for v in expect) < 1e-9
