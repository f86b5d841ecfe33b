"""Determinism across parallelism (SURVEY §5.3): the same kernels at
local[2]/2 shuffle partitions and local[8]/8 shuffle partitions produce
identical components/labels and PageRank ranks equal to float-sum
reordering tolerance. Replaces the reference's statistical threading
test (runtests.jl:210-231) — Spark's shuffle determinism makes the
stronger exact claim testable.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _run(master: str, shuffle: int) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "_determinism_child.py"), master, str(shuffle)],
        capture_output=True, text=True, timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT:")][-1]
    return json.loads(line[len("RESULT:"):])


def test_kernels_identical_across_parallelism():
    a = _run("local[2]", 2)
    b = _run("local[8]", 8)
    assert set(a) == set(b) and len(a) == 3000
    max_rank_diff = max(abs(a[k][0] - b[k][0]) for k in a)
    assert max_rank_diff < 1e-12  # float-sum reorder noise only
    assert all(a[k][1] == b[k][1] for k in a)  # components exact
    assert all(a[k][2] == b[k][2] for k in a)  # labels exact
