"""Pure-numpy replica of one packed gather bucket, run P-way concurrent.
Measures per-process kernel time vs concurrency — no Spark/JVM involved.

Usage: python tools/bw_floor.py [NPY_DIR] [STATE_SIZE]
  NPY_DIR    the block directory's _npy subdir (default: the 256M-edge
             scaling workdir bench_scaling.py creates)
  STATE_SIZE per-bucket state-vector length (default 260000 ≈ 16M
             vertices / 64 buckets, matching the default scaling input)
"""
import multiprocessing as mp
import os
import sys
import time

import numpy as np

D = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/graftpark-scaling-256000000-16000000-64/blocks/_npy"
STATE_SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 260000


def one(args):
    b, core = args
    os.sched_setaffinity(0, {core})
    d = os.path.join(D, b)
    pos = np.load(os.path.join(d, "positions.npy"), mmap_mode="r")
    starts = np.load(os.path.join(d, "starts.npy"), mmap_mode="r")
    rank = np.random.default_rng(1).random(STATE_SIZE).astype(np.float32)
    t0 = time.monotonic()
    per_edge = rank[np.asarray(pos)]
    partial = np.add.reduceat(per_edge, np.asarray(starts))
    assert len(partial) == len(starts)
    return time.monotonic() - t0


if __name__ == "__main__":
    buckets = sorted(n for n in os.listdir(D) if n.startswith("bucket="))[:64]
    for P in (1, 8, 32):
        with mp.Pool(P) as pool:
            args = [(buckets[i % len(buckets)], i % P) for i in range(64)]
            t0 = time.monotonic()
            times = pool.map(one, args)
            wall = time.monotonic() - t0
        print(f"P={P:2d} wall={wall:6.2f}s per-bucket mean={np.mean(times):.3f}s max={np.max(times):.3f}s")
