"""Pure-numpy replica of one packed gather bucket, run P-way concurrent.
Measures per-process kernel time vs concurrency — no Spark/JVM involved."""
import numpy as np, os, sys, time, multiprocessing as mp

D = "/tmp/graftpark-scaling-256000000-16000000-64/blocks/_npy"
BUCKETS = sorted(os.listdir(D))[:64]

def one(args):
    b, core = args
    os.sched_setaffinity(0, {core})
    d = os.path.join(D, b)
    pos = np.load(os.path.join(d, "positions.npy"), mmap_mode="r")
    starts = np.load(os.path.join(d, "starts.npy"), mmap_mode="r")
    rank = np.random.default_rng(1).random(260000).astype(np.float32)
    t0 = time.monotonic()
    per_edge = rank[np.asarray(pos)]
    partial = np.add.reduceat(per_edge, np.asarray(starts))
    return time.monotonic() - t0

if __name__ == "__main__":
    for P in (1, 8, 32):
        with mp.Pool(P) as pool:
            args = [(BUCKETS[i % len(BUCKETS)], i % P) for i in range(64)]
            t0 = time.monotonic()
            times = pool.map(one, args)
            wall = time.monotonic() - t0
        print(f"P={P:2d} wall={wall:6.2f}s per-bucket mean={np.mean(times):.3f}s max={np.max(times):.3f}s")
