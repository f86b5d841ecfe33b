#!/usr/bin/env python
"""Concurrent replay lab for the packed gather kernel variants.

Replays one bucket's superstep gather (the measured DRAM-bound hot loop
of the 8->32 scaling pair) P-way concurrent with pinned cores, no
Spark/JVM — isolates how each kernel variant scales on THIS host's
memory system. Variants:

  chunked   the production ``segment_gather_reduce`` (cache-resident
            chunked gather, blocks.py)
  fulltemp  the pre-round-3 kernel (full per-edge temp) — baseline
  sorted    chunked kernel over positions sorted ascending within each
            dst segment (simulates a layout where _build_npy orders
            src within dst runs; reduceat sums are permutation-
            equivalent)
  emit      chunked kernel + the message-emission passes (slice →
            tobytes per dst bucket) — measures how much of the bucket
            wall the post-gather copies add

Round-5 levers (VERDICT r04 item 2):

  f16       rank vector stored float16, chunked gather accumulating in
            float16 — the max-quantization bandwidth probe (accuracy
            would need a float32 finish; this measures the ceiling)
  f16x32    rank float16, per-chunk upcast to float32 before reduceat —
            the accuracy-preserving quantized variant a real
            middle-superstep payload would use
  chunk:N   the production chunked kernel with _GATHER_CHUNK=N
            (e.g. chunk:65536) — emission/gather granularity sweep;
            smaller chunks = finer pipelining, more reduceat overhead

Usage: python tools/kernel_lab.py [NPY_DIR] [STATE_SIZE] [P ...]
  defaults: the 256M-edge scaling workdir, 250000 (16M vertices / 64
  buckets), P in 1 8 32. Env GRAFTPARK_LAB_VARIANTS=a,b,c overrides
  the variant list.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/graftpark-scaling-256000000-16000000-64/blocks/_npy"
STATE_SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 250000
PS = [int(p) for p in sys.argv[3:]] or [1, 8, 32]


def _load(bucket_dir):
    pos = np.asarray(np.load(os.path.join(bucket_dir, "positions.npy"), mmap_mode="r"))
    starts = np.asarray(np.load(os.path.join(bucket_dir, "starts.npy"), mmap_mode="r"))
    return pos, starts


def _sort_within_segments(pos, starts):
    """Sort positions ascending inside each dst segment (sum-invariant)."""
    bounds = np.append(starts.astype(np.int64), len(pos))
    seg_id = np.repeat(np.arange(len(starts), dtype=np.int64), np.diff(bounds))
    order = np.lexsort((pos, seg_id))
    return np.ascontiguousarray(pos[order])


def _chunked_f16x32(rank16, pos, starts, chunk=1 << 18):
    """Accuracy-preserving quantized gather: float16 state, per-chunk
    upcast to float32 before reduceat (mirrors segment_gather_reduce's
    chunk/merge structure)."""
    n = len(pos)
    out = np.empty(len(starts), dtype=np.float32)
    lo_seg, e0 = 0, 0
    while e0 < n:
        e1 = min(e0 + chunk, n)
        hi_seg = int(np.searchsorted(starts, e1, side="left"))
        local = starts[lo_seg:hi_seg].astype(np.int64) - e0
        cont = len(local) == 0 or local[0] != 0
        if cont:
            local = np.concatenate([np.zeros(1, np.int64), local])
        part = np.add.reduceat(rank16[pos[e0:e1]].astype(np.float32), local)
        if cont:
            out[lo_seg - 1] += part[0]
            out[lo_seg:lo_seg + len(part) - 1] = part[1:]
        else:
            out[lo_seg:lo_seg + len(part)] = part
        lo_seg, e0 = hi_seg, e1
    return out


def one(args):
    variant, bucket, core = args
    os.sched_setaffinity(0, {core})
    import graftpark.blocks as B
    from graftpark.blocks import segment_gather_reduce

    pos, starts = _load(os.path.join(D, bucket))
    if variant == "sorted":
        pos = _sort_within_segments(pos, starts)
    n_state = max(STATE_SIZE, int(pos.max()) + 1 if len(pos) else 1)
    rank = np.random.default_rng(1).random(n_state).astype(np.float32)
    if variant.startswith("f16"):
        rank = rank.astype(np.float16)
    if variant.startswith("chunk:"):
        B._GATHER_CHUNK = int(variant.split(":")[1])
    # touch everything once so page-in isn't in the timed region
    if variant == "f16x32":
        _ = _chunked_f16x32(rank, pos, starts)
    else:
        _ = segment_gather_reduce(rank, pos, starts, "sum")
    t0 = time.monotonic()
    if variant == "fulltemp":
        partial = np.add.reduceat(rank[pos], starts)
    elif variant == "f16x32":
        partial = _chunked_f16x32(rank, pos, starts)
    else:
        partial = segment_gather_reduce(rank, pos, starts, "sum")
    if variant == "emit":
        # the post-gather message passes: 64 contiguous slices -> bytes
        cuts = np.linspace(0, len(partial), 65).astype(np.int64)
        payloads = [partial[cuts[i]:cuts[i + 1]].tobytes() for i in range(64)]
        assert sum(len(p) for p in payloads) == 4 * len(partial)
    dt = time.monotonic() - t0
    return dt, len(pos)


def main():
    buckets = sorted(n for n in os.listdir(D) if n.startswith("bucket="))[:64]
    print(f"# {len(buckets)} buckets from {D}, state={STATE_SIZE}")
    variants = tuple(
        v for v in os.environ.get("GRAFTPARK_LAB_VARIANTS", "").split(",") if v
    ) or ("chunked", "fulltemp", "sorted", "emit")
    for variant in variants:
        for P in PS:
            with mp.Pool(P) as pool:
                args = [(variant, buckets[i % len(buckets)], i % P) for i in range(64)]
                t0 = time.monotonic()
                res = pool.map(one, args)
                wall = time.monotonic() - t0
            times = [r[0] for r in res]
            edges = sum(r[1] for r in res)
            print(
                f"{variant:8s} P={P:2d} wall={wall:6.2f}s "
                f"per-bucket mean={np.mean(times):.3f}s max={np.max(times):.3f}s "
                f"agg_edges_per_s={edges / wall / 1e6:7.1f}M"
            )


if __name__ == "__main__":
    main()
