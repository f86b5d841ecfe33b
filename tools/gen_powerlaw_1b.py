#!/usr/bin/env python
"""Memory-safe builder for the 10^9-edge scaling input.

Same distribution family as graftpark.fixtures.powerlaw_edges_pdf
(truncated power-law out/in degrees, s_out=0.7 / s_in=0.5, offset-
permuted sinks, self-loops dropped, exact-duplicate edges removed) but
generated in seeded numpy chunks and deduplicated in DuckDB with a
disk-backed spill budget, so a 10^9-edge build peaks at ~30 GB RSS
instead of the ~90 GB the single-shot pandas fixture would need.

Writes the exact layout bench_scaling.prepare_input() produces
(<workdir>/input/edges.parquet + _OK), so the scaling harness reuses
the file and never regenerates. The file, not the generator, is what
both parallelism levels share — reproducibility of the pair comes from
the shared parquet; the recipe (seed 42, 16 chunks) is recorded here.

Usage: python tools/gen_powerlaw_1b.py [n_edges] [n_vertices] [workdir]
"""
from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pyarrow as pa

N_EDGES = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000_000
N_VERTICES = int(sys.argv[2]) if len(sys.argv) > 2 else 64_000_000
WORKDIR = (
    sys.argv[3]
    if len(sys.argv) > 3
    else f"/tmp/graftpark-scaling-{N_EDGES}-{N_VERTICES}-32"
)
S_OUT, S_IN, SEED, CHUNKS = 0.7, 0.5, 42, 16


def sample(rng: np.random.RandomState, s: float, size: int) -> np.ndarray:
    u = rng.random_sample(size)
    x = np.ceil(N_VERTICES * u ** (1.0 / (1.0 - s))).astype("int64")
    return np.clip(x, 1, N_VERTICES)


def main() -> None:
    data = os.path.join(WORKDIR, "input")
    ok = os.path.join(data, "_OK")
    if os.path.exists(ok):
        print(f"input already present: {data}")
        return
    os.makedirs(data, exist_ok=True)
    db_path = os.path.join(WORKDIR, "gen.duckdb")
    if os.path.exists(db_path):
        os.remove(db_path)
    con = duckdb.connect(db_path)
    con.execute("PRAGMA memory_limit='48GB'")
    con.execute(f"PRAGMA temp_directory='{WORKDIR}/gen_tmp'")
    con.execute("CREATE TABLE raw (src BIGINT, dst BIGINT)")

    m_total = int(N_EDGES * 1.35)  # oversample to survive dedup/self-loop loss
    per_chunk = (m_total + CHUNKS - 1) // CHUNKS
    t0 = time.monotonic()
    for i in range(CHUNKS):
        rng = np.random.RandomState(SEED + i)
        src = sample(rng, S_OUT, per_chunk)
        dst = (sample(rng, S_IN, per_chunk) + N_VERTICES // 2 - 1) % N_VERTICES + 1
        keep = src != dst
        tbl = pa.table({"src": src[keep], "dst": dst[keep]})
        con.execute("INSERT INTO raw SELECT * FROM tbl")
        del src, dst, keep, tbl
        print(
            f"chunk {i + 1}/{CHUNKS} inserted "
            f"({time.monotonic() - t0:.0f}s elapsed)",
            flush=True,
        )

    print("deduplicating...", flush=True)
    out = os.path.join(data, "edges.parquet")
    con.execute(
        f"""
        COPY (
            SELECT src, dst FROM (SELECT DISTINCT src, dst FROM raw)
            LIMIT {N_EDGES}
        ) TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE 2000000)
        """
    )
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
    con.close()
    os.remove(db_path)
    print(f"wrote {n:,} edges to {out} in {time.monotonic() - t0:.0f}s", flush=True)
    if n < N_EDGES:
        raise SystemExit(
            f"only {n:,} unique edges after dedup (< {N_EDGES:,}); "
            "raise the oversample factor"
        )
    open(ok, "w").close()


if __name__ == "__main__":
    main()
