"""Deterministic fixture graphs ported from the reference test suite.

Edge lists extracted from the inline adjacency matrices in
reference test/runtests.jl (see FIXTURES.md §2 for the line map).
Undirected fixtures are stored once as (min,max) pairs; the engine
symmetrizes. Generators are seeded pure Python (no external data).
"""

from __future__ import annotations

import random

# (name, n, directed, edges)
G4_CYCLE = (4, False, [(1, 2), (1, 3), (2, 4), (3, 4)])  # runtests.jl:33-40
G6_TWO_COMP = (6, False, [(1, 2), (2, 3), (4, 5), (5, 6)])  # runtests.jl:59-66
G4_DIR = (4, True, [(1, 2), (2, 3), (3, 4), (4, 2)])  # runtests.jl:86-92
G8_TWO_COMP = (8, False, [(1, 2), (2, 3), (4, 5), (5, 6), (5, 7), (6, 7), (6, 8), (7, 8)])  # :148-157
G30_HUB = (
    30,
    False,
    [(1, 2), (1, 3), (1, 4), (1, 5), (2, 12), (2, 13), (3, 10), (3, 11), (4, 8), (4, 9),
     (5, 6), (5, 7), (6, 28), (6, 29), (7, 26), (7, 27), (8, 24), (8, 25), (9, 22), (9, 23),
     (10, 20), (10, 21), (11, 18), (11, 19), (12, 16), (12, 17), (13, 14), (13, 15)]
    + [(k, 30) for k in range(14, 30)],
)  # runtests.jl:176-207
G14_DIR = (
    14,
    True,
    [(1, 2), (2, 3), (3, 4), (4, 2), (4, 5), (4, 8), (5, 6), (6, 7), (7, 11), (7, 14),
     (8, 9), (9, 10), (10, 11), (10, 12), (11, 14), (12, 1), (13, 1)],
)  # runtests.jl:265-280
G15_DENSE = (
    15,
    False,
    [(1, 2), (1, 3), (1, 4), (1, 6), (1, 9), (1, 11), (1, 12), (1, 14), (2, 3), (2, 7),
     (2, 8), (2, 9), (2, 11), (2, 12), (2, 13), (2, 15), (3, 6), (3, 7), (3, 8), (3, 10),
     (3, 11), (3, 14), (3, 15), (4, 8), (4, 9), (4, 10), (4, 11), (4, 13), (5, 6), (5, 8),
     (5, 10), (5, 13), (5, 14), (6, 7), (6, 9), (6, 10), (6, 12), (6, 13), (6, 14), (7, 8),
     (7, 9), (7, 11), (8, 9), (8, 14), (8, 15), (9, 11), (9, 13), (9, 14), (10, 11),
     (10, 12), (10, 14), (11, 15), (12, 13), (12, 14)],
)  # runtests.jl:559-575

FIXTURES = {
    "g4_cycle": G4_CYCLE,
    "g6_two_comp": G6_TWO_COMP,
    "g4_dir": G4_DIR,
    "g8_two_comp": G8_TWO_COMP,
    "g30_hub": G30_HUB,
    "g14_dir": G14_DIR,
    "g15_dense": G15_DENSE,
}


def barabasi_albert(n: int, m: int, seed: int = 42) -> list[tuple[int, int]]:
    """Seeded preferential-attachment generator (repeated-nodes method),
    1-indexed, undirected (min,max) pairs. Mirrors the reference's
    generated power-law family (benchmark/benchmarks.jl:89-94) and is
    the skew fixture for salting tests (SURVEY.md §4.3.2).
    """
    rng = random.Random(seed)
    edges: list[tuple[int, int]] = []
    repeated: list[int] = []
    # seed clique on the first m+1 vertices
    for u in range(1, m + 2):
        for v in range(u + 1, m + 2):
            edges.append((u, v))
            repeated += [u, v]
    for new in range(m + 2, n + 1):
        targets: set[int] = set()
        while len(targets) < m:
            targets.add(rng.choice(repeated))
        for t in sorted(targets):
            edges.append((min(new, t), max(new, t)))
            repeated += [new, t]
    return edges


def powerlaw_edges_pdf(
    n_edges: int, n_vertices: int, s_out: float = 0.7, s_in: float = 0.5, seed: int = 42
):
    """Vectorized seeded power-law edge table, deduplicated, self-loops
    dropped — the at-scale skew/throughput fixture. Out- and in-degree
    both follow truncated power laws P(i) ∝ i^-s (inverse-transform
    sampling over a permuted id space so hub sources ≠ hub sinks); with
    the defaults at n=2M the top out-hub sources ~1.3% of edges and the
    top in-hub receives ~0.07% — strong, realistic web skew without
    being degenerate. Returns a pandas DataFrame (src, dst) of int64,
    deterministic for a given seed."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(seed)
    # oversample to survive dedup/self-loop loss
    m = int(n_edges * 1.35)

    def sample(s: float, size: int):
        u = rng.random_sample(size)
        x = np.ceil(n_vertices * u ** (1.0 / (1.0 - s))).astype("int64")
        return np.clip(x, 1, n_vertices)

    src = sample(s_out, m)
    # offset-permute the in-degree ranking so hub sinks differ from hub sources
    dst = (sample(s_in, m) + n_vertices // 2 - 1) % n_vertices + 1
    pdf = pd.DataFrame({"src": src.astype("int64"), "dst": dst.astype("int64")})
    pdf = pdf[pdf.src != pdf.dst].drop_duplicates()
    return pdf.head(n_edges).reset_index(drop=True)


def dorogovtsev_mendes(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """Seeded Dorogovtsev–Mendes planar growth model: each new vertex
    attaches to both endpoints of a uniformly random existing edge
    (reference benchmark family, benchmark/benchmarks.jl:82-87)."""
    if n < 3:
        return [(u, v) for u in range(1, n + 1) for v in range(u + 1, n + 1)]
    rng = random.Random(seed)
    edges: list[tuple[int, int]] = [(1, 2), (1, 3), (2, 3)]
    for new in range(4, n + 1):
        u, v = edges[rng.randrange(len(edges))]
        edges.append((u, new))
        edges.append((v, new))
    return edges


def binary_tree(depth: int) -> list[tuple[int, int]]:
    """Complete binary tree of ``depth`` levels, 1-indexed heap layout
    (reference benchmark family, benchmark/benchmarks.jl:96-98)."""
    n = 2**depth - 1
    return [(k // 2, k) for k in range(2, n + 1)]


def star_graph(n: int) -> list[tuple[int, int]]:
    """Max-skew hub fixture (benchmark/benchmarks.jl:100-104)."""
    return [(1, k) for k in range(2, n + 1)]


def grid_2d(rows: int, cols: int) -> list[tuple[int, int]]:
    """Undirected grid (high-diameter fixture, benchmark/benchmarks.jl:106-107)."""
    edges = []
    vid = lambda r, c: r * cols + c + 1  # noqa: E731
    for r in range(rows):
        for c in range(cols):
            if c + 1 < cols:
                edges.append((vid(r, c), vid(r, c + 1)))
            if r + 1 < rows:
                edges.append((vid(r, c), vid(r + 1, c)))
    return edges


def path_digraph(n: int) -> list[tuple[int, int]]:
    return [(i, i + 1) for i in range(1, n)]
