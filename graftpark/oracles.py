"""Pure-Python reference implementations (test oracles).

~30-line hand-rolled versions of each kernel over python edge lists,
mirroring the reference's sequential kernels which serve the same
oracle role (reference: src/traversals/BFS/bfs_seq.jl:9-31,
src/traversals/coloring/greedy_coloring_seq.jl:12-36). Deterministic
tie-breaks match the engine exactly (min-parent / min-label / mode
with min tie-break), so tests assert exact equality (SURVEY.md §4.3.5).
"""

from __future__ import annotations

from collections import Counter, defaultdict, deque


def _adj(edges, symmetric: bool):
    adj = defaultdict(set)
    for u, v in edges:
        if u == v:
            continue
        adj[u].add(v)
        if symmetric:
            adj[v].add(u)
    return adj


def pagerank(edges, vertices, alpha=0.85, tol=1e-6, max_iter=200):
    """Power iteration with dangling-mass redistribution; L1 convergence."""
    vertices = sorted(set(vertices))
    n = len(vertices)
    if n == 0:
        return {}, 0
    out = defaultdict(set)
    for u, v in edges:
        if u != v:
            out[u].add(v)
    outdeg = {v: len(out[v]) for v in vertices}
    rank = {v: 1.0 / n for v in vertices}
    for it in range(1, max_iter + 1):
        sums = defaultdict(float)
        dangling = 0.0
        for v in vertices:
            if outdeg[v] == 0:
                dangling += rank[v]
            else:
                c = rank[v] / outdeg[v]
                for w in out[v]:
                    sums[w] += c
        base = (1.0 - alpha) / n + alpha * dangling / n
        new = {v: base + alpha * sums[v] for v in vertices}
        delta = sum(abs(new[v] - rank[v]) for v in vertices)
        rank = new
        if delta < tol:
            return rank, it
    return rank, max_iter


def connected_components(edges, vertices):
    """Min-label propagation result: comp = min vertex id in component."""
    adj = _adj(edges, symmetric=True)
    comp = {}
    for v in sorted(set(vertices)):
        if v in comp:
            continue
        members, q = [], deque([v])
        seen = {v}
        while q:
            u = q.popleft()
            members.append(u)
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    q.append(w)
        label = min(members)
        for m in members:
            comp[m] = label
    return comp


def label_propagation(edges, vertices, max_iter=20):
    """Synchronous LP: adopt the mode of neighbor labels, ties → min label.

    Vertices with no neighbors keep their own label. Stops when no label
    changes (or max_iter). Mirrors kernels/labelprop.py exactly.
    """
    adj = _adj(edges, symmetric=True)
    labels = {v: v for v in set(vertices)}
    for it in range(max_iter):
        new = {}
        for v, lab in labels.items():
            if not adj[v]:
                new[v] = lab
                continue
            counts = Counter(labels[w] for w in adj[v])
            best = max(counts.values())
            new[v] = min(l for l, c in counts.items() if c == best)
        if new == labels:
            return labels, it
        labels = new
    return labels, max_iter


def bfs_parents(edges, vertices, source, directed=False):
    """Level-synchronous BFS, deterministic min-parent claim.

    parent[source] = source; unreached vertices absent. Matches the
    engine's `groupBy(dst).agg(min(src))` claim rule (SURVEY.md P1).
    """
    vset = set(vertices)
    if source not in vset:
        raise ValueError(f"invalid source {source}")
    adj = _adj(edges, symmetric=not directed)
    parents = {source: source}
    frontier = [source]
    while frontier:
        claims = {}
        for u in frontier:
            for w in adj[u]:
                if w not in parents:
                    if w not in claims or u < claims[w]:
                        claims[w] = u
        for w, p in claims.items():
            parents[w] = p
        frontier = sorted(claims)
    return parents


def bfs_levels(edges, vertices, source, directed=False):
    adj = _adj(edges, symmetric=not directed)
    levels = {source: 0}
    frontier, lvl = [source], 0
    while frontier:
        lvl += 1
        nxt = []
        for u in frontier:
            for w in adj[u]:
                if w not in levels:
                    levels[w] = lvl
                    nxt.append(w)
        frontier = nxt
    return levels


def triangle_count(edges):
    """Exact global triangle count on the simple undirected graph."""
    adj = _adj(edges, symmetric=True)
    count = 0
    for u in adj:
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[v]:
                if w > v and w in adj[u]:
                    count += 1
    return count


def triangles_per_vertex(edges, vertices=None):
    """Exact per-vertex triangle membership counts (corner sums)."""
    adj = _adj(edges, symmetric=True)
    counts = {v: 0 for v in (vertices or adj)}
    for u in adj:
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[v]:
                if w > v and w in adj[u]:
                    for x in (u, v, w):
                        counts[x] = counts.get(x, 0) + 1
    return counts


def greedy_coloring(edges, vertices, order):
    """Sequential greedy coloring in the given order (reference C1,
    src/traversals/coloring/greedy_coloring_seq.jl:12-36). Colors 1-based."""
    adj = _adj(edges, symmetric=True)
    colors = {}
    for v in order:
        used = {colors[w] for w in adj[v] if w in colors}
        c = 1
        while c in used:
            c += 1
        colors[v] = c
    return colors


def mis_coloring(edges, vertices, weights=None):
    """Luby-style maximal-independent-set coloring, deterministic.

    Priority weights default to degree rank (largest degree → largest
    weight, ties by smaller id → larger weight), mirroring
    kernels/coloring.py and the reference's degree-ordered entry point
    (reference: src/traversals/coloring/BLAS_coloring.jl:8-11,103-216).
    """
    vertices = sorted(set(vertices))
    adj = _adj(edges, symmetric=True)
    if weights is None:
        ranked = sorted(vertices, key=lambda v: (-len(adj[v]), v))
        weights = {v: len(vertices) - i for i, v in enumerate(ranked)}
    colors = {}
    color = 0
    uncolored = set(vertices)
    while uncolored:
        color += 1
        # build one maximal IS among uncolored vertices
        cand = set(uncolored)
        is_set = set()
        while cand:
            selected = {
                v
                for v in cand
                if all(weights[v] > weights[w] for w in adj[v] if w in cand)
            }
            if not selected:
                break
            is_set |= selected
            knocked = {w for v in selected for w in adj[v]}
            cand -= selected | knocked
        for v in is_set:
            colors[v] = color
        uncolored -= is_set
    return colors


def is_proper_coloring(edges, colors):
    return all(colors[u] != colors[v] for u, v in edges if u != v)
