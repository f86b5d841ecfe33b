"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k against a query vector —
  one scan, JVM-side `zip_with`/`aggregate` dot products, no UDF.
- ``ann_lsh_topk``: the scale path — random-hyperplane LSH buckets
  (deterministic seeded planes broadcast as literals); the query only
  scans buckets within ``probe_hamming`` of its own signature
  (multi-probe), trading recall for a bounded scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(v) -> F.Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_scores(
    embeddings: DataFrame, query_vec: list[float],
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cosine) for every row vs the query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = sum(float(x) * float(x) for x in query_vec) ** 0.5
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        (_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))).alias("cosine"),
    )


def cosine_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine, deterministic tie-break on id.

    orderBy+limit compiles to TakeOrderedAndProject — a per-partition
    top-k then a driver merge, NOT a global sort."""
    return (
        cosine_scores(embeddings, query_vec, id_col, vec_col)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42):
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_signature_col(vec_col, planes) -> F.Column:
    """Pack sign(v·p) bits into one long signature column."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec_col, plane) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        sig = sig + bit
    return sig


def ann_lsh_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    n_planes: int = 8, probe_hamming: int = 1, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: scan only LSH buckets within ``probe_hamming``
    bits of the query's signature. At scale the signature column is
    computed once and persisted/bucketed; the probe is a semi-join."""
    import numpy as np

    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    q = np.asarray(query_vec, dtype="float64")
    q_sig = 0
    for i, p in enumerate(planes):
        if float(np.dot(q, p)) > 0:
            q_sig |= 1 << i
    # multi-probe bucket set: exact bucket + all within probe_hamming bits
    buckets = {q_sig}
    if probe_hamming >= 1:
        buckets |= {q_sig ^ (1 << i) for i in range(n_planes)}
    if probe_hamming >= 2:
        buckets |= {q_sig ^ (1 << i) ^ (1 << j) for i in range(n_planes) for j in range(i + 1, n_planes)}
    sig = lsh_signature_col(F.col(vec_col), planes)
    pool = embeddings.withColumn("_sig", sig).where(F.col("_sig").isin([int(b) for b in buckets]))
    return cosine_topk(pool, query_vec, k, id_col, vec_col)
