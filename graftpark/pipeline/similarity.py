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


def band_key_cols(vec_col, planes, bands: int) -> list[F.Column]:
    """Per-band packed sign-bit key columns (n_planes/bands bits each) —
    the banding primitive shared by ANN and embedding near-dup LSH."""
    r = len(planes) // bands
    keys = []
    for b in range(bands):
        key = F.lit(0).cast("long")
        for j, p in enumerate(planes[b * r:(b + 1) * r]):
            plane = F.array(*[F.lit(float(x)) for x in p])
            key = key + F.when(_dot(vec_col, plane) > 0, F.lit(1 << j).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        keys.append(key)
    return keys


def _probe_buckets(planes, query_vec: list[float], probe_hamming: int) -> list[int]:
    """Multi-probe bucket set: the query's signature bucket plus every
    bucket within ``probe_hamming`` sign-bit flips."""
    import numpy as np

    n_planes = len(planes)
    q = np.asarray(query_vec, dtype="float64")
    q_sig = 0
    for i, p in enumerate(planes):
        if float(np.dot(q, p)) > 0:
            q_sig |= 1 << i
    buckets = {q_sig}
    if probe_hamming >= 1:
        buckets |= {q_sig ^ (1 << i) for i in range(n_planes)}
    if probe_hamming >= 2:
        buckets |= {q_sig ^ (1 << i) ^ (1 << j) for i in range(n_planes) for j in range(i + 1, n_planes)}
    return [int(b) for b in buckets]


class AnnIndex:
    """A built LSH index: the embedding table with its signature column
    computed ONCE — either persisted in memory (session-local) or
    written as ``_sig``-partitioned parquet (durable; probes prune
    partition directories). Probes never recompute signatures."""

    def __init__(self, df: DataFrame, planes, id_col: str, vec_col: str, path: str | None = None):
        self.df, self.planes = df, planes
        self.id_col, self.vec_col = id_col, vec_col
        self.path = path

    def unpersist(self) -> None:
        self.df.unpersist()


def build_ann_index(
    embeddings: DataFrame, dim: int, n_planes: int = 8, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding", path: str | None = None,
) -> AnnIndex:
    """Index-build stage (one scan): signature column, then either

    - ``path=None`` → persist in memory (session-local index), or
    - ``path=...`` → write ONCE as parquet **partitioned by ``_sig``**
      (one directory per signature bucket) plus an ``_ann_meta.json``
      sidecar (dim / n_planes / seed — the planes are regenerated
      deterministically at load). A probe's ``_sig IN (...)`` filter
      becomes a partition filter, so only the probed buckets' files are
      ever read; the index survives the session and is shared by every
      executor at cluster scale. Reopen with :func:`load_ann_index`.
    """
    from pyspark.storagelevel import StorageLevel

    planes = _hyperplanes(dim, n_planes, seed)
    df = embeddings.withColumn("_sig", lsh_signature_col(F.col(vec_col), planes))
    if path is not None:
        import json
        import os

        df.write.mode("overwrite").partitionBy("_sig").parquet(path)
        # '_'-prefixed sidecar: ignored by the parquet reader
        meta = {"dim": int(dim), "n_planes": int(n_planes), "seed": int(seed),
                "id_col": id_col, "vec_col": vec_col}
        with open(os.path.join(path, "_ann_meta.json"), "w") as f:
            json.dump(meta, f)
        return AnnIndex(embeddings.sparkSession.read.parquet(path), planes, id_col, vec_col, path=path)
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    return AnnIndex(df, planes, id_col, vec_col)


def load_ann_index(spark, path: str) -> AnnIndex:
    """Reopen a parquet-backed ANN index in a fresh session — no scan,
    no signature recompute; planes regenerate from the meta sidecar."""
    import json
    import os

    with open(os.path.join(path, "_ann_meta.json")) as f:
        meta = json.load(f)
    planes = _hyperplanes(meta["dim"], meta["n_planes"], meta["seed"])
    return AnnIndex(spark.read.parquet(path), planes, meta["id_col"], meta["vec_col"], path=path)


def ann_probe(index: AnnIndex, query_vec: list[float], k: int = 10,
              probe_hamming: int = 1) -> DataFrame:
    """Probe stage: scan only the multi-probe buckets of the cached index."""
    buckets = _probe_buckets(index.planes, query_vec, probe_hamming)
    pool = index.df.where(F.col("_sig").isin(buckets))
    return cosine_topk(pool, query_vec, k, index.id_col, index.vec_col)


def ann_lsh_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    n_planes: int = 8, probe_hamming: int = 1, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """One-shot convenience: inline signatures + probe (single scan).
    For repeated queries build the index once with ``build_ann_index``
    and call ``ann_probe`` per query."""
    planes = _hyperplanes(len(query_vec), n_planes, seed)
    buckets = _probe_buckets(planes, query_vec, probe_hamming)
    sig = lsh_signature_col(F.col(vec_col), planes)
    pool = embeddings.withColumn("_sig", sig).where(F.col("_sig").isin(buckets))
    return cosine_topk(pool, query_vec, k, id_col, vec_col)
