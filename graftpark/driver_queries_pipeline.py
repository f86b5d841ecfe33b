"""Driver-contract queries for the training-data pipeline operators,
with DuckDB oracles (documents / embeddings tables).

Portability notes: md5 hex strings are the shared hash primitive;
integer outputs are cast to BIGINT on both sides; float outputs are
rounded to 6-8 dp and the top-k ordering happens on the ROUNDED value
on both sides so near-tie ordering can't diverge.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from graftpark.pipeline.dedup import exact_dedup_groups, minhash_signatures, simhash
from graftpark.pipeline.similarity import cosine_scores
from graftpark.pipeline.textstats import (
    STOPWORDS,
    fingerprints,
    language_id,
    quality_scores,
    token_counts,
)

_QUERY_VEC = [round(float(x), 4) for x in np.random.RandomState(123).standard_normal(64)]
_QNORM = float(sum(x * x for x in _QUERY_VEC)) ** 0.5

#: shared LSH geometry for the embedding near-dup / ANN driver queries —
#: same seeded hyperplanes on the Spark and DuckDB sides
_ND_PLANES_N, _ND_BANDS, _LSH_SEED = 16, 4, 42
_ANN_PLANES_N, _ANN_PROBE = 8, 1


def _planes(n_planes: int):
    from graftpark.pipeline.similarity import _hyperplanes

    return _hyperplanes(64, n_planes, _LSH_SEED)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q_dedup_exact(spark, sf_dir):
    return exact_dedup_groups(_docs(spark, sf_dir))


def q_token_count(spark, sf_dir):
    t = token_counts(_docs(spark, sf_dir))
    return t.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_unique_tokens").cast("long").alias("n_unique_tokens"),
        F.col("n_chars_measured").cast("long").alias("n_chars_measured"),
    )


def q_quality(spark, sf_dir):
    t = quality_scores(_docs(spark, sf_dir))
    return t.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "mean_token_len",
        "unique_ratio",
        "quality",
    )


def q_lang_id(spark, sf_dir):
    t = language_id(_docs(spark, sf_dir))
    return t.select("doc_id", "lang_pred", F.col("stop_hits").cast("long").alias("stop_hits"))


def q_fingerprint(spark, sf_dir):
    return fingerprints(_docs(spark, sf_dir))


def q_minhash_sig(spark, sf_dir):
    t = minhash_signatures(_docs(spark, sf_dir), num_hashes=8, shingle_k=3)
    return t.select("doc_id", F.col("h").cast("long").alias("h"), "minhash")


def q_simhash(spark, sf_dir):
    return simhash(_docs(spark, sf_dir))


#: hamming radius for the simhash near-dup driver row (the synthetic
#: sf0.01 documents are all-distinct, so radius 3 would return no pairs;
#: 8 keeps the row non-trivial — ~200 pairs — while exercising the same
#: chunk-banded candidate join + bit_count filter)
_SIMHASH_MAXH = 8


def q_simhash_near_dups(spark, sf_dir):
    """Chunk-banded SimHash near-dup pairs: candidates must agree exactly
    on one signature chunk (pigeonhole bucketing over max_hamming + 1
    chunks — never all-pairs, and recall is guaranteed at the requested
    radius), then a bit_count(xor) Hamming filter."""
    from graftpark.pipeline.dedup import simhash_near_dups

    out = simhash_near_dups(_docs(spark, sf_dir), max_hamming=_SIMHASH_MAXH)
    return out.select("a", "b", F.col("hamming").cast("long").alias("hamming"))


def q_cosine_topk(spark, sf_dir):
    scores = cosine_scores(_emb(spark, sf_dir), _QUERY_VEC)
    return (
        scores.select("vec_id", F.round("cosine", 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


def q_embedding_norms(spark, sf_dir):
    e = _emb(spark, sf_dir)
    dot = F.aggregate(
        F.zip_with("embedding", "embedding", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    return e.select("vec_id", F.round(F.sqrt(dot), 6).alias("norm"))


# ------------------------------------------------------------- oracles

_TOKS = "regexp_extract_all(text, '[^ ]+')"


def _lang_values() -> str:
    rows = []
    for lang in sorted(STOPWORDS):
        words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        rows.append(f"('{lang}', [{words}])")
    return ", ".join(rows)


def _qvec_literal() -> str:
    return "[" + ", ".join(repr(x) for x in _QUERY_VEC) + "]::DOUBLE[]"




def q_multimodal_meta(spark, sf_dir):
    from graftpark.pipeline.multimodal import attach_blobs, blob_meta

    return blob_meta(attach_blobs(_docs(spark, sf_dir), content="text"))


def q_image_features(spark, sf_dir):
    """Arrow-batched decode + feature pass. The fake decoder is
    deterministic byte arithmetic (tile payload bytes to width×height),
    so the features are fully reproducible in the DuckDB oracle."""
    from graftpark.pipeline.multimodal import attach_blobs, image_features

    out = image_features(attach_blobs(_docs(spark, sf_dir), content="text"))
    return out.select(
        "doc_id", "n_bytes",
        F.round("mean_pixel", 6).alias("mean_pixel"),
        F.round("p95_pixel", 6).alias("p95_pixel"),
        "width", "height",
    )


def q_audio_features(spark, sf_dir):
    """Fake audio decode = payload bytes as little-endian int16 — exactly
    reproducible in SQL."""
    from graftpark.pipeline.multimodal import attach_blobs, audio_features

    out = audio_features(attach_blobs(_docs(spark, sf_dir), content="text"))
    return out.select(
        "doc_id", "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
    )




#: resize geometry shared by query + oracle
_RSZ_W, _RSZ_H = 16, 12
#: frame-sampling stride/limit shared by query + oracle
_FRAME_BYTES, _FRAME_MAX = 256, 4


def q_resize_images(spark, sf_dir):
    """Nearest-neighbor thumbnail resize (Arrow-batched mapInPandas).
    The resized payload is compared as hex — both engines render binary
    as uppercase hex, and the fake decode + exact-integer index math
    (multimodal.py _nn_indices) make the bytes fully reproducible."""
    from graftpark.pipeline.multimodal import attach_blobs, resize_images

    out = resize_images(attach_blobs(_docs(spark, sf_dir), content="text"), _RSZ_W, _RSZ_H)
    return out.select("doc_id", "width", "height", F.hex("data").alias("px_hex"))


def q_sample_frames(spark, sf_dir):
    """Fixed-stride frame sampling (1→N row fan-out mapInPandas); frames
    compared as hex substrings of the payload."""
    from graftpark.pipeline.multimodal import attach_blobs, sample_frames

    out = sample_frames(
        attach_blobs(_docs(spark, sf_dir), content="text"),
        every_n_bytes=_FRAME_BYTES, max_frames=_FRAME_MAX,
    )
    return out.select("doc_id", "frame_idx", F.hex("frame").alias("frame_hex"))


def q_embedding_near_dups_lsh(spark, sf_dir):
    """Sign-bit-LSH-bucketed embedding near-dup pairs (the at-scale path:
    banded self-join + exact-cosine verify over candidates only)."""
    from graftpark.pipeline.dedup import embedding_near_dups_lsh

    out = embedding_near_dups_lsh(
        _emb(spark, sf_dir), threshold=0.3, dim=64,
        n_planes=_ND_PLANES_N, bands=_ND_BANDS, seed=_LSH_SEED,
    )
    return out.select("a", "b", F.round("cosine", 6).alias("cosine"))


def q_ann_lsh(spark, sf_dir):
    """ANN top-10 by cosine via multi-probe sign-bit LSH buckets."""
    from graftpark.pipeline.similarity import ann_lsh_topk

    out = ann_lsh_topk(
        _emb(spark, sf_dir), _QUERY_VEC, k=10,
        n_planes=_ANN_PLANES_N, probe_hamming=_ANN_PROBE, seed=_LSH_SEED,
    )
    return (
        out.select("vec_id", F.round("cosine", 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
    )


def q_minhash_near_dups(spark, sf_dir):
    """MinHash+LSH near-dup detection end-to-end: shingle → minhash →
    band → bucket self-join → signature-agreement filter."""
    from graftpark.pipeline.dedup import minhash_near_dups

    out = minhash_near_dups(_docs(spark, sf_dir), num_hashes=8, bands=4, threshold=0.5)
    return out.select("a", "b", F.round("est_jaccard", 6).alias("est_jaccard"))


def q_ngram_jaccard(spark, sf_dir):
    """Exact n-gram-shingle Jaccard over the LSH candidate pairs (the
    verify stage of near-dup dedup)."""
    from graftpark.pipeline.dedup import lsh_candidate_pairs, minhash_signatures, ngram_jaccard_pairs

    docs = _docs(spark, sf_dir)
    cand = lsh_candidate_pairs(minhash_signatures(docs, num_hashes=8), bands=4)
    out = ngram_jaccard_pairs(docs, cand)
    return out.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


PIPELINE_ORACLE_SQL: dict[str, str] = {
    "dedup_exact": """
SELECT md5(text) AS content_md5, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
FROM documents GROUP BY md5(text)
""",
    "token_count": f"""
SELECT doc_id,
       len({_TOKS}) AS n_tokens,
       len(list_distinct({_TOKS})) AS n_unique_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_measured
FROM documents
""",
    "quality": f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       ROUND(CASE WHEN len(toks) > 0 THEN length(replace(text, ' ', '')) / len(toks) ELSE 0.0 END, 8) AS mean_token_len,
       ROUND(CASE WHEN len(toks) > 0 THEN len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) ELSE 0.0 END, 8) AS unique_ratio,
       ROUND(LEAST(1.0, len(toks) / 50.0) * CASE WHEN len(toks) > 0 THEN len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) ELSE 0.0 END, 8) AS quality
FROM t
""",
    "lang_id": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
langs(lang, words) AS (VALUES {_lang_values()}),
h AS (
  SELECT doc_id, lang, len(list_filter(toks, x -> list_contains(words, x))) AS hits
  FROM t CROSS JOIN langs
)
SELECT doc_id,
       CASE WHEN MAX(hits) > 0 THEN (list(lang ORDER BY hits DESC, lang ASC))[1] ELSE 'und' END AS lang_pred,
       MAX(hits) AS stop_hits
FROM h GROUP BY doc_id
""",
    "fingerprint": r"""
WITH t AS (SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS norm FROM documents),
t2 AS (SELECT doc_id, norm, regexp_extract_all(norm, '[^ ]+') AS toks FROM t)
SELECT doc_id,
       COALESCE(
         list_aggregate(
           list_transform(generate_series(1, len(toks) - 4), i -> md5(array_to_string(toks[i:i+4], ' '))),
           'min'),
         md5(norm)) AS fingerprint
FROM t2
""",
    "minhash_sig": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
sh0 AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= 3
                THEN list_transform(generate_series(1, len(toks) - 2), i -> array_to_string(toks[i:i+2], ' '))
                ELSE []::VARCHAR[] END) AS shingle
  FROM t),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
seeds AS (SELECT unnest(generate_series(0, 7)) AS h)
SELECT doc_id, h, MIN(md5(CAST(h AS VARCHAR) || '|' || shingle)) AS minhash
FROM sh CROSS JOIN seeds GROUP BY doc_id, h
""",
    "simhash": """
WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(text, '[^ ]+')) AS tok FROM documents),
th AS (SELECT doc_id, md5(tok) AS hx FROM toks),
bits AS (SELECT doc_id, hx, unnest(generate_series(0, 63)) AS b FROM th),
votes AS (
  SELECT doc_id, b,
    CASE WHEN ((strpos('0123456789abcdef', substr(hx, CAST(b // 4 AS INT) + 1, 1)) - 1)
               // (CASE CAST(b % 4 AS INT) WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)) % 2 = 1
         THEN 1 ELSE -1 END AS v
  FROM bits),
s AS (SELECT doc_id, b, SUM(v) AS sv FROM votes GROUP BY doc_id, b),
p2(arr) AS (SELECT list_transform(generate_series(0, 62), i -> CAST(2 ** i AS BIGINT)) || [CAST(-9223372036854775808 AS BIGINT)])
SELECT doc_id,
       CAST(SUM(CASE WHEN sv > 0 THEN (SELECT arr FROM p2)[CAST(b AS INT) + 1] ELSE 0 END) AS BIGINT) AS simhash
FROM s GROUP BY doc_id
""",
    "minhash_near_dups": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
sh0 AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= 3
                THEN list_transform(generate_series(1, len(toks) - 2), i -> array_to_string(toks[i:i+2], ' '))
                ELSE []::VARCHAR[] END) AS shingle
  FROM t),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
seeds AS (SELECT unnest(generate_series(0, 7)) AS h),
sig AS (SELECT doc_id, h, MIN(md5(CAST(h AS VARCHAR) || '|' || shingle)) AS minhash
        FROM sh CROSS JOIN seeds GROUP BY doc_id, h),
banded AS (
  SELECT doc_id, CAST(h % 4 AS INT) AS band,
         md5(array_to_string(list_sort(list(CAST(h AS VARCHAR) || ':' || minhash)), '|')) AS band_key
  FROM sig GROUP BY doc_id, CAST(h % 4 AS INT)),
cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         FROM banded x JOIN banded y ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
agree AS (
  SELECT c.a, c.b,
         SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS est
  FROM cand c JOIN sig sa ON sa.doc_id = c.a JOIN sig sb ON sb.doc_id = c.b AND sb.h = sa.h
  GROUP BY c.a, c.b)
SELECT a, b, ROUND(est, 6) AS est_jaccard FROM agree WHERE est >= 0.5
""",
    "ngram_jaccard": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
sh0 AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= 3
                THEN list_transform(generate_series(1, len(toks) - 2), i -> array_to_string(toks[i:i+2], ' '))
                ELSE []::VARCHAR[] END) AS shingle
  FROM t),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
seeds AS (SELECT unnest(generate_series(0, 7)) AS h),
sig AS (SELECT doc_id, h, MIN(md5(CAST(h AS VARCHAR) || '|' || shingle)) AS minhash
        FROM sh CROSS JOIN seeds GROUP BY doc_id, h),
banded AS (
  SELECT doc_id, CAST(h % 4 AS INT) AS band,
         md5(array_to_string(list_sort(list(CAST(h AS VARCHAR) || ':' || minhash)), '|')) AS band_key
  FROM sig GROUP BY doc_id, CAST(h % 4 AS INT)),
cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         FROM banded x JOIN banded y ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, COUNT(*) AS i
  FROM cand c JOIN sh x ON x.doc_id = c.a JOIN sh y ON y.doc_id = c.b AND y.shingle = x.shingle
  GROUP BY c.a, c.b)
SELECT c.a, c.b,
       ROUND(COALESCE(i.i, 0) * 1.0 / (na.n + nb.n - COALESCE(i.i, 0)), 6) AS jaccard
FROM cand c
LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
JOIN sizes na ON na.doc_id = c.a
JOIN sizes nb ON nb.doc_id = c.b
""",
    "multimodal_meta": """
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256
FROM documents
""",
    # fake image decode: payload bytes tiled to width*height (multimodal.py
    # _decode_pixels); mean over the tiled pixels, p95 via quantile_cont
    # (linear interpolation — numpy's np.percentile default)
    "image_features": """
WITH img AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n,
         CAST(octet_length(encode(text)) % 64 + 16 AS INT) AS width,
         CAST(octet_length(encode(text)) % 48 + 16 AS INT) AS height
  FROM documents WHERE doc_id % 3 = 0),
b AS (
  SELECT doc_id, n, width, height, width * height AS need,
         CASE WHEN n = 0 THEN [0]
              ELSE list_transform(generate_series(1, n), i -> ('0x' || substr(hx, 2*i-1, 2))::INT)
         END AS bytes
  FROM img),
tiled AS (
  SELECT doc_id, n, width, height, need,
         flatten(list_transform(generate_series(1, CAST(ceil(need / CAST(len(bytes) AS DOUBLE)) AS INT)),
                                r -> bytes))[1:need] AS pxs
  FROM b),
ex AS (SELECT doc_id, n, width, height, unnest(pxs) AS p FROM tiled)
SELECT doc_id,
       CAST(any_value(n) AS BIGINT) AS n_bytes,
       ROUND(AVG(p), 6) AS mean_pixel,
       ROUND(quantile_cont(p, 0.95), 6) AS p95_pixel,
       any_value(width) AS width,
       any_value(height) AS height
FROM ex GROUP BY doc_id
""",
    # fake audio decode: payload bytes as little-endian signed int16
    # (multimodal.py _decode_samples); empty payload -> one zero sample
    "audio_features": """
WITH aud AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) // 2 AS ns
  FROM documents WHERE doc_id % 3 = 1),
s AS (
  SELECT doc_id, GREATEST(ns, 1) AS n_samples,
         CASE WHEN ns = 0 THEN [0.0]
              ELSE list_transform(generate_series(1, ns),
                     i -> CAST(CASE WHEN ('0x' || substr(hx, 4*i-1, 2))::INT >= 128
                               THEN ('0x' || substr(hx, 4*i-3, 2))::INT + 256 * ('0x' || substr(hx, 4*i-1, 2))::INT - 65536
                               ELSE ('0x' || substr(hx, 4*i-3, 2))::INT + 256 * ('0x' || substr(hx, 4*i-1, 2))::INT
                               END AS DOUBLE))
         END AS samples
  FROM aud),
ex AS (SELECT doc_id, n_samples, unnest(samples) AS v FROM s)
SELECT doc_id,
       CAST(any_value(n_samples) AS BIGINT) AS n_samples,
       ROUND(any_value(n_samples) / 16000.0, 6) AS duration_s,
       ROUND(sqrt(AVG(v * v)), 6) AS rms
FROM ex GROUP BY doc_id
""",
    "cosine_topk": f"""
WITH q AS (SELECT {_qvec_literal()} AS qv)
SELECT vec_id,
       ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) * {_QNORM!r}), 6) AS cosine
FROM embeddings, q
ORDER BY cosine DESC, vec_id ASC LIMIT 10
""",
    "embedding_norms": """
SELECT vec_id,
       ROUND(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6) AS norm
FROM embeddings
""",
}

def _simhash_near_dups_sql() -> str:
    """simhash_near_dups replica: the simhash oracle's per-bit vote sums,
    packed both into the full 64-bit signature AND into the banded chunk
    keys (same ``simhash_chunk_bounds(max_hamming + 1)`` split as the
    engine, so the pigeonhole recall guarantee covers the requested
    radius on both sides); candidate pairs agree on ≥1 chunk; Hamming
    distance = bit_count(xor(sa, sb)) — identical bit math on both
    engines."""
    from graftpark.pipeline.dedup import simhash_chunk_bounds

    bounds = simhash_chunk_bounds(max(4, _SIMHASH_MAXH + 1))
    n_chunks = len(bounds)
    chunk_terms = ",\n     ".join(
        f"CAST(SUM(CASE WHEN sv > 0 AND b >= {start} AND b < {start + width} "
        f"THEN CAST(2 ** (b - {start}) AS BIGINT) ELSE 0 END) AS BIGINT)"
        for start, width in bounds
    )
    return f"""
WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(text, '[^ ]+')) AS tok FROM documents),
th AS (SELECT doc_id, md5(tok) AS hx FROM toks),
bits AS (SELECT doc_id, hx, unnest(generate_series(0, 63)) AS b FROM th),
votes AS (
  SELECT doc_id, b,
    CASE WHEN ((strpos('0123456789abcdef', substr(hx, CAST(b // 4 AS INT) + 1, 1)) - 1)
               // (CASE CAST(b % 4 AS INT) WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)) % 2 = 1
         THEN 1 ELSE -1 END AS v
  FROM bits),
s AS (SELECT doc_id, b, SUM(v) AS sv FROM votes GROUP BY doc_id, b),
p2(arr) AS (SELECT list_transform(generate_series(0, 62), i -> CAST(2 ** i AS BIGINT)) || [CAST(-9223372036854775808 AS BIGINT)]),
sig AS (
  SELECT doc_id,
    CAST(SUM(CASE WHEN sv > 0 THEN (SELECT arr FROM p2)[CAST(b AS INT) + 1] ELSE 0 END) AS BIGINT) AS simhash,
    [{chunk_terms}] AS cks
  FROM s GROUP BY doc_id),
chunks AS (SELECT doc_id, simhash, chunk, cks[chunk + 1] AS ck
           FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {n_chunks - 1})) AS chunk) t),
cand AS (SELECT DISTINCT x.doc_id AS a, x.simhash AS sa, y.doc_id AS b, y.simhash AS sb
         FROM chunks x JOIN chunks y ON x.chunk = y.chunk AND x.ck = y.ck AND x.doc_id < y.doc_id)
SELECT a, b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {_SIMHASH_MAXH}
"""


def _plane_lit(p) -> str:
    return "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[]"


def _nd_oracle_sql() -> str:
    """Full LSH-banding replication in DuckDB: per-band packed sign-bit
    keys from the same seeded hyperplanes, bucketed self-join, exact
    cosine verify (filter on the unrounded value, like the Spark side)."""
    planes = _planes(_ND_PLANES_N)
    r = _ND_PLANES_N // _ND_BANDS
    keys = []
    for b in range(_ND_BANDS):
        terms = [
            f"CASE WHEN list_dot_product(v, {_plane_lit(planes[b * r + j])}) > 0 THEN {1 << j} ELSE 0 END"
            for j in range(r)
        ]
        keys.append("CAST(" + " + ".join(terms) + " AS BIGINT)")
    ks = ", ".join(keys)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
keyed AS (SELECT vec_id, [{ks}] AS ks FROM e),
banded AS (
  SELECT vec_id, band, ks[band + 1] AS key
  FROM keyed CROSS JOIN (SELECT unnest(generate_series(0, {_ND_BANDS - 1})) AS band) t),
cand AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM banded x JOIN banded y ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
SELECT c.a, c.b,
       ROUND(list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm), 6) AS cosine
FROM cand c JOIN n na ON na.vec_id = c.a JOIN n nb ON nb.vec_id = c.b
WHERE list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) >= 0.3
"""


def _ann_oracle_sql() -> str:
    from graftpark.pipeline.similarity import _probe_buckets

    planes = _planes(_ANN_PLANES_N)
    buckets = _probe_buckets(planes, _QUERY_VEC, _ANN_PROBE)
    sig_terms = " + ".join(
        f"CASE WHEN list_dot_product(v, {_plane_lit(p)}) > 0 THEN {1 << i} ELSE 0 END"
        for i, p in enumerate(planes)
    )
    in_list = ", ".join(str(b) for b in sorted(buckets))
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sig AS (SELECT vec_id, v, CAST({sig_terms} AS BIGINT) AS s FROM e),
pool AS (SELECT vec_id, v FROM sig WHERE s IN ({in_list})),
q AS (SELECT {_qvec_literal()} AS qv)
SELECT vec_id,
       ROUND(list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * {_QNORM!r}), 6) AS cosine
FROM pool, q
ORDER BY list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * {_QNORM!r}) DESC, vec_id ASC
LIMIT 10
"""


def _resize_oracle_sql() -> str:
    """Byte-exact replica of resize_images over the fake decoder: tiled
    pixel j = payload[j % n]; output byte (r, c) is tiled index
    (nn(h, H, r)·w + nn(w, W, c)) % n with nn(a, b, i) =
    (2·i·(a−1) + (b−1)) // (2·(b−1)) — the same exact-integer
    round-half-up the engine uses (multimodal.py _nn_indices)."""
    W, H = _RSZ_W, _RSZ_H
    yi = f"((2 * r * (h - 1) + {H - 1}) // {2 * (H - 1)})"
    xi = f"((2 * c * (w - 1) + {W - 1}) // {2 * (W - 1)})"
    return f"""
WITH img AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n,
         CAST(octet_length(encode(text)) % 64 + 16 AS INT) AS w,
         CAST(octet_length(encode(text)) % 48 + 16 AS INT) AS h
  FROM documents WHERE doc_id % 3 = 0),
idx AS (
  SELECT doc_id, hx, n,
    flatten(list_transform(generate_series(0, {H - 1}), r ->
      list_transform(generate_series(0, {W - 1}), c ->
        ({yi} * w + {xi}) % n))) AS js
  FROM img WHERE n > 0)
SELECT doc_id,
       CAST({W} AS INT) AS width,
       CAST({H} AS INT) AS height,
       array_to_string(list_transform(js, j -> substr(hx, 2 * j + 1, 2)), '') AS px_hex
FROM idx
"""


def _frames_oracle_sql() -> str:
    """sample_frames replica: min(max_frames, max(1, n // stride))
    frames per video payload; frame i = bytes [i·stride, (i+1)·stride)
    — substr truncates the ragged last frame exactly like the slice."""
    s2 = 2 * _FRAME_BYTES
    return f"""
WITH vid AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents WHERE doc_id % 3 = 2),
f AS (
  SELECT doc_id, hx,
         unnest(generate_series(0, LEAST({_FRAME_MAX}, GREATEST(1, n // {_FRAME_BYTES})) - 1)) AS i
  FROM vid)
SELECT doc_id, CAST(i AS INT) AS frame_idx,
       substr(hx, i * {s2} + 1, {s2}) AS frame_hex
FROM f
"""


PIPELINE_ORACLE_SQL["simhash_near_dups"] = _simhash_near_dups_sql()
PIPELINE_ORACLE_SQL["resize_images"] = _resize_oracle_sql()
PIPELINE_ORACLE_SQL["sample_frames"] = _frames_oracle_sql()
PIPELINE_ORACLE_SQL["embedding_near_dups_lsh"] = _nd_oracle_sql()
PIPELINE_ORACLE_SQL["ann_lsh"] = _ann_oracle_sql()

PIPELINE_QUERIES = {
    "dedup_exact": q_dedup_exact,
    "token_count": q_token_count,
    "quality": q_quality,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "minhash_sig": q_minhash_sig,
    "minhash_near_dups": q_minhash_near_dups,
    "embedding_near_dups_lsh": q_embedding_near_dups_lsh,
    "ann_lsh": q_ann_lsh,
    "ngram_jaccard": q_ngram_jaccard,
    "simhash": q_simhash,
    "simhash_near_dups": q_simhash_near_dups,
    "cosine_topk": q_cosine_topk,
    "embedding_norms": q_embedding_norms,
    "multimodal_meta": q_multimodal_meta,
    "image_features": q_image_features,
    "audio_features": q_audio_features,
    "resize_images": q_resize_images,
    "sample_frames": q_sample_frames,
}
