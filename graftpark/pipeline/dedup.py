"""Deduplication operators for large-scale training-data pipelines.

Scale design notes (100 TB framing):

- exact dedup is one hash-aggregate over md5(text) — Spark's partial
  aggregation makes the shuffle ~#distinct rows.
- MinHash+LSH is the standard shingle → minhash → band → bucket-join
  pipeline: candidate generation never compares all pairs, only rows
  sharing a band bucket (self-join keyed on (band, band_key), which
  shuffles #docs×#bands rows).
- SimHash packs 64 bits from token hashes; near-dup candidates join on
  band chunks (4×16-bit) so Hamming-distance ≤3 pairs are guaranteed
  to collide in ≥1 band (pigeonhole).
- All hashing is md5 hex (JVM-side, codegen'd); lexicographic MIN of
  md5 strings is the min-hash primitive, which the DuckDB oracles can
  reproduce bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_RE = "[^ ]+"  # documents are whitespace-tokenized


def _tokens(text_col: str = "text") -> F.Column:
    return F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)


def shingles(docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) — distinct k-token shingles (space-joined)."""
    toks = _tokens(text_col)
    # guard: sequence(0, neg) DESCENDS in Spark, so short docs need an
    # explicit empty-array branch
    sh = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


# ------------------------------------------------------------- exact

def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(content_md5, keep_id, dup_count) — one row per distinct content."""
    return docs.groupBy(F.md5(F.col(text_col)).alias("content_md5")).agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count")
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Documents with exact duplicates removed (keep the min id)."""
    keep = exact_dedup_groups(docs, id_col, text_col).select(F.col("keep_id").alias(id_col))
    return docs.join(keep, id_col, "left_semi")


# ------------------------------------------------------------ minhash

def minhash_signatures(
    docs: DataFrame, num_hashes: int = 16, shingle_k: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(doc_id, h, minhash) — minhash h ∈ 0..num_hashes-1 per doc.

    minhash_h(doc) = MIN over shingles of md5(h || '|' || shingle); the
    lexicographic min of a uniform hex hash is itself a uniform
    min-hash, and is reproducible in any engine with md5().
    """
    sh = shingles(docs, k=shingle_k, id_col=id_col, text_col=text_col)
    seeds = docs.sparkSession.range(num_hashes).select(F.col("id").cast("int").alias("h"))
    return (
        sh.crossJoin(F.broadcast(seeds))
        .groupBy("doc_id", "h")
        .agg(F.min(F.md5(F.concat_ws("|", F.col("h"), F.col("shingle")))).alias("minhash"))
    )


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 4) -> DataFrame:
    """(a, b) candidate pairs sharing ≥1 LSH band (a < b).

    Rows-per-band = num_hashes/bands; band key = md5 of the band's
    concatenated minhashes. The self-join is keyed on (band, band_key)
    — only same-bucket docs ever meet.
    """
    banded = (
        signatures.withColumn("band", F.col("h") % bands)
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws("|", F.sort_array(F.collect_list(F.concat_ws(":", "h", "minhash"))))).alias("band_key"))
    )
    x, y = banded.alias("x"), banded.alias("y")
    return (
        x.join(y, (F.col("x.band") == F.col("y.band")) & (F.col("x.band_key") == F.col("y.band_key"))
               & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )


def minhash_near_dups(
    docs: DataFrame, num_hashes: int = 16, bands: int = 4, shingle_k: int = 3,
    threshold: float = 0.7, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(a, b, est_jaccard) — LSH candidates with minhash-agreement ≥ threshold."""
    sigs = minhash_signatures(docs, num_hashes, shingle_k, id_col, text_col)
    cand = lsh_candidate_pairs(sigs, bands)
    sa = sigs.select(F.col("doc_id").alias("a"), "h", F.col("minhash").alias("ma"))
    sb = sigs.select(F.col("doc_id").alias("b"), "h", F.col("minhash").alias("mb"))
    agree = (
        cand.join(sa, "a").join(sb, ["b", "h"])
        .groupBy("a", "b")
        .agg((F.sum(F.when(F.col("ma") == F.col("mb"), 1).otherwise(0)) / F.count("*")).alias("est_jaccard"))
    )
    return agree.where(F.col("est_jaccard") >= threshold)


def ngram_jaccard_pairs(
    docs: DataFrame, pairs: DataFrame, shingle_k: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Exact shingle-set Jaccard for given (a, b) pairs (the verify stage
    after LSH candidate generation)."""
    sh = shingles(docs, k=shingle_k, id_col=id_col, text_col=text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        pairs.join(sh.select(F.col("doc_id").alias("a"), "shingle"), "a")
        .join(sh.select(F.col("doc_id").alias("b"), F.col("shingle").alias("shingle_b")), "b")
        .where(F.col("shingle") == F.col("shingle_b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(inter, ["a", "b"], "left")
        .join(sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), "b")
        .select(
            "a", "b",
            (F.coalesce("inter", F.lit(0)) / (F.col("na") + F.col("nb") - F.coalesce("inter", F.lit(0)))).alias("jaccard"),
        )
    )


# ------------------------------------------------------------ simhash

#: powers of two as literal lookup arrays (PySpark's shiftleft/shiftright
#: take only literal shift amounts; element_at lookups keep everything
#: codegen'd and ANSI-safe — bit 63 is the sign bit, stored as -(1<<63))
def _pow2_array(n: int) -> F.Column:
    vals = [1 << i for i in range(n)]
    if n == 64:
        vals[63] = -(1 << 63)
    return F.array(*[F.lit(v).cast("long") for v in vals])


def _simhash_bit_votes(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, b, s) — per-bit vote sums: bit b of md5(token) votes ±1."""
    toks = docs.select(F.col(id_col).alias("doc_id"), F.explode(_tokens(text_col)).alias("tok"))
    toks = toks.withColumn("th", F.md5("tok"))
    bits = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("b"),
        F.col("th"),
    )
    hexv = F.conv(F.substring(F.col("th"), (F.col("b") / 4).cast("int") + 1, 1), 16, 10).cast("int")
    # bit (3 - b%4) of the hex digit, via integer divide (no dynamic shifts)
    bit = (hexv / F.element_at(_pow2_array(4), (3 - F.col("b") % 4).cast("int") + 1)).cast("int") % 2
    votes = bits.select("doc_id", "b", F.when(bit == 1, 1).otherwise(-1).alias("v"))
    return votes.groupBy("doc_id", "b").agg(F.sum("v").alias("s"))


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash over whitespace tokens.

    Bit b of md5(token) votes ±1; simhash bit b = 1 iff the sum of
    votes > 0. All codegen'd expressions, reproducible in the DuckDB
    oracle."""
    per_bit = _simhash_bit_votes(docs, id_col, text_col)
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.element_at(_pow2_array(64), F.col("b").cast("int") + 1)).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3,
                      id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(a, b, hamming) pairs with Hamming(simhash) ≤ max_hamming.

    Candidates join on 16-bit chunks (4 bands): any pair within Hamming
    3 must agree exactly on ≥1 chunk (pigeonhole), so the self-join is
    bucketed, never all-pairs."""
    per_bit = _simhash_bit_votes(docs, id_col, text_col)
    sig = per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.element_at(_pow2_array(64), F.col("b").cast("int") + 1)).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )
    chunk_val = F.when(
        F.col("s") > 0, F.element_at(_pow2_array(16), (F.col("b") % 16).cast("int") + 1)
    ).otherwise(F.lit(0).cast("long"))
    chunked = (
        per_bit.withColumn("chunk", (F.col("b") / 16).cast("int"))
        .groupBy("doc_id", "chunk")
        .agg(F.sum(chunk_val).alias("ck"))
    )
    chunks = chunked.join(sig, "doc_id")
    x, y = chunks.alias("x"), chunks.alias("y")
    cand = (
        x.join(y, (F.col("x.chunk") == F.col("y.chunk")) & (F.col("x.ck") == F.col("y.ck"))
               & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("a"), F.col("x.simhash").alias("sa"),
                F.col("y.doc_id").alias("b"), F.col("y.simhash").alias("sb"))
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return cand.select("a", "b", ham.alias("hamming")).where(F.col("hamming") <= max_hamming)


# --------------------------------------------------- embedding near-dup

def embedding_near_dups(
    embeddings: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, cosine) pairs with cosine ≥ threshold (brute-force O(n²)
    baseline; the scale path buckets by LSH sign bits first —
    similarity.ann_lsh_topk's bucketing applies the same way)."""
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    e = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"), norm.alias("nrm"))
    a, b = e.alias("a"), e.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"),
                (dot / (F.col("a.nrm") * F.col("b.nrm"))).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
