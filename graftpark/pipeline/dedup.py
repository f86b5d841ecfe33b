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

def _bit_of_md5(b: int) -> F.Column:
    """Bit ``b`` (0..63) of the first 64 bits of md5 hex in column th —
    a pure codegen expression with LITERAL shift amounts."""
    hexv = F.conv(F.substring(F.col("th"), b // 4 + 1, 1), 16, 10).cast("int")
    return F.shiftright(hexv, 3 - b % 4).bitwiseAND(F.lit(1))


def _simhash_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, nt, c0..c63) — per-doc token count and per-bit set-counts.

    ONE aggregate over the token rows with 64 conditional-sum columns
    (all whole-stage codegen, map-side partial aggregation): the shuffle
    carries ~#docs rows × 65 longs, NOT 64×#tokens rows as the naive
    per-bit explode would. Vote sum s_b = 2*c_b - nt, so bit b of the
    signature is set iff 2*c_b > nt.
    """
    toks = docs.select(F.col(id_col).alias("doc_id"), F.explode(_tokens(text_col)).alias("tok"))
    toks = toks.withColumn("th", F.md5("tok"))
    aggs = [F.sum(_bit_of_md5(b)).alias(f"c{b}") for b in range(64)]
    return toks.groupBy("doc_id").agg(F.count("*").alias("nt"), *aggs)


def _sig_from_counts() -> F.Column:
    """The packed 64-bit signature column over (nt, c0..c63) columns."""
    p2 = [1 << b for b in range(63)] + [-(1 << 63)]  # bit 63 = sign bit
    sig = F.lit(0).cast("long")
    for b in range(64):
        sig = sig + F.when(2 * F.col(f"c{b}") > F.col("nt"), F.lit(p2[b]).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash over whitespace tokens.

    Bit b of md5(token) votes ±1; simhash bit b = 1 iff the sum of
    votes > 0. All codegen'd expressions, reproducible in the DuckDB
    oracle; the only shuffle is the per-doc 65-column aggregate
    (map-side combined), never 64× the token count.
    """
    return _simhash_counts(docs, id_col, text_col).select(
        "doc_id", _sig_from_counts().alias("simhash")
    )


def simhash_chunk_bounds(n_chunks: int) -> list[tuple[int, int]]:
    """(start_bit, width) per chunk — the 64 signature bits split into
    ``n_chunks`` contiguous chunks as evenly as possible. Shared by the
    engine and the DuckDB driver oracle so both band identically."""
    base, rem = divmod(64, n_chunks)
    bounds, start = [], 0
    for c in range(n_chunks):
        w = base + (1 if c < rem else 0)
        bounds.append((start, w))
        start += w
    return bounds


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3,
                      id_col: str = "doc_id", text_col: str = "text",
                      n_chunks: int | None = None) -> DataFrame:
    """(a, b, hamming) pairs with Hamming(simhash) ≤ max_hamming.

    Candidates join on contiguous bit chunks of the 64-bit signature:
    a pair within Hamming ``n_chunks - 1`` must agree exactly on ≥1
    chunk (pigeonhole), so the self-join is bucketed, never all-pairs.

    Recall bound: banding GUARANTEES recall only for pairs within
    Hamming ``n_chunks - 1`` — a pair whose flipped bits land in every
    chunk is missed. ``n_chunks`` therefore defaults to
    ``max(4, max_hamming + 1)`` so the guarantee covers the requested
    radius; pass a smaller ``n_chunks`` explicitly to trade recall
    (banded-candidate-limited results) for fewer candidate rows."""
    if n_chunks is None:
        n_chunks = max(4, max_hamming + 1)
    bounds = simhash_chunk_bounds(n_chunks)
    counts = _simhash_counts(docs, id_col, text_col)
    # chunk c's packed bit value, derived from the same single aggregate
    chunk_cols = []
    for c, (start, width) in enumerate(bounds):
        v = F.lit(0).cast("long")
        for j in range(width):
            b = start + j
            v = v + F.when(2 * F.col(f"c{b}") > F.col("nt"), F.lit(1 << j).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        chunk_cols.append(v.alias(f"ck{c}"))
    sig = counts.select("doc_id", _sig_from_counts().alias("simhash"), *chunk_cols)
    chunks = sig.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*[F.col(f"ck{c}") for c in range(n_chunks)])).alias("chunk", "ck"),
    )
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


def embedding_near_dups_lsh(
    embeddings: DataFrame, threshold: float = 0.95, *, dim: int,
    n_planes: int = 16, bands: int = 4, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, cosine) near-dup pairs via sign-bit LSH banding — the
    at-scale replacement for the O(n²) ``embedding_near_dups``.

    Random-hyperplane sign bits are grouped into ``bands`` keys
    (n_planes/bands bits each); candidate pairs must agree exactly on
    ≥1 band, so the self-join is keyed on (band, key) — only same-bucket
    vectors ever meet — followed by an exact-cosine verify over the
    candidates only. Approximate by construction: a qualifying pair
    whose signatures differ in every band is missed (pigeonhole
    guarantees recall for pairs within ``bands - 1`` flipped sign bits);
    ``embedding_near_dups`` remains the exact oracle for tests.

    ``dim`` (the embedding length) is required so the plan stays fully
    lazy — deriving it with a driver-side ``.head()`` would run an
    action before the banded join of every probe.
    """
    from graftpark.pipeline.similarity import _hyperplanes, band_key_cols

    planes = _hyperplanes(dim, n_planes, seed)
    keys = band_key_cols(F.col(vec_col), planes, bands)
    banded = embeddings.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.array(*keys)).alias("band", "key"),
    )
    x, y = banded.alias("x"), banded.alias("y")
    cand = (
        x.join(y, (F.col("x.band") == F.col("y.band")) & (F.col("x.key") == F.col("y.key"))
               & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    e = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"), norm.alias("nrm"))
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    return (
        cand.join(e.select(F.col("id").alias("a"), F.col("v").alias("va"), F.col("nrm").alias("na")), "a")
        .join(e.select(F.col("id").alias("b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")), "b")
        .select("a", "b", (dot / (F.col("na") * F.col("nb"))).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
