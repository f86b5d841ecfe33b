"""Training-data pipeline operators over document / embedding tables.

Everything here is built-in Spark SQL expressions (JVM-side, codegen'd)
— md5/sha2 hashing, higher-order array functions — with NO per-row
Python; portability with the DuckDB oracles comes from using md5 hex
strings as the shared hash primitive (lexicographic min of md5 IS a
valid uniform min-hash).

- dedup.py      exact (hash-groupBy), MinHash+LSH, SimHash, n-gram
                Jaccard, embedding-cosine near-dup
- similarity.py brute-force cosine top-k + LSH-bucketed ANN
- textstats.py  token counts, quality scores, language-ID, fingerprints
"""

from graftpark.pipeline.dedup import (  # noqa: F401
    exact_dedup_groups,
    exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    minhash_near_dups,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dups,
    embedding_near_dups,
    embedding_near_dups_lsh,
)
from graftpark.pipeline.similarity import (  # noqa: F401
    ann_lsh_topk,
    ann_probe,
    build_ann_index,
    cosine_topk,
)
from graftpark.pipeline.textstats import (  # noqa: F401
    token_counts,
    quality_scores,
    language_id,
    fingerprints,
)
