"""Text analysis operators: token counts, quality, language-ID, fingerprints.

All built-in expressions (regexp + higher-order array functions);
deterministic and reproducible in ANSI-ish SQL for the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_RE = "[^ ]+"

# tiny per-language stopword marker sets (heuristic language-ID —
# deterministic n-gram/stopword scoring, not a model)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ein"],
    "zh": ["的", "了", "是", "在", "和"],
}


def _tokens(text_col: str = "text") -> F.Column:
    return F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_unique_tokens, n_chars_measured)."""
    toks = _tokens(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.length(text_col).alias("n_chars_measured"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, mean_token_len, unique_ratio, quality) — simple
    length/diversity heuristics, rounded to 8 dp for oracle parity."""
    toks = _tokens(text_col)
    n = F.size(toks)
    mean_len = F.when(n > 0, (F.length(F.regexp_replace(F.col(text_col), " ", "")) / n)).otherwise(F.lit(0.0))
    uniq = F.when(n > 0, F.size(F.array_distinct(toks)) / n).otherwise(F.lit(0.0))
    quality = F.least(F.lit(1.0), n / F.lit(50.0)) * uniq
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_tokens"),
        F.round(mean_len, 8).alias("mean_token_len"),
        F.round(uniq, 8).alias("unique_ratio"),
        F.round(quality, 8).alias("quality"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, stop_hits) — argmax of stopword hit counts,
    deterministic tie-break by language code; 'und' when no hits."""
    toks = _tokens(text_col)
    best = None
    for lang in sorted(STOPWORDS):
        words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(words, t)))
        cand = F.struct(hits.alias("hits"), F.lit(lang).alias("lang"))
        # strict > keeps the earlier candidate on ties — languages iterate
        # in sorted order, so the SMALLEST lang code wins a tie
        best = cand if best is None else F.when(
            (cand["hits"] > best["hits"]), cand
        ).otherwise(best)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["hits"].alias("stop_hits"),
    )


def fingerprints(docs: DataFrame, k: int = 5, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint) — winnowing-style document fingerprint: the
    minimum md5 over k-token shingles of the normalized text (a single
    stable hex string; equal fingerprints ⇒ near-identical prefixes of
    content). Deterministic and SQL-reproducible."""
    norm = F.lower(F.regexp_replace(F.col(text_col), "\\s+", " "))
    toks = F.regexp_extract_all(norm, F.lit(TOKEN_RE), 0)
    # guard: sequence(0, neg) DESCENDS in Spark — short docs fall back to
    # the whole-text hash via the otherwise-NULL → coalesce path
    sh = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.md5(F.array_join(F.slice(toks, i + 1, k), " ")),
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.array_min(sh), F.md5(norm)).alias("fingerprint"),
    )
