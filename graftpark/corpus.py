"""Source-code corpus front end: synthesis, edge extraction, densification.

The engine's production input (BASELINE.json ``input_hint``) is a corpus
table ``repos(repo, path, commit, lang, content)`` — one row per file —
from which repo→repo import edges are extracted. This module provides:

- ``synthesize_corpus``: a deterministic, fully distributed generator
  that plants a known graph's edges as import statements (the test
  fixture contract from FIXTURES.md §1.1 — no external data).
- ``extract_edges``: the vectorized pandas/Arrow UDF import parser
  (regex per ``lang``; NO per-row Python, per ``input_hint``).
- ``corpus_to_graph``: extraction → vertex densification (dense 1..n
  longs via the scalable range-partition + offset scheme, graph.py) →
  ``Graph`` + ``vertex_map``.

Per-row invariant: ``content_sha = sha2(content, 256)`` is computed at
synthesis and must survive every transform (asserted in tests).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from graftpark.graph import Graph, densify_ids

REPO_FMT = "repo_{:06d}"
_IMPORT_RE = {
    "python": re.compile(r"^\s*(?:import|from)\s+(repo_\d+)", re.MULTILINE),
    "javascript": re.compile(r"""require\(['"](repo_\d+)['"]\)""", re.MULTILINE),
    "go": re.compile(r'^\s*import\s+"(repo_\d+)"', re.MULTILINE),
}
_DEFAULT_RE = _IMPORT_RE["python"]


def repo_name_col(id_col) -> F.Column:
    return F.format_string("repo_%06d", id_col)


def synthesize_corpus(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    lang: str = "python",
    commit: str = "deadbeefcafe0042",
) -> DataFrame:
    """Corpus table whose import statements encode exactly ``edges``.

    Fully distributed: group out-edges by src, sort the neighbor list
    (deterministic content → stable sha256 across runs), emit one file
    per repo. Repos with no out-edges get a no-import file so every
    vertex appears. Columns: repo, path, commit, lang, content,
    content_sha.
    """
    g = Graph(edges, vertices)
    adj = (
        g.edges.groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
    )
    all_rows = g.vertices().join(adj, g.vertices().id == adj.src, "left").select(
        F.col("id"), F.coalesce("nbrs", F.array().cast("array<long>")).alias("nbrs")
    )
    imports = F.array_join(
        F.transform(F.col("nbrs"), lambda d: F.concat(F.lit("import "), repo_name_col(d))), "\n"
    )
    content = F.concat(
        F.lit('"""auto module for '),
        repo_name_col(F.col("id")),
        F.lit('"""\nimport os\nimport sys\n'),
        imports,
        F.lit("\n\nVALUE = "),
        (F.col("id") * 17 % 1009).cast("string"),
        F.lit("\n"),
    )
    return all_rows.select(
        repo_name_col(F.col("id")).alias("repo"),
        F.concat(F.lit("src/"), repo_name_col(F.col("id")), F.lit("/main.py")).alias("path"),
        F.lit(commit).alias("commit"),
        F.lit(lang).alias("lang"),
        content.alias("content"),
    ).withColumn("content_sha", F.sha2(F.col("content"), 256))


@F.pandas_udf(T.ArrayType(T.StringType()))
def _parse_imports(content: pd.Series, lang: pd.Series) -> pd.Series:
    """Vectorized import parser: content batch → list of imported repos."""
    out = []
    for text, lg in zip(content, lang):
        if text is None:
            out.append([])
            continue
        rx = _IMPORT_RE.get(lg, _DEFAULT_RE)
        out.append(rx.findall(text))
    return pd.Series(out)


def extract_edges(corpus: DataFrame) -> DataFrame:
    """repo→repo import edges (strings), deduplicated, self-loops dropped.

    One Arrow-batched pass over content; everything after the UDF is
    built-in Spark (explode → project → distinct).
    """
    return (
        corpus.select(
            F.col("repo").alias("src_repo"),
            F.explode(_parse_imports(F.col("content"), F.col("lang"))).alias("dst_repo"),
        )
        .where(F.col("src_repo") != F.col("dst_repo"))
        .distinct()
    )


def corpus_to_graph(corpus: DataFrame) -> tuple[Graph, DataFrame]:
    """Extract edges, densify repo names to 1..n longs, build the Graph.

    Returns (graph, vertex_map(repo, id)). The vertex map covers every
    repo that appears in the corpus OR in an import (dangling imports
    become vertices with no file, matching how a real corpus behaves).
    """
    edges_str = extract_edges(corpus)
    names = (
        corpus.select(F.col("repo"))
        .union(edges_str.select(F.col("dst_repo").alias("repo")))
        .distinct()
    )
    vertex_map = densify_ids(names, "repo")
    e = (
        edges_str.join(vertex_map.withColumnRenamed("repo", "src_repo"), "src_repo")
        .withColumnRenamed("id", "src")
        .join(vertex_map.withColumnRenamed("repo", "dst_repo"), "dst_repo")
        .withColumnRenamed("id", "dst")
        .select("src", "dst")
    )
    vertices = vertex_map.select("id")
    return Graph(e, vertices), vertex_map
