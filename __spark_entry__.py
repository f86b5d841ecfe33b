"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship kernel — full PageRank power
iteration (damping 0.85, tol 1e-6) over the customer→supplier link
graph derived from the sf0.001 parquet tables — and returns the ranks
DataFrame. ``queries()`` / ``oracle_sql()`` expose every
DuckDB-checkable operator (see graftpark/driver_queries.py and
SURVEY.md §2).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank to convergence on the sf0.001-derived edges."""
    from pyspark.sql import functions as F

    from graftpark.graph import Graph, edges_from_testdata
    from graftpark.kernels.pagerank import pagerank

    g = Graph(edges_from_testdata(spark, "/root/testdata/sf0.001"))
    res = pagerank(g, alpha=0.85, tol=1e-6, max_supersteps=100)
    return res.state.select("id", F.round("rank", 8).alias("rank"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from graftpark.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from graftpark.driver_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
