"""Driver-contract queries over /root/testdata parquet, with DuckDB oracles.

Each function here backs one ``__spark_entry__.queries()`` entry and has
a matching ANSI-SQL oracle in ``ORACLE_SQL`` (FIXTURES.md §3). The graph
queries run over edge tables derived deterministically from the TPC-H-ish
tables:

- bipartite customer→supplier graph: ``src=o_custkey, dst=l_suppkey+1e6``
- dense nation→nation graph (cyclic, triangle-rich) for the kernels that
  need closure oracles (WITH RECURSIVE).

Column names and types are aligned on both sides; floating results are
rounded to 8 dp on both sides (the engines sum in different orders, so
raw doubles differ in the last ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from graftpark.graph import Graph, edges_from_testdata, nation_edges_from_testdata
from graftpark.kernels.bfs import bfs_levels, bfs_parents
from graftpark.kernels.components import connected_components, components_df
from graftpark.kernels.labelprop import label_propagation, labels_df
from graftpark.kernels.pagerank import pagerank
from graftpark.kernels.triangles import triangle_count

ALPHA = 0.85
PR_STEPS = 10
LP_STEPS = 2

# ---------------------------------------------------------------- SQL CTEs

_EDGES_CTE = """
e AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
)"""

_NATION_CTE = """
ne AS MATERIALIZED (
  SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS src, CAST(s_nationkey AS BIGINT) AS dst
  FROM orders
  JOIN lineitem ON o_orderkey = l_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE c_nationkey <> s_nationkey
),
ns AS MATERIALIZED (SELECT src, dst FROM ne UNION SELECT dst, src FROM ne),
nv AS (SELECT DISTINCT src AS id FROM ns)"""


# ---------------------------------------------------------------- queries

def q_edges_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return edges_from_testdata(spark, sf_dir)


def q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Graph(edges_from_testdata(spark, sf_dir)).degrees()


def q_degree_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    deg = Graph(edges_from_testdata(spark, sf_dir)).degrees()
    return deg.orderBy(F.desc("deg"), F.asc("id")).limit(10).select("id", "deg")


def q_symmetrize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Graph(nation_edges_from_testdata(spark, sf_dir)).edges_sym()


def q_pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = Graph(edges_from_testdata(spark, sf_dir))
    res = pagerank(g, alpha=ALPHA, tol=0.0, max_supersteps=PR_STEPS)
    out = res.state.select("id", F.round("rank", 8).alias("rank"))
    g.unpersist()
    return out


def q_pagerank_csr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same computation as pagerank_fixed, forced through the CSR-block
    strategy (graftpark/blocks.py) so the driver oracle-checks the
    north_star execution path, not just the DataFrame formulation."""
    g = Graph(edges_from_testdata(spark, sf_dir))
    res = pagerank(g, alpha=ALPHA, tol=0.0, max_supersteps=PR_STEPS, strategy="csr")
    out = res.state.select("id", F.round("rank", 8).alias("rank"))
    g.unpersist()
    return out


def q_cc_csr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cc_bipartite via the CSR-block min-propagation strategy."""
    g = Graph(edges_from_testdata(spark, sf_dir))
    res = connected_components(g, strategy="csr")
    out = components_df(res)
    g.unpersist()
    return out


def q_cc_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = Graph(nation_edges_from_testdata(spark, sf_dir))
    res = connected_components(g)
    out = components_df(res)
    g.unpersist()
    return out


def q_cc_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = Graph(edges_from_testdata(spark, sf_dir))
    res = connected_components(g)
    out = components_df(res)
    g.unpersist()
    return out


def q_cc_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-star/small-star CC (O(log n) rounds, diameter-independent)
    on the bipartite link graph — same oracle as cc_bipartite."""
    from graftpark.kernels.components import connected_components_twophase

    g = Graph(edges_from_testdata(spark, sf_dir))
    res = connected_components_twophase(g)
    out = components_df(res)
    g.unpersist()
    return out


def q_triangles_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = Graph(nation_edges_from_testdata(spark, sf_dir))
    n = triangle_count(g)
    g.unpersist()
    return spark.createDataFrame([(n,)], "triangles LONG")


def q_triangles_per_vertex_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle membership via the edge-iterator plan
    (kernels/triangles.py) — each triangle credits its three corners."""
    from graftpark.kernels.triangles import triangles_per_vertex

    g = Graph(nation_edges_from_testdata(spark, sf_dir))
    out = triangles_per_vertex(g)
    g.unpersist()
    return out


def q_label_prop_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = Graph(nation_edges_from_testdata(spark, sf_dir))
    res = label_propagation(g, max_supersteps=LP_STEPS)
    out = labels_df(res)
    g.unpersist()
    return out


def q_label_prop_csr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """label_prop_nation via the CSR-block mode-propagation strategy."""
    g = Graph(nation_edges_from_testdata(spark, sf_dir))
    res = label_propagation(g, max_supersteps=LP_STEPS, strategy="csr")
    out = labels_df(res)
    g.unpersist()
    return out


def q_bfs_levels_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = Graph(nation_edges_from_testdata(spark, sf_dir))
    source = g.vertices().agg(F.min("id")).collect()[0][0]
    out = bfs_levels(g, source)
    g.unpersist()
    return out


def q_bfs_parents_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = Graph(nation_edges_from_testdata(spark, sf_dir))
    source = g.vertices().agg(F.min("id")).collect()[0][0]
    res = bfs_parents(g, source)
    g.unpersist()
    return res.state


# ---------------------------------------------------------------- oracles

def _pagerank_fixed_sql() -> str:
    """Unrolled power iteration: r0..r{K}, dangling mass redistributed."""
    parts = [
        "WITH " + _EDGES_CTE.strip() + ",",
        "v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),",
        "od AS MATERIALIZED (SELECT src AS id, COUNT(*) AS odeg FROM e GROUP BY src),",
        "nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM v),",
        "r0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM v),",
    ]
    for k in range(1, PR_STEPS + 1):
        p = f"r{k - 1}"
        parts.append(
            f"""r{k} AS MATERIALIZED (
  SELECT v.id,
    (1 - {ALPHA}) / (SELECT n FROM nn)
    + {ALPHA} * (SELECT COALESCE(SUM(r.rank), 0) FROM {p} r LEFT JOIN od ON od.id = r.id
                 WHERE od.id IS NULL) / (SELECT n FROM nn)
    + {ALPHA} * COALESCE(s.contrib, 0) AS rank
  FROM v LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank / od.odeg) AS contrib
    FROM e JOIN {p} r ON r.id = e.src JOIN od ON od.id = e.src
    GROUP BY e.dst) s ON s.id = v.id
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT id, ROUND(rank, 8) AS rank FROM r{PR_STEPS}")
    return "\n".join(parts)


def _label_prop_sql() -> str:
    """K synchronous LP steps: mode of neighbor labels, min tie-break."""
    parts = ["WITH " + _NATION_CTE.strip() + ",", "l0 AS MATERIALIZED (SELECT id, id AS label FROM nv),"]
    for k in range(1, LP_STEPS + 1):
        p = f"l{k - 1}"
        parts.append(
            f"""l{k} AS MATERIALIZED (
  SELECT nv.id, COALESCE(b.lab, nv.id) AS label
  FROM nv LEFT JOIN (
    SELECT id, lab FROM (
      SELECT ns.dst AS id, l.label AS lab, COUNT(*) AS c,
             ROW_NUMBER() OVER (PARTITION BY ns.dst ORDER BY COUNT(*) DESC, l.label ASC) AS rn
      FROM ns JOIN {p} l ON l.id = ns.src
      GROUP BY ns.dst, l.label) t
    WHERE rn = 1) b ON b.id = nv.id
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT id, label FROM l{LP_STEPS}")
    return "\n".join(parts)


ORACLE_SQL: dict[str, str] = {
    "edges_derive": f"WITH {_EDGES_CTE.strip()} SELECT src, dst FROM e",
    "degrees": f"""
WITH {_EDGES_CTE.strip()},
v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
s AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e)
SELECT v.id AS id,
       COALESCE(od.c, 0) AS out_deg,
       COALESCE(idg.c, 0) AS in_deg,
       COALESCE(dg.c, 0) AS deg
FROM v
LEFT JOIN (SELECT src, COUNT(*) AS c FROM e GROUP BY src) od ON od.src = v.id
LEFT JOIN (SELECT dst, COUNT(*) AS c FROM e GROUP BY dst) idg ON idg.dst = v.id
LEFT JOIN (SELECT src, COUNT(*) AS c FROM s GROUP BY src) dg ON dg.src = v.id
""",
    "degree_topk": f"""
WITH {_EDGES_CTE.strip()},
v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
s AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
d AS (SELECT v.id AS id, COALESCE(dg.c, 0) AS deg
      FROM v LEFT JOIN (SELECT src, COUNT(*) AS c FROM s GROUP BY src) dg ON dg.src = v.id)
SELECT id, deg FROM d ORDER BY deg DESC, id ASC LIMIT 10
""",
    "symmetrize": f"WITH {_NATION_CTE.strip()} SELECT src, dst FROM ns",
    "pagerank_fixed": _pagerank_fixed_sql(),
    "pagerank_csr": _pagerank_fixed_sql(),
    "cc_nation": f"""
WITH RECURSIVE {_NATION_CTE.strip()},
reach(id, r) AS (
  SELECT id, id FROM nv
  UNION
  SELECT ns.dst, reach.r FROM reach JOIN ns ON ns.src = reach.id
)
SELECT id, MIN(r) AS comp FROM reach GROUP BY id
""",
    "cc_bipartite": f"""
WITH RECURSIVE {_EDGES_CTE.strip()},
s AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
v AS (SELECT DISTINCT src AS id FROM s),
reach(id, r) AS (
  SELECT id, id FROM v
  UNION
  SELECT s.dst, reach.r FROM reach JOIN s ON s.src = reach.id
)
SELECT id, MIN(r) AS comp FROM reach GROUP BY id
""",
    "triangles_nation": f"""
WITH {_NATION_CTE.strip()},
c AS (SELECT src AS u, dst AS v FROM ns WHERE src < dst)
SELECT COUNT(*) AS triangles
FROM c a JOIN c b ON a.v = b.u JOIN c t ON t.u = a.u AND t.v = b.v
""",
    "triangles_per_vertex_nation": f"""
WITH {_NATION_CTE.strip()},
c AS (SELECT src AS u, dst AS v FROM ns WHERE src < dst),
tri AS (
  SELECT a.u AS x, a.v AS y, b.v AS z
  FROM c a JOIN c b ON a.v = b.u JOIN c t ON t.u = a.u AND t.v = b.v),
corners AS (
  SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri),
cnt AS (SELECT id, COUNT(*) AS c FROM corners GROUP BY id)
SELECT nv.id AS id, COALESCE(cnt.c, 0) AS triangles
FROM nv LEFT JOIN cnt ON cnt.id = nv.id
""",
    "label_prop_nation": _label_prop_sql(),
    "bfs_levels_nation": f"""
WITH RECURSIVE {_NATION_CTE.strip()},
src0 AS (SELECT MIN(id) AS id FROM nv),
reach(id, level) AS (
  SELECT id, 0 FROM src0
  UNION
  SELECT ns.dst, reach.level + 1 FROM reach JOIN ns ON ns.src = reach.id
  WHERE reach.level < 50
)
SELECT id, CAST(MIN(level) AS INT) AS level FROM reach GROUP BY id
""",
    "bfs_parents_nation": f"""
WITH RECURSIVE {_NATION_CTE.strip()},
src0 AS (SELECT MIN(id) AS id FROM nv),
reach(id, level) AS (
  SELECT id, 0 FROM src0
  UNION
  SELECT ns.dst, reach.level + 1 FROM reach JOIN ns ON ns.src = reach.id
  WHERE reach.level < 50
),
lvl AS (SELECT id, MIN(level) AS level FROM reach GROUP BY id)
SELECT l.id AS id, MIN(ns.src) AS parent
FROM lvl l JOIN ns ON ns.dst = l.id JOIN lvl p ON p.id = ns.src AND p.level = l.level - 1
WHERE l.level > 0
GROUP BY l.id
UNION ALL
SELECT id, id AS parent FROM src0
""",
}

ORACLE_SQL["cc_csr"] = ORACLE_SQL["cc_bipartite"]
ORACLE_SQL["cc_twophase"] = ORACLE_SQL["cc_bipartite"]
ORACLE_SQL["label_prop_csr"] = ORACLE_SQL["label_prop_nation"]

from graftpark.driver_queries_pipeline import PIPELINE_ORACLE_SQL, PIPELINE_QUERIES  # noqa: E402

ORACLE_SQL.update(PIPELINE_ORACLE_SQL)

QUERIES = {
    "edges_derive": q_edges_derive,
    "degrees": q_degrees,
    "degree_topk": q_degree_topk,
    "symmetrize": q_symmetrize,
    "pagerank_fixed": q_pagerank_fixed,
    "pagerank_csr": q_pagerank_csr,
    "cc_nation": q_cc_nation,
    "cc_csr": q_cc_csr,
    "cc_twophase": q_cc_twophase,
    "cc_bipartite": q_cc_bipartite,
    "triangles_nation": q_triangles_nation,
    "triangles_per_vertex_nation": q_triangles_per_vertex_nation,
    "label_prop_nation": q_label_prop_nation,
    "label_prop_csr": q_label_prop_csr,
    "bfs_levels_nation": q_bfs_levels_nation,
    "bfs_parents_nation": q_bfs_parents_nation,
    **PIPELINE_QUERIES,
}
