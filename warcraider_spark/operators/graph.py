"""Link-graph operators (SURVEY §2.7 self-join row).

The url_resource table's ``links`` arrays make the crawl a graph; edge
extraction is ``explode(links)`` + equi-join on the target URL. The
driver tables carry no links, so edges are synthesized deterministically
from ``documents`` (node i → (i·7+k+1) mod N for k<5) — same construction
in the oracle, so degree/reciprocity/PageRank are hash-checked.

Scale notes: every step is an equi-join or groupBy on the node id — the
join key IS the partition key, so iterative PageRank is one shuffle per
iteration; out-degrees are broadcast (|nodes| ≪ |edges|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warcraider_spark.registry import query
from warcraider_spark.tables import load_table

FANOUT = 5
DAMPING = 0.85
ITERATIONS = 3

# NOTE: DuckDB 1.0's binder hits an internal error when an unnest-
# projecting CTE is referenced 3+ times — oracles use AS MATERIALIZED
# and a wrapper subselect as workarounds
EDGES_SQL = f"""
SELECT src, dst FROM (
  SELECT doc_id AS src,
         unnest(list_transform(generate_series(1, {FANOUT}), k -> (doc_id * 7 + k) % n)) AS dst
  FROM documents CROSS JOIN (SELECT COUNT(*) AS n FROM documents)
)
"""


def edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    return docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.transform(F.sequence(F.lit(1), F.lit(FANOUT)), lambda k: (F.col("doc_id") * 7 + k) % n)
        ).alias("dst"),
    )


@query(
    "q017_link_degrees",
    oracle=f"""
WITH e AS MATERIALIZED ({EDGES_SQL}),
outd AS (SELECT src, COUNT(*) AS out_deg FROM e GROUP BY src),
ind AS (SELECT dst, COUNT(*) AS in_deg FROM e GROUP BY dst),
recip AS (
  SELECT COUNT(*) AS n_recip
  FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src AND a.src < a.dst
)
SELECT o.src AS node, o.out_deg, COALESCE(i.in_deg, 0) AS in_deg,
       (SELECT n_recip FROM recip) AS reciprocal_pairs
FROM outd o LEFT JOIN ind i ON o.src = i.dst
ORDER BY node
""",
    tags=("graph", "join"),
)
def q017_link_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In/out degree per node + reciprocal-edge count (the link-graph
    accounting pass; edge extraction = explode + equi-join)."""
    e = edges(spark, sf_dir)
    outd = e.groupBy(F.col("src")).agg(F.count(F.lit(1)).alias("out_deg"))
    ind = e.groupBy(F.col("dst")).agg(F.count(F.lit(1)).alias("in_deg"))
    a, b = e.alias("a"), e.alias("b")
    recip = (
        a.join(b, (F.col("a.src") == F.col("b.dst")) & (F.col("a.dst") == F.col("b.src")) & (F.col("a.src") < F.col("a.dst")))
        .agg(F.count(F.lit(1)).alias("n_recip"))
    )
    return (
        outd.join(ind, outd.src == ind.dst, "left")
        .crossJoin(F.broadcast(recip))
        .select(
            F.col("src").alias("node"),
            "out_deg",
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.col("n_recip").alias("reciprocal_pairs"),
        )
        .orderBy("node")
    )


def _pagerank_iter_sql(prev: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT n.node,
         ROUND((1 - {DAMPING}) / nn.n + {DAMPING} * COALESCE(SUM(p.pr / od.out_deg), 0.0), 10) AS pr
  FROM nodes n
  CROSS JOIN (SELECT COUNT(*) AS n FROM nodes) nn
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN {prev} p ON p.node = e.src
  LEFT JOIN outd od ON od.src = e.src
  GROUP BY n.node, nn.n
)"""


@query(
    "q018_pagerank",
    oracle=f"""
WITH e AS MATERIALIZED ({EDGES_SQL}),
nodes AS (SELECT DISTINCT src AS node FROM e),
outd AS (SELECT src, COUNT(*) AS out_deg FROM e GROUP BY src),
pr0 AS (SELECT node, ROUND(1.0 / (SELECT COUNT(*) FROM nodes), 10) AS pr FROM nodes),
{_pagerank_iter_sql("pr0", "pr1")},
{_pagerank_iter_sql("pr1", "pr2")},
{_pagerank_iter_sql("pr2", "pr3")}
SELECT node, pr FROM pr3
ORDER BY pr DESC, node
LIMIT 100
""",
    tags=("graph", "iterative", "join"),
)
def q018_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank, 3 unrolled iterations (damping 0.85): the iterative-
    algorithm shape as repeated join+groupBy — one shuffle per iteration
    on the node id. Ranks are ROUNDED to 10 decimals each iteration so
    both engines feed identical doubles into the next step (per-node
    in-sums are small, so parallel summation order drift is sub-round).
    """
    e = edges(spark, sf_dir)
    nodes = e.select(F.col("src").alias("node")).distinct()
    n = nodes.count()
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    pr = nodes.select("node", F.round(F.lit(1.0 / n), 10).alias("pr"))
    for _ in range(ITERATIONS):
        contrib = (
            e.join(pr, e.src == pr.node)
            .join(F.broadcast(outd), "src")
            .select(F.col("dst"), (F.col("pr") / F.col("out_deg")).alias("w"))
            .groupBy("dst")
            .agg(F.sum("w").alias("in_sum"))
        )
        pr = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                F.round(
                    F.lit((1 - DAMPING) / n) + DAMPING * F.coalesce(F.col("in_sum"), F.lit(0.0)), 10
                ).alias("pr"),
            )
        )
    return pr.orderBy(F.desc("pr"), F.asc("node")).limit(100)


@query(
    "q120_recursive_reachability",
    oracle=f"""
WITH RECURSIVE e AS MATERIALIZED ({EDGES_SQL}),
walk(seed, node, depth) AS (
  SELECT src, src, 0 FROM (SELECT DISTINCT src FROM e WHERE src < 3)
  UNION ALL
  SELECT w.seed, e.dst, w.depth + 1
  FROM walk w JOIN e ON w.node = e.src
  WHERE w.depth < 3
),
first_reach AS (
  SELECT seed, node, CAST(MIN(depth) AS BIGINT) AS depth
  FROM walk GROUP BY seed, node
)
SELECT seed, depth, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM first_reach
GROUP BY seed, depth
ORDER BY seed, depth
""",
    tags=("graph", "recursive-cte"),
)
def q120_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded transitive closure via Spark 4's WITH RECURSIVE: BFS from
    three seed nodes over the link graph, reporting how many nodes are
    first reached at each hop count (min-depth reachability, depth ≤ 3).
    The recursive CTE is the declarative dual of the iterative-join
    PageRank loop in q018 — Catalyst unrolls it into one equi-join +
    depth-guard per level, each shuffling only the frontier on the node
    key, so a 100 TB edge table pays |frontier| per hop, never all paths.
    """
    edges(spark, sf_dir).createOrReplaceTempView("link_edges_r")
    return spark.sql(
        """
        WITH RECURSIVE walk(seed, node, depth) AS (
          SELECT src, src, 0L FROM (SELECT DISTINCT src FROM link_edges_r WHERE src < 3)
          UNION ALL
          SELECT w.seed, e.dst, w.depth + 1
          FROM walk w JOIN link_edges_r e ON w.node = e.src
          WHERE w.depth < 3
        ),
        first_reach AS (
          SELECT seed, node, CAST(MIN(depth) AS BIGINT) AS depth
          FROM walk GROUP BY seed, node
        )
        SELECT seed, depth, COUNT(*) AS n_nodes
        FROM first_reach
        GROUP BY seed, depth
        ORDER BY seed, depth
        """
    )


@query(
    "q128_triangle_count",
    oracle=f"""
WITH e AS MATERIALIZED ({EDGES_SQL}),
und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e WHERE src <> dst
),
tri AS MATERIALIZED (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM und e1
  JOIN und e2 ON e1.b = e2.a
  JOIN und e3 ON e1.a = e3.a AND e2.b = e3.b
),
pern AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
  FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  )
  GROUP BY node
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_triangles FROM tri)
SELECT node, n_tri, (SELECT total_triangles FROM tot) AS total_triangles
FROM pern ORDER BY node
""",
    tags=("graph", "join"),
)
def q128_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the link graph (the clustering-coefficient /
    community-structure primitive). Edges are canonicalized to undirected
    (a < b) — which IS the classic orientation trick: every triangle is
    enumerated exactly once as a < b < c, so the two equi-joins see only
    'forward' wedges instead of 6 rotations. At 100 TB-scale graphs the
    orientation would be by degree (low→high) to cap wedge fan-out on hub
    nodes; id-order is the degree proxy here (the synthetic graph is
    near-regular). Both joins shuffle on the node key — the same
    partitioning, reused — and the per-node rollup is one more groupBy on
    that key. No driver-side iteration: the whole count is a static
    3-join DAG."""
    e = edges(spark, sf_dir)
    und = (
        e.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    wedges = (
        und.alias("e1")
        .join(und.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(F.col("e1.a").alias("a"), F.col("e1.b").alias("b"), F.col("e2.b").alias("c"))
    )
    tri = (
        wedges.alias("w")
        .join(
            und.alias("e3"),
            (F.col("w.a") == F.col("e3.a")) & (F.col("w.c") == F.col("e3.b")),
        )
        .select("w.a", "w.b", "w.c")
        .localCheckpoint(eager=False)
    )
    pern = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    total = tri.agg(F.count(F.lit(1)).alias("total_triangles"))
    return (
        pern.crossJoin(F.broadcast(total))
        .select("node", "n_tri", "total_triangles")
        .orderBy("node")
    )
