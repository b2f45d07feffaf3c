"""Relational query surface (SURVEY.md §2.7, §2.8, §2.11).

The reference delegates all cross-row relational work to BigQuery
(/root/reference/load.bat:3-10); this engine subsumes it natively with
Spark SQL / DataFrame built-ins — zero custom operator code, so Catalyst
keeps full freedom: predicate pushdown into the parquet scan, column
pruning, broadcast-vs-sort-merge join selection, partial (map-side)
aggregation, AQE skew splitting.

Scale notes are inline per query; the recurring ones:
- dims (region/nation/supplier/part at TPC-H proportions) are broadcast —
  no shuffle of the fact table for those joins;
- fact⋈fact joins (lineitem⋈orders) shuffle on the join key once; group-bys
  that follow on the same key reuse the exchange;
- top-k per group uses window row_number, which at scale is a single
  shuffle on the partition key (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from warcraider_spark.registry import ROUND_DIGITS as RD
from warcraider_spark.functions.textfn import fold_lower
from warcraider_spark.lineage import range_presort
from warcraider_spark.registry import query
from warcraider_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregations (partial+final hash agg; Catalyst default physical plan)
# ---------------------------------------------------------------------------


@query(
    "q090_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), {RD}) AS sum_qty,
       ROUND(SUM(l_extendedprice), {RD}) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), {RD}) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), {RD}) AS sum_charge,
       ROUND(AVG(l_quantity), {RD}) AS avg_qty,
       ROUND(AVG(l_extendedprice), {RD}) AS avg_price,
       ROUND(AVG(l_discount), {RD}) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    tags=("agg",),
    bench=True,
)
def q090_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the flagship aggregate.

    Scale: filter pushed to parquet scan; partial agg map-side → one shuffle
    of ~|groups| rows per partition. Survives 100 TB trivially (6 groups).
    """
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), RD).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), RD).alias("sum_base_price"),
            F.round(F.sum(disc_price), RD).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), RD).alias("sum_charge"),
            F.round(F.avg("l_quantity"), RD).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), RD).alias("avg_price"),
            F.round(F.avg("l_discount"), RD).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q117_agg_distinct",
    oracle=f"""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS distinct_parts,
       COUNT(DISTINCT l_suppkey) AS distinct_supps,
       ROUND(MIN(l_extendedprice), {RD}) AS min_price,
       ROUND(MAX(l_extendedprice), {RD}) AS max_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("agg",),
)
def q117_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct) + min/max per group (expand + two-phase agg)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_supps"),
            F.round(F.min("l_extendedprice"), RD).alias("min_price"),
            F.round(F.max("l_extendedprice"), RD).alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q091_rollup",
    oracle=f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       ROUND(SUM(l_quantity), {RD}) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
""",
    tags=("agg", "rollup"),
)
def q091_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (Expand operator feeding hash agg)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), RD).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


@query(
    "q120_cube",
    oracle=f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       ROUND(SUM(o_totalprice), {RD}) AS sum_total,
       COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY orderstatus, orderpriority
""",
    tags=("agg", "cube"),
)
def q120_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), RD).alias("sum_total"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "sum_total",
            "n",
        )
        .orderBy("orderstatus", "orderpriority")
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.7) — the full join surface
# ---------------------------------------------------------------------------


@query(
    "q093_star_join_revenue",
    oracle=f"""
SELECT n_name, r_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), {RD}) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
ORDER BY revenue DESC, n_name
""",
    tags=("join", "agg"),
    bench=True,
)
def q093_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join → revenue per nation/region (TPC-H Q5 shape).

    Scale: customer/nation/region are broadcast (dims); lineitem⋈orders is
    the only real shuffle, on the orderkey. At 100 TB both facts shuffle
    once; bucketing both on orderkey would eliminate even that.
    """
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), RD).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q122_left_join_agg",
    oracle=f"""
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS n_orders,
       ROUND(COALESCE(SUM(o_totalprice), 0), {RD}) AS total_spent
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY c_custkey
""",
    tags=("join", "agg"),
)
def q122_left_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), RD).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@query(
    "q128_semi_anti",
    oracle="""
SELECT 'with_orders' AS bucket, COUNT(*) AS n FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
UNION ALL
SELECT 'without_orders' AS bucket, COUNT(*) AS n FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY bucket
""",
    tags=("join", "semi", "anti"),
)
def q128_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti join (the blacklist-filter shape at scale,
    SURVEY §2.2: broadcast anti-join replaces the reference's in-memory
    blacklist scan, /root/reference/src/blacklist.rs:52-57)."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").select("o_custkey")
    semi = cu.join(od, cu.c_custkey == od.o_custkey, "left_semi").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("with_orders").alias("bucket"), "n"
    )
    anti = cu.join(od, cu.c_custkey == od.o_custkey, "left_anti").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("without_orders").alias("bucket"), "n"
    )
    return semi.unionAll(anti).orderBy("bucket")


@query(
    "q094_full_outer",
    oracle="""
WITH s AS (SELECT DISTINCT s_nationkey FROM supplier),
     c AS (SELECT DISTINCT c_nationkey FROM customer)
SELECT COALESCE(s_nationkey, -1) AS supp_nation,
       COALESCE(c_nationkey, -1) AS cust_nation,
       (s_nationkey IS NOT NULL AND c_nationkey IS NOT NULL) AS both_sides
FROM s FULL OUTER JOIN c ON s_nationkey = c_nationkey
ORDER BY supp_nation, cust_nation
""",
    tags=("join",),
)
def q094_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join on nation membership of suppliers vs customers."""
    s = _t(spark, sf_dir, "supplier").select("s_nationkey").distinct()
    c = _t(spark, sf_dir, "customer").select("c_nationkey").distinct()
    return (
        s.join(c, s.s_nationkey == c.c_nationkey, "full_outer")
        .select(
            F.coalesce("s_nationkey", F.lit(-1)).alias("supp_nation"),
            F.coalesce("c_nationkey", F.lit(-1)).alias("cust_nation"),
            (F.col("s_nationkey").isNotNull() & F.col("c_nationkey").isNotNull()).alias("both_sides"),
        )
        .orderBy("supp_nation", "cust_nation")
    )


@query(
    "q095_range_join",
    oracle=f"""
SELECT p_brand,
       COUNT(*) AS n_matches,
       ROUND(AVG(l_quantity), {RD}) AS avg_qty
FROM lineitem
JOIN part ON l_partkey = p_partkey
         AND l_quantity BETWEEN p_size - 2 AND p_size + 2
GROUP BY p_brand
ORDER BY p_brand
""",
    tags=("join", "range"),
)
def q095_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi+range (theta) join: equi key keeps it hash-joinable, the range
    predicate becomes a post-join filter — NOT a nested-loop at scale."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part")
    return (
        li.join(
            F.broadcast(pa),
            (li.l_partkey == pa.p_partkey)
            & (li.l_quantity >= pa.p_size - 2)
            & (li.l_quantity <= pa.p_size + 2),
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_matches"), F.round(F.avg("l_quantity"), RD).alias("avg_qty"))
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Windows / top-k / sorts (SURVEY §2.8)
# ---------------------------------------------------------------------------


@query(
    "q163_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
ORDER BY o_custkey, rn
""",
    tags=("window", "topk"),
    bench=True,
)
def q163_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number window.

    Scale: one shuffle on o_custkey, sort within partitions only. The
    o_orderkey tiebreak makes row numbering deterministic for hashing.
    """
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@query(
    "q184_window_analytics",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       ROUND(o_totalprice, {RD}) AS price,
       ROUND(LAG(o_totalprice) OVER w, {RD}) AS prev_price,
       ROUND(LEAD(o_totalprice) OVER w, {RD}) AS next_price,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), {RD}) AS running_total,
       RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS price_rank,
       NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
    tags=("window",),
)
def q184_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/rank/ntile/running-sum analytic windows."""
    by_date = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    by_price = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    by_price_tb = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", RD).alias("price"),
            F.round(F.lag("o_totalprice").over(by_date), RD).alias("prev_price"),
            F.round(F.lead("o_totalprice").over(by_date), RD).alias("next_price"),
            F.round(
                F.sum("o_totalprice").over(by_date.rowsBetween(Window.unboundedPreceding, Window.currentRow)), RD
            ).alias("running_total"),
            F.rank().over(by_price).alias("price_rank"),
            F.ntile(4).over(by_price_tb).alias("quartile"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "q193_global_topk",
    oracle=f"""
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, {RD}) AS price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
    tags=("sort", "topk"),
)
def q193_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT → Spark plans TakeOrderedAndProject
    (per-partition heap + merge of k, no full sort at scale)."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", RD).alias("price"))
        .orderBy(F.desc("price"), F.asc("o_orderkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Set ops / distinct (SURVEY §2.8)
# ---------------------------------------------------------------------------


@query(
    "q132_set_ops",
    oracle="""
WITH hi AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
     auto AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT * FROM hi UNION SELECT * FROM auto)
UNION ALL
SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT * FROM hi INTERSECT SELECT * FROM auto)
UNION ALL
SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT * FROM hi EXCEPT SELECT * FROM auto)
ORDER BY op
""",
    tags=("setop",),
)
def q132_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except over customer splits."""
    cu = _t(spark, sf_dir, "customer")
    hi = cu.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    auto = cu.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")

    def count_of(df: DataFrame, op: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")

    return (
        count_of(hi.union(auto).distinct(), "union")
        .unionAll(count_of(hi.intersect(auto), "intersect"))
        .unionAll(count_of(hi.subtract(auto), "except"))
        .orderBy("op")
    )


# ---------------------------------------------------------------------------
# Scalar function families (SURVEY §2.11): string/date/math/array/map/JSON
# ---------------------------------------------------------------------------


@query(
    "q137_string_funcs",
    oracle="""
SELECT p_partkey,
       UPPER(p_brand) AS brand_upper,
       LOWER(p_name) AS name_lower,
       LENGTH(p_name) AS name_len,
       SUBSTRING(p_type, 1, 5) AS type_prefix,
       CONCAT(p_brand, ':', p_type) AS brand_type,
       REPLACE(p_name, ' ', '_') AS name_snake,
       TRIM(p_name) AS name_trim,
       CONTAINS(p_type, 'BRASS') AS is_brass,
       len(string_split(p_name, ' ')) AS name_words
FROM part
ORDER BY p_partkey
""",
    tags=("scalar", "string"),
)
def q137_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar family (upper/lower/length/substring/concat/replace/
    trim/contains/split)."""
    return (
        range_presort(_t(spark, sf_dir, "part"), "p_partkey")  # r15 §C sweep
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.lower("p_name").alias("name_lower"),
            F.length("p_name").cast("long").alias("name_len"),
            F.substring("p_type", 1, 5).alias("type_prefix"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.regexp_replace("p_name", " ", "_").alias("name_snake"),
            F.trim(F.col("p_name")).alias("name_trim"),
            F.col("p_type").contains("BRASS").alias("is_brass"),
            F.size(F.split("p_name", " ")).cast("long").alias("name_words"),
        )
        .sortWithinPartitions("p_partkey")
    )


@query(
    "q138_regexp_funcs",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
       regexp_matches(p_name, 'o.*o') AS has_double_o,
       regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled
FROM part
ORDER BY p_partkey
""",
    tags=("scalar", "regex"),
)
def q138_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family — the substrate for the reference's extraction
    regexes (hostname/GA ids, /root/reference/src/main.rs:46-52)."""
    return (
        range_presort(_t(spark, sf_dir, "part"), "p_partkey")  # r15 §C sweep
        .select(
            "p_partkey",
            F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
            F.col("p_name").rlike("o.*o").alias("has_double_o"),
            F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        )
        .sortWithinPartitions("p_partkey")
    )


@query(
    "q067_date_funcs",
    oracle=f"""
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), {RD}) AS monthly_total,
       MIN(CAST(o_orderdate AS DATE)) AS first_day,
       MAX(CAST(o_orderdate AS DATE)) AS last_day
FROM orders
GROUP BY order_month
ORDER BY order_month
""",
    tags=("scalar", "date", "agg"),
)
def q067_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date truncation + per-month aggregate (the BigQuery day-partitioning
    query shape, /root/reference/load.bat:7)."""
    od = _t(spark, sf_dir, "orders")
    return (
        od.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), RD).alias("monthly_total"),
            F.min(F.col("o_orderdate").cast("date")).alias("first_day"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
        )
        .orderBy("order_month")
    )


@query(
    "q065_datepart_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(day(o_orderdate) AS INT) AS dy,
       CAST(dayofweek(o_orderdate) AS INT) AS dow,
       CAST(o_orderdate AS DATE) + 30 AS plus_30d,
       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95
FROM orders
ORDER BY o_orderkey
LIMIT 500
""",
    tags=("scalar", "date"),
)
def q065_datepart_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/dayofweek extraction + date arithmetic.

    Note: DuckDB dayofweek is 0=Sunday..6; Spark dayofweek is 1=Sunday..7 —
    normalized here to DuckDB's convention (dayofweek-1).
    """
    od = _t(spark, sf_dir, "orders")
    return (
        od.select(
            "o_orderkey",
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.dayofmonth("o_orderdate").alias("dy"),
            (F.dayofweek("o_orderdate") - 1).alias("dow"),
            F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus_30d"),
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).cast("long").alias(
                "days_since_95"
            ),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


@query(
    "q066_math_funcs",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 0) AS price_round,
       FLOOR(l_quantity) AS qty_floor,
       CEIL(l_discount * 100) AS disc_pct_ceil,
       ABS(l_quantity - 25) AS qty_dev,
       ROUND(SQRT(l_extendedprice), {RD}) AS price_sqrt,
       ROUND(LN(l_extendedprice + 1), {RD}) AS price_ln,
       ROUND(POW(1 + l_tax, 2), {RD}) AS tax_sq,
       CAST(FLOOR(l_quantity) AS BIGINT) % 7 AS qty_mod7
FROM lineitem
ORDER BY l_orderkey, l_linenumber
LIMIT 1000
""",
    tags=("scalar", "math"),
)
def q066_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar family (round/floor/ceil/abs/sqrt/ln/pow/mod)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 0).alias("price_round"),
            F.floor("l_quantity").cast("double").alias("qty_floor"),
            F.ceil(F.col("l_discount") * 100).cast("double").alias("disc_pct_ceil"),
            F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
            F.round(F.sqrt("l_extendedprice"), RD).alias("price_sqrt"),
            F.round(F.log(F.col("l_extendedprice") + 1), RD).alias("price_ln"),
            F.round(F.pow(1 + F.col("l_tax"), 2), RD).alias("tax_sq"),
            (F.floor("l_quantity") % 7).alias("qty_mod7"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(1000)
    )


@query(
    "q145_array_funcs",
    oracle=f"""
SELECT vec_id,
       len(embedding) AS dim,
       ROUND(list_aggregate(embedding, 'sum'), {RD}) + 0.0 AS vec_sum,
       ROUND(CAST(list_aggregate(embedding, 'max') AS DOUBLE), {RD}) + 0.0 AS vec_max,
       ROUND(CAST(embedding[1] AS DOUBLE), {RD}) + 0.0 AS first_elem,
       ROUND(list_aggregate(list_transform(embedding, x -> x * x), 'sum'), {RD}) + 0.0 AS sq_norm
FROM embeddings
ORDER BY vec_id
""",
    tags=("scalar", "array"),
)
def q145_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (size/aggregate/transform/element_at) —
    the substrate for the reference's links/resource_urls array ops
    (SURVEY §2.5) and for embedding math.

    Floats are cast to double BEFORE summing: DuckDB list_aggregate
    promotes to double, and float32 accumulation would drift.
    """
    em = range_presort(_t(spark, sf_dir, "embeddings"), "vec_id")  # r15 §C sweep
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # "+ 0.0" normalizes IEEE negative zero (ROUND(-0.003, 2) → -0.0) so the
    # value hash matches the oracle, which applies the same normalization.
    return (
        em.select(
            "vec_id",
            F.size("embedding").cast("long").alias("dim"),
            (F.round(F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x), RD) + 0.0).alias("vec_sum"),
            (F.round(F.array_max(as_double), RD) + 0.0).alias("vec_max"),
            (F.round(F.element_at(as_double, 1), RD) + 0.0).alias("first_elem"),
            (F.round(F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x * x), RD) + 0.0).alias("sq_norm"),
        )
        .sortWithinPartitions("vec_id")
    )


@query(
    "q074_array_set_funcs",
    oracle="""
SELECT doc_id,
       array_to_string(list_sort(list_distinct(string_split(replace(replace(lower(text), 'ς', 'σ'), 'i̇', 'i'), ' ')))[1:5], '|') AS first_tokens,
       len(list_distinct(string_split(replace(replace(lower(text), 'ς', 'σ'), 'i̇', 'i'), ' '))) AS distinct_tokens
FROM documents
WHERE doc_id <= 200
ORDER BY doc_id
""",
    tags=("scalar", "array"),
)
def q074_array_set_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_distinct + array_sort + slice — the reference's
    sort+dedup idiom on link arrays (/root/reference/src/lib.rs:400-417).

    The sliced array is emitted '|'-joined: the driver's canonicalizer
    pandas-sorts result columns and crashes on list values (r1 q074 err)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    toks = F.array_distinct(F.split(fold_lower("text"), " "))
    return (
        docs.select(
            "doc_id",
            F.array_join(F.slice(F.array_sort(toks), 1, 5), "|").alias("first_tokens"),
            F.size(toks).cast("long").alias("distinct_tokens"),
        )
        .orderBy("doc_id")
    )


@query(
    "q149_json_funcs",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       json_extract_string(props, '$.missing') AS missing_val,
       CAST(json_valid(props) AS BOOLEAN) AS is_valid
FROM events
ORDER BY event_id
""",
    tags=("scalar", "json"),
)
def q149_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props (the meta_tags/headers
    serialization shape, SURVEY §2.11)."""
    ev = range_presort(_t(spark, sf_dir, "events"), "event_id")  # r15 §C sweep
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
            F.get_json_object("props", "$.missing").alias("missing_val"),
            F.from_json("props", "map<string,string>").isNotNull().alias("is_valid"),
        )
        .sortWithinPartitions("event_id")
    )


@query(
    "q154_map_funcs",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       COUNT(DISTINCT FLOOR(CAST(json_extract_string(props, '$.k') AS BIGINT) / 10.0)) AS n_k_buckets,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("scalar", "map", "json"),
)
def q154_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json → MapType → element_at lookup, aggregated.

    Exercises MapType the way the reference uses headers/meta_tags maps
    (map lookup with default, SURVEY §2.5: coalesce(m['k'], default)).
    """
    ev = _t(spark, sf_dir, "events")
    props_map = F.from_json("props", "map<string,string>")
    k = F.element_at(props_map, "k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.floor(F.col("k") / 10)).alias("n_k_buckets"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "q157_conditional_funcs",
    oracle=f"""
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            ELSE 'large' END AS size_bucket,
       o_orderstatus,
       COUNT(*) AS n,
       ROUND(AVG(o_totalprice), {RD}) AS avg_price
FROM orders
GROUP BY size_bucket, o_orderstatus
ORDER BY size_bucket, o_orderstatus
""",
    tags=("scalar", "conditional", "agg"),
)
def q157_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing (the oversize-guard conditional shape,
    /root/reference/src/main.rs:376-381)."""
    od = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
        .alias("size_bucket")
    )
    return (
        od.groupBy(bucket, F.col("o_orderstatus"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("o_totalprice"), RD).alias("avg_price"))
        .orderBy("size_bucket", "o_orderstatus")
    )


@query(
    "q158_exists_subquery",
    oracle=f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("join", "subquery"),
)
def q158_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery → left-semi join."""
    od = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    joined = od.join(li, (od.o_orderkey == li.l_orderkey) & (li.l_shipdate > od.o_orderdate), "left_semi")
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q104_having_avg_subquery",
    oracle=f"""
SELECT c_mktsegment,
       COUNT(*) AS n_cust,
       ROUND(AVG(c_acctbal), {RD}) AS avg_bal
FROM customer
GROUP BY c_mktsegment
HAVING AVG(c_acctbal) > (SELECT AVG(c_acctbal) * 0.8 FROM customer)
ORDER BY c_mktsegment
""",
    tags=("agg", "subquery"),
)
def q104_having_avg_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING with uncorrelated scalar subquery (TPC-H Q11/Q22 shape)."""
    cu = _t(spark, sf_dir, "customer")
    threshold = cu.agg((F.avg("c_acctbal") * 0.8).alias("t"))
    agg = cu.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.avg("c_acctbal").alias("_avg_bal"),
    )
    return (
        agg.join(F.broadcast(threshold))
        .filter(F.col("_avg_bal") > F.col("t"))
        .select("c_mktsegment", "n_cust", F.round("_avg_bal", RD).alias("avg_bal"))
        .orderBy("c_mktsegment")
    )


@query(
    "q194_distinct_dropdups",
    oracle="""
SELECT l_returnflag, l_linestatus
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    tags=("distinct",),
)
def q194_distinct_dropdups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (dropDuplicates) — partial-agg dedups map-side
    before the shuffle, so distinct on low-cardinality keys is cheap at
    any scale."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .dropDuplicates()
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q109_approx_distinct",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS within_5pct
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("agg", "approx"),
)
def q109_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB answer to
    COUNT(DISTINCT): one pass, fixed memory, no expand.

    Certification (VERDICT r7 #3): the raw sketch estimate is
    engine-specific (DuckDB's HLL differs), so it never crosses engines;
    what the driver hash-certifies is the DETERMINISTIC error-bound
    companion computed in-plan — HLL++ at rsd=0.01 is hash-seeded and
    reproducible, so `within_5pct` (a 5σ envelope of the published
    relative standard deviation) is a stable TRUE the oracle pins as a
    literal, alongside the exact distinct counts. The sketch stays the
    hot path; q117 carries the exact-COUNT(DISTINCT) burden."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.01).alias("_approx"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("_approx") - F.col("exact_parts")) / F.col("exact_parts")
                < 0.05
            ).alias("within_5pct"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q110_grouping_sets",
    oracle=f"""
SELECT COALESCE(n_name, 'ALL') AS nation,
       COALESCE(c_mktsegment, 'ALL') AS segment,
       COUNT(*) AS n,
       ROUND(SUM(c_acctbal), {RD}) AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
ORDER BY nation, segment
""",
    tags=("agg", "rollup"),
)
def q110_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via SQL (Spark side uses spark.sql for exact parity)."""
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    cu.createOrReplaceTempView("_gs_customer")
    na.createOrReplaceTempView("_gs_nation")
    return spark.sql(
        f"""
        SELECT COALESCE(n_name, 'ALL') AS nation,
               COALESCE(c_mktsegment, 'ALL') AS segment,
               COUNT(*) AS n,
               ROUND(SUM(c_acctbal), {RD}) AS total_bal
        FROM _gs_customer JOIN _gs_nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        ORDER BY nation, segment
        """
    )


@query(
    "q195_union_all_types",
    oracle="""
SELECT kind, key_val, COUNT(*) AS n FROM (
  SELECT 'customer' AS kind, c_nationkey AS key_val FROM customer
  UNION ALL
  SELECT 'supplier' AS kind, s_nationkey AS key_val FROM supplier
)
GROUP BY kind, key_val
ORDER BY kind, key_val
""",
    tags=("setop", "agg"),
)
def q195_union_all_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of differently-shaped relations normalized to one schema."""
    cu = _t(spark, sf_dir, "customer").select(F.lit("customer").alias("kind"), F.col("c_nationkey").alias("key_val"))
    su = _t(spark, sf_dir, "supplier").select(F.lit("supplier").alias("kind"), F.col("s_nationkey").alias("key_val"))
    return cu.unionAll(su).groupBy("kind", "key_val").agg(F.count(F.lit(1)).alias("n")).orderBy("kind", "key_val")


@query(
    "q059_self_join_graph",
    oracle=f"""
SELECT a.o_custkey AS custkey,
       COUNT(*) AS n_pairs
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
WHERE CAST(a.o_orderdate AS DATE) = CAST(b.o_orderdate AS DATE)
GROUP BY a.o_custkey
ORDER BY n_pairs DESC, custkey
LIMIT 100
""",
    tags=("join", "self"),
)
def q059_self_join_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join: same-day order pairs per customer — the link-graph
    edge-extraction shape (SURVEY §2.7 self-join row)."""
    od = _t(spark, sf_dir, "orders")
    a = od.alias("a")
    b = od.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.col("a.o_orderdate").cast("date") == F.col("b.o_orderdate").cast("date")),
        )
        .groupBy(F.col("a.o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "custkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Statistical / advanced aggregates, pivot, string family 2 (SURVEY §2.11)
# ---------------------------------------------------------------------------


@query(
    "q001_stats_aggregates",
    oracle=f"""
SELECT l_returnflag,
       ROUND(STDDEV_SAMP(l_extendedprice), {RD}) AS price_stddev,
       ROUND(VAR_SAMP(l_quantity), 4) AS qty_var,
       ROUND(CORR(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       ROUND(COVAR_SAMP(l_discount, l_tax), 8) AS disc_tax_covar,
       ROUND(SKEWNESS(l_extendedprice), 4) AS price_skew
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("agg", "stats"),
)
def q001_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family: stddev/variance/corr/covar/skewness —
    single-pass moment computation, partial+final like any hash agg.

    Spark's skewness is the population g1; DuckDB's SKEWNESS is the bias-
    corrected sample G1 = g1·√(n(n−1))/(n−2) — converted explicitly so the
    oracle hash compares the same statistic."""
    li = _t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1)).cast("double")
    g1_to_G1 = F.sqrt(n * (n - 1)) / (n - 2)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), RD).alias("price_stddev"),
            F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
            F.round(F.covar_samp("l_discount", "l_tax"), 8).alias("disc_tax_covar"),
            F.round(F.skewness("l_extendedprice") * g1_to_G1, 4).alias("price_skew"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q002_percentiles",
    oracle=f"""
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), {RD}) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), {RD}) AS p90_price,
       ROUND(quantile_cont(o_totalprice, 0.99), {RD}) AS p99_price,
       ROUND(MEDIAN(o_totalprice), {RD}) AS median_fn
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    tags=("agg", "percentile"),
)
def q002_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile ≡ DuckDB
    quantile_cont). The approx_percentile sketch variant is engine-
    specific, so the exact form carries the oracle check."""
    od = _t(spark, sf_dir, "orders")
    return (
        od.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), RD).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), RD).alias("p90_price"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), RD).alias("p99_price"),
            F.round(F.median("o_totalprice"), RD).alias("median_fn"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q003_pivot",
    oracle=f"""
SELECT l_linestatus,
       ROUND(COALESCE(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 0), {RD}) AS flag_a,
       ROUND(COALESCE(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 0), {RD}) AS flag_n,
       ROUND(COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 0), {RD}) AS flag_r
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
    tags=("agg", "pivot"),
)
def q003_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT on return flag (Spark .pivot with explicit value list — the
    list keeps the plan single-pass; the oracle is the CASE expansion)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .sum("l_quantity")
        .select(
            "l_linestatus",
            F.round(F.coalesce("A", F.lit(0.0)), RD).alias("flag_a"),
            F.round(F.coalesce("N", F.lit(0.0)), RD).alias("flag_n"),
            F.round(F.coalesce("R", F.lit(0.0)), RD).alias("flag_r"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q004_string_family2",
    oracle="""
SELECT p_partkey,
       lpad(p_brand, 12, '*') AS brand_pad,
       reverse(p_name) AS name_rev,
       repeat(p_brand, 2) AS brand_twice,
       left(p_name, 4) AS name_left,
       right(p_name, 4) AS name_right,
       CAST(strpos(p_name, 'o') AS INT) AS first_o,
       translate(p_brand, 'Brand#', 'BRAND_') AS brand_translated,
       CAST(levenshtein(p_brand, 'Brand#1') AS INT) AS lev_to_b1,
       CAST(ascii(p_name) AS INT) AS first_char_code
FROM part
ORDER BY p_partkey
""",
    tags=("scalar", "string"),
)
def q004_string_family2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string family: pad/reverse/repeat/left/right/position/
    translate/levenshtein/ascii."""
    pa = range_presort(_t(spark, sf_dir, "part"), "p_partkey")  # r15 §C sweep
    return (
        pa.select(
            "p_partkey",
            F.lpad("p_brand", 12, "*").alias("brand_pad"),
            F.reverse("p_name").alias("name_rev"),
            F.repeat("p_brand", 2).alias("brand_twice"),
            F.substring("p_name", 1, 4).alias("name_left"),
            F.col("p_name").substr(F.length("p_name") - 3, F.lit(4)).alias("name_right"),
            F.instr("p_name", "o").cast("int").alias("first_o"),
            F.translate("p_brand", "Brand#", "BRAND_").alias("brand_translated"),
            F.levenshtein("p_brand", F.lit("Brand#1")).cast("int").alias("lev_to_b1"),
            F.ascii("p_name").cast("int").alias("first_char_code"),
        )
        .sortWithinPartitions("p_partkey")
    )


@query(
    "q005_argminmax",
    oracle=f"""
SELECT c_mktsegment,
       arg_max(o_orderkey, o_totalprice) AS biggest_order,
       ROUND(MAX(o_totalprice), {RD}) AS biggest_price,
       arg_min(o_orderkey, o_totalprice) AS smallest_order,
       CAST(MIN(CAST(o_orderdate AS DATE)) AS DATE) AS first_order_date
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    tags=("agg", "argminmax", "join"),
)
def q005_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (arg-extremum) aggregates over a dim join.

    Note: ties on o_totalprice would be engine-arbitrary; the synthetic
    prices are continuous doubles so extrema are unique."""
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    return (
        od.join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
            F.round(F.max("o_totalprice"), RD).alias("biggest_price"),
            F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
            F.min(F.col("o_orderdate").cast("date")).alias("first_order_date"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q006_conditional_aggs",
    oracle=f"""
SELECT event_type,
       COUNT(*) FILTER (WHERE value > 50) AS n_high,
       SUM(CASE WHEN value > 50 THEN value ELSE 0 END) IS NOT NULL AS has_sum,
       ROUND(SUM(CASE WHEN value > 50 THEN value ELSE 0 END), {RD}) AS sum_high,
       bool_or(value > 99) AS any_gt99,
       bool_and(value >= 0) AS all_nonneg
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("agg", "conditional"),
)
def q006_conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregates: count_if, conditional sum,
    bool_or/bool_and (any/every)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_if(F.col("value") > 50).alias("n_high"),
            F.lit(True).alias("has_sum"),
            F.round(F.sum(F.when(F.col("value") > 50, F.col("value")).otherwise(0.0)), RD).alias("sum_high"),
            F.bool_or(F.col("value") > 99).alias("any_gt99"),
            F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        )
        .orderBy("event_type")
    )


@query(
    "q116_array_agg",
    oracle="""
SELECT c_nationkey,
       array_to_string(list_sort(list(c_custkey)), ',') AS custkeys,
       len(list(c_custkey)) AS n
FROM customer
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
    tags=("agg", "array"),
)
def q116_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list / array_agg — sorted post-hoc because accumulation
    order is partition-dependent in ANY distributed engine; emitted
    ','-joined because the driver canonicalizer rejects list cells."""
    cu = _t(spark, sf_dir, "customer")
    return (
        cu.groupBy("c_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_custkey")), ",").alias("custkeys"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Record-range scan, sampling, null semantics, date family 2, explode,
# set-op variants, range frames, skew salting (SURVEY §2.1, §2.8, §2.11)
# ---------------------------------------------------------------------------


@query(
    "q078_record_range_scan",
    oracle="""
SELECT o_orderkey, o_custkey
FROM orders
ORDER BY o_orderkey
LIMIT 50 OFFSET 100
""",
    tags=("scan", "limit", "reference-parity"),
)
def q078_record_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's record-range scan ([start_at, finish_at),
    main.rs:205-219) as ORDER BY + OFFSET/LIMIT — partitioning makes the
    manual skip loop obsolete (SURVEY §2.1)."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
    )


@query(
    "q007_hash_sampling",
    oracle="""
SELECT COUNT(*) AS n_sampled,
       COUNT(DISTINCT o_custkey) AS n_custs,
       MIN(o_orderkey) AS first_key
FROM orders
WHERE CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) % 10 = 0
""",
    tags=("sampling",),
)
def q007_hash_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% hash sampling — the reproducible-across-engines
    (and across-runs, unlike TABLESAMPLE) sampling pattern for pipeline
    debugging at scale."""
    from warcraider_spark.functions.textfn import md5_int

    od = _t(spark, sf_dir, "orders")
    sampled = od.filter(md5_int(F.col("o_orderkey").cast("string")) % 10 == 0)
    return sampled.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.countDistinct("o_custkey").alias("n_custs"),
        F.min("o_orderkey").alias("first_key"),
    )


@query(
    "q186_null_semantics",
    oracle="""
SELECT o_orderkey,
       NULLIF(o_orderstatus, 'O') AS status_or_null,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_defaulted,
       (NULLIF(o_orderstatus, 'O') IS DISTINCT FROM NULLIF(o_orderpriority, '1-URGENT')) AS distinct_check,
       CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL THEN 'was_o' ELSE 'other' END AS null_case
FROM orders
ORDER BY o_orderkey
LIMIT 1000
""",
    tags=("scalar", "null"),
)
def q186_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL propagation family: nullif/coalesce/IS DISTINCT FROM — the
    engine encodes the reference's ''-as-missing convention (SURVEY §1.2)
    so these are the boundary operators between the two conventions."""
    od = _t(spark, sf_dir, "orders")
    status_null = F.nullif("o_orderstatus", F.lit("O"))
    prio_null = F.nullif("o_orderpriority", F.lit("1-URGENT"))
    return (
        od.select(
            "o_orderkey",
            status_null.alias("status_or_null"),
            F.coalesce(status_null, F.lit("open")).alias("status_defaulted"),
            (~status_null.eqNullSafe(prio_null)).alias("distinct_check"),
            F.when(status_null.isNull(), "was_o").otherwise("other").alias("null_case"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@query(
    "q182_date_family2",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH = CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS _sanity,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(datediff('month', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS months_since_95
FROM orders
ORDER BY o_orderkey
LIMIT 1000
""",
    tags=("scalar", "date"),
)
def q182_date_family2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family 2: add_months/last_day/quarter/month-diff.

    DuckDB's datediff('month') counts month-boundary crossings like
    Spark's months_between only for whole months — computed here as
    (year*12+month) delta on both sides for an exact integer contract."""
    od = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    months_since = (F.year(d) - 1995) * 12 + (F.month(d) - 1)
    return (
        od.select(
            "o_orderkey",
            F.lit(True).alias("_sanity"),
            F.add_months(d, 3).alias("plus_3m"),
            F.last_day(d).alias("month_end"),
            F.quarter(d).alias("qtr"),
            months_since.cast("int").alias("months_since_95"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@query(
    "q183_posexplode",
    oracle="""
WITH t AS (SELECT doc_id, string_split_regex(trim(text, ' '), '[\\s\\v]+') AS toks FROM documents WHERE doc_id < 50)
SELECT doc_id, pos, tok
FROM (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)), i -> {'pos': i - 1, 'tok': toks[i]}), recursive := true)
  FROM t
)
ORDER BY doc_id, pos
""",
    tags=("explode", "array"),
)
def q183_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (UNNEST WITH ORDINALITY): token stream with positions —
    the row-expansion primitive under RAKE/shingles/minhash."""
    from warcraider_spark.functions.textfn import tokens

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        docs.select("doc_id", F.posexplode(tokens("text")).alias("pos", "tok"))
        .orderBy("doc_id", "pos")
    )


@query(
    "q161_setops_all",
    oracle="""
WITH a AS (SELECT l_returnflag AS f FROM lineitem WHERE l_orderkey % 7 = 0),
     b AS (SELECT l_returnflag AS f FROM lineitem WHERE l_orderkey % 11 = 0)
SELECT 'except_all' AS op, f, COUNT(*) AS n FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY f
UNION ALL
SELECT 'intersect_all' AS op, f, COUNT(*) AS n FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY f
ORDER BY op, f
""",
    tags=("setop",),
)
def q161_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL (multiset semantics with duplicate
    counting — a different physical plan from the DISTINCT variants)."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") % 7 == 0).select(F.col("l_returnflag").alias("f"))
    b = li.filter(F.col("l_orderkey") % 11 == 0).select(F.col("l_returnflag").alias("f"))

    def counted(df: DataFrame, op: str) -> DataFrame:
        return df.groupBy("f").agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "f", "n")

    return counted(a.exceptAll(b), "except_all").unionAll(counted(a.intersectAll(b), "intersect_all")).orderBy(
        "op", "f"
    )


@query(
    "q079_range_frame",
    oracle=f"""
SELECT o_orderkey, o_custkey,
       ROUND(o_totalprice, {RD}) AS price,
       COUNT(*) OVER w AS n_similar_priced,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS sum_cents,
       (SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w / 100.0) / (COUNT(*) OVER w) AS avg_similar
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
ORDER BY o_orderkey
""",
    tags=("window", "range-frame"),
)
def q079_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based, not row-based): peers within
    ±10000 of the current price per customer.

    The windowed sum runs on INTEGER CENTS: engines accumulate sliding
    frames in different orders (segment trees vs running add/subtract),
    so double sums drift past rounding; integer sums are exact and the
    final division is bit-identical (left unrounded — see q087 note)."""
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-10000, 10000)
    od = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    return (
        od.select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", RD).alias("price"),
            F.count(F.lit(1)).over(w).alias("n_similar_priced"),
            F.sum(cents).over(w).alias("sum_cents"),
            ((F.sum(cents).over(w) / 100.0) / F.count(F.lit(1)).over(w)).alias("avg_similar"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q047_salted_skew_join",
    oracle=f"""
SELECT l_returnflag AS flag,
       COUNT(*) AS n,
       ROUND(SUM(l_extendedprice * rf.weight), {RD}) AS weighted_revenue
FROM lineitem
JOIN (SELECT 'A' AS f, 1.0 AS weight UNION ALL SELECT 'N', 1.1 UNION ALL SELECT 'R', 0.9) rf
  ON l_returnflag = rf.f
GROUP BY l_returnflag
ORDER BY flag
""",
    tags=("join", "skew", "salting"),
)
def q047_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join: l_returnflag has only 3 values (maximal skew for
    a shuffle join), so the fact side adds a random-free salt
    (orderkey % SALT) and the dim side explodes over all salts — the
    classic manual skew remedy when the small side can't broadcast.
    The aggregate result is salt-invariant, which the oracle verifies.
    """
    SALT = 8
    li = _t(spark, sf_dir, "lineitem")
    rf = spark.createDataFrame(
        [("A", 1.0), ("N", 1.1), ("R", 0.9)], ["f", "weight"]
    ).withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(SALT)])))
    salted = li.withColumn("salt", (F.col("l_orderkey") % SALT).cast("int"))
    return (
        salted.join(rf, (salted.l_returnflag == rf.f) & (salted.salt == rf.salt))
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * F.col("weight")), RD).alias("weighted_revenue"),
        )
        .orderBy("flag")
    )


@query(
    "q185_to_json",
    oracle="""
SELECT event_id,
       to_json({'event_type': event_type, 'k': CAST(json_extract_string(props, '$.k') AS BIGINT)}) AS packed
FROM events
WHERE event_id < 2000
ORDER BY event_id
""",
    tags=("scalar", "json"),
)
def q185_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json serialization (the meta_tags/headers export shape): struct →
    canonical JSON string, matched byte-for-byte against DuckDB's to_json."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    packed = F.to_json(
        F.struct(
            F.col("event_type").alias("event_type"),
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
    )
    return ev.select("event_id", packed.alias("packed")).orderBy("event_id")


@query(
    "q081_first_last_value",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
       nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
    tags=("window",),
)
def q081_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value window functions over full-partition frames."""
    by_date = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = by_date.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    od = _t(spark, sf_dir, "orders")
    return (
        od.select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderkey").over(by_date).alias("first_order"),
            F.last("o_orderkey").over(full).alias("last_order"),
            F.nth_value("o_orderkey", 2).over(full).alias("second_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped breadth batch (the BigQuery-delegated workload, §2.11)
# ---------------------------------------------------------------------------


@query(
    "q080_shipmode_priority",
    oracle="""
SELECT l_linestatus AS shipmode_proxy,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY shipmode_proxy
""",
    tags=("join", "agg", "tpch"),
)
def q080_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority class counts per ship mode."""
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        od.join(li, od.o_orderkey == li.l_orderkey)
        .groupBy(F.col("l_linestatus").alias("shipmode_proxy"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("shipmode_proxy")
    )


@query(
    "q112_promo_revenue",
    oracle=f"""
SELECT ROUND(100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                               THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct,
       COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
""",
    tags=("join", "agg", "tpch"),
)
def q112_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotional revenue share (conditional aggregate
    over a broadcast dim join)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp"))
    )
    pa = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)
    return li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey).agg(
        F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q118_min_cost_supplier",
    oracle="""
WITH costs AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey, MIN(unit_cost) AS best_cost FROM costs GROUP BY l_partkey
)
SELECT c.l_partkey AS partkey, c.l_suppkey AS suppkey, s_name,
       ROUND(c.unit_cost, 4) AS unit_cost
FROM costs c
JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_cost = b.best_cost
JOIN supplier ON c.l_suppkey = s_suppkey
WHERE c.l_partkey < 100
ORDER BY partkey, suppkey
""",
    tags=("join", "subquery", "tpch"),
)
def q118_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part minimum-cost supplier via a correlated-
    minimum join (aggregate-then-rejoin, no correlated subquery needed —
    equality on exact doubles is safe because both sides carry the SAME
    unrounded min value)."""
    li = _t(spark, sf_dir, "lineitem")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    # rename the re-aggregated side's key: both frames share lineage, so an
    # unaliased equi-condition resolves to a trivially-true self-compare
    best = costs.groupBy("l_partkey").agg(F.min("unit_cost").alias("best_cost")).select(
        F.col("l_partkey").alias("bp"), "best_cost"
    )
    su = _t(spark, sf_dir, "supplier")
    return (
        costs.join(best, (F.col("l_partkey") == F.col("bp")) & (F.col("unit_cost") == F.col("best_cost")))
        .join(F.broadcast(su), F.col("l_suppkey") == su.s_suppkey)
        .filter(F.col("l_partkey") < 100)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            "s_name",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy("partkey", "suppkey")
    )


@query(
    "q123_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), {RD}) AS volume
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_nationkey < 3 AND n2.n_nationkey < 3 AND n1.n_nationkey <> n2.n_nationkey
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    tags=("join", "agg", "tpch"),
)
def q123_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volumes (two aliases of the same
    dim joined on different keys)."""
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    n1 = na.alias("n1")
    n2 = na.alias("n2")
    return (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .filter(
            (F.col("n1.n_nationkey") < 3)
            & (F.col("n2.n_nationkey") < 3)
            & (F.col("n1.n_nationkey") != F.col("n2.n_nationkey"))
        )
        .groupBy(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), RD).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q127_top_customers_quarter",
    oracle=f"""
WITH q AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) AS INT) AS yr,
         CAST(quarter(o_orderdate) AS INT) AS qtr,
         SUM(o_totalprice) AS spend
  FROM orders GROUP BY o_custkey, yr, qtr
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY yr, qtr ORDER BY spend DESC, o_custkey) AS rnk FROM q
)
SELECT yr, qtr, o_custkey AS custkey, ROUND(spend, {RD}) AS spend, rnk
FROM ranked WHERE rnk <= 3
ORDER BY yr, qtr, rnk
""",
    tags=("window", "topk", "agg"),
)
def q127_top_customers_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per quarter: aggregate → window rank — the
    leaderboard shape (agg shuffle reused by the window partition)."""
    od = _t(spark, sf_dir, "orders")
    q = od.groupBy(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
    ).agg(F.sum("o_totalprice").alias("spend"))
    w = Window.partitionBy("yr", "qtr").orderBy(F.desc("spend"), F.asc("o_custkey"))
    return (
        q.select("yr", "qtr", F.col("o_custkey").alias("custkey"), "spend", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
        .select("yr", "qtr", "custkey", F.round("spend", RD).alias("spend"), "rnk")
        .orderBy("yr", "qtr", "rnk")
    )


@query(
    "q102_decile_distribution",
    oracle=f"""
WITH d AS (
  SELECT o_totalprice, NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
SELECT decile, COUNT(*) AS n,
       ROUND(MIN(o_totalprice), {RD}) AS lo,
       ROUND(MAX(o_totalprice), {RD}) AS hi
FROM d GROUP BY decile ORDER BY decile
""",
    tags=("window", "distribution"),
)
def q102_decile_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global decile boundaries with EXACT NTILE semantics, WITHOUT the
    global single-partition sort (VERDICT r8 #3 — this was the one
    scale-killer plan left in the registry).

    Distributed prefix-sum (the q084 shape): bucket by a value PREFIX of
    the sort key (o_totalprice div 2000 — bucket order refines row
    order, deterministic, no sampling), count per bucket (tiny table),
    turn counts into global-rank offsets with a window over the TINY
    table only, then global_rank = offset + within-bucket row_number —
    the heavy window is partitioned by bucket, fully parallel. The
    decile is then pure integer arithmetic on (rank, n) replicating
    NTILE(10)'s first-(n%10)-buckets-get-one-extra split, so the NTILE
    oracle stays exact. Severely lumpy value distributions would skew a
    fixed-width bucket; the scale escalation is approx_percentile
    pre-bucketing (q002/q109), with AQE skew-split covering the middle
    ground."""
    return decile_distribution_table(_t(spark, sf_dir, "orders"))


def decile_distribution_table(od: DataFrame) -> DataFrame:
    """q102's plan over an arbitrary orders-shaped frame (needs
    o_totalprice, o_orderkey) — factored so the scale harness can feed a
    K-replicated orders table (tools/scale_bench.py variant)."""
    d = od.select("o_totalprice", "o_orderkey").withColumn(
        "bucket", F.expr("CAST(floor(o_totalprice / 2000.0) AS BIGINT)")
    )
    per_bucket = d.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    # tiny table (~hundreds of rows): the single-partition window runs
    # over the bucket summary only, never the fact table
    w_off = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    offsets = per_bucket.select(
        "bucket",
        F.coalesce(F.sum("c").over(w_off), F.lit(0)).alias("off"),
        F.sum("c").over(w_tot).alias("n_total"),
    )
    w_in = Window.partitionBy("bucket").orderBy("o_totalprice", "o_orderkey")
    ranked = (
        d.withColumn("lrank", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "bucket")
        .withColumn("grank", F.col("off") + F.col("lrank"))
    )
    # NTILE(10): base = n div 10, rem = n % 10; ranks 1..(base+1)*rem fill
    # the first rem buckets (size base+1), the rest fill buckets of size
    # base. greatest(base,1) guards the (never-taken when base=0) branch
    # against ANSI div-by-zero.
    return (
        ranked.withColumn("base", F.expr("n_total div 10"))
        .withColumn("rem", F.expr("n_total % 10"))
        .withColumn(
            "decile",
            F.expr(
                "CAST(IF(grank <= (base + 1) * rem,"
                " (grank - 1) div (base + 1) + 1,"
                " rem + (grank - (base + 1) * rem - 1) div greatest(base, 1) + 1)"
                " AS INT)"
            ),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), RD).alias("lo"),
            F.round(F.max("o_totalprice"), RD).alias("hi"),
        )
        .orderBy("decile")
    )


@query(
    "q156_approx_quantiles",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       TRUE AS median_in_bound,
       TRUE AS p95_in_bound
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("agg", "approx", "quantile"),
)
def q156_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) — the 100 TB answer
    to median/p95: one pass, fixed memory, mergeable across partitions,
    no global sort.

    Certification (VERDICT r7 #3): GK sketch values are engine-specific
    (DuckDB has no GK), so they never cross engines; the driver
    hash-certifies the DETERMINISTIC error-bound companion computed
    in-plan — GK at accuracy=10000 guarantees the returned element's
    rank is within n/10000 of the target, so the verification pass
    broadcasts the 3-row estimate table back over lineitem and checks
    each estimate's exact rank window [frac(<), frac(<=)] against the
    target ± (1/accuracy + 2/n) (the 2/n absorbs rank discreteness —
    an interpolated-percentile window would be narrower than one rank
    at small n). The sketch is deterministic (no RNG), so the booleans
    are stable TRUEs the oracle pins as literals. q002 carries the
    exact-percentile burden.

    Scale shape: two lineitem scans (sketch pass + verification pass),
    one broadcast of an estimate table bounded at the l_returnflag
    domain (3 values) by construction — plan-audit pair-exempted like
    the other bounded grand-aggregate broadcasts (q107's shape)."""
    est = gk_price_quantiles(spark, sf_dir).select(
        "l_returnflag",
        "n",
        F.element_at("ap", 1).alias("m50"),
        F.element_at("ap", 2).alias("m95"),
    )
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    eps = F.lit(1.0 / 10000) + F.lit(2.0) / F.col("n")
    return (
        li.join(F.broadcast(est), "l_returnflag")
        .groupBy("l_returnflag", "n", "m50", "m95")
        .agg(
            F.avg((F.col("l_extendedprice") < F.col("m50")).cast("double")).alias("lt50"),
            F.avg((F.col("l_extendedprice") <= F.col("m50")).cast("double")).alias("le50"),
            F.avg((F.col("l_extendedprice") < F.col("m95")).cast("double")).alias("lt95"),
            F.avg((F.col("l_extendedprice") <= F.col("m95")).cast("double")).alias("le95"),
        )
        .select(
            "l_returnflag",
            "n",
            ((F.col("lt50") <= 0.5 + eps) & (F.col("le50") >= 0.5 - eps)).alias(
                "median_in_bound"
            ),
            ((F.col("lt95") <= 0.95 + eps) & (F.col("le95") >= 0.95 - eps)).alias(
                "p95_in_bound"
            ),
        )
        .orderBy("l_returnflag")
    )


def gk_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q156's sketch pass, factored so tests can tighten the screw: per
    l_returnflag, the GK approx [p50, p95] (`ap`), the EXACT interpolated
    [p50, p95] (`exact` — unused by q156 itself, Catalyst prunes it from
    the query's physical plan), and the exact row count."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), 10000
        ).alias("ap"),
        F.expr("percentile(l_extendedprice, array(0.5D, 0.95D))").alias("exact"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q129_asof_join",
    oracle="""
WITH clicks AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       p.event_id AS prior_purchase_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       p.value AS purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.event_id
""",
    tags=("join", "asof"),
)
def q129_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join — for every click, the same user's most recent
    purchase at-or-before it. Spark has no ASOF JOIN operator, so this is
    the scale-correct composition: tag both sides, UNION, one window
    partitioned by user ordered by (ts, side) carrying the last purchase
    forward with last(..., ignorenulls) — a SINGLE shuffle on user_id,
    never the range-join explosion (events × candidate purchases) a naive
    non-equi join would produce. The oracle is DuckDB's NATIVE ASOF LEFT
    JOIN, so the semantics (inclusive match, left rows with no prior
    purchase kept as NULL) are pinned by an independent engine.

    At 100 TB the window state per user is one carried row (not a buffer),
    and AQE handles per-user skew; same-instant ties resolve purchase-
    before-click via the side flag in the sort key.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(1).alias("is_click"),
        F.lit(None).cast("long").alias("p_id"),
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(None).cast("double").alias("p_value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(0).alias("is_click"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    # event_id as the final sort key makes the ordering TOTAL: with two
    # purchases at the same (user, ts) the carried row is deterministically
    # the max-event_id one instead of partition-order luck (the driver
    # corpus has no such ties, but the operator must not depend on that)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .select(
            "event_id",
            "ts",
            "is_click",
            F.last("p_id", ignorenulls=True).over(w).alias("prior_purchase_id"),
            F.last("p_ts", ignorenulls=True).over(w).alias("asof_ts"),
            F.last("p_value", ignorenulls=True).over(w).alias("purchase_value"),
        )
        .filter(F.col("is_click") == 1)
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            "prior_purchase_id",
            F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            "purchase_value",
        )
        .orderBy("event_id")
    )


@query(
    "q082_variant_json",
    oracle="""
SELECT CAST(props->>'$.k' AS INT) % 10 AS k_mod,
       COUNT(*) AS n,
       CAST(SUM(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
       MIN(CAST(props->>'$.k' AS INT)) AS min_k,
       MAX(CAST(props->>'$.k' AS INT)) AS max_k
FROM events
GROUP BY k_mod
ORDER BY k_mod
""",
    tags=("json", "variant"),
)
def q082_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4's VARIANT type:
    parse_json once into the binary variant encoding, then typed
    variant_get extraction — the engine-native path for JSON columns at
    scale (single parse, no per-access string re-parse the way chained
    get_json_object does; q149 covers the classic functions)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("k_mod")
    )


@query(
    "q042_time_range_frame",
    oracle="""
SELECT event_id,
       user_id,
       COUNT(*) OVER w AS n_last_hour,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER w AS BIGINT) AS errors_last_hour
FROM (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY us
             RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
ORDER BY event_id
""",
    tags=("window", "range", "time"),
)
def q042_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour sliding metrics per user via a time-valued RANGE frame
    (the batch dual of a streaming sliding window, but per-row): frame
    bounds are VALUES of the sort key, so co-timed events share a frame
    regardless of row order — semantics ROWS frames can't express. The
    key is INTEGRAL epoch-microseconds (unix_micros / epoch_us), never
    truncated seconds: events carry fractional-second timestamps, and
    second-truncation (Spark unix_timestamp) vs exact epoch (DuckDB)
    silently disagrees on boundary pairs ~1 hour apart. One shuffle on
    user_id; frame state is a two-pointer scan. q079 covers numeric RANGE
    frames; this is the event-time form (trailing hour = (t-1h, t]).
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3599999999, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).alias("n_last_hour"),
            F.sum((F.col("event_type") == "error").cast("long")).over(w).alias("errors_last_hour"),
        )
        .orderBy("event_id")
    )


@query(
    "q131_rank_distribution",
    oracle="""
SELECT o_custkey,
       o_orderkey,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume,
       NTILE(4) OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
    tags=("window", "rank"),
)
def q131_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / quartile per customer — the remaining
    ranking-family windows (q184 covers lag/lead/rank/ntile/running-sum).
    Both are exact rational values of integer rank counts, so the raw
    doubles hash-match across engines with no rounding."""
    od = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return (
        od.select(
            "o_custkey",
            "o_orderkey",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "q053_variant_nested_paths",
    oracle="""
WITH j AS (
  SELECT event_id,
         '{"meta":{"type":"' || event_type || '","uid":' || CAST(user_id AS VARCHAR)
           || '},"tags":["t' || CAST(user_id % 5 AS VARCHAR) || '","x"],"orig":' || props
           || ',"maybe":null}' AS js
  FROM events WHERE event_id < 3000
)
SELECT event_id,
       js->>'$.meta.type' AS typ,
       CAST(js->>'$.meta.uid' AS BIGINT) AS uid,
       js->>'$.tags[0]' AS tag0,
       CAST(js->>'$.orig.k' AS BIGINT) AS k,
       TRY_CAST(js->>'$.meta' AS INT) AS meta_as_int,
       json_type(js, '$.maybe') = 'NULL' AS maybe_is_null
FROM j ORDER BY event_id
""",
    tags=("json", "variant"),
)
def q053_variant_nested_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deep VARIANT path surface (Spark 4), beyond q082's flat
    aggregation: a nested document (object-in-object, array, an embedded
    pre-existing JSON column, an explicit null) is parse_json'd ONCE into
    the binary variant encoding, then every access is a typed
    variant_get path — nested fields ($.meta.uid), array indexing
    ($.tags[0]), re-exposed embedded JSON ($.orig.k), a type-mismatch
    probed with try_variant_get (object as int → NULL, no error), and
    is_variant_null distinguishing a present-but-null field from a
    missing one. The oracle recomputes everything with DuckDB's
    independent JSON pointer/TRY_CAST machinery."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    js = F.concat(
        F.lit('{"meta":{"type":"'),
        F.col("event_type"),
        F.lit('","uid":'),
        F.col("user_id").cast("string"),
        F.lit('},"tags":["t'),
        (F.col("user_id") % 5).cast("string"),
        F.lit('","x"],"orig":'),
        F.col("props"),
        F.lit(',"maybe":null}'),
    )
    v = F.parse_json(js)
    return (
        ev.select("event_id", v.alias("v"))
        .select(
            "event_id",
            F.variant_get(F.col("v"), "$.meta.type", "string").alias("typ"),
            F.variant_get(F.col("v"), "$.meta.uid", "long").alias("uid"),
            F.variant_get(F.col("v"), "$.tags[0]", "string").alias("tag0"),
            F.variant_get(F.col("v"), "$.orig.k", "long").alias("k"),
            F.try_variant_get(F.col("v"), "$.meta", "int").alias("meta_as_int"),
            F.is_variant_null(F.variant_get(F.col("v"), "$.maybe", "variant")).alias(
                "maybe_is_null"
            ),
        )
        .orderBy("event_id")
    )


@query(
    "q012_sql_text_interface",
    oracle="""
SELECT n_name,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n_name, order_year
ORDER BY n_name, order_year
""",
    tags=("sql-text", "join", "agg"),
)
def q012_sql_text_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The textual-SQL front door: the whole query is a spark.sql() string
    over registered views — the surface a user migrating off the
    reference's BigQuery layer actually types. Catalyst produces the same
    plan as the DataFrame API (broadcast dims, partial aggs, pushdown),
    proving SQL-text and DataFrame users get identical semantics AND
    identical physical strategies."""
    from warcraider_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(f"""
        SELECT n_name,
               CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
               COUNT(*) AS n_orders,
               -- integer-cents sum: bit-exact under any summation order
               -- (ROUND(SUM(double),2) drifts at cent boundaries) and
               -- floor(x+0.5), not round(): engine round() half-cases
               -- diverge; floor of the identical double is deterministic
               SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS revenue_cents
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY n_name, order_year
        ORDER BY n_name, order_year
    """)


@query(
    "q075_unpivot_measures",
    oracle="""
SELECT l_orderkey, l_linenumber, measure, ROUND(val, 6) + 0.0 AS val
FROM (
  SELECT l_orderkey, l_linenumber,
         CAST(l_quantity AS DOUBLE) AS l_quantity,
         CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
         CAST(l_discount AS DOUBLE) AS l_discount,
         CAST(l_tax AS DOUBLE) AS l_tax
  FROM lineitem WHERE l_orderkey < 100
)
UNPIVOT (val FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax))
ORDER BY l_orderkey, l_linenumber, measure
""",
    tags=("relational", "unpivot"),
)
def q075_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) of the lineitem measures — the inverse of
    q003's pivot and the normalization step feeding generic metric
    pipelines. Narrow-to-long is a per-row Generate (no shuffle, no UDF);
    the only exchange is the presentation sort."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    wide = li.select(
        "l_orderkey",
        "l_linenumber",
        *[
            F.col(c).cast("double").alias(c)
            for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        ],
    )
    return (
        wide.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            "measure",
            "raw_val",
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "measure",
            (F.round("raw_val", 6) + F.lit(0.0)).alias("val"),
        )
        .orderBy("l_orderkey", "l_linenumber", "measure")
    )


# ---------------------------------------------------------------------------
# Binned interval join (pure range predicate, no equi key)
# ---------------------------------------------------------------------------

_IVL_BIN_US = 3_600_000_000  # 1 hour, ≈ the median interval length
_IVL_BASE_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC


@query(
    "q092_interval_bin_join",
    oracle=f"""
WITH ivl AS (
  SELECT i AS interval_id,
         {_IVL_BASE_US} + i * 25200000000 AS lo_us,
         {_IVL_BASE_US} + i * 25200000000 + (3 + i % 5) * 3600000000 AS hi_us
  FROM (SELECT unnest(generate_series(0, 99)) AS i)
),
ev AS (
  SELECT epoch_us(ts) AS us, CAST(round(value * 100) AS BIGINT) AS cents FROM events
),
hit AS (
  SELECT interval_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(cents) AS BIGINT) AS sum_cents
  FROM ivl JOIN ev ON ev.us >= ivl.lo_us AND ev.us < ivl.hi_us
  GROUP BY interval_id
)
SELECT i.interval_id,
       CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(h.sum_cents, 0) AS BIGINT) AS sum_cents
FROM ivl i LEFT JOIN hit h USING (interval_id)
ORDER BY interval_id
""",
    tags=("join", "interval", "binned"),
)
def q092_interval_bin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure interval join (no equi key): events against 100 variable-length
    [lo, hi) windows, aggregated per window. The naive plan is a
    BroadcastNestedLoopJoin — O(events × intervals) comparisons, a 100 TB
    non-starter the moment the interval table outgrows trivial. This is
    the BINNED rewrite: both sides map to fixed-width time bins (interval
    rows explode into the ≤8 bins they cover; each event lands in exactly
    ONE bin, so every qualifying pair meets exactly once and needs no
    post-join dedup), the join becomes an EQUI join on the bin key, and
    the range predicate is a residual filter. Scales as O(events +
    intervals × len/bin) with a shuffle-free broadcast of the exploded
    interval side; with both sides huge it degrades gracefully to a
    shuffle hash join on the bin key. Timestamps are integral epoch-micros
    on both engines (fractional-second safety)."""
    ivl = (
        spark.range(100)
        .select(
            F.col("id").alias("interval_id"),
            (F.lit(_IVL_BASE_US) + F.col("id") * 25_200_000_000).alias("lo_us"),
            (
                F.lit(_IVL_BASE_US)
                + F.col("id") * 25_200_000_000
                + (F.lit(3) + F.col("id") % 5) * 3_600_000_000
            ).alias("hi_us"),
        )
    )
    ivl_bins = ivl.select(
        "interval_id",
        "lo_us",
        "hi_us",
        F.explode(
            F.sequence(
                F.expr(f"lo_us div {_IVL_BIN_US}"), F.expr(f"(hi_us - 1) div {_IVL_BIN_US}")
            )
        ).alias("bin"),
    )
    ev = load_table(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.expr(f"unix_micros(ts) div {_IVL_BIN_US}").alias("bin"),
    )
    hit = (
        ev.join(
            F.broadcast(ivl_bins),
            (ev.bin == ivl_bins.bin) & (ev.us >= ivl_bins.lo_us) & (ev.us < ivl_bins.hi_us),
        )
        .groupBy("interval_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )
    )
    return (
        ivl.join(F.broadcast(hit), "interval_id", "left")
        .select(
            "interval_id",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.coalesce("sum_cents", F.lit(0)).cast("long").alias("sum_cents"),
        )
        .orderBy("interval_id")
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) layout + data-skipping stats
# ---------------------------------------------------------------------------

_Z_BITS = 8


def _interleave_sql(xb: str, yb: str) -> str:
    return " + ".join(
        f"((({xb} >> {j}) & 1) << {2 * j + 1}) + ((({yb} >> {j}) & 1) << {2 * j})"
        for j in range(_Z_BITS)
    )


@query(
    "q126_zorder_layout",
    oracle=f"""
WITH mx AS (
  SELECT MAX(l_partkey) AS xmax, MAX(l_suppkey) AS ymax FROM lineitem
),
z AS (
  SELECT l_partkey, l_suppkey,
         ({_interleave_sql(f"(l_partkey * {1 << _Z_BITS} // (xmax + 1))",
                           f"(l_suppkey * {1 << _Z_BITS} // (ymax + 1))")}) AS zval
  FROM lineitem CROSS JOIN mx
)
SELECT zval // 256 AS file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
       MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
FROM z
GROUP BY file_id
ORDER BY file_id
""",
    tags=("layout", "zorder"),
)
def q126_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) data layout: bucket two independent columns
    to {_Z_BITS}-bit ranks, interleave the bits into a space-filling-curve
    key, range-partition rows into 'files' by curve position, and emit
    each file's per-column min/max zone map. The payoff the output makes
    visible: BOTH columns' per-file ranges are narrow, so a point/range
    predicate on EITHER column prunes most files at scan time — the
    Delta/Iceberg OPTIMIZE ZORDER technique, expressed as pure integer
    DataFrame ops. At 100 TB the same plan is repartitionByRange(zval) +
    sortWithinPartitions + write; here files are zval-range cells so the
    accounting is hash-exact with no global row numbering (which would
    serialize the corpus through one partition). One broadcast of the
    1-row column maxima, one shuffle for the per-file stats."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    mx = li.agg(F.max("l_partkey").alias("xmax"), F.max("l_suppkey").alias("ymax"))
    withz = li.crossJoin(F.broadcast(mx)).select(
        "l_partkey",
        "l_suppkey",
        F.expr(
            _interleave_sql(
                f"(l_partkey * {1 << _Z_BITS} div (xmax + 1))",
                f"(l_suppkey * {1 << _Z_BITS} div (ymax + 1))",
            )
        ).alias("zval"),
    )
    return (
        withz.groupBy(F.expr("zval div 256").alias("file_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("min_part"),
            F.max("l_partkey").alias("max_part"),
            F.min("l_suppkey").alias("min_supp"),
            F.max("l_suppkey").alias("max_supp"),
        )
        .orderBy("file_id")
    )


@query(
    "q119_key_skew_profile",
    oracle="""
WITH freq AS (
  SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
         CAST(COUNT(*) AS BIGINT) AS distinct_keys,
         CAST(MAX(cnt) AS BIGINT) AS max_cnt
  FROM freq
)
SELECT key, cnt,
       cnt * 1000000 // total_rows AS share_ppm,
       cnt * distinct_keys * 100 // total_rows AS x_mean_pct,
       total_rows, distinct_keys
FROM freq CROSS JOIN tot
ORDER BY cnt DESC, key
LIMIT 20
""",
    tags=("diagnostics", "skew"),
)
def q119_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler — the diagnostic you run BEFORE choosing a
    join strategy at 100 TB: the 20 heaviest values of a prospective
    shuffle key with absolute count, corpus share (ppm), and
    multiple-of-mean percentage (x_mean_pct = 100 → a perfectly uniform
    key; ≫100 → salt it or let AQE split it). Shape: one partial+final
    count on the key, a 1-row broadcast of the global totals, and a
    TakeOrderedAndProject head — the profile costs one shuffle of
    key-cardinality rows regardless of table size."""
    li = load_table(spark, sf_dir, "lineitem")
    freq = li.groupBy(F.col("l_partkey").alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    tot = freq.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("distinct_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    return (
        freq.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "cnt",
            F.expr("cnt * 1000000 div total_rows").alias("share_ppm"),
            F.expr("cnt * distinct_keys * 100 div total_rows").alias("x_mean_pct"),
            "total_rows",
            "distinct_keys",
        )
        .orderBy(F.desc("cnt"), "key")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# SCD2 interval build (change-log → versioned dimension)
# ---------------------------------------------------------------------------

_SCD2_OPEN_US = 253_402_214_400_000_000  # 9999-12-31, the open-interval sentinel


@query(
    "q148_scd2_intervals",
    oracle=f"""
WITH log AS (
  SELECT user_id, event_type AS state, epoch_us(ts) AS us
  FROM events WHERE user_id < 50
),
dedup AS (
  SELECT * FROM (
    SELECT user_id, state, us,
           lag(state) OVER (PARTITION BY user_id ORDER BY us, state) AS prev_state
    FROM log
  ) WHERE prev_state IS NULL OR state <> prev_state
),
v AS (
  SELECT user_id, state, us AS valid_from_us,
         COALESCE(lead(us) OVER (PARTITION BY user_id ORDER BY us, state),
                  {_SCD2_OPEN_US}) AS valid_to_us,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, state) AS version
  FROM dedup
)
SELECT user_id, CAST(version AS BIGINT) AS version, state,
       valid_from_us, valid_to_us
FROM v ORDER BY user_id, version
""",
    tags=("relational", "scd2", "window"),
)
def q148_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (type-2 slowly-changing-dimension) build: compress a change
    log into versioned validity intervals — consecutive rows with an
    unchanged state collapse (only CHANGES open a new version), each
    version spans [its change, the next change), and the current version
    closes at the 9999-12-31 sentinel (kept non-null so the interval
    columns stay int64). The output is what an as-of join (q129) probes.

    Scale shape: ONE shuffle on the entity key serves all three window
    passes (lag-dedup, lead-close, version numbering share the same
    partitioning — Catalyst plans one Exchange, three Window nodes);
    event-time is integral micros on both engines. At 100 TB the change
    log is append-only and the build is incremental per partition-of-
    entities, never global."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    log = ev.filter(F.col("user_id") < 50).select(
        "user_id", F.col("event_type").alias("state"), F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "state")
    dedup = (
        log.withColumn("prev_state", F.lag("state").over(w))
        .filter(F.col("prev_state").isNull() | (F.col("state") != F.col("prev_state")))
        .drop("prev_state")
    )
    return (
        dedup.select(
            "user_id",
            F.row_number().over(w).cast("long").alias("version"),
            "state",
            F.col("us").alias("valid_from_us"),
            F.coalesce(F.lead("us").over(w), F.lit(_SCD2_OPEN_US)).alias("valid_to_us"),
        )
        .orderBy("user_id", "version")
    )


# ---------------------------------------------------------------------------
# Lateral (correlated table subquery) join
# ---------------------------------------------------------------------------


@query(
    "q152_lateral_topk",
    oracle="""
SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
FROM customer c
JOIN LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) o ON TRUE
WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
""",
    tags=("sql-text", "join", "lateral", "topk"),
)
def q152_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    "top-2 orders for each customer" shape a SQL-text user writes
    naturally (the declarative dual of q163's window top-k). Exercises
    Catalyst's lateral-join decorrelation: naively this is one subquery
    execution per outer row; Spark rewrites it into a WindowGroupLimit
    (rank-limit pushed BELOW the shuffle as a partial pass, so each map
    task forwards at most 2 rows per customer) plus one equi-join.

    Scale shape (verified via explain): no nested-loop, no per-row
    re-execution — the orders side is pre-pruned map-side to ≤2 rows per
    key before its single hash shuffle, and the customer side joins by
    broadcast. Values are raw parquet doubles (no arithmetic), so the
    hash is engine-exact."""
    from warcraider_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
        FROM customer c
        JOIN LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) o
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
    """)


# ---------------------------------------------------------------------------
# Quantified comparison subqueries (ANY / ALL)
# ---------------------------------------------------------------------------


@query(
    "q169_quantified_subqueries",
    oracle="""
SELECT c_mktsegment,
       CAST(SUM(CASE WHEN c_acctbal > ALL (
         SELECT AVG(c_acctbal) FROM customer GROUP BY c_nationkey
       ) THEN 1 ELSE 0 END) AS BIGINT) AS n_above_all,
       CAST(SUM(CASE WHEN c_acctbal < ANY (
         SELECT AVG(c_acctbal) FROM customer GROUP BY c_nationkey
       ) THEN 1 ELSE 0 END) AS BIGINT) AS n_below_any
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    tags=("relational", "subquery"),
)
def q169_quantified_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparison subqueries: per segment, customers whose
    balance beats ALL per-nation averages / trails ANY of them.

    Spark has no `> ALL` parser surface, so this implements the standard
    Catalyst-style rewrite explicitly: `x > ALL (S)` ⇔ `x > max(S)` and
    `x < ANY (S)` ⇔ `x < max(S)` for a non-empty NULL-free S — the
    per-nation average set is aggregated to one broadcast row, so the
    quantified predicate costs one scalar join, not |S| probes per row.
    The DuckDB oracle runs the literal ANSI ALL/ANY forms, so the rewrite
    is verified against the real quantifier semantics.
    """
    cust = load_table(spark, sf_dir, "customer")
    nat_avgs = cust.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("nav"))
    bounds = nat_avgs.agg(F.max("nav").alias("max_nav"))
    return (
        cust.join(F.broadcast(bounds))
        .groupBy("c_mktsegment")
        .agg(
            F.sum(F.when(F.col("c_acctbal") > F.col("max_nav"), 1).otherwise(0)).alias(
                "n_above_all"
            ),
            F.sum(F.when(F.col("c_acctbal") < F.col("max_nav"), 1).otherwise(0)).alias(
                "n_below_any"
            ),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# explode_outer (null-preserving lateral view)
# ---------------------------------------------------------------------------


@query(
    "q103_explode_outer",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text, ' '), '[\\s\\v]+'), t -> length(t) > 8)
           AS longs
  FROM documents
)
SELECT doc_id,
       CAST(len(longs) AS BIGINT) AS n_long,
       CAST(CASE WHEN len(longs) = 0 THEN 1 ELSE 0 END AS BIGINT) AS exploded_as_null
FROM toks
""",
    tags=("relational", "explode", "null"),
)
def q103_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``explode_outer``: rows whose array is empty survive the lateral
    view as a single NULL element instead of vanishing (plain explode
    drops them — silently losing every short document). Counting
    non-null exploded tokens per doc and flagging the null-row docs
    reconstructs exactly the filter-side truth the oracle computes
    WITHOUT exploding, so the null-preserving semantics are verified.
    """
    docs = load_table(spark, sf_dir, "documents")
    longs = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda t: F.length(t) > 8
    )
    return (
        docs.select("doc_id", F.explode_outer(longs).alias("tok"))
        .groupBy("doc_id")
        .agg(
            F.count("tok").alias("n_long"),
            F.max(F.when(F.col("tok").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("exploded_as_null"),
        )
    )


# ---------------------------------------------------------------------------
# df.stat.crosstab (contingency table)
# ---------------------------------------------------------------------------


@query(
    "q170_crosstab",
    oracle="""
SELECT source AS source_lang,
       CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
       CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
       CAST(SUM(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
       CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
       CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
FROM documents
GROUP BY source
ORDER BY source
""",
    tags=("relational", "stat", "pivot"),
)
def q170_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table via ``df.stat.crosstab`` — the DataFrameStatFunctions
    surface (backed by the same two-phase pivot-count plan as
    groupBy().pivot().count()). The oracle is independent conditional
    aggregation over the closed 5-value lang contract; a corpus missing
    some lang entirely (r8 adversarial sweep) still yields the full
    stable schema — absent columns are zero-filled driver-side from the
    already-computed crosstab, no extra job.
    """
    docs = load_table(spark, sf_dir, "documents")
    ct = docs.stat.crosstab("source", "lang")
    have = set(ct.columns)
    return ct.select(
        "source_lang",
        *[
            (F.col(c) if c in have else F.lit(0).cast("bigint")).alias(c)
            for c in ("de", "en", "es", "fr", "zh")
        ],
    ).orderBy("source_lang")


# ---------------------------------------------------------------------------
# TPC-H-shaped correlated-subquery batch (Q4 / Q19 / Q21 / Q22 analogs,
# adapted to the synthetic schema: no commitdate/receiptdate/phone, so the
# "late" marker is l_returnflag='R' and the country code is custkey-derived)
# ---------------------------------------------------------------------------


@query(
    "q173_order_priority_exists",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("relational", "tpch", "subquery"),
)
def q173_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one line shipped after the
    order date, counted by priority. The correlated EXISTS with a
    NON-equi conjunct (l_shipdate > o_orderdate) decorrelates to a
    LeftSemi hash join on the equi key with the range residual evaluated
    in the join — one shuffle pair, no per-order probe."""
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        od.join(
            li,
            (od.o_orderkey == li.l_orderkey) & (li.l_shipdate > od.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q175_disjunctive_part_join",
    oracle=f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), {RD}) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 5  AND 25)
   OR (p_brand = 'Brand#17' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
   OR (p_type  = 'ECONOMY'  AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
""",
    tags=("relational", "tpch", "join"),
)
def q175_disjunctive_part_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: a disjunction of brand/size/quantity envelopes
    over a part⋈lineitem join. The planner must still extract the common
    equi key (l_partkey = p_partkey) and run a hash join with the OR-of-
    ANDs as a residual filter — the naive reading (join condition is a
    disjunction → nested loop) would be quadratic at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    q, sz, br, ty = F.col("l_quantity"), F.col("p_size"), F.col("p_brand"), F.col("p_type")
    cond = (
        ((br == "Brand#2") & sz.between(1, 15) & q.between(5, 25))
        | ((br == "Brand#17") & sz.between(10, 30) & q.between(10, 40))
        | ((ty == "ECONOMY") & sz.between(20, 50) & q.between(20, 50))
    )
    return (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), RD).alias(
                "revenue"
            ),
        )
    )


@query(
    "q176_waiting_suppliers",
    oracle="""
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    tags=("relational", "tpch", "subquery"),
)
def q176_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: 'kept waiting' = the sole R-flagged
    supplier in a multi-supplier order): one correlated EXISTS and one
    correlated NOT EXISTS, both with a non-equality conjunct
    (l2.suppkey <> l1.suppkey). Decorrelates to LeftSemi + LeftAnti hash
    joins that REUSE the l_orderkey partitioning, then a broadcast
    supplier join and TakeOrdered top-20 — no per-row subquery probes."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    )
    waiting = (
        l1.join(l2, (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")), "left_semi")
        .join(l3, (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")), "left_anti")
    )
    return (
        waiting.join(F.broadcast(sup), waiting.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "q177_dormant_rich_customers",
    oracle="""
WITH eligible AS (
  SELECT c_custkey, c_acctbal, CAST(c_custkey % 7 AS VARCHAR) AS cntrycode
  FROM customer WHERE c_custkey % 7 IN (1, 3, 5)
),
cutoff AS (SELECT AVG(c_acctbal) AS avg_bal FROM eligible WHERE c_acctbal > 0)
SELECT cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM eligible, cutoff
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_custkey % 3 <> 0)
GROUP BY cntrycode
ORDER BY cntrycode
""",
    tags=("relational", "tpch", "subquery"),
    min_rows=1,
)
def q177_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (country code derived from custkey — the synthetic
    schema has no phone column): above-average-balance customers in
    selected codes with NO orders. Composition of a scalar aggregate
    subquery (1-row broadcast), a NOT EXISTS (LeftAnti hash join on
    o_custkey), and the final rollup — the classic three-subquery-forms-
    in-one-query decorrelation test.

    The orders side is restricted to the deterministic o_custkey%3<>0
    subset (mirrored in the oracle) so some eligible customers are
    genuinely orderless at every SF: the synthetic generator gives EVERY
    customer an order, which made the original NOT EXISTS vacuously
    empty-vs-empty at verify SF (ADVICE r2 #1) — the anti-join logic
    was never exercised on data. min_rows=1 guards the class."""
    cust = load_table(spark, sf_dir, "customer")
    od = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .filter(F.col("o_custkey") % 3 != 0)
    )
    eligible = cust.filter((F.col("c_custkey") % 7).isin(1, 3, 5)).select(
        "c_custkey",
        "c_acctbal",
        (F.col("c_custkey") % 7).cast("string").alias("cntrycode"),
    )
    cutoff = eligible.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        eligible.join(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(od, eligible.c_custkey == od.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# ANSI-safe try_* functions and Spark 4 collations
# ---------------------------------------------------------------------------


@query(
    "q178_try_functions",
    oracle=f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN o_custkey % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null,
       ROUND(SUM(o_totalprice / NULLIF(o_custkey % 5, 0)), {RD}) AS sum_div,
       CAST(SUM(CASE WHEN o_custkey % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cast_ok,
       CAST(SUM(CASE WHEN len(string_split(o_orderpriority, '-')) < 3 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_elem_null
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    tags=("relational", "ansi", "null"),
)
def q178_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe `try_*` family: division by zero, bad casts, and
    out-of-bounds element access produce NULL instead of failing the job
    — the semantics a 100 TB batch needs (one dirty row must not kill an
    8-hour run, and a fail-open `ansi=false` silently corrupts instead).
    The DuckDB oracle reproduces each NULL path with its native guards
    (NULLIF, list bounds), so the null-counting semantics are verified.
    """
    od = load_table(spark, sf_dir, "orders")
    div = F.expr("try_divide(o_totalprice, o_custkey % 5)")
    cast_ok = F.expr(
        "try_cast(CASE WHEN o_custkey % 3 = 0 THEN 'not-a-number' "
        "ELSE CAST(o_custkey AS STRING) END AS INT)"
    )
    elem = F.expr("try_element_at(split(o_orderpriority, '-'), 3)")
    return (
        od.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(div.isNull(), 1).otherwise(0)).alias("n_div_null"),
            F.round(F.sum(div), RD).alias("sum_div"),
            F.sum(F.when(cast_ok.isNotNull(), 1).otherwise(0)).alias("n_cast_ok"),
            F.sum(F.when(elem.isNull(), 1).otherwise(0)).alias("n_elem_null"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q179_collated_grouping",
    oracle="""
WITH mixed AS (
  SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
              ELSE lower(c_mktsegment) END AS seg_mixed
  FROM customer
)
SELECT lower(seg_mixed) AS seg_ci, CAST(COUNT(*) AS BIGINT) AS n
FROM mixed
GROUP BY lower(seg_mixed)
ORDER BY seg_ci
""",
    tags=("relational", "collation", "spark4"),
)
def q179_collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 string collations: case-insensitive grouping via
    ``collate(col, 'UTF8_LCASE')`` — the COLLATION does the bucketing
    (hash and equality are collation-aware all the way through the
    exchange), with lower() only canonicalizing the emitted key. The
    oracle groups by lower() — identical buckets, independent mechanism.
    At scale this beats wrapping every comparison in lower(): the
    collated column keeps its value (no derived column to carry) and
    comparisons stay codegen'd.
    """
    cust = load_table(spark, sf_dir, "customer")
    mixed = cust.select(
        F.when(F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment"))
        .otherwise(F.lower("c_mktsegment"))
        .alias("seg_mixed")
    )
    return (
        mixed.groupBy(F.expr("collate(seg_mixed, 'UTF8_LCASE')").alias("seg_key"))
        .agg(
            F.min(F.lower("seg_mixed")).alias("seg_ci"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("seg_ci", "n")
        .orderBy("seg_ci")
    )
