"""Mergeable-sketch aggregates (Apache DataSketches via Spark 4 built-ins):
Theta distinct-count + set algebra, HLL rollups, KLL quantiles.

Why these are first-class at 100 TB: a sketch is a bounded-size partial
aggregate that re-aggregates — per-partition sketches merge map-side, per-
day sketches merge into months WITHOUT re-scanning raw data, and Theta
sketches support set algebra (union/intersection/difference) on the
sketches themselves. COUNT(DISTINCT) at scale forces one shuffle of every
distinct value per re-grouping; sketch columns turn that into kilobytes.
This replaces the reference's BigQuery-side APPROX_COUNT_DISTINCT analytics
(SURVEY §2.11 approx-agg family; q109 covers approx_count_distinct itself).

Oracle strategy: below their configured capacity (theta/HLL default
k=4096 entries / lgK=12) DataSketches estimators are in EXACT mode — the
estimate is definitionally the retained-value count. The queries bound key
cardinality (user_id % 300) so the oracle can pin the estimates against
DuckDB COUNT(DISTINCT) *exactly*, proving the sketch path end-to-end;
beyond capacity the same plan degrades gracefully to ±1.6% error. KLL
compaction is randomized, so the quantile query is rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warcraider_spark.functions.textfn import md5_int, tokens
from warcraider_spark.registry import query
from warcraider_spark.tables import load_table

_KEY_MOD = 300  # bounds distinct-key cardinality → sketches stay exact


def _keyed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_type",
        (F.col("user_id") % _KEY_MOD).cast("long").alias("k"),
        "value",
    )


@query(
    "q049_sketch_distinct_rollup",
    oracle=f"""
WITH d AS (SELECT event_type, CAST(user_id % {_KEY_MOD} AS BIGINT) AS k FROM events)
SELECT event_type, COUNT(DISTINCT k) AS theta_users, COUNT(DISTINCT k) AS hll_users
FROM d GROUP BY event_type
UNION ALL
SELECT 'ALL' AS event_type, COUNT(DISTINCT k) AS theta_users, COUNT(DISTINCT k) AS hll_users
FROM d
ORDER BY event_type
""",
    tags=("sketch", "approx", "distinct"),
)
def q049_sketch_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct counts: per-type Theta AND HLL sketches,
    then the grand total by merging the PER-TYPE SKETCHES (theta_union_agg /
    hll_union_agg) — never re-scanning events. This two-level shape is the
    scale pattern: daily sketch partitions roll up to any period for the
    cost of a sketch merge."""
    d = _keyed_events(spark, sf_dir)
    per = d.groupBy("event_type").agg(
        F.theta_sketch_agg("k").alias("ts"),
        F.hll_sketch_agg("k").alias("hs"),
    )
    per_rows = per.select(
        "event_type",
        F.theta_sketch_estimate("ts").alias("theta_users"),
        F.hll_sketch_estimate("hs").alias("hll_users"),
    )
    total = per.agg(
        F.theta_sketch_estimate(F.theta_union_agg("ts")).alias("theta_users"),
        F.hll_sketch_estimate(F.hll_union_agg("hs")).alias("hll_users"),
    ).select(F.lit("ALL").alias("event_type"), "theta_users", "hll_users")
    return per_rows.unionAll(total).orderBy("event_type")


@query(
    "q051_sketch_theta_setops",
    oracle=f"""
WITH d AS (SELECT event_type, CAST(user_id % {_KEY_MOD} AS BIGINT) AS k FROM events),
     v AS (SELECT DISTINCT k FROM d WHERE event_type = 'view'),
     p AS (SELECT DISTINCT k FROM d WHERE event_type = 'purchase')
SELECT (SELECT COUNT(*) FROM (SELECT k FROM v UNION SELECT k FROM p)) AS either_users,
       (SELECT COUNT(*) FROM (SELECT k FROM v INTERSECT SELECT k FROM p)) AS both_users,
       (SELECT COUNT(*) FROM (SELECT k FROM v EXCEPT SELECT k FROM p)) AS view_only_users
""",
    tags=("sketch", "approx", "setops"),
)
def q051_sketch_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra on SKETCHES: viewers ∪/∩/∖ purchasers computed
    with theta_union / theta_intersection / theta_difference over two
    pre-built Theta sketches — the raw events are scanned once, then every
    combination is sketch arithmetic. At 100 TB this is how audience-
    overlap matrices are built without an n-way self-join of the fact
    table."""
    d = _keyed_events(spark, sf_dir)
    # conditional aggregation (sketch aggs skip NULLs) → both sketches in
    # ONE scan pass; pivot can't wrap theta_sketch_agg (its lgNomEntries
    # argument must stay a literal)
    sketches = d.agg(
        F.theta_sketch_agg(F.when(F.col("event_type") == "view", F.col("k"))).alias("view"),
        F.theta_sketch_agg(F.when(F.col("event_type") == "purchase", F.col("k"))).alias("purchase"),
    )
    return sketches.select(
        F.theta_sketch_estimate(F.theta_union(F.col("view"), F.col("purchase"))).alias(
            "either_users"
        ),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("view"), F.col("purchase"))
        ).alias("both_users"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("view"), F.col("purchase"))
        ).alias("view_only_users"),
    )


_KLL_SLACK = 0.10  # ~4x the published k=200 99%-confidence rank error


def _kll_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _keyed_events(spark, sf_dir)
    return d.filter(F.col("event_type").isin("view", "purchase")).select(
        "event_type", "value"
    )


def kll_event_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q107's sketch pass, factored so tests can tighten the screw: the
    3-row (view / purchase / merged view+purchase) estimate table with
    exact n, the p50/p95 quantile estimates, and the rank estimate of
    the literal value 50.0."""
    d = _keyed_events(spark, sf_dir)
    vp = _kll_events(spark, sf_dir)
    per = vp.groupBy("event_type").agg(F.kll_sketch_agg_double("value").alias("ks"))
    # kll_sketch_merge_* is the SCALAR two-sketch merge (no merge-agg exists
    # for KLL): build view+purchase sketches in one conditional-agg pass,
    # merge them into a combined sketch — the cross-partition rollup shape
    merged = d.agg(
        F.kll_sketch_agg_double(
            F.when(F.col("event_type") == "view", F.col("value"))
        ).alias("kv"),
        F.kll_sketch_agg_double(
            F.when(F.col("event_type") == "purchase", F.col("value"))
        ).alias("kp"),
    ).select(
        F.lit("view+purchase").alias("event_type"),
        F.kll_sketch_merge_double("kv", "kp").alias("ks"),
    )
    return per.unionAll(merged).select(
        "event_type",
        F.kll_sketch_get_n_double("ks").alias("n"),
        F.kll_sketch_get_quantile_double("ks", F.lit(0.5)).alias("p50v"),
        F.kll_sketch_get_quantile_double("ks", F.lit(0.95)).alias("p95v"),
        F.kll_sketch_get_rank_double("ks", F.lit(50.0)).alias("r50"),
    )


@query(
    "q107_sketch_kll_quantiles",
    oracle="""
WITH e AS (
  SELECT event_type, value FROM events WHERE event_type IN ('view', 'purchase')
),
u AS (
  SELECT event_type, value FROM e
  UNION ALL SELECT 'view+purchase' AS event_type, value FROM e
)
SELECT event_type, CAST(COUNT(value) AS BIGINT) AS n,
       TRUE AS p50_in_bound, TRUE AS p95_in_bound, TRUE AS rank50_in_bound
FROM u GROUP BY event_type ORDER BY event_type
""",
    tags=("sketch", "approx", "quantile"),
)
def q107_sketch_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketches per event_type: mergeable streaming quantiles
    — the bounded-memory alternative to exact percentile's full sort at
    scale; exercises the sketch API family end-to-end (agg → merge →
    get_quantile / get_rank / get_n).

    Certification (VERDICT r7 #3): KLL compaction is RANDOMIZED, so raw
    estimates are run-dependent and never cross engines; the driver
    hash-certifies (a) get_n — exact by the sketch contract — against
    the oracle's COUNT, and (b) DETERMINISTIC-BY-BOUND booleans: each
    estimate's exact rank window, computed in-plan by broadcasting the
    3-row estimate table back over the events, must sit within ±10% of
    the target rank — ~4x the k=200 sketch's published 99%-confidence
    normalized rank error (~2.4% two-sided), so the TRUEs the oracle
    pins hold for every compaction draw with overwhelming margin. The
    p95 UPPER side is the exception (ADVICE r9 #1): 0.95 + 0.10 would
    exceed 1 and never fail, so it is clamped to +4% (lt95 <= 0.99) —
    asymmetric (-10%, +4%), still ~1.7x the sketch error above target. q002
    carries the exact-percentile burden.

    Scale shape: two event scans (sketch pass + verification pass), one
    broadcast of a 3-row-by-construction estimate table (groupBy over
    the two filtered event types + one merged row) — plan-audit
    pair-exempted like the other bounded grand-aggregate broadcasts."""
    est = kll_event_estimates(spark, sf_dir)
    # verification pass: exact rank windows of each estimate, one shuffle
    # ADVICE r9 #1: at p95 a symmetric +s upper slack is VACUOUS
    # (0.95 + 0.10 > 1 and lt95 is a fraction), so the upper side uses
    # an asymmetric clamp: lt95 <= 0.95 + min(s, 0.04) = 0.99 — a real
    # bound (fails when the estimate exceeds the true p99 rank) that
    # the k=200 sketch's ~2.4% 99%-confidence rank error clears with
    # margin, while an estimate pinned at/above the stream max on
    # n > 100 now FAILS instead of passing silently.
    s95u = min(_KLL_SLACK, 0.04)
    vp = _kll_events(spark, sf_dir)
    ev2 = vp.unionAll(
        vp.select(F.lit("view+purchase").alias("event_type"), "value")
    ).filter(F.col("value").isNotNull())
    s = _KLL_SLACK
    j = ev2.join(F.broadcast(est), "event_type")
    return (
        j.groupBy("event_type", "n", "p50v", "p95v", "r50")
        .agg(
            F.avg((F.col("value") < F.col("p50v")).cast("double")).alias("lt50"),
            F.avg((F.col("value") <= F.col("p50v")).cast("double")).alias("le50"),
            F.avg((F.col("value") < F.col("p95v")).cast("double")).alias("lt95"),
            F.avg((F.col("value") <= F.col("p95v")).cast("double")).alias("le95"),
            F.avg((F.col("value") < F.lit(50.0)).cast("double")).alias("ltc"),
            F.avg((F.col("value") <= F.lit(50.0)).cast("double")).alias("lec"),
        )
        .select(
            "event_type",
            "n",
            ((F.col("lt50") <= 0.5 + s) & (F.col("le50") >= 0.5 - s)).alias(
                "p50_in_bound"
            ),
            ((F.col("lt95") <= 0.95 + s95u) & (F.col("le95") >= 0.95 - s)).alias(
                "p95_in_bound"
            ),
            ((F.col("r50") >= F.col("ltc") - s) & (F.col("r50") <= F.col("lec") + s)).alias(
                "rank50_in_bound"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Count-min sketch (frequency estimation over a token stream)
# ---------------------------------------------------------------------------

CMS_D = 4  # depth: independent hash rows
CMS_W = 512  # width: counters per row
# universal-hash family per row over the shared 30-bit token hash
_CMS_AB = ((3, 17), (5, 257), (7, 4099), (11, 65539))


@query(
    "q124_countmin_freq",
    oracle=f"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text, ' '), '[\\s\\v]+')) AS tok FROM documents
),
tokh AS (
  SELECT tok, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % {1 << 30} AS h30
  FROM toks
),
cms AS (
  SELECT row_i, pos, COUNT(*) AS cnt
  FROM (
    SELECT unnest([{", ".join(f"{i}" for i in range(CMS_D))}]) AS row_i,
           unnest([{", ".join(f"({a} * h30 + {b}) % {CMS_W}" for a, b in _CMS_AB)}]) AS pos
    FROM tokh
  )
  GROUP BY row_i, pos
),
probes AS (
  SELECT tok, MIN(h30) AS h30, COUNT(*) AS exact_cnt
  FROM tokh GROUP BY tok HAVING COUNT(*) >= 40
),
est AS (
  SELECT p.tok, p.exact_cnt,
         MIN(c.cnt) AS cm_estimate
  FROM (
    SELECT tok, exact_cnt,
           unnest([{", ".join(f"{i}" for i in range(CMS_D))}]) AS row_i,
           unnest([{", ".join(f"({a} * h30 + {b}) % {CMS_W}" for a, b in _CMS_AB)}]) AS pos
    FROM probes
  ) p JOIN cms c ON c.row_i = p.row_i AND c.pos = p.pos
  GROUP BY p.tok, p.exact_cnt
)
SELECT tok,
       CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(cm_estimate AS BIGINT) AS cm_estimate,
       CAST(cm_estimate - exact_cnt AS BIGINT) AS overestimate
FROM est
ORDER BY tok
""",
    tags=("sketch", "countmin", "llm-pipeline"),
    bench=True,
    min_rows=1,
)
def q124_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream: d=4 hash rows ×
    w=512 counters, probed for every token whose true frequency ≥ 40,
    reporting exact count, CM estimate, and the (always ≥ 0) collision
    overestimate — the oracle hash certifies the one-sided error bound,
    not just "some estimate came back".

    Why CMS at 100 TB: the sketch is a CONSTANT-SIZE (d×w) mergeable
    partial aggregate — per-partition updates combine map-side through
    the same groupBy(row,pos) SUM that merges per-day sketches into
    months without rescanning raw data. Point queries then probe d cells
    against the BROADCAST table instead of shuffling the corpus per key
    (the heavy-hitter twin q016 re-scans; the sketch answers from
    kilobytes). Same one-base-hash universal family as the minhash/bloom
    operators (dedup.py:145) — one md5 per token, d derived positions.
    """
    docs = load_table(spark, sf_dir, "documents")
    tokh = docs.select(F.explode(tokens("text")).alias("tok")).select(
        "tok", (md5_int(F.col("tok")) % (1 << 30)).alias("h30")
    )
    row_pos = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                ((F.lit(a) * F.col("h30") + F.lit(b)) % CMS_W).alias("pos"),
            )
            for i, (a, b) in enumerate(_CMS_AB)
        ]
    )
    cms = (
        tokh.select(F.explode(row_pos).alias("rp"))
        .groupBy(F.col("rp.row_i").alias("row_i"), F.col("rp.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = (
        tokh.groupBy("tok")
        .agg(F.min("h30").alias("h30"), F.count(F.lit(1)).alias("exact_cnt"))
        .filter(F.col("exact_cnt") >= 40)
    )
    est = (
        probes.select("tok", "exact_cnt", F.explode(row_pos).alias("rp"))
        .select("tok", "exact_cnt", F.col("rp.row_i").alias("row_i"), F.col("rp.pos").alias("pos"))
        .join(F.broadcast(cms), ["row_i", "pos"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("cnt").alias("cm_estimate"))
    )
    return est.select(
        "tok",
        F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
        F.col("cm_estimate").cast("bigint").alias("cm_estimate"),
        (F.col("cm_estimate") - F.col("exact_cnt")).cast("bigint").alias("overestimate"),
    ).orderBy("tok")
