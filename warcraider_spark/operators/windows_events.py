"""Event-time window operators over ``events`` (SURVEY §2.10).

The reference has no streaming, but its shape (files arrive → process once
→ exactly-once sink) maps to Structured Streaming; these are the BATCH
duals of the streaming/windows.py operators, oracle-checked against
independent SQL formulations (time_bucket / union-of-offsets /
gaps-and-islands). The streaming variants share the same builders, so a
hash-match here validates the windowing semantics the stream runs with.

Timestamps are emitted as formatted strings so the value hash is
timezone-representation-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from warcraider_spark.registry import ROUND_DIGITS as RD
from warcraider_spark.registry import query
from warcraider_spark.tables import load_table

_FMT = "yyyy-MM-dd HH:mm:ss"
_FMT_SQL = "%Y-%m-%d %H:%M:%S"


def tumbling_counts(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Shared by batch q60 and the streaming variant: 1h tumbling window
    per event_type with count + sum(value)."""
    return (
        events.groupBy(F.window("ts", duration).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), RD).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "q60_tumbling_window",
    oracle=f"""
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{_FMT_SQL}') AS window_start,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), {RD}) AS sum_value
FROM events
GROUP BY window_start, event_type
ORDER BY window_start, event_type
""",
    tags=("streaming", "window", "agg"),
    bench=True,
)
def q60_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time windows (epoch-aligned, so time_bucket is
    the exact dual). The same builder feeds the streaming variant."""
    ev = load_table(spark, sf_dir, "events")
    return tumbling_counts(ev).orderBy("window_start", "event_type")


@query(
    "q61_sliding_window",
    oracle=f"""
WITH assigned AS (
  SELECT strftime(time_bucket(INTERVAL '30 minutes', ts), '{_FMT_SQL}') AS window_start, value FROM events
  UNION ALL
  SELECT strftime(time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', '{_FMT_SQL}') AS window_start, value FROM events
)
SELECT window_start, COUNT(*) AS n, ROUND(SUM(value), {RD}) AS sum_value
FROM assigned
GROUP BY window_start
ORDER BY window_start
""",
    tags=("streaming", "window", "agg"),
)
def q61_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min: each event lands in exactly two
    windows — the oracle materializes that as a union of two offset
    bucketings."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), RD).alias("sum_value"))
        .select(F.date_format("w.start", _FMT).alias("window_start"), "n", "sum_value")
        .orderBy("window_start")
    )


@query(
    "q62_session_window",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL '30 minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM ordered
)
SELECT user_id,
       strftime(MIN(ts), '{_FMT_SQL}') AS session_start,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
    tags=("streaming", "window", "session"),
)
def q62_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) via Spark's session_window, verified
    against an independent gaps-and-islands SQL formulation — the two
    derivations agreeing pins the merge semantics."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", _FMT).alias("session_start"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "q63_watermark_semantics",
    oracle=None,  # streaming-only semantics: rows-only check
    tags=("streaming", "watermark"),
)
def q63_watermark_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark + late-data accounting, run through a REAL structured
    stream: the events table is replayed as a file stream with a 1-hour
    watermark; results come from the streaming engine itself (not a batch
    rewrite), so the driver's rows-check certifies the streaming path runs.
    """
    from warcraider_spark.streaming.windows import replay_events_stream

    return replay_events_stream(spark, sf_dir, watermark="1 hour")


@query(
    "q64_stream_static_enrich",
    oracle=f"""
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{_FMT_SQL}') AS window_start,
       COALESCE(c_mktsegment, 'unknown') AS segment,
       COUNT(*) AS n,
       ROUND(SUM(value), {RD}) AS sum_value
FROM events LEFT JOIN customer ON user_id = c_custkey
GROUP BY window_start, segment
ORDER BY window_start, segment
""",
    tags=("streaming", "join", "window"),
)
def q64_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join run through a REAL structured stream: events
    replayed as a file stream, broadcast-joined per micro-batch to the
    static customer dimension, then watermarked windowed revenue per
    market segment. The oracle is the batch SQL dual — the streaming
    engine must land on the identical final table (complete mode,
    availableNow drains everything, so no rows are watermark-dropped).
    """
    from warcraider_spark.streaming.windows import replay_enriched_stream

    return replay_enriched_stream(spark, sf_dir)
