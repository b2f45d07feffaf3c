"""Edge-case coverage for the q129 as-of join composition that the driver
corpus can't exercise: same-instant click/purchase (inclusive match),
users with no purchases at all (left semantics), clicks before any
purchase, and purchase ties at the same timestamp (deterministic
tie-break). DuckDB's native ASOF LEFT JOIN is the semantics oracle where
its semantics are defined; the purchase-tie case (ambiguous in both
engines) is pinned to our documented rule instead: max event_id wins."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.window import Window

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _asof_spark(spark, pdf: pd.DataFrame):
    """The exact q129 composition, applied to an arbitrary events frame."""
    ev = spark.createDataFrame(pdf)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(1).alias("is_click"),
        F.lit(None).cast("long").alias("p_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(0).alias("is_click"),
        F.col("event_id").alias("p_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return {
        (r.event_id, r.prior)
        for r in clicks.unionByName(purchases)
        .select(
            "event_id",
            "is_click",
            F.last("p_id", ignorenulls=True).over(w).alias("prior"),
        )
        .filter(F.col("is_click") == 1)
        .collect()
    }


def _events(rows):
    return pd.DataFrame(
        [
            {
                "event_id": eid,
                "user_id": uid,
                "ts": T0 + dt.timedelta(seconds=s),
                "event_type": typ,
            }
            for eid, uid, s, typ in rows
        ]
    )


def test_asof_edges_match_duckdb(spark):
    """Same-instant match is inclusive; first click of a user with a later
    purchase gets NULL; a user with no purchases gets NULL on every click."""
    pdf = _events(
        [
            (1, 1, 0, "click"),      # before any purchase -> NULL
            (2, 1, 10, "purchase"),
            (3, 1, 10, "click"),     # same instant as purchase 2 -> 2
            (4, 1, 20, "click"),     # -> 2
            (5, 2, 5, "click"),      # user 2 has no purchases -> NULL
            (6, 3, 1, "purchase"),
            (7, 3, 2, "purchase"),
            (8, 3, 3, "click"),      # latest prior -> 7
        ]
    )
    got = _asof_spark(spark, pdf)

    con = duckdb.connect()
    con.register("events", pdf)
    want = {
        tuple(r)
        for r in con.execute(
            """
            SELECT c.event_id, p.event_id
            FROM (SELECT * FROM events WHERE event_type='click') c
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='purchase') p
              ON c.user_id = p.user_id AND c.ts >= p.ts
            """
        ).fetchall()
    }
    assert got == want
    assert got == {(1, None), (3, 2), (4, 2), (5, None), (8, 7)}


def test_asof_purchase_tie_is_deterministic(spark):
    """Two purchases at the identical (user, ts): ASOF is ambiguous in any
    engine, so the operator pins its own rule — max event_id wins — and
    must return it on every run regardless of partitioning."""
    pdf = _events(
        [
            (10, 1, 0, "purchase"),
            (11, 1, 0, "purchase"),  # tie with 10
            (12, 1, 5, "click"),
        ]
    )
    for _ in range(3):
        assert _asof_spark(spark, pdf) == {(12, 11)}
