"""applyInPandasWithState operator test: first-sighting-per-user filter
over a real micro-batch stream, checked against the batch truth."""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import functions as F

from warcraider_spark.streaming.stateful import streaming_seen_filter
from warcraider_spark.streaming.windows import stream_events
from warcraider_spark.tables import load_table


def test_stateful_seen_filter(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events").select("user_id", "ts")
    staged = os.path.join(tempfile.gettempdir(), f"ev_state_{uuid.uuid4().hex[:8]}")
    ev.write.mode("overwrite").parquet(staged)

    stream = stream_events(spark, staged, ev.schema).select("user_id", "ts")
    out = streaming_seen_filter(stream)
    name = f"seen_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table(name)

    # one emission per user; emitted first_ts == batch-truth min(ts)
    truth = {r.user_id: r.first for r in ev.groupBy("user_id").agg(F.min("ts").alias("first")).collect()}
    rows = got.collect()
    emitted_users = [r.user_id for r in rows]
    assert sorted(set(emitted_users)) == sorted(truth)
    # each user emitted exactly once across all micro-batches
    assert len(emitted_users) == len(set(emitted_users))
    # first_ts matches the global minimum per user (stream is one file here;
    # with maxFilesPerTrigger=8 and a single staged file this is exact)
    for r in rows:
        assert r.first_ts == truth[r.user_id], r


def test_transform_with_state_spend_tracker(spark, sf_smoke):
    """transformWithStateInPandas running-total operator vs batch truth.

    The protobuf control channel is satisfied by the real package when
    installed, else by the vendored mini-runtime (vendor/google/protobuf
    + the PYTHONPATH hand-off in conftest/session.get_spark). Skips only
    if neither can satisfy the import — never expected in this repo."""
    import pytest

    from warcraider_spark.streaming.stateful import (
        streaming_spend_tracker,
        tws_available,
    )

    if not tws_available():
        pytest.skip("no google.protobuf and the vendored shim is missing")

    ev = load_table(spark, sf_smoke, "events").select("user_id", "ts", "value")
    staged = os.path.join(tempfile.gettempdir(), f"ev_tws_{uuid.uuid4().hex[:8]}")
    ev.write.mode("overwrite").parquet(staged)

    stream = stream_events(spark, staged, ev.schema).select("user_id", "value")
    out = streaming_spend_tracker(stream)
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last emission per user must equal the batch truth
    got = {
        r.user_id: (r.total_value, r.n_events)
        for r in spark.table(name).orderBy("n_events").collect()
    }
    truth = {
        r.user_id: (r.total, r.n)
        for r in ev.groupBy("user_id")
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == set(truth)
    for u in truth:
        assert got[u][1] == truth[u][1]
        assert abs(got[u][0] - truth[u][0]) < 1e-6
