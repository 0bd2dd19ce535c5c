"""Custom stateful streaming operator (applyInPandasWithState):
gap-based sessionization with per-user state carried across
microbatches and restarts via the checkpoint."""

import datetime as dt
import os

from pyspark.sql import functions as F

from lexoid_spark.streaming.sessionize import (
    run_sessionize_stream,
    sessionize_batch,
    sessionize_stream,
)

SCHEMA = "user_id long, ts timestamp"
BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows(*specs):
    return [(u, BASE + dt.timedelta(seconds=s)) for u, s in specs]


def test_batch_twin_closed_sessions(spark):
    # user 1: sessions [0..100](3 events), [4000..4010](2) -> first closed
    # user 2: single session -> stays open, nothing closed
    events = spark.createDataFrame(
        _rows((1, 0), (1, 50), (1, 100), (1, 4000), (1, 4010), (2, 7)),
        SCHEMA,
    )
    got = {(r["user_id"], r["start_sec"] % 10**6, r["n_events"])
           for r in sessionize_batch(events, gap_sec=1800).collect()}
    base_sec = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp())
    assert got == {(1, base_sec % 10**6, 3)}


def test_stateful_stream_matches_batch_across_microbatches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = _rows((1, 0), (1, 60), (2, 10))
    batch2 = _rows((1, 5000), (2, 8000), (2, 8030), (1, 5020))

    spark.createDataFrame(batch1, SCHEMA).write.mode("append").parquet(in_dir)
    run_sessionize_stream(spark, in_dir, out_dir, ckpt, SCHEMA,
                          gap_sec=1800)

    # second drop: the checkpointed state closes batch-1 sessions
    spark.createDataFrame(batch2, SCHEMA).write.mode("append").parquet(in_dir)
    run_sessionize_stream(spark, in_dir, out_dir, ckpt, SCHEMA,
                          gap_sec=1800)

    got = spark.read.schema(
        "user_id long, start_sec long, end_sec long, n_events long"
    ).parquet(out_dir)
    all_events = spark.createDataFrame(batch1 + batch2, SCHEMA)
    expected = sessionize_batch(all_events, gap_sec=1800)

    g = {tuple(r) for r in got.collect()}
    e = {tuple(r) for r in expected.collect()}
    assert g == e and len(g) == 2  # one closed session per user


def test_sessionize_stream_is_streaming_plan(spark, tmp_path):
    in_dir = str(tmp_path / "in2")
    spark.createDataFrame(_rows((1, 0)), SCHEMA).write.parquet(in_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    out = sessionize_stream(stream, gap_sec=60)
    assert out.isStreaming
    assert out.columns == ["user_id", "start_sec", "end_sec", "n_events"]
