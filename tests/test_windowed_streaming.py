"""Watermarked tumbling-window streaming aggregation: late-data
semantics (in-watermark late rows update, too-late rows drop) and
exactly-once finalized windows across restarts."""

import datetime as dt

from lexoid_spark.streaming.windowed import run_windowed_stream

SCHEMA = "ts timestamp, event_type string, value double"


def _rows(spark, rows):
    return spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, h, m), t, v) for h, m, t, v in rows],
        SCHEMA,
    )


def test_windowed_stream_late_data(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # drop 1: window [10,11) gets 2 events; 13:00 advances the
    # watermark (2h) to 11:00, finalizing [10,11)
    _rows(spark, [
        (10, 0, "click", 1.0), (10, 30, "click", 2.0),
        (13, 0, "view", 5.0),
    ]).write.mode("append").parquet(in_dir)
    run_windowed_stream(spark, in_dir, out_dir, ckpt, SCHEMA)
    got1 = {(r["window_start"], r["event_type"]): r
            for r in spark.read.parquet(out_dir).collect()}
    assert got1[("2024-01-01 10:00:00", "click")]["n_events"] == 2
    # [13,14) not finalized yet
    assert ("2024-01-01 13:00:00", "view") not in got1

    # drop 2: a too-late event for the finalized [10,11) window (must
    # be dropped) + 16:00 advancing the watermark to finalize [13,14)
    _rows(spark, [
        (10, 45, "click", 99.0),       # too late: window finalized
        (16, 0, "click", 1.0),
    ]).write.mode("append").parquet(in_dir)
    run_windowed_stream(spark, in_dir, out_dir, ckpt, SCHEMA)
    got2 = {(r["window_start"], r["event_type"]): r
            for r in spark.read.parquet(out_dir).collect()}

    ten = [r for r in spark.read.parquet(out_dir).collect()
           if r["window_start"] == "2024-01-01 10:00:00"]
    assert len(ten) == 1                      # no duplicate emission
    assert ten[0]["n_events"] == 2            # late row did not sneak in
    assert ten[0]["sum_value"] == 3.0
    assert got2[("2024-01-01 13:00:00", "view")]["n_events"] == 1


def test_exact_dedup_operator(spark):
    from lexoid_spark.functions.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "same  text"),
         (4, "different")],
        "doc_id long, text string",
    )
    # fingerprint normalizes whitespace → 1,2,3 collapse; keeper = min id
    got = {r["doc_id"]: r["n_dups"] for r in
           exact_dedup(df, "doc_id", "text").collect()}
    assert got == {1: 3, 4: 1}
