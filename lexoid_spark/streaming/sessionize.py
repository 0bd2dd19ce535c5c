"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The windowed aggregation (streaming/windowed.py) covers everything
expressible as watermark + groupBy; per-user SESSIONS (split when the
gap between consecutive events exceeds ``gap_sec``) need arbitrary
per-key state — the canonical ``applyInPandasWithState`` use case the
training-data pipeline hits when sessionizing interaction logs. The
reference has no streaming at all (SURVEY.md §2.10).

State per user: (start_sec, last_sec, n_events) of the OPEN session.
Each microbatch sorts its events, extends or closes sessions, emits
CLOSED sessions (append mode) and carries the open one in state across
batches — so a session spanning many microbatches closes exactly once,
when an event finally lands more than ``gap_sec`` after it. State is
one tiny tuple per active user: bounded regardless of stream length.

The same algorithm over a static DataFrame (``sessionize_batch``) is
the oracle twin: lag-window gap splits, the classic batch
sessionization the ``events_sessions`` driver query uses.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = ("user_id long, start_sec long, end_sec long, "
              "n_events long")
STATE_DDL = "start_sec long, last_sec long, n_events long"


def _sessionize_fn(gap_sec: int):
    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        closed = []
        for t in sorted(batch["ts"]):
            tsec = int(pd.Timestamp(t).value // 1_000_000_000)
            if last is None:
                start, last, n = tsec, tsec, 1
            elif tsec - last > gap_sec:
                closed.append((user, start, last, n))
                start, last, n = tsec, tsec, 1
            else:
                last = max(last, tsec)
                n += 1
        state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "start_sec", "end_sec", "n_events"],
            )

    return fn


def sessionize_stream(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Streaming events(user_id, ts, ...) → closed sessions."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_sec),
            outputStructType=OUTPUT_DDL,
            stateStructType=STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Batch twin (lag-window gap split) — closed sessions only, i.e.
    every session except each user's LAST one, mirroring what the
    streaming form emits while the final session is still open."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    sec = F.unix_timestamp("ts")
    sess = (
        events.select("user_id", "ts")
        .withColumn("_gap", sec - F.lag(sec).over(w))
        .withColumn(
            "_new", F.when(
                F.col("_gap").isNull() | (F.col("_gap") > gap_sec), 1
            ).otherwise(0),
        )
        .withColumn("_sid", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "_sid")
        .agg(
            F.min(sec).alias("start_sec"),
            F.max(sec).alias("end_sec"),
            F.count("*").alias("n_events"),
        )
    )
    last_sid = sess.groupBy("user_id").agg(F.max("_sid").alias("_last"))
    return (
        sess.join(last_sid, "user_id")
        .filter(F.col("_sid") != F.col("_last"))
        .select("user_id", "start_sec", "end_sec", "n_events")
    )


def run_sessionize_stream(spark, input_dir: str, output_dir: str,
                          checkpoint_dir: str, schema: str,
                          gap_sec: int = 1800):
    """Drain available input (Trigger.AvailableNow), append closed
    sessions to parquet. State carries open sessions across restarts
    via the checkpoint."""
    events = spark.readStream.schema(schema).parquet(input_dir)
    out = sessionize_stream(events, gap_sec=gap_sec)
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
