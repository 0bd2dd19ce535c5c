"""Event-time windowed aggregation with a watermark — the
late-data-tolerant streaming shape the training-data pipeline needs for
ingest monitoring (rows/sec per source over tumbling windows), and the
standard Structured Streaming pattern the reference lacks entirely
(SURVEY.md §2.10: no streaming in the reference).

Watermark semantics: events later than ``watermark`` behind the max
observed event time are dropped and their windows finalized — state
stays bounded no matter how long the stream runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, ts_col: str = "ts",
                    key_col: str = "event_type",
                    window_len: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """events(ts, key, value) → per-window per-key counts + value sum.

    Works identically on a batch DataFrame (for oracle checks) and a
    streaming one (state + watermark) — same declarative plan.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_len).alias("w"), key_col)
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            key_col, "n_events", "sum_value",
        )
    )


def run_windowed_stream(spark: SparkSession, input_dir: str,
                        output_dir: str, checkpoint_dir: str,
                        schema: str,
                        window_len: str = "1 hour",
                        watermark: str = "2 hours"):
    """File-stream variant: drain available input (Trigger.AvailableNow),
    append finalized windows to parquet. Late rows inside the watermark
    update their window before it finalizes; rows later than the
    watermark are dropped — exactly-once per finalized window."""
    events = spark.readStream.schema(schema).parquet(input_dir)
    out = windowed_counts(events, window_len=window_len,
                          watermark=watermark)
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
