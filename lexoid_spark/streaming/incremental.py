"""Incremental extraction via Structured Streaming.

The reference has no streaming (SURVEY.md §2.10); the north rule's
resumability is batch (progress tables, plans/job.py). This module is
the *continuous-ingest* variant the training-data pipeline needs when
the pages table grows over time: ``readStream`` over the landing
directory → the SAME extraction plan → ``writeStream`` with a
checkpoint, giving exactly-once per input file without a progress
table (the stream checkpoint tracks consumed files).

``Trigger.AvailableNow`` drains the backlog and exits — the
batch-friendly mode for cron-style incremental runs; leave
``available_now=False`` for a long-running tail job.

The extraction plan is reused verbatim: ``extract()`` is a pure
DataFrame→DataFrame function, so the batch/streaming split is just the
source and sink (repartition is disabled — streaming microbatches are
already bounded; skew handling happens at file granularity).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from lexoid_spark.corpus.gen import PAGES_SCHEMA_DDL
from lexoid_spark.plans.extract import extract


def incremental_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = 64,
    schema: str = PAGES_SCHEMA_DDL,
):
    """Start (and for available_now=True, run to completion) the
    incremental extraction stream. Returns the StreamingQuery."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_dir)

    # streaming plans cannot shuffle-repartition a file source safely;
    # microbatch size already bounds per-task bytes
    out = extract(pages, run_id="stream", repartition=False)["extracted"]

    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="30 seconds").start()
