"""Incremental extraction via Structured Streaming.

The reference has no streaming (SURVEY.md §2.10); the north rule's
resumability is batch (progress tables, plans/job.py). This module is
the *continuous-ingest* variant the training-data pipeline needs when
the pages table grows over time: ``readStream`` over the landing
directory → the SAME extraction plan → per-microbatch sinks for BOTH
branches.

Sink shape: ``foreachBatch`` writing ``batch=<epoch>/`` directories in
overwrite mode — a replayed microbatch (restart after a mid-batch
kill) overwrites its own directory, so the at-least-once contract of
foreachBatch becomes effectively exactly-once. Crucially the errors
branch is sunk too: documents that fail extraction in continuous-ingest
mode land in ``<errors_dir>/batch=<epoch>/`` exactly as the batch job
persists ``errors/bucket=<b>/`` — they must not silently vanish. The
pre-split ``docs`` frame is persisted per microbatch so the kernels run
once per document, not once per branch.

``Trigger.AvailableNow`` drains the backlog and exits — the
batch-friendly mode for cron-style incremental runs; leave
``available_now=False`` for a long-running tail job.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from lexoid_spark.corpus.gen import PAGES_SCHEMA_DDL
from lexoid_spark.plans.extract import extract


def incremental_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    errors_dir: str | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = 64,
    schema: str = PAGES_SCHEMA_DDL,
):
    """Start (and for available_now=True, run to completion) the
    incremental extraction stream. Returns the StreamingQuery."""
    errors_dir = errors_dir or output_dir.rstrip("/") + "_errors"
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_dir)

    def sink_batch(batch_df, batch_id: int) -> None:
        # streaming plans cannot shuffle-repartition a file source
        # safely; microbatch size already bounds per-task bytes
        out = extract(batch_df, run_id=f"stream-{batch_id}",
                      repartition=False, return_docs=True)
        docs = out["docs"].persist()
        try:
            out["extracted"].write.mode("overwrite").parquet(
                os.path.join(output_dir, f"batch={batch_id}")
            )
            out["errors"].write.mode("overwrite").parquet(
                os.path.join(errors_dir, f"batch={batch_id}")
            )
        finally:
            docs.unpersist()

    writer = (
        pages.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="30 seconds").start()
