"""Resumable batch extraction job (north_rule: checkpointed progress,
per-partition lineage, resume at partition granularity).

Reference analogue: the benchmark harness's result-cache skip-on-hit
(``tests/benchmark.py:150-181`` in /root/reference) — upgraded to an
exactly-once batch pattern:

  * the corpus is bucketed by ``pmod(xxhash64(url), n_buckets)``;
  * buckets are processed in groups; each completed bucket appends one
    progress row and its output lands under ``extracted/bucket=<b>/``
    (idempotent: re-running a bucket overwrites only its own directory);
  * on restart, ``pending = all buckets ∖ done`` (left anti-join), so a
    killed job resumes with no duplicates and no lost work;
  * each group also appends per-physical-partition lineage rows.

At 10^12 rows the bucket count scales (e.g. 4096) and the group size
matches cluster width; here the defaults are sandbox-sized. Run via::

    spark-submit --py-files dist/lexoid_spark.zip jobs/extract_job.py \
        --input <pages parquet> --output <dir> --run-id r1
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lexoid_spark.operators.lineage import lineage_rows
from lexoid_spark.operators.progress import (
    mark_done,
    pending_buckets,
    with_bucket,
)
from lexoid_spark.plans.extract import extract


@dataclass
class JobResult:
    buckets_done: list[int]
    buckets_skipped: int
    n_docs: int


def warc_pages(spark: SparkSession, input_path: str):
    """Read a parquet table of WARC archive blobs ``(id, data)`` and
    explode it into the pages schema the extraction plan consumes —
    see :func:`lexoid_spark.sources.warc.warc_blobs_to_pages`."""
    from lexoid_spark.sources.warc import warc_blobs_to_pages

    return warc_blobs_to_pages(spark.read.parquet(input_path))


def run_extract_job(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    run_id: str = "run0",
    n_buckets: int = 16,
    group_size: int = 4,
    max_buckets: int | None = None,
    repartition: bool = True,
    pdf_framework: str = "pdfplumber",
    html_main_content: bool = False,
    codec: str | None = None,
    input_format: str = "pages",
) -> JobResult:
    """Process pending buckets; ``max_buckets`` simulates a mid-run kill.

    Layout under ``output_dir``:
      extracted/bucket=<b>/   per-bucket parquet (overwrite = idempotent)
      errors/bucket=<b>/      quarantined docs
      lineage/                append-only per-partition metrics
      progress/               append-only (run_id, bucket, done, n_docs)
    """
    progress_dir = os.path.join(output_dir, "progress")
    lineage_dir = os.path.join(output_dir, "lineage")

    all_pending = pending_buckets(spark, n_buckets, progress_dir, run_id)
    skipped = n_buckets - len(all_pending)
    todo = all_pending if max_buckets is None else all_pending[:max_buckets]

    if input_format == "warc":
        raw_pages, warc_bad = warc_pages(spark, input_path)
        # persist the exploded rows: the blob parse is the expensive
        # mapInPandas, and without a cache every bucket group (and the
        # errors branch within each group) would re-parse EVERY blob —
        # ~2x groups full-corpus parses instead of one
        pages = with_bucket(raw_pages, n_buckets).persist()
        warc_bad = with_bucket(warc_bad, n_buckets).persist()
    else:
        pages = with_bucket(spark.read.parquet(input_path), n_buckets)
        warc_bad = None
    done: list[int] = []
    total_docs = 0

    # ONE write job per group per table via dynamic partition overwrite
    # (a per-bucket filter+write loop is thousands of sequential jobs at
    # the 4096-bucket design point); only the bucket partitions present
    # in the group are replaced, so re-running a bucket stays idempotent.
    # codec: extracted text compresses ~30-40% smaller under zstd than
    # the snappy default — at the 100 TB design point that's the
    # difference worth a CLI knob (CPU cost rides the already-hot write)
    dyn = {"partitionOverwriteMode": "dynamic"}
    if codec:
        dyn["compression"] = codec

    for i in range(0, len(todo), group_size):
        group = todo[i : i + group_size]
        subset = pages.filter(F.col("bucket").isin(group)).drop("bucket")
        out = extract(subset, run_id=run_id, repartition=repartition,
                      pdf_framework=pdf_framework,
                      html_main_content=html_main_content)
        ext = with_bucket(out["extracted"], n_buckets).persist()
        err = with_bucket(out["errors"], n_buckets)
        if warc_bad is not None:
            err = err.unionByName(
                warc_bad.filter(F.col("bucket").isin(group))
                .select(
                    "url", F.lit("warc_ingest").alias("stage"),
                    "error", F.lit(run_id).alias("run_id"), "bucket",
                )
            )

        counts = {
            r["bucket"]: r["n"]
            for r in ext.groupBy("bucket").agg(F.count("*").alias("n")).collect()
        }
        ext.write.mode("overwrite").options(**dyn).partitionBy(
            "bucket"
        ).parquet(os.path.join(output_dir, "extracted"))
        err.write.mode("overwrite").options(**dyn).partitionBy(
            "bucket"
        ).parquet(os.path.join(output_dir, "errors"))
        # lineage after the data writes, partitioned by bucket with the
        # same dynamic overwrite: a killed-and-resumed bucket REPLACES
        # its lineage rows (append-only lineage double-counts replays)
        lineage_rows(ext, run_id, group_col="bucket").write.mode(
            "overwrite"
        ).options(**dyn).partitionBy("bucket").parquet(lineage_dir)

        for b in group:
            mark_done(spark, progress_dir, run_id, b, counts.get(b, 0))
            done.append(b)
            total_docs += counts.get(b, 0)
        ext.unpersist()

    if warc_bad is not None:
        pages.unpersist()
        warc_bad.unpersist()
    return JobResult(buckets_done=done, buckets_skipped=skipped,
                     n_docs=total_docs)


def read_extracted(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_dir, "extracted", "bucket=*"))
