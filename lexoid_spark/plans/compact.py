"""Small-file compaction for bucketed extraction output.

At 10^12 rows the resumable job's per-bucket writes (plans/job.py)
accumulate many small parquet files — each written by whatever task
count the extraction stage happened to use. Small files are the
classic large-table tax: NameNode/listing pressure, per-file open
cost, undersized row groups that defeat parquet's columnar encoding.

``compact_buckets`` rewrites each bucket directory to
``ceil(bucket_bytes / target_bytes)`` files:

- file sizing is decided from a directory listing (control-plane
  metadata, no data read);
- each bucket is rewritten with ``coalesce(n)`` — coalesce is a
  PARTITION-MERGING transform, no shuffle (repartition would shuffle
  every byte of the corpus just to change file counts);
- the rewrite goes to a temp directory first and is swapped in only
  after success, so a killed compaction never corrupts the bucket
  (same idempotence contract as the extraction job's per-bucket
  overwrite);
- buckets already at or under the target file count are skipped
  without reading any data.

Iceberg analogue: ``rewrite_data_files`` (binpack strategy).
"""

from __future__ import annotations

import math
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class CompactionResult:
    buckets_compacted: list[str]
    buckets_skipped: int
    files_before: int
    files_after: int


def _parquet_files(d: str) -> list[str]:
    return [
        os.path.join(root, fn)
        for root, _, fns in os.walk(d)
        for fn in fns
        if fn.endswith(".parquet")
    ]


def compact_buckets(
    spark: SparkSession,
    table_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> CompactionResult:
    """Compact every ``bucket=*`` child of ``table_dir`` toward
    ``target_bytes`` per file. Returns per-run stats."""
    buckets = sorted(
        d for d in os.listdir(table_dir)
        if d.startswith("bucket=")
        and os.path.isdir(os.path.join(table_dir, d))
    )
    done: list[str] = []
    skipped = 0
    files_before = 0
    files_after = 0
    for b in buckets:
        bdir = os.path.join(table_dir, b)
        files = _parquet_files(bdir)
        files_before += len(files)
        total = sum(os.path.getsize(f) for f in files)
        n_target = max(1, math.ceil(total / target_bytes))
        if len(files) < min_files_to_compact or len(files) <= n_target:
            skipped += 1
            files_after += len(files)
            continue
        tmp = bdir + ".compact-tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        (
            spark.read.parquet(bdir)
            .coalesce(n_target)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        shutil.rmtree(bdir)
        os.rename(tmp, bdir)
        files_after += len(_parquet_files(bdir))
        done.append(b)
    return CompactionResult(
        buckets_compacted=done,
        buckets_skipped=skipped,
        files_before=files_before,
        files_after=files_after,
    )
