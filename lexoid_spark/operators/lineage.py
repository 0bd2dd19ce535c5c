"""Per-partition lineage rows (north_rule D7 / SURVEY.md A10).

A ``mapInPandas`` side-pass over any stage's output: one metrics row per
physical partition — (run_id, partition_id, n_docs, n_bytes, n_errors,
wall_ms). Written to the ``lineage`` sink so a 1000-executor run leaves
an auditable per-partition trail and stragglers are measurable.
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

LINEAGE_SCHEMA = T.StructType([
    T.StructField("partition_id", T.IntegerType()),
    T.StructField("n_docs", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("n_errors", T.LongType()),
    T.StructField("wall_ms", T.LongType()),
])


def lineage_rows(df: DataFrame, run_id: str,
                 bytes_col: str = "n_chars",
                 error_col: str = "error") -> DataFrame:
    """Aggregate df into one lineage row per physical partition."""
    has_bytes = bytes_col in df.columns
    has_err = error_col in df.columns

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.monotonic()
        n_docs = 0
        n_bytes = 0
        n_errors = 0
        for b in batches:
            n_docs += len(b)
            if has_bytes:
                n_bytes += int(b[bytes_col].fillna(0).sum())
            if has_err:
                n_errors += int(b[error_col].notna().sum())
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        yield pd.DataFrame({
            "partition_id": [pid],
            "n_docs": [n_docs],
            "n_bytes": [n_bytes],
            "n_errors": [n_errors],
            "wall_ms": [int((time.monotonic() - t0) * 1000)],
        })

    return (
        df.mapInPandas(emit, LINEAGE_SCHEMA)
        .withColumn("run_id", F.lit(run_id))
        .withColumn("ts", F.current_timestamp())
    )
