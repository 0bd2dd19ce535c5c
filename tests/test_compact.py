"""Small-file compaction (plans/compact.py): fewer files, identical
rows, kill-safe swap."""

import os

from pyspark.sql import functions as F

from lexoid_spark.plans.compact import compact_buckets, _parquet_files


def _write_fragmented(spark, d, bucket, n_rows, n_files):
    (
        spark.range(n_rows)
        .withColumn("v", F.col("id") * 2)
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(os.path.join(d, f"bucket={bucket}"))
    )


def test_compacts_to_fewer_files_same_rows(spark, tmp_path):
    d = str(tmp_path / "extracted")
    _write_fragmented(spark, d, 0, 500, 16)
    _write_fragmented(spark, d, 1, 100, 8)
    before = {
        b: sorted(r["id"] for r in
                  spark.read.parquet(os.path.join(d, f"bucket={b}")).collect())
        for b in (0, 1)
    }
    res = compact_buckets(spark, d, target_bytes=1 << 30)
    assert set(res.buckets_compacted) == {"bucket=0", "bucket=1"}
    assert res.files_after < res.files_before
    for b in (0, 1):
        bdir = os.path.join(d, f"bucket={b}")
        assert len(_parquet_files(bdir)) == 1  # tiny data → one file
        after = sorted(r["id"] for r in spark.read.parquet(bdir).collect())
        assert after == before[b]


def test_skips_already_compact_buckets(spark, tmp_path):
    d = str(tmp_path / "extracted")
    _write_fragmented(spark, d, 0, 50, 1)
    res = compact_buckets(spark, d, target_bytes=1 << 30)
    assert res.buckets_compacted == [] and res.buckets_skipped == 1


def test_no_leftover_tmp_dirs(spark, tmp_path):
    d = str(tmp_path / "extracted")
    _write_fragmented(spark, d, 0, 200, 6)
    compact_buckets(spark, d, target_bytes=1 << 30)
    assert not [x for x in os.listdir(d) if x.endswith(".compact-tmp")]
