"""Skew-partitioning policies: byte-size keying (not digit-count), tail
split semantics, and row preservation under both shuffle modes."""

from pyspark.sql import functions as F

from lexoid_spark.corpus.gen import pages_df
from lexoid_spark.operators.partitioning import (
    _size_col,
    repartition_by_size,
    split_giant_tail,
)
from lexoid_spark.plans.extract import extract


def test_size_col_numeric_passthrough(spark):
    """Regression: F.length on an int column counts decimal digits —
    a precomputed n_bytes column must be used as-is."""
    df = spark.createDataFrame(
        [("a", 1500000), ("b", 999)], "url string, n_bytes long"
    )
    got = df.select(_size_col(df, "n_bytes").alias("s")).collect()
    assert sorted(r["s"] for r in got) == [999, 1500000]
    bdf = spark.createDataFrame([("a", b"xyz")], "url string, html binary")
    assert bdf.select(_size_col(bdf, "html").alias("s")).collect()[0]["s"] == 3


def test_split_giant_tail_preserves_rows_and_spreads(spark):
    pages = pages_df(spark, 40, p_giant=0.1)
    out = split_giant_tail(pages, 8, payload_col="html",
                           threshold_bytes=50_000)
    assert out.count() == 40
    assert sorted(r["url"] for r in out.collect()) == sorted(
        r["url"] for r in pages.collect()
    )
    tail = pages.filter(F.length("html") > 50_000)
    n_tail = tail.count()
    assert n_tail >= 2  # the skew knob produced a giant tail
    spread = (
        split_giant_tail(pages, 8, threshold_bytes=50_000)
        .filter(F.length("html") > 50_000)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert spread >= min(n_tail, 2)  # giants not all in one partition


def test_extract_modes_same_rows(spark):
    pages = pages_df(spark, 30, p_giant=0.1)

    def rows(mode_kw):
        ext = extract(pages, repartition=True, **mode_kw)["extracted"]
        return sorted((r["url"], r["raw"]) for r in ext.collect())

    base = rows({"skew_mode": "tail"})
    assert base == rows({"skew_mode": "range"})
    assert base == rows({"skew_mode": "tail",
                         "giant_threshold_bytes": 10_000})


def test_repartition_by_size_balances_bytes(spark):
    pages = pages_df(spark, 60, p_giant=0.05)
    rep = repartition_by_size(pages.select("url", "html"), 4)
    sizes = (
        rep.select(F.spark_partition_id().alias("p"),
                   F.length("html").alias("b"))
        .groupBy("p").agg(F.sum("b").alias("bytes"))
        .collect()
    )
    assert len(sizes) == 4


def test_z_order_key_matches_reference_interleave(spark):
    from lexoid_spark.operators.partitioning import z_order_key

    df = spark.createDataFrame(
        [(i, (i * 37) % 65536, (i * 101) % 65536) for i in range(64)],
        "id long, a long, b long")
    rows = df.select("a", "b", z_order_key("a", "b").alias("z")).collect()

    def ref(a, b, bits=16):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    for r in rows:
        assert r["z"] == ref(r["a"], r["b"])


def test_cluster_by_z_improves_both_dimension_spans(spark):
    """After Z-order layout, per-partition min/max spans shrink in
    BOTH dimensions vs a one-dimension sort (the point of Morton
    keys: neither dimension's statistics degenerate)."""
    import random

    from pyspark.sql import functions as F

    from lexoid_spark.operators.partitioning import cluster_by_z

    rng = random.Random(7)
    rows = [(i, rng.randrange(4096), rng.randrange(4096))
            for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, a long, b long")

    def spans(frame, col):
        stats = (
            frame.withColumn("p", F.spark_partition_id())
            .groupBy("p").agg((F.max(col) - F.min(col)).alias("s"))
            .collect()
        )
        return sum(r["s"] for r in stats) / len(stats)

    z = cluster_by_z(df, "a", "b", num_partitions=16, bits=12)
    one_dim = df.repartitionByRange(16, "a")
    # a-sorted layout: 'a' spans are tiny but 'b' spans are the full
    # domain; z-order keeps BOTH bounded well below the domain
    assert spans(z, "a") < 4096 * 0.45
    assert spans(z, "b") < 4096 * 0.45
    assert spans(one_dim, "b") > 4096 * 0.8
