"""TableIO parquet-fallback semantics (Iceberg catalog absent here)."""

from lexoid_spark.sources.table_io import TableIO


def test_write_read_roundtrip(spark, tmp_path):
    io = TableIO(spark, str(tmp_path))
    df = spark.range(10).withColumnRenamed("id", "k")
    io.write(df, "t1", mode="overwrite")
    assert io.read("t1").count() == 10
    assert "k" in io.schema_ddl("t1")


def test_append_snapshots(spark, tmp_path):
    io = TableIO(spark, str(tmp_path))
    io.write(spark.range(5), "t2", mode="overwrite")
    io.write(spark.range(3), "t2", mode="append")
    assert io.read("t2").count() == 8
    snaps = io.snapshots("t2")
    assert [s["snapshot_id"] for s in snaps] == [1, 2]
    assert [s["rows"] for s in snaps] == [5, 3]
    assert snaps[1]["operation"] == "append"


def test_partitioned_write(spark, tmp_path):
    from pyspark.sql import functions as F

    io = TableIO(spark, str(tmp_path))
    df = spark.range(20).withColumn("p", F.col("id") % 2)
    io.write(df, "t3", mode="overwrite", partition_by=["p"])
    back = io.read("t3")
    assert back.count() == 20
    assert back.filter("p = 1").count() == 10
    import os
    assert os.path.isdir(str(tmp_path / "t3" / "data" / "p=0"))


def test_overwrite_resets_snapshots(spark, tmp_path):
    io = TableIO(spark, str(tmp_path))
    io.write(spark.range(5), "t4", mode="overwrite")
    io.write(spark.range(5), "t4", mode="append")
    io.write(spark.range(2), "t4", mode="overwrite")
    assert io.read("t4").count() == 2
    snaps = io.snapshots("t4")
    assert len(snaps) == 1 and snaps[0]["rows"] == 2


def test_unconfigured_catalog_falls_back(spark, tmp_path):
    io = TableIO(spark, str(tmp_path), catalog="nope")
    assert io.catalog is None
    io.write(spark.range(1), "t5", mode="overwrite")
    assert io.read("t5").count() == 1


def test_time_travel_read_at(spark, tmp_path):
    from lexoid_spark.sources.table_io import TableIO

    io = TableIO(spark, str(tmp_path))
    io.write(spark.range(0, 3).selectExpr("id"), "tt", mode="overwrite")
    io.write(spark.range(10, 12).selectExpr("id"), "tt", mode="append")
    io.write(spark.range(20, 24).selectExpr("id"), "tt", mode="append")

    assert sorted(r["id"] for r in io.read_at("tt", 1).collect()) == [0, 1, 2]
    assert sorted(r["id"] for r in io.read_at("tt", 2).collect()) == [
        0, 1, 2, 10, 11]
    assert io.read_at("tt", 3).count() == 9 == io.read("tt").count()

    # overwrite resets the visible set for later snapshots
    io.write(spark.range(100, 102).selectExpr("id"), "tt", mode="overwrite")
    assert sorted(r["id"] for r in io.read_at("tt", 1).collect()) == [100, 101]


def test_merge_upsert(spark, tmp_path):
    from lexoid_spark.sources.table_io import TableIO

    io = TableIO(spark, str(tmp_path))
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    io.write(base, "m", mode="overwrite")

    # 2 updates in place, 4 inserts
    io.merge_upsert(spark.createDataFrame(
        [(2, "B"), (4, "d")], "id long, v string"), "m", keys=["id"])
    got = {r["id"]: r["v"] for r in io.read("m").collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}

    snaps = io.snapshots("m")
    assert snaps[-1]["operation"] == "merge"
    assert snaps[-1]["rows"] == 4

    # merge into a missing table behaves like create
    io.merge_upsert(base, "fresh", keys=["id"])
    assert io.read("fresh").count() == 3


def test_merge_upsert_idempotent(spark, tmp_path):
    from lexoid_spark.sources.table_io import TableIO

    io = TableIO(spark, str(tmp_path))
    io.write(spark.createDataFrame([(1, "a")], "id long, v string"),
             "m2", mode="overwrite")
    up = spark.createDataFrame([(1, "z")], "id long, v string")
    io.merge_upsert(up, "m2", keys=["id"])
    io.merge_upsert(up, "m2", keys=["id"])  # replay: same end state
    rows = io.read("m2").collect()
    assert len(rows) == 1 and rows[0]["v"] == "z"


def test_merge_upsert_duplicate_key_batch(spark, tmp_path):
    """A batch carrying the same key twice must upsert exactly ONE row
    (deterministic min-struct keeper) — the parquet fallback must not
    insert both where SQL MERGE would fail."""
    from lexoid_spark.sources.table_io import TableIO

    io = TableIO(spark, str(tmp_path))
    io.write(spark.createDataFrame([(1, "a")], "id long, v string"),
             "dup", mode="overwrite")
    batch = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "m"), (2, "k")], "id long, v string")
    io.merge_upsert(batch, "dup", keys=["id"])
    got = {r["id"]: r["v"] for r in io.read("dup").collect()}
    assert got == {1: "x", 2: "k"}  # min-struct keeper per key


def test_expire_snapshots_trims_history_and_orphans(spark, tmp_path):
    import os

    from lexoid_spark.sources.table_io import TableIO

    io = TableIO(spark, str(tmp_path))
    io.write(spark.range(0, 3), "e", mode="overwrite")
    io.write(spark.range(10, 12), "e", mode="append")
    io.write(spark.range(20, 22), "e", mode="append")
    assert len(io.snapshots("e")) == 3

    # simulate a killed write's leftover: a parquet file no snapshot
    # references (the remove_orphan_files case)
    orphan = os.path.join(str(tmp_path), "e", "data", "orphan-000.parquet")
    spark.range(100, 200).coalesce(1).write.mode("overwrite").parquet(
        orphan + ".dir")
    part = [f for f in os.listdir(orphan + ".dir")
            if f.endswith(".parquet")][0]
    os.rename(os.path.join(orphan + ".dir", part), orphan)
    import shutil
    shutil.rmtree(orphan + ".dir")

    before = sorted(r["id"] for r in io.read("e").collect())
    removed = io.expire_snapshots("e", keep_last=1)
    assert removed >= 1  # at least the orphan went
    assert not os.path.exists(orphan)

    # latest state unchanged; history trimmed to one snapshot that
    # still resolves via read_at
    snaps = io.snapshots("e")
    assert len(snaps) == 1
    # note: read() scans the data dir, so orphan removal is what keeps
    # it consistent with the manifest
    after = sorted(r["id"] for r in io.read("e").collect())
    assert after == [r for r in before if r < 100]
    assert sorted(
        r["id"] for r in io.read_at("e", snaps[0]["snapshot_id"]).collect()
    ) == after


def test_expire_noop_when_history_short(spark, tmp_path):
    from lexoid_spark.sources.table_io import TableIO

    io = TableIO(spark, str(tmp_path))
    io.write(spark.range(3), "s", mode="overwrite")
    assert io.expire_snapshots("s", keep_last=2) == 0
    assert io.read("s").count() == 3


def test_schema_evolution_merge_read(spark, tmp_path):
    from lexoid_spark.sources.table_io import TableIO

    io = TableIO(spark, str(tmp_path))
    io.write(spark.createDataFrame([(1, "a")], "id long, v string"),
             "ev", mode="overwrite")
    # evolved writer adds a column
    io.write(spark.createDataFrame([(2, "b", 9.5)],
                                   "id long, v string, score double"),
             "ev", mode="append")
    merged = io.read("ev", merge_schema=True)
    assert set(merged.columns) == {"id", "v", "score"}
    got = {r["id"]: r["score"] for r in merged.collect()}
    assert got[1] is None and got[2] == 9.5
