"""curate_job.py ship test: the dropped/ audit trail must attribute
each excluded id to the stage that dropped it (quality / exact_dedup /
near_dup / sample) — the per-stage audit a corpus release needs."""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_curate_job_dropped_stage_attribution(tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from build_pyfiles import build

    zip_path = build(str(tmp_path / "lexoid_spark.zip"))
    out = str(tmp_path / "out")

    spark_submit = os.path.join(
        os.path.dirname(os.path.abspath(__import__("pyspark").__file__)),
        "bin", "spark-submit",
    )
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    proc = subprocess.run(
        [spark_submit, "--master", "local[2]", "--py-files", zip_path,
         os.path.join(ROOT, "jobs", "curate_job.py"),
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", out,
         "--sample-rates", '{"en": 0.5}', "--near-dup"],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])

    import duckdb
    con = duckdb.connect()
    dropped = con.execute(
        f"SELECT stage, count(*) AS n FROM '{out}/dropped/*.parquet' "
        "GROUP BY stage"
    ).fetchall()
    stages = dict(dropped)
    assert set(stages) <= {"quality", "exact_dedup", "near_dup", "sample"}
    n_kept = con.execute(
        f"SELECT count(*) FROM '{out}/kept/*.parquet'").fetchone()[0]
    # every input row is either kept or attributed to exactly one stage
    assert n_kept + sum(stages.values()) == report["n_in"]
    assert n_kept == report["n_kept"]
    # the sample stage fired (en rate 0.5 < 1.0) and the quality counts
    # line up with the report's stage boundaries
    assert stages.get("quality", 0) == report["n_in"] - report["n_quality"]
    assert (stages.get("exact_dedup", 0) + stages.get("near_dup", 0)
            == report["n_quality"] - report["n_after_dedup"])
    assert stages.get("sample", 0) == report["n_after_dedup"] - report["n_kept"]
