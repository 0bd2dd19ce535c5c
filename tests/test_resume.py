"""Kill/resume exactness (SURVEY.md §5.2(4), north_rule resumability).

Run the bucketed job, kill it after k buckets (max_buckets=k), resume,
and assert: no bucket processed twice, no progress-row duplicates, and
the final extracted table is byte-identical to a single-shot run.
"""

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from lexoid_spark.corpus.gen import pages_df
from lexoid_spark.operators.progress import pending_buckets, read_progress
from lexoid_spark.plans.extract import extract
from lexoid_spark.plans.job import read_extracted, run_extract_job

N_DOCS = 48
N_BUCKETS = 8

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    pages_df(spark, N_DOCS, p_giant=0.05).write.parquet(p)
    return p


def _canon_rows(df):
    return sorted(
        (r["url"], r["raw"], r["parser_used"]) for r in df.collect()
    )


def test_kill_then_resume_byte_identical(spark, pages_path, tmp_path):
    out = str(tmp_path / "out")

    r1 = run_extract_job(spark, pages_path, out, run_id="r1",
                         n_buckets=N_BUCKETS, group_size=3, max_buckets=3)
    assert len(r1.buckets_done) == 3
    pend = pending_buckets(spark, N_BUCKETS,
                           os.path.join(out, "progress"), "r1")
    assert len(pend) == N_BUCKETS - 3
    assert set(pend).isdisjoint(r1.buckets_done)

    r2 = run_extract_job(spark, pages_path, out, run_id="r1",
                         n_buckets=N_BUCKETS, group_size=3)
    assert r2.buckets_skipped == 3
    assert set(r2.buckets_done) == set(pend)

    prog = read_progress(spark, os.path.join(out, "progress"))
    assert prog.count() == N_BUCKETS
    assert prog.select("bucket").distinct().count() == N_BUCKETS

    resumed = read_extracted(spark, out)
    single = extract(spark.read.parquet(pages_path), run_id="oneshot")[
        "extracted"
    ]
    assert _canon_rows(resumed) == _canon_rows(single)
    assert resumed.count() == resumed.select("url").distinct().count()


def test_rerun_completed_job_is_noop(spark, pages_path, tmp_path):
    out = str(tmp_path / "out2")
    run_extract_job(spark, pages_path, out, run_id="r1", n_buckets=4)
    r = run_extract_job(spark, pages_path, out, run_id="r1", n_buckets=4)
    assert r.buckets_done == [] and r.buckets_skipped == 4
    prog = read_progress(spark, os.path.join(out, "progress"))
    assert prog.count() == 4


def test_lineage_rows_written(spark, pages_path, tmp_path):
    out = str(tmp_path / "out3")
    res = run_extract_job(spark, pages_path, out, run_id="r1", n_buckets=4)
    lin = spark.read.parquet(os.path.join(out, "lineage"))
    assert lin.count() >= 1
    got = lin.agg(F.sum("n_docs")).collect()[0][0]
    assert got == res.n_docs == N_DOCS


def test_spark_submit_py_files_ship(tmp_path):
    """The north_rule ship vehicle end-to-end: build the zip, launch via
    spark-submit --py-files, assert the job completes and reports docs."""
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from build_pyfiles import build

    zip_path = build(str(tmp_path / "lexoid_spark.zip"))

    pages_p = str(tmp_path / "pages.parquet")
    out = str(tmp_path / "out")
    gen = (
        "from lexoid_spark.session import get_spark\n"
        "from lexoid_spark.corpus.gen import pages_df\n"
        "s = get_spark('gen', cores=2, shuffle_partitions=4)\n"
        f"pages_df(s, 12).write.parquet({pages_p!r})\n"
        "s.stop()\n"
    )
    subprocess.run([sys.executable, "-c", gen], check=True, cwd=ROOT,
                   timeout=300)

    spark_submit = os.path.join(
        os.path.dirname(os.path.abspath(__import__("pyspark").__file__)),
        "bin", "spark-submit",
    )
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    proc = subprocess.run(
        [spark_submit, "--master", "local[2]", "--py-files", zip_path,
         os.path.join(ROOT, "jobs", "extract_job.py"),
         "--input", pages_p, "--output", out,
         "--n-buckets", "4", "--run-id", "ship"],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path),  # not the repo root: forces import from the zip
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    import json
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["n_docs"] == 12
    assert sorted(report["buckets_done"]) == [0, 1, 2, 3]
