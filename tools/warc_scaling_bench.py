"""N→4N scaling evidence for the WARC ingestion arm.

Same constant-host-load executor-sim protocol as
``tools/scaling_bench.py`` (see its docstring for the frequency-
calibration rationale): N executors = 1 timed pinned local[8] process
(+3 ballast), 4N = all four timed, wall = slowest; every measurement
window starts after a preheat so both levels sample the same
steady-hot clock state. The measured plan here is the full crawl-dump
path: parquet of WARC archive blobs → ``warc_blobs_to_pages``
(mapInPandas framing parse + HTTP strip) → ``extract`` → noop sink.

Usage: python tools/warc_scaling_bench.py [n_docs]   # default 100000
Results → BENCH/warc_scaling.json. HOST MUST BE OTHERWISE IDLE.
"""

from __future__ import annotations

import glob
import json
import os
import signal
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
BLOBS = os.environ.get("WARC_SCALING_DIR", "/tmp/warc_scaling_blobs")
N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
DOCS_PER_ARCHIVE = 50
REPEATS = int(os.environ.get("SCALING_REPEATS", "2"))
EXEC_CORES = 8
N_EXECUTORS = 4
PREHEAT_S = int(os.environ.get("SCALING_PREHEAT_S", "60"))

_RUNNER = r"""
import json, sys, time
cores, repeats = sys.argv[1], int(sys.argv[2])
paths = sys.argv[3:]
from lexoid_spark.session import get_spark
from lexoid_spark.plans.extract import extract
from lexoid_spark.sources.warc import warc_blobs_to_pages

spark = get_spark("warc_scaling", cores=cores,
                  shuffle_partitions=int(cores), arrow_max_records=256,
                  extra_conf={
                      "spark.sql.files.maxPartitionBytes": "4m",
                      "spark.sql.files.openCostInBytes": "64k",
                  })

def run():
    blobs = spark.read.parquet(*paths)
    pages, _bad = warc_blobs_to_pages(blobs)
    extract(pages, repartition=False)["extracted"].write.format(
        "noop").mode("overwrite").save()

n_archives = spark.read.parquet(*paths).count()
run()  # warm-up excluded
times = []
for _ in range(repeats):
    t0 = time.monotonic()
    run()
    times.append(time.monotonic() - t0)
print("RESULT " + json.dumps({"times": times, "n_archives": n_archives}))
spark.stop()
"""


def _materialize() -> int:
    import pandas as pd
    from pyspark.sql import functions as F

    from lexoid_spark.corpus.gen import pages_df_dist
    from lexoid_spark.session import get_spark

    spark = get_spark("gen_warc_scaling", cores=32, shuffle_partitions=64)
    if not os.path.isdir(BLOBS):
        pages = pages_df_dist(spark, N_DOCS, p_giant=0.0,
                              num_partitions=128)
        grouped = pages.withColumn(
            "aid",
            F.pmod(F.xxhash64("url"),
                   F.lit(N_DOCS // DOCS_PER_ARCHIVE)).cast("long"),
        )

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            from lexoid_spark.kernels.warc import build_record

            aid = int(pdf["aid"].iloc[0])
            blob = b"".join(
                build_record(
                    "response", str(u), "2024-01-01T00:00:00Z",
                    b"HTTP/1.1 200 OK\r\n\r\n" + bytes(h),
                )
                for u, h in zip(pdf["url"], pdf["html"])
            )
            return pd.DataFrame({"id": [aid], "data": [blob]})

        (
            grouped.groupBy("aid")
            .applyInPandas(build, "id long, data binary")
            .repartition(256)
            .write.parquet(BLOBS)
        )
    n = spark.read.parquet(BLOBS).count()
    spark.stop()
    return n


def _spawn(cpu_set: str, cores: int, paths: list[str],
           repeats: int) -> subprocess.Popen:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)
    return subprocess.Popen(
        ["taskset", "-c", cpu_set, sys.executable, "-c", _RUNNER,
         str(cores), str(repeats), *paths],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=ROOT, env=env, start_new_session=True,
    )


def _collect(proc: subprocess.Popen) -> dict:
    out, _ = proc.communicate(timeout=1800)
    if proc.returncode != 0:
        raise RuntimeError(f"runner failed rc={proc.returncode}")
    line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def _cpu_set(i: int) -> str:
    return f"{i * EXEC_CORES}-{(i + 1) * EXEC_CORES - 1}"


def _killpg(procs) -> None:
    for b in procs:
        try:
            os.killpg(b.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
    for b in procs:
        b.wait()


def main() -> None:
    n_archives = _materialize()
    files = sorted(glob.glob(os.path.join(BLOBS, "part-*")))
    shards = [files[i::N_EXECUTORS] for i in range(N_EXECUTORS)]

    # N level: executor-0 timed on shard-0, 3 un-timed ballast
    ballast = [_spawn(_cpu_set(i), EXEC_CORES, shards[i], 99)
               for i in range(1, N_EXECUTORS)]
    time.sleep(PREHEAT_S)
    r0 = _collect(_spawn(_cpu_set(0), EXEC_CORES, shards[0], REPEATS))
    _killpg(ballast)
    n_best = min(r0["times"])
    shard_docs = r0["n_archives"] * DOCS_PER_ARCHIVE
    n_rate = shard_docs / n_best

    # 4N level: all four timed, wall = slowest executor's best
    procs = [_spawn(_cpu_set(i), EXEC_CORES, shards[i], REPEATS)
             for i in range(N_EXECUTORS)]
    results = [_collect(p) for p in procs]
    wall = max(min(r["times"]) for r in results)
    x4_docs = sum(r["n_archives"] for r in results) * DOCS_PER_ARCHIVE
    x4_rate = x4_docs / wall

    eff = round(x4_rate / (4 * n_rate), 4)
    out = {
        "n_docs": N_DOCS,
        "n_archives": n_archives,
        "docs_per_archive": DOCS_PER_ARCHIVE,
        "protocol": "constant-host-load executor-sim "
                    "(see tools/scaling_bench.py)",
        "N_docs_per_sec": round(n_rate, 2),
        "x4N_docs_per_sec": round(x4_rate, 2),
        "scaling_efficiency": eff,
        "meets_0_8": eff >= 0.8,
    }
    dst = os.path.join(ROOT, "BENCH", "warc_scaling.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
