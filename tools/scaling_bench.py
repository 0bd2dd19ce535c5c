"""Scaling-efficiency evidence for the north rule (N vs 4N executors).

No real cluster exists in this sandbox, so the same extraction job runs
at two parallelism levels — local[8] and local[32] — on the SAME
materialized input, each in a fresh JVM subprocess. Throughput at both
plus efficiency = (rate_32 / rate_8) / 4 is written to
BENCH/BASELINE.md and BENCH/scaling.json.

A warm-up pass (excluded from timing) spins up the Python worker pool
first; the timed passes measure steady-state docs/sec, which is what a
long-running 10^12-row job sees.

Usage: python tools/scaling_bench.py [n_docs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAGES = os.environ.get("SCALING_PAGES_DIR", "/tmp/scaling_pages")
N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
REPEATS = int(os.environ.get("SCALING_REPEATS", "3"))

_RUNNER = r"""
import json, sys, time
cores, pages_path, repeats = sys.argv[1], sys.argv[2], int(sys.argv[3])
from lexoid_spark.session import get_spark
from lexoid_spark.plans.extract import extract

spark = get_spark("scaling", cores=cores, shuffle_partitions=int(cores))

def run():
    pages = spark.read.parquet(pages_path)
    extract(pages)["extracted"].write.format("noop").mode("overwrite").save()

run()  # warm-up: python worker pool + code paths, excluded from timing
times = []
for _ in range(repeats):
    t0 = time.monotonic()
    run()
    times.append(time.monotonic() - t0)
print("RESULT " + json.dumps({"cores": int(cores), "times": times}))
spark.stop()
"""


def _materialize() -> int:
    from lexoid_spark.corpus.gen import pages_df
    from lexoid_spark.session import get_spark

    spark = get_spark("gen_scaling", cores=8, shuffle_partitions=8)
    if not os.path.isdir(PAGES):
        # many small files: the zero-shuffle bulk path parallelizes by
        # input split, so the file count must exceed the widest level
        # (a real CC table has thousands of files per partition)
        pages_df(spark, N_DOCS, p_giant=0.02).repartition(128).write.parquet(
            PAGES
        )
    n = spark.read.parquet(PAGES).count()
    spark.stop()
    return n


def _run_level(cores: int) -> dict:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER, str(cores), PAGES, str(REPEATS)],
        capture_output=True, text=True, cwd=ROOT, timeout=1800, env=env,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-3000:])
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def main() -> None:
    sys.path.insert(0, ROOT)
    n_docs = _materialize()
    levels = {}
    for cores in (8, 32):
        r = _run_level(cores)
        best = min(r["times"])  # steady-state: least-interference run
        levels[cores] = {
            "times_sec": [round(t, 3) for t in r["times"]],
            "best_sec": round(best, 3),
            "median_sec": round(statistics.median(r["times"]), 3),
            "docs_per_sec": round(n_docs / best, 2),
        }
    r8, r32 = levels[8]["docs_per_sec"], levels[32]["docs_per_sec"]
    eff = round((r32 / r8) / 4.0, 4)
    out = {
        "n_docs": n_docs,
        "input": PAGES,
        "repeats": REPEATS,
        "levels": levels,
        "speedup_8_to_32": round(r32 / r8, 3),
        "scaling_efficiency": eff,
        "meets_0_8": eff >= 0.8,
    }
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(ROOT, "BENCH", "scaling.json"), "w") as f:
        json.dump(out, f, indent=2)

    md = f"""# BENCH — scaling evidence (north rule: N → 4N efficiency ≥ 0.8)

Sandbox stand-in for a two-cluster-size run: the identical extraction
job (`extract()` defaults: tail-split skew handling, single
mapInPandas dispatch) over the identical materialized input
({n_docs} synthetic Common-Crawl-style pages incl. 2% giant-blob
tail), at `local[8]` vs `local[32]` in fresh JVMs. Warm-up pass
excluded; best of {REPEATS} timed passes.

| parallelism | best sec | median sec | docs/sec |
|---|---|---|---|
| local[8] (N) | {levels[8]['best_sec']} | {levels[8]['median_sec']} | {r8} |
| local[32] (4N) | {levels[32]['best_sec']} | {levels[32]['median_sec']} | {r32} |

**Speedup 8→32:** {out['speedup_8_to_32']}×  ·
**Scaling efficiency:** (rate_4N / rate_N) / 4 = **{eff}**
({'meets' if eff >= 0.8 else 'BELOW'} the ≥ 0.8 bar)

Reference floor (BASELINE.md): ~0.087 docs/sec/process (AUTO,
11.53 s/doc). This static path delivers {r32} docs/sec at 32 cores =
{round(r32/32, 1)} docs/sec/core — ~{int((r32/32)/0.087)}× the
reference per-process rate.

Reproduce: `python tools/scaling_bench.py {n_docs}`
(raw numbers in `BENCH/scaling.json`).
"""
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
