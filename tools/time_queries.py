"""Time individual declared queries with the noop sink (guide §1.4).

Usage:
    python tools/time_queries.py <passes> <query> [query ...]

Runs each named query <passes> times (interleaved, like bench.py),
prints per-query min/all timings as JSON. Separate from the FROZEN
bench.py so iteration here cannot disturb the driver's measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    passes = int(sys.argv[1])
    names = sys.argv[2:]

    import __spark_entry__ as entry_mod
    from lexoid_spark.session import get_spark

    spark = get_spark("lexoid_spark_timeq", cores=CPUS,
                      shuffle_partitions=int(CPUS))
    qs = entry_mod.queries()

    def run(name):
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()

    # warmup pass (codegen + python worker spin-up), untimed; clear
    # the cache after it so pass 1 does not read fixture/result pins
    # populated by the warmup (bench.py clears between passes too)
    for name in names:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        run(name)
    spark.catalog.clearCache()
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _p in range(passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.monotonic()
            run(name)
            samples[name].append(round(time.monotonic() - t0, 3))
        spark.catalog.clearCache()
    out = {n: {"min": min(v), "all": v} for n, v in samples.items()}
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
