"""Pin per-query bench budgets from a clean run's JSON output::

    python bench.py > /tmp/bench.json        # HOST OTHERWISE IDLE
    python tools/pin_bench_budgets.py /tmp/bench.json

Writes BENCH/budgets.json; bench.py then fails loud (stderr +
"budget_violations" in its JSON; exit 1 under BENCH_STRICT=1) whenever
a query runs >2x its pin at sf0.1 — so a real regression can't hide
behind the host's documented ±2x thermal drift.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench.json"
    with open(src) as f:
        line = [ln for ln in f if ln.strip().startswith("{")][-1]
    run = json.loads(line)
    if abs(run.get("sf", 0) - 0.1) > 1e-9:
        raise SystemExit(f"refusing to pin from sf={run.get('sf')} "
                         "(budgets are sf0.1-based)")
    out = {
        "pinned_from_total_sec": run["value"],
        "queries": run["queries"],
    }
    if run.get("calibration_sec"):
        out["calibration_pin_sec"] = run["calibration_sec"]
        out["protocol"] = (
            "pinned from one clean idle-host interleaved min-of-3 run; "
            "bench.py scales the 2x tripwire by calibration_sec / "
            "calibration_pin_sec so host contention cannot flag "
            "unchanged code")
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "budgets.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"pinned {len(run['queries'])} budgets -> {dst}")


if __name__ == "__main__":
    main()
