"""Standalone mirror of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry AND its ``oracle_sql()`` on the
same parquet tables via DuckDB, print one CORRECTNESS-style JSON
object (per query: rows/schema/hash match) plus a summary line.

    python tools/check_oracles.py [sf_dir]     # default sf0.01
    python tools/check_oracles.py --only q1,q3 [sf_dir]

(The pytest variant, tests/test_entry_oracle.py, fails fast per query;
this prints the full matrix the way the driver records it.)
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Full-precision shortest-roundtrip repr: the driver's value
        # hash detects last-ulp drift, so the local gate must too (a
        # 6-sig-fig canon hid the audio_meta banker's-rounding bug for
        # a whole round — VERDICT r02 "What's wrong" #2).
        return repr(v)
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


def main() -> None:
    argv = sys.argv[1:]
    only: set[str] | None = None
    if argv and argv[0] == "--only":
        only = set(argv[1].split(","))
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"

    import duckdb

    import __spark_entry__ as entry_mod
    from lexoid_spark.session import get_spark

    spark = get_spark("oracle_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if only is not None:
        missing = only - set(queries)
        if missing:
            raise SystemExit(f"--only names unknown queries: {missing}")
        queries = {k: v for k, v in queries.items() if k in only}
    out: dict[str, dict] = {}
    n_pass = 0
    for name in sorted(queries):
        rec: dict = {"rows_match": None, "schema_match": None,
                     "hash_match": None, "err": None}
        try:
            sdf = queries[name](spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
            if name not in oracles:
                rec["err"] = "no_oracle"
            else:
                res = con.execute(oracles[name])
                dcols = [d[0].lower() for d in res.description]
                drows = res.fetchall()
                rec["oracle_rows"] = len(drows)
                rec["rows_match"] = len(srows) == len(drows)
                rec["schema_match"] = sorted(scols) == sorted(dcols)
                rec["hash_match"] = (
                    _rowset(scols, srows) == _rowset(dcols, drows)
                )
                if rec["rows_match"] and rec["schema_match"] \
                        and rec["hash_match"]:
                    n_pass += 1
        except Exception as e:  # noqa: BLE001 — record, keep going
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        out[name] = rec
        status = "PASS" if rec.get("hash_match") else (
            rec["err"] or "FAIL")
        print(f"  {name}: {status}", file=sys.stderr)

    print(json.dumps(out, indent=1))
    print(f"# {n_pass}/{len(queries)} fully green", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
