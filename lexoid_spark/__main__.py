"""CLI mirroring the reference's ``lexoid parse`` shape
(``/root/reference/lexoid/cli.py:273-356``; module alias
``__main__.py:1-6``): parse one document to markdown or json on
stdout, or run the corpus-scale extraction job.

    python -m lexoid_spark parse --input doc.html [--format json]
    python -m lexoid_spark extract --input <pages parquet> --output out/
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="lexoid_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("parse", help="parse one document to stdout")
    p.add_argument("--input", "-i", required=True)
    p.add_argument("--format", choices=("markdown", "json"),
                   default="markdown")
    p.add_argument("--output", "-o", default=None,
                   help="write to file instead of stdout")

    x = sub.add_parser("extract", help="corpus-scale extraction job")
    x.add_argument("--input", required=True)
    x.add_argument("--output", required=True)
    x.add_argument("--run-id", default="run0")
    x.add_argument("--n-buckets", type=int, default=16)

    args = ap.parse_args(argv)

    if args.cmd == "parse":
        from lexoid_spark.api import parse

        try:
            doc = parse(args.input)
        except Exception as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        out = doc["raw"] if args.format == "markdown" else json.dumps(doc)
        if args.output:
            with open(args.output, "w") as f:
                f.write(out)
        else:
            print(out)
        return 0

    # extract: delegate to the resumable job (same code spark-submit runs)
    from lexoid_spark.plans.job import run_extract_job
    from lexoid_spark.session import get_spark

    spark = get_spark("lexoid_spark_cli")
    res = run_extract_job(spark, args.input, args.output,
                          run_id=args.run_id, n_buckets=args.n_buckets)
    print(json.dumps({"buckets_done": res.buckets_done,
                      "buckets_skipped": res.buckets_skipped,
                      "n_docs": res.n_docs}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
