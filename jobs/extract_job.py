"""spark-submit entry point for the extraction job (north_rule ship
vehicle)::

    python tools/build_pyfiles.py          # → dist/lexoid_spark.zip
    spark-submit --master local[32] --py-files dist/lexoid_spark.zip \
        jobs/extract_job.py --input /data/pages --output /data/out \
        --run-id r1 --n-buckets 64

On a real cluster the same command with ``--master yarn``/k8s ships the
zip to every executor; nothing here is local-mode-specific.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--group-size", type=int, default=4)
    ap.add_argument("--max-buckets", type=int, default=None,
                    help="stop after N buckets (kill simulation / sharding)")
    ap.add_argument("--no-repartition", action="store_true")
    ap.add_argument("--input-format", default="pages",
                    choices=["pages", "warc"],
                    help="pages: parquet of (url, warc_ts, html, text, "
                         "lang); warc: parquet of (id, data) WARC "
                         "archive blobs, exploded to pages rows first")
    ap.add_argument("--pdf-framework", default="pdfplumber",
                    choices=["pdfplumber", "pdfminer"],
                    help="PDF arm: full layout (default) or text-only fast")
    ap.add_argument("--html-main-content", action="store_true",
                    help="strip nav/ads/social chrome via tag/class blocklists")
    ap.add_argument("--codec", default=None,
                    choices=["snappy", "zstd", "gzip", "lz4"],
                    help="parquet compression for the output tables "
                         "(default: Spark's snappy; zstd ≈30-40%% smaller)")
    ap.add_argument("--compact", action="store_true",
                    help="after processing, compact small files in "
                         "extracted/ (plans/compact.py)")
    ap.add_argument("--compact-target-mb", type=int, default=128)
    ap.add_argument("--emit-wet", action="store_true",
                    help="also serialize the extracted text to "
                         "WET-style WARC conversion blobs under wet/ "
                         "(the Common-Crawl output format)")
    ap.add_argument("--wet-shards", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # spark-submit owns master/conf; only fill gaps for bare invocation
    spark = (
        SparkSession.builder.appName("lexoid_spark_extract")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from lexoid_spark.plans.job import run_extract_job

    res = run_extract_job(
        spark,
        input_path=args.input,
        output_dir=args.output,
        run_id=args.run_id,
        n_buckets=args.n_buckets,
        group_size=args.group_size,
        max_buckets=args.max_buckets,
        repartition=not args.no_repartition,
        pdf_framework=args.pdf_framework,
        html_main_content=args.html_main_content,
        codec=args.codec,
        input_format=args.input_format,
    )
    out = {
        "buckets_done": res.buckets_done,
        "buckets_skipped": res.buckets_skipped,
        "n_docs": res.n_docs,
    }
    if args.compact:
        import os

        from lexoid_spark.plans.compact import compact_buckets

        ext_dir = os.path.join(args.output, "extracted")
        if os.path.isdir(ext_dir):
            c = compact_buckets(
                spark, ext_dir,
                target_bytes=args.compact_target_mb * 1024 * 1024,
            )
            out["compaction"] = {
                "buckets_compacted": len(c.buckets_compacted),
                "files_before": c.files_before,
                "files_after": c.files_after,
            }
    if args.emit_wet:
        import os

        from pyspark.sql import functions as F

        from lexoid_spark.plans.job import read_extracted
        from lexoid_spark.sources.warc import write_wet_blobs

        ext = read_extracted(spark, args.output).select(
            "url",
            F.date_format(F.current_date(), "yyyy-MM-dd'T'00:00:00'Z'")
            .alias("warc_date"),
            F.coalesce("raw", F.lit("")).alias("text"),
        )
        wet = write_wet_blobs(ext, n_shards=args.wet_shards)
        wet_dir = os.path.join(args.output, "wet")
        wet.write.mode("overwrite").parquet(wet_dir)
        out["wet_shards"] = spark.read.parquet(wet_dir).count()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
