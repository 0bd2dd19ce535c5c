"""spark-submit entry point for the corpus-curation pipeline::

    spark-submit --master local[32] --py-files dist/lexoid_spark.zip \
        jobs/curate_job.py --input /data/documents --output /data/curated \
        --id-col doc_id --text-col text --lang-col lang

Chains the curation operators the training pipeline ships (each also
an oracled driver query): Gopher quality gate → exact-dedup keepers →
optional LSH near-dup drop → per-lang deterministic sampling → PII
scrub. Writes ``kept/`` (curated rows, text replaced by the scrubbed
form) and ``dropped/`` (id + stage that dropped it — the audit trail a
corpus release needs), and prints one JSON summary line.

Scale notes: every stage is a filter/aggregation with map-side
combine; the only collects are control-plane (#strata rows). Counts
ride persisted frames the job needs anyway.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--lang-col", default="lang")
    ap.add_argument("--sample-rates", default="{}",
                    help='JSON lang→rate, e.g. \'{"en": 1.0, "de": 0.5}\'')
    ap.add_argument("--default-rate", type=float, default=1.0)
    ap.add_argument("--near-dup", action="store_true",
                    help="also drop LSH near-duplicate cluster non-keepers")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("lexoid_spark_curate")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from lexoid_spark.functions.curation import (
        pii_redact,
        stratified_sample,
    )
    from lexoid_spark.functions.dedup import (
        connected_components,
        exact_dedup,
        lsh_candidate_pairs,
    )
    from lexoid_spark.functions.textstats import gopher_quality_flags

    ic, tc, lc = args.id_col, args.text_col, args.lang_col
    docs = spark.read.parquet(args.input).persist()
    n_in = docs.count()

    quality = docs.filter(
        gopher_quality_flags(F.col(tc)).getField("passes")
    ).persist()
    n_quality = quality.count()

    exact_keepers = exact_dedup(quality, ic, tc).drop("n_dups")
    keepers = exact_keepers
    nd_drop = None
    if args.near_dup:
        pairs = lsh_candidate_pairs(keepers, ic, tc,
                                    num_hashes=8, bands=4)
        nd_drop = (
            connected_components(pairs)
            .filter(F.col("id") != F.col("cluster_id"))
            .select(F.col("id").alias(ic))
        )
        keepers = keepers.join(nd_drop, ic, "left_anti")
    keepers = keepers.persist()
    n_dedup = keepers.count()

    rates = json.loads(args.sample_rates)
    sampled = stratified_sample(keepers, ic, lc, rates,
                                default_rate=args.default_rate)
    kept = sampled.withColumn(tc, pii_redact(F.col(tc))).persist()
    n_kept = kept.count()

    kept.write.mode("overwrite").parquet(args.output + "/kept")
    # dropped/: (id, stage) — each anti-join ships only the id column;
    # stages are attributed at the boundary where the row left the
    # pipeline, so a corpus release can audit every exclusion.
    q_drop = (
        docs.select(ic).join(quality.select(ic), ic, "left_anti")
        .withColumn("stage", F.lit("quality"))
    )
    dd_drop = (
        quality.select(ic).join(exact_keepers.select(ic), ic, "left_anti")
        .withColumn("stage", F.lit("exact_dedup"))
    )
    s_drop = (
        keepers.select(ic).join(kept.select(ic), ic, "left_anti")
        .withColumn("stage", F.lit("sample"))
    )
    dropped = q_drop.unionByName(dd_drop).unionByName(s_drop)
    if nd_drop is not None:
        dropped = dropped.unionByName(
            exact_keepers.select(ic).join(nd_drop, ic, "left_semi")
            .withColumn("stage", F.lit("near_dup"))
        )
    dropped.write.mode("overwrite").parquet(args.output + "/dropped")

    print(json.dumps({
        "n_in": n_in, "n_quality": n_quality,
        "n_after_dedup": n_dedup, "n_kept": n_kept,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
