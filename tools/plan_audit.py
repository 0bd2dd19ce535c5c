"""Print the flagship plans' scale-critical properties (the same ones
tests/test_plan_shape.py pins) with PASS/FAIL — a human-auditable
artifact:

    python tools/plan_audit.py

Audits: column pruning + pushable tail predicate at the parquet scan,
zero-shuffle default extract, broadcast dimension joins, no cartesian
products in the dedup/ANN family, map-only IVF assignment, broadcast
benchmark grams in decontamination.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fmt(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return jdf.queryExecution().explainString(mode.fromString("formatted"))


def main() -> None:
    from pyspark.sql import functions as F

    from lexoid_spark.corpus.gen import pages_df
    from lexoid_spark.functions.curation import decontaminate
    from lexoid_spark.functions.dedup import lsh_candidate_pairs
    from lexoid_spark.functions.similarity import (
        assign_clusters,
        embedding_near_dup_pairs,
    )
    from lexoid_spark.plans.extract import extract
    from lexoid_spark.session import get_spark

    spark = get_spark("plan_audit", cores=4, shuffle_partitions=8)
    pdir = "/tmp/plan_audit_pages"
    (
        pages_df(spark, 40)
        .withColumn("n_bytes", F.length("html").cast("long"))
        .write.mode("overwrite").parquet(pdir)
    )
    pages = spark.read.parquet(pdir)

    checks: list[tuple[str, bool, str]] = []

    p = _fmt(extract(pages)["extracted"])
    checks.append((
        "extract: scan pruned to url/html/n_bytes",
        "ReadSchema: struct<url:string,html:binary,n_bytes:bigint>" in p,
        "ReadSchema line",
    ))
    checks.append((
        "extract: tail predicate pushed to parquet",
        "GreaterThan(n_bytes,1048576)" in p,
        "PushedFilters",
    ))
    p0 = _fmt(extract(pages, repartition=False)["extracted"])
    checks.append((
        "extract (bulk): ZERO shuffle", "Exchange" not in p0, "no Exchange",
    ))

    docs = spark.createDataFrame(
        [(i, f"w{i} alpha beta gamma delta common tail") for i in range(30)],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, float(i % 3)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    for name, df in (
        ("lsh_candidate_pairs",
         lsh_candidate_pairs(docs, "doc_id", "text", num_hashes=8, bands=2)),
        ("embedding_near_dup_pairs",
         embedding_near_dup_pairs(emb, tau=0.5, n_centroids=4)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        checks.append((
            f"{name}: no cartesian product",
            "CartesianProduct" not in plan, "bucketed joins only",
        ))

    pa = _fmt(assign_clusters(emb, n_centroids=4))
    checks.append((
        "IVF assignment: no window/sort-merge, one-row broadcast",
        "Window" not in pa and "SortMergeJoin" not in pa
        and "BroadcastNestedLoopJoin" in pa,
        "map-only + broadcast centroids",
    ))

    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta eta theta",)], ["text"])
    pd_ = _fmt(decontaminate(docs, bench, "doc_id", "text", n=5))
    checks.append((
        "decontaminate: benchmark grams broadcast",
        "BroadcastHashJoin" in pd_, "broadcast build side",
    ))

    from lexoid_spark.functions.curation import (
        c4_line_filter,
        dsir_weights,
        duplicate_span_removal,
    )

    pc4 = _fmt(c4_line_filter(docs, "doc_id", "text"))
    checks.append((
        "c4_line_filter: ZERO shuffle", "Exchange" not in pc4,
        "split+HOF filter ride the scan",
    ))
    pdsir = _fmt(dsir_weights(docs, "doc_id", "text",
                              F.col("doc_id") % 2 == 0))
    checks.append((
        "dsir_weights: combined bucket table broadcast",
        "BroadcastHashJoin" in pdsir and "SortMergeJoin" not in pdsir
        and "CartesianProduct" not in pdsir,
        "one count pass, corpus never shuffles for scoring",
    ))
    pspan = _fmt(duplicate_span_removal(docs, "doc_id", "text", n=4))
    checks.append((
        "duplicate_span_removal: aggregation not window",
        "Window" not in pspan and "CartesianProduct" not in pspan,
        "map-side-combinable dup-gram detection",
    ))

    width = max(len(c[0]) for c in checks) + 2
    failures = 0
    for name, ok, why in checks:
        print(f"{name:<{width}} {'PASS' if ok else 'FAIL'}  ({why})")
        failures += 0 if ok else 1
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
