"""The flagship extraction pipeline: pages → extracted markdown.

Spark rebuild of the reference lifecycle (SURVEY.md §3 entry point 1):

    pages(url, warc_ts, html, text, lang)
      → column-pruned scan (url, html)
      → repartition-by-size (byte-balanced tasks; skew tail spread)
      → doctype sniff (magic bytes) → route
      → HTML  : pandas_udf html_to_md
        CSV   : pandas_udf csv_to_md
        TXT   : pandas_udf decode-ignore
        PDF   : mapInPandas per-page explode → page markdown
                → salted partial/final groupBy merge ("\\n\\n" join)
      → unionByName → segments → error-quarantine split
      → extracted(url, title, raw, segments, parser_used, n_chars)

All extraction Python runs inside Arrow batches; all orchestration is
native DataFrame ops (filters, unions, groupBy, when/otherwise) that
Catalyst prunes and pushes down. Verified by tests/test_pipeline.py
(plan shape: scan reads only url+html; branches reuse one scan).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lexoid_spark.functions.columns import doc_title
from lexoid_spark.functions.udfs import (
    PDF_PAGES_SCHEMA,
    csv_to_md_udf,
    html_to_md_udf,
    pdf_pages_map,
    segment_md_udf,
    txt_decode_udf,
)
from lexoid_spark.operators.partitioning import (
    repartition_by_size,
    salted_group_merge,
)
from lexoid_spark.operators.routing import (
    quarantine,
    route_parser,
    with_doctype,
    with_pdf_flags,
)

SEGMENTS_COL_TYPE = T.ArrayType(T.StructType([
    T.StructField("page", T.IntegerType()),
    T.StructField("section", T.StringType()),
    T.StructField("content", T.StringType()),
]))


def _single_segment(raw_col) -> "F.Column":
    """txt/csv: one segment, page=1 (static_parser.py:96-118)."""
    return F.array(
        F.struct(
            F.lit(1).alias("page"),
            F.lit(None).cast("string").alias("section"),
            raw_col.alias("content"),
        )
    )


def extract(pages: DataFrame, run_id: str = "run0",
            num_partitions: Optional[int] = None,
            salt_buckets: int = 8) -> Dict[str, DataFrame]:
    """Build the extraction plan. Returns {"extracted", "errors"} DataFrames."""
    spark = pages.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )

    src = pages.select("url", "html")  # explicit column pruning
    src = repartition_by_size(src, num_partitions)
    src = with_doctype(src)

    # ---- simple one-row branches (html / csv / txt) ----
    def scalar_branch(doctype: str, udf) -> DataFrame:
        b = src.filter(F.col("doctype") == doctype)
        b = b.withColumn("_res", udf(F.col("html")))
        segs = (
            segment_md_udf(F.col("_res.raw"))
            if doctype == "html"
            else _single_segment(F.col("_res.raw"))
        )
        return b.select(
            "url",
            doc_title(F.col("url")).alias("title"),
            F.col("_res.raw").alias("raw"),
            segs.alias("segments"),
            F.lit("STATIC_PARSE").alias("parser_used"),
            F.col("_res.error").alias("error"),
        )

    html_b = scalar_branch("html", html_to_md_udf)
    csv_b = scalar_branch("csv", csv_to_md_udf)
    txt_b = scalar_branch("txt", txt_decode_udf)

    # ---- PDF branch: page explode → per-page kernel → salted merge ----
    pdf_src = src.filter(F.col("doctype") == "pdf")
    pdf_src = with_pdf_flags(pdf_src)
    pdf_routed = route_parser(with_doctype(pdf_src))
    pdf_static = pdf_routed.filter(F.col("route") == "STATIC")
    pdf_unsupported = pdf_routed.filter(F.col("route") != "STATIC").select(
        "url",
        F.lit("router").alias("stage"),
        F.lit("unsupported: image-bearing PDF needs OCR/LLM path").alias("error"),
        F.lit(run_id).alias("run_id"),
    )

    pages_rows = pdf_static.select("url", "html").mapInPandas(
        pdf_pages_map, PDF_PAGES_SCHEMA
    )
    pdf_errors = quarantine(pages_rows, "pdf_kernel", run_id)
    pages_ok = pages_rows.filter(F.col("error").isNull())

    merged = salted_group_merge(
        pages_ok, key="url", sort_col="page", content_col="content",
        salt_buckets=salt_buckets, sep="\n\n",
    )
    pdf_b = merged.select(
        "url",
        doc_title(F.col("url")).alias("title"),
        F.col("content").alias("raw"),
        F.transform(
            F.col("_sorted_parts"),
            lambda p: F.struct(
                p.getField("s").cast("int").alias("page"),
                F.lit(None).cast("string").alias("section"),
                p.getField("c").alias("content"),
            ),
        ).alias("segments"),
        F.lit("STATIC_PARSE").alias("parser_used"),
        F.lit(None).cast("string").alias("error"),
    )

    union = html_b.unionByName(csv_b).unionByName(txt_b).unionByName(pdf_b)

    extracted = (
        union.filter(F.col("error").isNull())
        .withColumn("n_chars", F.length("raw"))
        .drop("error")
    )
    errors = (
        quarantine(union, "kernel", run_id)
        .unionByName(pdf_errors)
        .unionByName(pdf_unsupported)
    )
    return {"extracted": extracted, "errors": errors}
