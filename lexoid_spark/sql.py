"""SQL surface: temp views exposing the engine's operators to
``spark.sql(...)``.

The operators are native Column expressions (JVM/codegen), so the
right SQL exposure is VIEWS whose plans embed those expressions —
NOT ``spark.udf.register`` (that would wrap them in per-row Python,
the slow path this engine avoids everywhere). A view's plan fuses
into the caller's query: ``SELECT * FROM v_doc_quality WHERE quality
> 0.8`` still prunes/pushes down through the underlying scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """One temp view per driver parquet table."""
    out = []
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
        out.append(t)
    return out


def register_views(spark: SparkSession, sf_dir: str,
                   doc_table: str = "documents") -> list[str]:
    """Operator views over the documents table, queryable via pure SQL:

      v_doc_quality      doc_id, quality
      v_doc_langid       doc_id, lang_pred
      v_doc_fingerprint  doc_id, fp
      v_gopher           doc_id, <flag columns>, passes
      v_dedup_keepers    exact-dedup surviving rows + n_dups
      v_pii_clean        doc_id, text_clean
      v_cms_tokens / v_hll_registers   mergeable sketch cells
      v_tfidf_topk       doc_id, term, tf, df, score_micros, rank
      v_inverted_postings  term, df, postings (capped, sorted)
      v_dsir_weights     doc_id, sum_t, sum_r, importance
      v_unimax_alloc     stratum, cap, alloc
    """
    from lexoid_spark.functions.curation import pii_redact
    from lexoid_spark.functions.dedup import exact_dedup
    from lexoid_spark.functions.textstats import (
        fingerprint,
        gopher_quality_flags,
        langid,
        quality_score,
    )

    register_tables(spark, sf_dir)
    docs: DataFrame = spark.table(doc_table)
    views = {
        "v_doc_quality": docs.select(
            "doc_id", quality_score(F.col("text")).alias("quality")
        ),
        "v_doc_langid": docs.select(
            "doc_id", langid(F.col("text")).alias("lang_pred")
        ),
        "v_doc_fingerprint": docs.select(
            "doc_id", fingerprint(F.col("text")).alias("fp")
        ),
        "v_gopher": docs.select(
            "doc_id",
            gopher_quality_flags(F.col("text")).alias("g")
        ).select("doc_id", "g.*"),
        "v_dedup_keepers": exact_dedup(docs, "doc_id", "text"),
        "v_pii_clean": docs.select(
            "doc_id", pii_redact(F.col("text")).alias("text_clean")
        ),
    }
    from lexoid_spark.functions.textstats import (
        count_min_sketch,
        hll_registers,
        inverted_postings,
        tfidf_topk,
    )

    views["v_cms_tokens"] = count_min_sketch(docs, "text")
    views["v_hll_registers"] = hll_registers(docs, "text")

    from lexoid_spark.functions.curation import (
        dsir_weights,
        unimax_allocation,
    )

    views["v_tfidf_topk"] = tfidf_topk(docs, "doc_id", "text", k=5)
    views["v_inverted_postings"] = inverted_postings(docs, "doc_id", "text")
    views["v_dsir_weights"] = dsir_weights(
        docs, "doc_id", "text", F.col("lang") == "en"
    )
    views["v_unimax_alloc"] = unimax_allocation(docs, "doc_id", "lang")
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return sorted(views)
