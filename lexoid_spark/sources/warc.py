"""WARC ingestion source: explode concatenated-WARC blobs into the
(url, warc_ts, html) rows the extraction pipeline consumes.

The Spark seam over :mod:`lexoid_spark.kernels.warc` — a row-expanding
``mapInPandas`` (UDTF shape, same pattern as the video frame sampler):
one input row per archive blob, one output row per contained record.

Scale shape: map-only — no shuffle, no collect; an archive shard is
parsed entirely inside its partition, and a bad blob quarantines as an
error row instead of failing the stage. Downstream the rows join the
normal extraction path (doctype sniff → kernel dispatch), so a crawl
dump goes archive → markdown without leaving the DataFrame plan.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lexoid_spark.kernels.warc import WarcError, http_body, warc_records

WARC_ROWS_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("rec_idx", T.IntegerType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("error", T.StringType()),
])


def read_warc_blobs(df: DataFrame, id_col: str = "id",
                    bin_col: str = "data",
                    strip_http: bool = True) -> DataFrame:
    """Explode each WARC blob row into its records. Response payloads
    lose their HTTP envelope when ``strip_http`` (the html the
    extraction kernels want); a malformed blob yields ONE quarantine
    row (rec_idx NULL, error set) — isolation, not stage failure."""
    src = df.select(F.col(id_col).cast("long").alias("id"),
                    F.col(bin_col).alias("data"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i, blob in zip(b["id"], b["data"]):
                try:
                    recs = warc_records(blob)
                except WarcError as e:
                    rows.append((i, None, None, None, None, None,
                                 len(blob or b""), str(e)[:200]))
                    continue
                for k, r in enumerate(recs):
                    payload = r["payload"]
                    if strip_http and r["warc_type"] == "response":
                        try:
                            payload = http_body(payload)
                        except WarcError as e:
                            # per-RECORD isolation: one bad chunked/
                            # compressed HTTP body quarantines that
                            # record, not the blob's other records
                            rows.append((i, k, r["warc_type"],
                                         r["url"], r["warc_date"],
                                         None, len(payload),
                                         str(e)[:200]))
                            continue
                    rows.append((i, k, r["warc_type"], r["url"],
                                 r["warc_date"], payload,
                                 len(payload), None))
            yield pd.DataFrame(
                rows, columns=["id", "rec_idx", "warc_type", "url",
                               "warc_date", "payload", "n_bytes",
                               "error"])

    return src.mapInPandas(kernel, WARC_ROWS_SCHEMA)


WARC_BLOBS_SCHEMA_DDL = "id long, data binary"


def warc_blobs_to_pages(blobs: DataFrame):
    """WARC archive blobs ``(id, data)`` → (pages, bad): response
    records in the pages schema the extraction plan consumes (HTTP
    envelope stripped, WARC-Date cast to timestamp) plus quarantine
    rows ``(url='warc:<id>', error)`` for malformed blobs. Map-only."""
    rows = read_warc_blobs(blobs, "id", "data")
    pages = (
        rows.filter(F.col("error").isNull()
                    & (F.col("warc_type") == "response"))
        .select(
            "url",
            # try_cast, NOT cast: under ANSI mode a missing or
            # malformed WARC-Date would throw and kill the stage —
            # the quarantine-not-fail contract demands NULL instead
            F.try_to_timestamp(F.col("warc_date")).alias("warc_ts"),
            F.col("payload").alias("html"),
            F.lit("").alias("text"),
            F.lit("").alias("lang"),
        )
    )
    bad = rows.filter(F.col("error").isNotNull()).select(
        F.concat(F.lit("warc:"), F.col("id").cast("string")).alias("url"),
        "error",
    )
    return pages, bad


WET_BLOBS_SCHEMA = T.StructType([
    T.StructField("shard", T.IntegerType()),
    T.StructField("wet", T.BinaryType()),
    T.StructField("n_records", T.LongType()),
])


def write_wet_blobs(df: DataFrame, url_col: str = "url",
                    date_col: str = "warc_date",
                    text_col: str = "text",
                    n_shards: int = 16, gz: bool = True) -> DataFrame:
    """Extracted text → WET-style archive blobs (the Common-Crawl
    output format: one WARC ``conversion`` record per document,
    ``Content-Type: text/plain``, per-record gzip members when
    ``gz``) — the WRITE twin of :func:`read_warc_blobs`, so a
    curation pipeline can emit crawl-ecosystem artifacts without
    leaving the DataFrame plan.

    Scale shape: ONE hash shuffle on the md5 shard key (uniform by
    construction — no hot shards), then applyInPandas serializes each
    shard to one blob with records in deterministic url order. Shard
    count is the parallelism knob: at 10^12 docs set n_shards to the
    target archive count, not 16."""
    from lexoid_spark.functions.dedup import _md5_hash64
    from lexoid_spark.kernels.warc import build_record

    src = df.select(
        F.col(url_col).alias("url"),
        F.col(date_col).cast("string").alias("date"),
        F.col(text_col).alias("text"),
        F.pmod(_md5_hash64(F.col(url_col)),
               F.lit(n_shards)).cast("int").alias("shard"),
    )

    def serialize(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("url")
        out = bytearray()
        for url, date, text in zip(pdf["url"], pdf["date"], pdf["text"]):
            out += build_record("conversion", url or "", date or "",
                                (text or "").encode("utf-8"), gz=gz)
        return pd.DataFrame({"shard": [key[0]], "wet": [bytes(out)],
                             "n_records": [len(pdf)]})

    return src.groupBy("shard").applyInPandas(serialize,
                                              WET_BLOBS_SCHEMA)
