"""Benchmark harness (driver runs this per round → BENCH_r{N}.json).

Runs the headline workload at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries":
{name: sec}, "sf", plus extraction docs/sec extras}.

Headline = the flagship extraction pipeline (synthetic Common-Crawl
pages corpus incl. giant-blob skew tail, written to parquet then
scanned) + the relational / dedup / ANN query families over the
driver-provided tables.

Host-load hardening (round-3 lesson: a loaded host printed budget
violations for code unchanged since round 1):
  * a fixed CPU-bound CALIBRATION PROBE runs before and between
    passes; its best time vs the idle-host pin in BENCH/budgets.json
    gives ``host_factor`` — reported in the JSON, and used to scale
    the budget tripwire so contention can't flag unchanged code
    (a real plan regression still trips: it grows the query time
    without growing the probe time);
  * per-query timing is the min over 3 INTERLEAVED passes (full
    query list per pass, not back-to-back repeats), so a transient
    load spike can't hit every sample of one query.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# scale the synthetic extraction corpus with the sf of the driver tables
_SF_GUESS = 0.1 if "0.1" in SF_DIR else (0.01 if "0.01" in SF_DIR else 0.001)
N_EXTRACT_DOCS = int(os.environ.get("BENCH_EXTRACT_DOCS",
                                    str(int(100000 * _SF_GUESS))))
PAGES_DIR = os.environ.get("BENCH_PAGES_DIR", "/tmp/bench_pages")
N_PASSES = int(os.environ.get("BENCH_PASSES", "3"))


def _noop_write(df):
    df.write.format("noop").mode("overwrite").save()


def _calibration_probe() -> float:
    """Fixed single-core CPU work (pure-python loop + sha256): its
    wall time moves with host contention/thermal state but not with
    any code in this repo. min-of-3 inside one call."""
    import hashlib

    best = None
    buf = bytes(65536)
    for _ in range(3):
        t0 = time.monotonic()
        acc = 0
        for i in range(1_500_000):
            acc += i * i
        h = hashlib.sha256()
        for _ in range(500):
            h.update(buf)
        h.digest()
        el = time.monotonic() - t0
        best = el if best is None else min(best, el)
    return best


def main() -> None:
    from lexoid_spark.corpus.gen import pages_df_dist
    from lexoid_spark.plans.extract import extract
    from lexoid_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("lexoid_spark_bench", cores=CPUS,
                      shuffle_partitions=int(CPUS))

    # materialize the synthetic pages corpus once (generation excluded
    # from timing; the benched pipeline starts at the parquet scan) —
    # distributed gen, many files so the map path gets enough splits
    if os.path.isdir(PAGES_DIR):
        shutil.rmtree(PAGES_DIR)
    from pyspark.sql import functions as F
    (
        pages_df_dist(spark, N_EXTRACT_DOCS, p_giant=0.02,
                      num_partitions=max(64, int(CPUS) * 2))
        .withColumn("n_bytes", F.length("html").cast("long"))
        .write.parquet(PAGES_DIR)
    )
    pages = spark.read.parquet(PAGES_DIR)
    # warm with one untimed FULL pass: a limit(64) warmup touches only
    # a few of the 32 python workers, so the first timed run paid the
    # other workers' interpreter + kernel-import spin-up (~3 s of the
    # ~5 s total at 10k docs). The timed run below then measures the
    # steady-state throughput the metric claims.
    _noop_write(extract(pages, run_id="warm")["extracted"])

    # --- task list: headline extraction + the query families ---
    queries = entry_mod.queries()
    bench_names = [
        "q1_pricing_summary", "q3_shipping_priority", "q5_local_suppliers",
        "top_customers", "supplier_rank", "events_daily", "events_sessions",
        "docs_by_lang", "doc_quality", "doc_langid", "doc_fingerprint",
        "ngram_jaccard_adjacent", "minhash_band_pairs", "simhash_pairs",
        "ann_cosine_topk", "ann_ivf_topk", "emb_near_dup",
        "emb_near_dup_hof",
        "image_meta", "video_frames", "audio_chunks",
        "parse_quality_metrics",
        "bbox_range_join", "crawl_reachable", "extract_html_h1",
        "extract_html_main", "pdf_flate_extract", "pdf_speed_arm",
        "pdf_cid_extract", "pdf_ttf_extract", "ocr_scanned",
        "ocr_glyph_scan", "png_meta", "png_resize", "png_dialects",
        "jpeg_resize", "jpeg_progressive",
        "para_dedup", "doc_repetition", "pii_redact_docs",
        "token_pack_bins",
        "decontaminate", "curation_pipeline", "chunk_windows",
        "link_pagerank", "mixture_rebalance",
        "c4_filter", "dsir_importance", "dup_span_removal",
        "semdedup_keep", "tfidf_topk", "warc_ingest",
        "robots_check", "sitemap_frontier", "phrase_merges",
        "corpus_report", "ccnet_buckets", "train_val_split",
        "pdf_rc4_extract", "pdf_filters_extract", "pdf_aes_extract",
        "pdf_aes256_extract",
        "char_span_removal",
        "pdf_ocr_extract", "pdf_cff_extract", "semdedup_greedy",
        "quality_classifier", "ann_sq8_topk", "ann_ivfpq_topk",
        # round 5: winnowed char dedup (must land well under
        # char_span_removal), mixed-case OCR, inline images, G3 fax,
        # predefined-CMap + CID-keyed-CFF text recovery
        "char_span_winnow", "ocr_mixed_case", "pdf_inline_image",
        "pdf_g3_scan", "pdf_ucs2_extract", "pdf_cffcid_extract",
        # round 5 wave 2: Type3 fonts, JBIG2 + JPX raster decode,
        # real H.264 frame OCR
        "pdf_type3_extract", "pdf_jbig2_scan", "pdf_jpx_scan",
        "video_frame_ocr", "flac_meta",
        # round 5 wave 3: standalone TIFF/BMP scan decode (CCITT/LZW/
        # PackBits strips through the OCR arm), gzip-member WARC
        "tiff_ocr_scan", "warc_gz_ingest",
        # round 5 wave 4: WHATWG charset-sniffed extraction; sampled
        # BPE training (learn on the hash subsample, apply fused);
        # Motion-JPEG MP4 frame decode + OCR
        "html_charset_1252", "phrase_merges_sampled", "video_mjpeg_ocr",
        "avi_mjpeg_ocr", "webp_meta", "sitemap_gz_parse",
        "wet_roundtrip", "epub_extract", "rtf_extract",
        "html_head_meta", "feed_discovery", "sitemap_index_parse",
        "mp3_meta", "html_jsonld",
    ]

    def run_extract():
        _noop_write(extract(pages, run_id="bench")["extracted"])

    tasks = [("extract_pipeline", run_extract)] + [
        (name, lambda n=name: _noop_write(queries[n](spark, SF_DIR)))
        for name in bench_names
    ]

    # --- interleaved min-of-N passes, calibration probe between ---
    timings: dict[str, float] = {}
    probes = [_calibration_probe()]
    for _p in range(N_PASSES):
        for name, fn in tasks:
            t0 = time.monotonic()
            fn()
            el = time.monotonic() - t0
            prev = timings.get(name)
            timings[name] = el if prev is None else min(prev, el)
        spark.catalog.clearCache()
        probes.append(_calibration_probe())
    timings = {k: round(v, 3) for k, v in timings.items()}
    calibration_sec = round(min(probes), 4)
    extract_docs_per_sec = round(
        N_EXTRACT_DOCS / timings["extract_pipeline"], 2)

    # --- per-query budget check (fail LOUD on >2x drift vs the pinned
    # numbers in BENCH/budgets.json, scaled by the host-speed factor so
    # contention can't flag unchanged code; refresh pins with
    # tools/pin_bench_budgets.py after an intentional change) ---
    violations: list[str] = []
    host_factor = 1.0
    budgets_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH", "budgets.json")
    if os.path.exists(budgets_path) and abs(_SF_GUESS - 0.1) < 1e-9:
        with open(budgets_path) as f:
            pins = json.load(f)
        budgets = pins.get("queries", {})
        calib_pin = pins.get("calibration_pin_sec")
        if calib_pin:
            host_factor = max(1.0, round(calibration_sec / calib_pin, 3))
        for name, sec in timings.items():
            pinned = budgets.get(name)
            if pinned and sec > 2.0 * pinned * host_factor:
                violations.append(
                    f"{name}: {sec}s > 2x pinned {pinned}s"
                    f" (host_factor {host_factor})")
        for v in violations:
            print(f"BUDGET VIOLATION: {v}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _SF_GUESS,
        "extract_docs": N_EXTRACT_DOCS,
        "extract_docs_per_sec": extract_docs_per_sec,
        "cpus": int(CPUS),
        "timing": f"min_of_{N_PASSES}_interleaved_passes_after_full_warmup",
        "calibration_sec": calibration_sec,
        "host_factor": host_factor,
        "host_degraded": host_factor > 1.3,
        "budget_violations": violations,
    }))
    spark.stop()
    if violations and os.environ.get("BENCH_STRICT"):
        sys.exit(1)


if __name__ == "__main__":
    main()
