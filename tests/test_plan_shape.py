"""Physical-plan pins: the properties that make the pipeline scale must
survive refactors — column pruning at the scan, pushable tail
predicate, broadcast joins for dimensions. (.explain-driven; SURVEY.md
§4.2 'free — verify, don't build'.)"""

import pytest
from pyspark.sql import functions as F


def _formatted(df):
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return jdf.queryExecution().explainString(mode.fromString("formatted"))


@pytest.fixture(scope="module")
def bench_pages(spark, tmp_path_factory):
    from lexoid_spark.corpus.gen import pages_df

    p = str(tmp_path_factory.mktemp("pp") / "pages")
    (
        pages_df(spark, 40)
        .withColumn("n_bytes", F.length("html").cast("long"))
        .write.parquet(p)
    )
    return spark.read.parquet(p)


def test_scan_prunes_to_needed_columns(spark, bench_pages):
    from lexoid_spark.plans.extract import extract

    plan = _formatted(extract(bench_pages)["extracted"])
    assert "ReadSchema: struct<url:string,html:binary,n_bytes:bigint>" in plan
    # warc_ts / text / lang never read
    assert "warc_ts" not in plan


def test_tail_predicate_pushed_to_parquet(spark, bench_pages):
    from lexoid_spark.plans.extract import extract

    plan = _formatted(extract(bench_pages)["extracted"])
    assert "GreaterThan(n_bytes,1048576)" in plan
    assert "IsNull(n_bytes)" in plan


def test_dimension_joins_broadcast(spark):
    import __spark_entry__ as em

    q3 = em.queries()["q3_shipping_priority"](spark, "/root/testdata/sf0.001")
    plan = _formatted(q3)
    assert "BroadcastHashJoin" in plan


def test_no_shuffle_without_repartition(spark, bench_pages):
    from lexoid_spark.plans.extract import extract

    plan = _formatted(extract(bench_pages, repartition=False)["extracted"])
    assert "Exchange" not in plan  # pure map pipeline


def test_bucketed_join_elides_shuffle(spark, tmp_path_factory):
    """J4 at scale: two url-bucketed tables equi-join with no Exchange."""
    from lexoid_spark.corpus.gen import pages_df
    from lexoid_spark.operators.partitioning import write_bucketed
    from lexoid_spark.plans.extract import extract

    pages = pages_df(spark, 30)
    ext = extract(pages, repartition=False)["extracted"].select("url", "raw")
    golden = ext.select("url", F.col("raw").alias("golden_raw"))
    write_bucketed(ext, "t_extracted", key="url", n_buckets=4)
    write_bucketed(golden, "t_golden", key="url", n_buckets=4)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at test scale Spark would broadcast; disable it to observe
        # the strategy 100 TB tables would get (sort-merge)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("t_extracted")
        b = spark.table("t_golden")
        joined = a.join(b, "url").filter(
            F.col("raw") != F.col("golden_raw"))
        plan = _formatted(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing co-locates both sides
        assert joined.count() == 0  # byte identity, while we're here
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS t_extracted")
        spark.sql("DROP TABLE IF EXISTS t_golden")


def test_dedup_plans_never_cartesian(spark):
    """LSH, portable SimHash, and IVF near-dup must stay bucket-local
    joins — a CartesianProduct anywhere is the O(N^2) scale-killer."""
    from lexoid_spark.functions.dedup import (
        lsh_candidate_pairs,
        simhash_near_pairs_portable,
    )
    from lexoid_spark.functions.similarity import embedding_near_dup_pairs

    docs = spark.createDataFrame(
        [(i, f"word{i} alpha beta gamma delta common tail")
         for i in range(30)],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, float(i % 3)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    for df in (
        lsh_candidate_pairs(docs, "doc_id", "text", num_hashes=8, bands=2),
        simhash_near_pairs_portable(docs, "doc_id", "text"),
        embedding_near_dup_pairs(emb, tau=0.5, n_centroids=4),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan


def test_lsh_size_probe_is_broadcast(spark):
    """The oversized-bucket probe joins back as a BROADCAST (tiny build
    side), not a shuffle of the full banded frame."""
    from lexoid_spark.functions.dedup import lsh_candidate_pairs

    docs = spark.createDataFrame(
        [(i, "same text everywhere for collisions") for i in range(20)],
        "doc_id long, text string",
    )
    pairs = lsh_candidate_pairs(docs, "doc_id", "text",
                                num_hashes=8, bands=2)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_curation_map_ops_zero_shuffle(spark):
    """pii_redact / normalize_url / stratified_sample are pure map
    expressions — they must ride the scan with NO Exchange."""
    from lexoid_spark.functions.curation import (
        normalize_url,
        pii_redact,
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, f"text {i}", f"https://Ex.com/{i}?utm_a=1", "en")
         for i in range(20)],
        "id long, text string, url string, lang string",
    )
    for out in (
        df.select(pii_redact("text")),
        df.select(normalize_url("url")),
        stratified_sample(df, "id", "lang", {"en": 0.5}),
    ):
        assert "Exchange" not in _formatted(out)


def test_ivf_assignment_is_map_only(spark):
    """Nearest-centroid assignment broadcasts ONE row of centroid
    structs: the vector side sees no Exchange, no per-vector window
    sort, no N×C row blowup (the only join is the broadcast of the
    single centroid-array row; the only Exchange is the C-row
    centroid-side aggregation)."""
    from lexoid_spark.functions.similarity import assign_clusters

    emb = spark.createDataFrame(
        [(i, [float(i % 5), 1.0, float(i % 2)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    plan = _formatted(assign_clusters(emb, n_centroids=4))
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row centroid side
    # the big (vector) side must not shuffle: the only hash Exchange
    # allowed is the tiny C-row centroid aggregation under the
    # broadcast build side
    assert plan.count("Exchange hashpartitioning") <= 1


def test_paragraph_dedup_keeper_partial_aggregates(spark):
    """The keeper choice must be an aggregation (map-side combine:
    HashAggregate appears in partial+final pairs), not a window over
    the paragraph-hash partition — a boilerplate paragraph shared by
    millions of docs would hot-spot a window partition."""
    from lexoid_spark.functions.curation import paragraph_dedup

    df = spark.createDataFrame(
        [(i, f"shared para\n\nown {i}") for i in range(10)],
        "id long, text string",
    )
    plan = _formatted(paragraph_dedup(df, "id", "text"))
    assert "Window" not in plan


def test_decontaminate_broadcasts_benchmark_grams(spark):
    """The benchmark n-gram set must be the broadcast build side; the
    corpus side must never shuffle its text (only id+hash pairs)."""
    from lexoid_spark.functions.curation import decontaminate

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in
         range(10)], "id long, text string")
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta eta theta",)], ["text"])
    plan = _formatted(decontaminate(docs, bench, "id", "text", n=5))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_charlm_table_is_broadcast(spark):
    """charlm_familiarity's per-lang top-k table must broadcast into
    the scoring join (the exploded corpus side never shuffles for it),
    and nothing in the plan may be a cartesian product."""
    from lexoid_spark.functions.curation import charlm_familiarity

    docs = spark.createDataFrame(
        [(i, "spark data " * 20, "en") for i in range(30)],
        "doc_id long, text string, lang string")
    plan = _formatted(charlm_familiarity(docs, "doc_id", "text", "lang"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_c4_filter_zero_shuffle(spark):
    """c4_line_filter is split + higher-order filter + array_join —
    pure map expressions that must ride the scan with NO Exchange."""
    from lexoid_spark.functions.curation import c4_line_filter

    df = spark.createDataFrame(
        [(i, "a line with plenty of words here.\nshort.") for i in
         range(20)], "id long, text string")
    assert "Exchange" not in _formatted(c4_line_filter(df, "id", "text"))


def test_dsir_bucket_tables_broadcast(spark):
    """DSIR's raw+target bucket counts come from ONE combined
    aggregation whose <= n_buckets-row result is the broadcast build
    side of the scoring join; the exploded corpus never shuffles for
    it (only the final groupBy(id) exchanges), and nothing goes
    cartesian."""
    from pyspark.sql import functions as F

    from lexoid_spark.functions.curation import dsir_weights

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta", "en" if i % 2 else "de")
         for i in range(30)], "id long, text string, lang string")
    plan = _formatted(
        dsir_weights(df, "id", "text", F.col("lang") == "en"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # corpus never shuffles to score
    assert "CartesianProduct" not in plan


def test_unimax_no_cartesian_alloc_broadcast(spark):
    """unimax_sample: the K-row allocation table must broadcast into
    the rank filter; no cartesian products anywhere."""
    from lexoid_spark.functions.curation import unimax_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(30)],
        "id long, lang string")
    plan = _formatted(unimax_sample(df, "id", "lang", 50))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dup_span_removal_no_window_no_cartesian(spark):
    """duplicate_span_removal's dup-gram detection must be a two-level
    aggregation (map-side combinable — a boilerplate gram in 10^9 docs
    partially aggregates), never a window over the gram-hash
    partition, and nothing may go cartesian."""
    from lexoid_spark.functions.curation import duplicate_span_removal

    df = spark.createDataFrame(
        [(i, "one two three four five six seven eight tail%d" % i)
         for i in range(10)], "id long, text string")
    # materialize=False: pin the LOGICAL shape (the default pins the
    # shared gram frame, which explain renders as an opaque cache scan)
    plan = _formatted(duplicate_span_removal(df, "id", "text", n=8,
                                             materialize=False))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_char_span_removal_no_window_no_cartesian(spark):
    """char_span_removal keeps the same scale shape as the word
    variant: two-level map-side-combinable dup detection, interval
    masking via per-row HOF folds — never a window function, never a
    cartesian; fingerprints come straight from the Arrow-batched
    mapInPandas kernel (no explode, no row-at-a-time Python)."""
    from lexoid_spark.functions.curation import char_span_removal

    df = spark.createDataFrame(
        [(i, ("shared boilerplate text that is long enough! " * 2)
          + "tail%d" % i) for i in range(10)],
        "id long, text string")
    plan = _formatted(char_span_removal(df, "id", "text", w=40,
                                        materialize=False))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate (" not in plan
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_tfidf_scalar_broadcast(spark):
    """tfidf_topk's corpus-size N is a one-row broadcast (nested-loop
    broadcast join is fine for 1 row); no CartesianProduct; the rank
    window partitions by doc id only."""
    from lexoid_spark.functions.textstats import tfidf_topk

    df = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(10)],
        "id long, text string")
    plan = _formatted(tfidf_topk(df, "id", "text"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_quality_classifier_zero_shuffle(spark):
    """The linear quality classifier is one higher-order fold per row
    (hash -> integer weight -> sum) — it must ride the scan with NO
    Exchange; the custom-weights arm broadcasts its one-row table."""
    from lexoid_spark.functions.curation import linear_quality_classifier

    df = spark.createDataFrame(
        [(i, "some words to score here") for i in range(20)],
        "id long, text string")
    assert "Exchange" not in _formatted(
        linear_quality_classifier(df, "id", "text"))
    custom = _formatted(linear_quality_classifier(
        df, "id", "text", n_buckets=16, weights={0: 3}))
    assert "BroadcastNestedLoopJoin" in custom or "BroadcastExchange" in custom
    assert "CartesianProduct" not in custom


def test_char_span_winnow_shape(spark):
    """char_span_winnow keeps the exact variant's scale shape (no
    window function, no cartesian) while hashing + selection ride the
    scan in ONE Arrow-batched mapInPandas kernel that emits the
    selected fingerprints directly — no explode, no per-row hash
    arrays, no per-window md5, no row-at-a-time Python."""
    from lexoid_spark.functions.curation import char_span_removal_winnow

    df = spark.createDataFrame(
        [(i, ("shared boilerplate text that is long enough! " * 2)
          + "tail%d" % i) for i in range(10)],
        "id long, text string")
    plan = _formatted(char_span_removal_winnow(df, "id", "text", w=40, k=8,
                                               materialize=False))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate (" not in plan
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_frame_ocr_is_map_only(spark):
    """frame_ocr is a row-expanding mapInPandas over the video
    column — per-frame OCR must ride the scan with NO Exchange (at
    10^12 docs the frame fan-out must stay inside the input
    partitioning; any shuffle here would move raw video bytes)."""
    from lexoid_spark.functions.multimodal import frame_ocr

    df = spark.createDataFrame(
        [(i, b"\x00\x00\x00\x01\x67") for i in range(8)],
        "id long, payload binary",
    )
    plan = _formatted(frame_ocr(df, every_n=2))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_parse_sitemap_bytes_zero_shuffle(spark):
    """Byte-level sitemap ingestion must ride the scan: one
    mapInPandas gunzip+decode, then the native block split — no
    Exchange anywhere (at 10^8 hosts a shuffle here would move raw
    sitemap blobs)."""
    from lexoid_spark.operators.robots import parse_sitemap_bytes

    df = spark.createDataFrame(
        [("h%d" % i, bytearray(b"<urlset></urlset>")) for i in range(8)],
        "host string, sitemap_blob binary")
    plan = _formatted(parse_sitemap_bytes(df))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_phrase_merges_sampled_apply_is_fused(spark):
    """The sampled trainer's apply stage: ALL learned merges fuse into
    ONE projection of chained literal-pattern regexp_replace calls —
    never a cartesian, never a per-merge shuffle or join of the
    corpus (r6: the former one-row broadcast pattern frame cost a
    default-parallelism Python parallelize job per invocation; scalar
    string literals generate value-independent code, so the codegen
    cache still hits across invocations)."""
    from lexoid_spark.functions.tokenizer import phrase_merges

    df = spark.createDataFrame(
        [(i, "a b c d a b") for i in range(12)],
        "id long, text string")
    out = phrase_merges(df, "id", "text", n_merges=2, sample_mod=3)
    plan = _formatted(out)
    assert "CartesianProduct" not in plan
    assert "Join" not in plan          # apply is join-free now
    assert plan.count("regexp_replace") >= 2  # fused chain, one Project
