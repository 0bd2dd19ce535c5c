"""SQL surface (lexoid_spark/sql.py): operator views queryable via
spark.sql, with plans that still prune/push down."""

SF = "/root/testdata/sf0.001"


def test_views_agree_with_dataframe_api(spark):
    from lexoid_spark.functions.textstats import quality_score
    from lexoid_spark.sql import register_views
    from pyspark.sql import functions as F

    names = register_views(spark, SF)
    assert "v_doc_quality" in names and "v_gopher" in names

    via_sql = {r["doc_id"]: r["quality"] for r in spark.sql(
        "SELECT doc_id, quality FROM v_doc_quality").collect()}
    via_df = {r["doc_id"]: r["q"] for r in (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", quality_score(F.col("text")).alias("q"))
        .collect())}
    assert via_sql == via_df


def test_sql_joins_across_views(spark):
    from lexoid_spark.sql import register_views

    register_views(spark, SF)
    rows = spark.sql("""
        SELECT g.doc_id FROM v_gopher g
        JOIN v_dedup_keepers k ON g.doc_id = k.doc_id
        WHERE g.passes ORDER BY g.doc_id
    """).collect()
    assert rows  # quality-passing keepers exist at sf0.001


def test_view_plan_prunes_scan(spark):
    from lexoid_spark.sql import register_views

    register_views(spark, SF)
    plan = spark.sql(
        "SELECT doc_id FROM v_pii_clean WHERE doc_id < 10"
    )._jdf.queryExecution().executedPlan().toString()
    # the filter reaches the parquet scan through the view
    assert "doc_id" in plan and "PushedFilters: [" in plan


def test_round3_views_present_and_queryable(spark):
    from lexoid_spark.sql import register_views

    names = register_views(spark, SF)
    for v in ("v_tfidf_topk", "v_inverted_postings", "v_dsir_weights",
              "v_unimax_alloc"):
        assert v in names
    top = spark.sql("""
        SELECT doc_id, term FROM v_tfidf_topk
        WHERE rank = 1 ORDER BY doc_id LIMIT 5
    """).collect()
    assert len(top) == 5
    alloc = spark.sql(
        "SELECT sum(alloc) AS a, sum(cap) AS c FROM v_unimax_alloc"
    ).collect()[0]
    assert 0 < alloc["a"] <= alloc["c"]
