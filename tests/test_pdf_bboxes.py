"""PDF word-box side-channel (reference segments' "bboxes",
static_parser.py:450-458 normalization, :711-718 shape)."""

from pyspark.sql import functions as F

from lexoid_spark.corpus.gen import pages_df
from lexoid_spark.functions.udfs import pdf_word_boxes
from lexoid_spark.kernels.pdf_md import pdf_to_pages_with_bboxes
from lexoid_spark.operators.routing import with_doctype


def test_kernel_bboxes_normalized():
    from lexoid_spark.corpus.gen import gen_page_row

    # find a pdf fixture row
    for i in range(40):
        url, _ts, payload, _t, _l = gen_page_row(i)
        if "/pdf_" in url:
            pages = pdf_to_pages_with_bboxes(payload)
            assert pages, url
            boxes = [b for _p, _c, bb in pages for b in bb]
            assert boxes, url
            for word, (x0, top, x1, bottom) in boxes:
                assert word
                assert 0.0 <= x0 <= x1 <= 1.0
                assert 0.0 <= top <= bottom <= 1.0
            return
    raise AssertionError("no pdf fixture found")


def test_word_box_table_end_to_end(spark):
    pages = with_doctype(pages_df(spark, 40))
    # pdf_scanned docs are image-only (no text layer) — correctly
    # contribute zero word boxes; every text-bearing PDF must appear
    pdfs = pages.filter(
        (F.col("doctype") == "pdf") & ~F.col("url").contains("pdf_scanned")
    )
    n_pdfs = pdfs.count()
    assert n_pdfs >= 8
    boxes = pdf_word_boxes(pdfs)
    assert boxes.select("url").distinct().count() == n_pdfs
    stats = boxes.agg(
        F.min("x0"), F.max("x1"), F.min("top"), F.max("bottom"),
        F.count("*"),
    ).collect()[0]
    assert stats[4] > 50
    assert stats[0] >= 0.0 and stats[1] <= 1.0
    assert stats[2] >= 0.0 and stats[3] <= 1.0


def test_undecodable_pdf_contributes_no_boxes(spark):
    df = spark.createDataFrame(
        [("http://x/1", b"%PDF-1.4 garbage no xref")],
        "url string, html binary",
    )
    assert pdf_word_boxes(df).count() == 0
