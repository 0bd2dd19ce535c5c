"""Bounding-box utilities F17-F20 (utils.py:645-862 analogues)."""

from lexoid_spark.kernels.bbox_ops import (
    find_bboxes_for_substring,
    merge_bboxes,
    split_bbox_by_word_length,
)


def test_merge_adjacent_same_line():
    boxes = [
        (0.10, 0.10, 0.20, 0.12),
        (0.21, 0.10, 0.30, 0.12),   # gap 0.01 <= 0.02 → merge
        (0.40, 0.10, 0.50, 0.12),   # gap 0.10 → separate
        (0.10, 0.30, 0.20, 0.32),   # other line
    ]
    out = merge_bboxes(boxes)
    assert (0.10, 0.10, 0.30, 0.12) in out
    assert (0.40, 0.10, 0.50, 0.12) in out
    assert len(out) == 3
    assert merge_bboxes([]) == []


def test_merge_requires_vertical_overlap():
    a = (0.1, 0.10, 0.2, 0.12)
    b = (0.21, 0.20, 0.3, 0.22)  # adjacent in x but different band
    assert len(merge_bboxes([a, b])) == 2


def test_split_bbox_proportional():
    parts = split_bbox_by_word_length((0.0, 0.0, 1.0, 0.1), ["ab", "abcd"])
    assert len(parts) == 2
    # total weight = 2 + 4 + 1 separator = 7; first word 2/7 wide
    assert abs(parts[0][2] - 2 / 7) < 1e-9
    assert abs(parts[1][0] - 3 / 7) < 1e-9  # starts after the separator
    assert parts[1][3] == 0.1
    assert split_bbox_by_word_length((0, 0, 1, 1), []) == []


def test_find_substring_exact_and_fuzzy():
    wb = [
        ("the", (0.0, 0.0, 0.1, 0.1)),
        ("quick", (0.1, 0.0, 0.2, 0.1)),
        ("brown", (0.2, 0.0, 0.3, 0.1)),
        ("fox", (0.3, 0.0, 0.4, 0.1)),
    ]
    assert find_bboxes_for_substring(wb, "quick brown") == [
        (0.1, 0.0, 0.2, 0.1), (0.2, 0.0, 0.3, 0.1)]
    # fuzzy: one typo within 30% distance
    assert find_bboxes_for_substring(wb, "quick brwn") == [
        (0.1, 0.0, 0.2, 0.1), (0.2, 0.0, 0.3, 0.1)]
    # too far: nothing
    assert find_bboxes_for_substring(wb, "zzzzzz qqqqqq") == []
    assert find_bboxes_for_substring(wb, "") == []
    assert find_bboxes_for_substring([], "x") == []


def test_bpe_token_count_column(spark):
    from pyspark.sql import functions as F

    from lexoid_spark.functions.textstats import bpe_token_count

    df = spark.createDataFrame(
        [("Hello, world 42!",), ("",), ("one-two",)], "t string")
    got = [r["n"] for r in
           df.select(bpe_token_count(F.col("t")).alias("n")).collect()]
    # "Hello" "," " world" " 42" "!" → 5 ; "" → 0 ; "one" "-" "two" → 3
    assert got == [5, 0, 3]
