"""Pipe-table kernel tests (tabulate-pipe-shaped output, pinned widths)."""

from lexoid_spark.kernels.table_md import (
    clean_table_grid,
    csv_to_md,
    rows_to_pipe_table,
)


def test_simple_pipe_table():
    got = rows_to_pipe_table(["name", "qty"], [["apple", "3"], ["fig", "12"]])
    assert got == (
        "| name  | qty |\n"
        "|:------|----:|\n"
        "| apple |   3 |\n"
        "| fig   |  12 |"
    )


def test_text_column_left_aligned():
    got = rows_to_pipe_table(["a"], [["xy"]])
    assert got.splitlines()[1] == "|:----|"


def test_csv_to_md():
    got = csv_to_md(b"h1,h2\nv1,v2\n")
    assert got.splitlines()[0] == "| h1  | h2  |"
    assert got.splitlines()[1] == "|:----|:----|"
    assert got.splitlines()[2] == "| v1  | v2  |"


def test_clean_table_grid_drops_empty_and_promotes_header():
    grid = [
        ["h1", "h2", None],
        [None, None, None],     # all-NA row dropped
        ["a", "b", None],       # all-NA col 3 dropped
    ]
    got = clean_table_grid(grid)
    lines = got.splitlines()
    assert lines[0] == "| h1  | h2  |"
    assert lines[2] == "| a   | b   |"


def test_multiline_cell_br():
    got = rows_to_pipe_table(["h"], [["line1\nline2"]])
    assert "line1<br>line2" in got


def test_empty_csv():
    assert csv_to_md(b"") == ""
