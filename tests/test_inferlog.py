"""E4 stdout-parser semantics (deepseek.py:213-262) — python twin vs
crafted transcripts, and the three-engine agreement (python / Spark
Catalyst / DuckDB) on synthesized wrappers."""

from __future__ import annotations

from ocr_spark.extract.inferlog import parse_infer_output

M = "=" * 21
B = "=" * 15


def _wrap(text: str) -> str:
    return (
        f"{M}\nBASE:  torch.Size([1, 3])\nPATCHES:  torch.Size([4])\n{M}\n"
        f"{text}\n===============save results:===============\ndebug tail"
    )


def test_basic_roundtrip():
    assert parse_infer_output(_wrap("hello\nworld")) == "hello\nworld"


def test_marker_counting_and_break():
    raw = f"{M}\njunk\n{M}\nkeep1\n\nkeep2\nsave results here\nlost"
    assert parse_infer_output(raw) == "keep1\n\nkeep2"


def test_debug_lines_dropped_inside_text():
    raw = f"{M}\n{M}\nkeep\n  BASE: x\nPATCHES: y\nalso keep\n{B}\n"
    assert parse_infer_output(raw) == "keep\nalso keep"


def test_tab_indented_debug_lines_dropped():
    # str.strip() strips tabs too — tab-indented debug lines must drop
    raw = f"{M}\n{M}\nkeep\n\tBASE: x\n\t PATCHES: y\nalso keep\n{B}\n"
    assert parse_infer_output(raw) == "keep\nalso keep"


def test_no_markers_yields_empty():
    assert parse_infer_output("plain\ntext") == ""


def test_break_before_text_section():
    # a breaker line before the 2nd marker ends everything
    raw = f"{M}\n{B}\n{M}\nnever"
    assert parse_infer_output(raw) == ""


def test_third_marker_is_skipped_not_break():
    raw = f"{M}\n{M}\na\n{M}\nb\nsave results"
    assert parse_infer_output(raw) == "a\nb"


def test_strip_of_leading_trailing_blank_lines():
    raw = f"{M}\n{M}\n\n\nmid\n\n\nsave results"
    assert parse_infer_output(raw) == "mid"


def test_python_matches_duckdb_oracle():
    import duckdb

    from ocr_spark.functions.extractops import SQL_INFER_PARSE

    texts = [
        "simple one liner",
        "two\nlines here",
        "with\n\nblank paragraph",
        "BASE: looks like debug\nreal text",
        "\tBASE: tab-indented debug\nreal text",
        "ends with marker-ish ===============",  # breaker inside payload
        "",
    ]
    con = duckdb.connect()
    values = ", ".join(
        "({i}, '{t}')".format(i=i, t=t.replace("'", "''"))
        for i, t in enumerate(texts)
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {values}) t(doc_id, text)"
    )
    rows = {r[0]: r[1] for r in con.execute(SQL_INFER_PARSE).fetchall()}
    for i, t in enumerate(texts):
        want = parse_infer_output(_wrap(t))
        assert rows[i] == len(want), (i, t)


def test_spark_matches_python(spark):
    from pyspark.sql import functions as F

    from ocr_spark.functions.extractops import parse_infer_output_col

    cases = [
        _wrap("hello\nworld"),
        f"{M}\njunk\n{M}\nkeep1\n\nkeep2\nsave results here\nlost",
        "plain text no markers",
        f"{M}\n{B}\n{M}\nnever",
        f"{M}\n{M}\n\n\nmid\n\n\nsave results",
        f"{M}\n{M}\nkeep\n\tBASE: tab debug\n\t PATCHES: y\nalso keep\n{B}\n",
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "id int, raw string"
    )
    got = {
        r["id"]: r["out"]
        for r in df.select(
            "id", parse_infer_output_col(F.col("raw")).alias("out")
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == parse_infer_output(c), repr(c)
