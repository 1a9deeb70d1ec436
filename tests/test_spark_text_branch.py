"""The Catalyst boilerplate expression must equal the Python classifier
byte-for-byte on every fixture text span (and crafted edge cases)."""

from __future__ import annotations

import numpy as np

from ocr_spark.spark.text_branch import main_content_col
from ocr_spark.textproc.boilerplate import extract_main_content


def _cases() -> list[str]:
    from ocr_spark.fixtures import make_text_span

    rng = np.random.default_rng(7)
    cases = [make_text_span(rng, f"t{i}") for i in range(120)]
    cases += [
        "",
        "\n\n",
        "   \n\n  ",
        "only one block without terminal",
        "The the the of and to in is it you.",
        "© 2024 Example Corp",
        "(c) someone",
        "Copyright 2020 Acme",
        "copyrighted material is discussed here in a long sentence with the and of.",
        "a https://x.example/y b www.example.com c d",
        "word www.dots more",
        "SHORT HEADER",
        "Ends with question?",
        "Ends with bang!",
        "six words here no stop words",
        "tab\tseparated words without terminal here",
        "block one\n\nblock two.\n\n© footer\n\nitem0 https://e.com/0 item1 https://e.com/1",
        "trailing spaces end.   ",
        "unicode — dash © inline not at start",
        "multi\nline\nsingle block ends.",
    ]
    return cases


def test_catalyst_matches_python(spark):
    from pyspark.sql import functions as F

    cases = _cases()
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "id int, text string")
    got = {
        r["id"]: r["out"]
        for r in df.select("id", main_content_col(F.col("text")).alias("out")).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == extract_main_content(c), repr(c)
