"""Mirror of the driver gate over __spark_entry__: the three physical
extraction modes must hash-match the golden spans table (the
single-process oracle, precomputed by functions/golden.py), and the
golden build itself must be deterministic."""

from __future__ import annotations

import pytest

from ocr_spark.functions import QuerySpec
from ocr_spark.functions.compare import compare_query

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("mode", ["fused", "staged", "hybrid"])
def test_extract_pipeline_matches_golden(spark, mode):
    import __spark_entry__ as E

    name = f"extract_pipeline_{mode}"
    spec = QuerySpec(E.queries()[name], E.oracle_sql()[name])
    r = compare_query(spark, SF_DIR, name, spec)
    assert r["ok"], r["detail"]
    assert r["rows"] > 0


def test_all_queries_have_oracles():
    """Round-2 target: zero rows-only entries — every driver query is
    hash-gated (image paths via golden tables)."""
    import __spark_entry__ as E

    q = E.queries()
    sql = E.oracle_sql()
    missing = sorted(set(q) - set(sql))
    assert missing == [], missing


def test_golden_build_is_idempotent_and_complete():
    import os

    from ocr_spark.functions.golden import _TABLES, ensure_golden, golden_path

    d1 = ensure_golden()
    d2 = ensure_golden()
    assert d1 == d2
    for t in _TABLES:
        assert os.path.exists(golden_path(t)), t
