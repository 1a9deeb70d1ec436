"""Every SQL-checkable operator must match its DuckDB oracle exactly
(row count, column names, order-insensitive values) — the same gate the
driver applies via __spark_entry__.queries()/oracle_sql()."""

from __future__ import annotations

import pytest

from ocr_spark.functions import all_queries
from ocr_spark.functions.compare import compare_query

SF_DIR = "/root/testdata/sf0.001"

_SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_query_matches_oracle(spark, name):
    spec = _SPECS[name]
    r = compare_query(spark, SF_DIR, name, spec)
    assert r["ok"], r["detail"]
    assert r["rows"] > 0, "query returned no rows"


@pytest.mark.parametrize("name", ["events_sessionize", "events_rollup"])
def test_timestamp_queries_survive_foreign_session_tz(spark, name):
    """The driver's session may not be UTC; the timestamp queries pin the
    session TZ themselves, so the oracle hash must stay green even when
    the harness session starts in another zone."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        r = compare_query(spark, SF_DIR, name, _SPECS[name])
        assert r["ok"], r["detail"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
