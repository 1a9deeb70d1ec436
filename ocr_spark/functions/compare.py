"""Dev/test harness mirroring the driver's correctness gate: run a
QuerySpec's Spark builder and its DuckDB oracle over the same parquet
tables, then compare row count, column names, and order-insensitive
values exactly."""

from __future__ import annotations

import math
import os

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duckdb_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style canonicalization: floats compared at 6 dp
        return f"{v:.6f}"
    if v is None:
        return ""
    return str(v)


def compare_query(spark, sf_dir: str, name: str, spec) -> dict:
    """Returns {'name', 'ok', 'rows', 'detail'} like the driver records."""
    sdf = spec.fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sorted(sdf.columns)
    got = sorted(tuple(_canon(r[c]) for c in scols) for r in srows)
    out = {"name": name, "rows": len(got)}
    sql = spec.sql_for(sf_dir) if hasattr(spec, "sql_for") else spec.sql
    if sql is None:
        out["ok"] = True
        out["detail"] = "rows-only"
        return out
    con = duckdb_con(sf_dir)
    ores = con.execute(sql)
    ocols_raw = [d[0] for d in ores.description]
    orows = ores.fetchall()
    ocols = sorted(ocols_raw)
    if ocols != scols:
        out["ok"] = False
        out["detail"] = f"schema mismatch: spark={scols} oracle={ocols}"
        return out
    idx = [ocols_raw.index(c) for c in ocols]
    want = sorted(tuple(_canon(r[i]) for i in idx) for r in orows)
    if len(got) != len(want):
        out["ok"] = False
        out["detail"] = f"row count: spark={len(got)} oracle={len(want)}"
        return out
    if got != want:
        bad = next(
            (i for i, (g, w) in enumerate(zip(got, want)) if g != w), None
        )
        out["ok"] = False
        out["detail"] = (
            f"value mismatch at sorted row {bad}: "
            f"spark={got[bad]} oracle={want[bad]}"
        )
        return out
    out["ok"] = True
    out["detail"] = "exact"
    return out
