"""Training-data pipeline operators over the driver's parquet tables.

Each module exposes ``QUERIES: dict[name, QuerySpec]`` where a QuerySpec
pairs a Spark builder ``fn(spark, sf_dir) -> DataFrame`` with the
equivalent DuckDB oracle SQL (or None for rows-only checks). Spark
expressions and oracle SQL are generated from the *same* Python
constants (hash seeds, stopword lists, hyperplanes, regex patterns) so
the two engines cannot drift.

Cross-engine float determinism rules used throughout:
* never compare raw float SUMs — double addition is order-dependent and
  Spark/DuckDB aggregate in different orders. Money/value sums round
  each term to an integer quantum first (exact int64 sums both sides).
* single-value float ops (divide, multiply, cosine of one pair) are
  bit-identical IEEE ops; round(x, 6) guards the hash.
* DuckDB ``sum(BIGINT)`` returns HUGEINT, which Python DB clients
  materialize as float64 (``1074.0``) — a silent hash-killer against
  Spark's int64 even when values are equal. Every ``sum(...)`` in a
  final SQL projection must be wrapped ``CAST(sum(...) AS BIGINT)``
  (CTE pass-throughs keep HUGEINT too — cast at the aggregation site).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    # DuckDB oracle; None -> rows-only check. A callable form
    # ``sql(sf_dir) -> str`` is for oracles whose constants are
    # data-derived (e.g. trained IVF centroids): the SQL is generated
    # from the same constants as the Spark plan *for a given sf_dir*.
    sql: Optional[str | Callable[[str], str]]

    def sql_for(self, sf_dir: str) -> Optional[str]:
        return self.sql(sf_dir) if callable(self.sql) else self.sql


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def all_queries() -> dict[str, QuerySpec]:
    from ocr_spark.functions import (
        dedup,
        extractops,
        relational,
        similarity,
        textops,
    )

    out: dict[str, QuerySpec] = {}
    for mod in (textops, dedup, similarity, relational, extractops):
        overlap = set(out) & set(mod.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out
