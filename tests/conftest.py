"""Shared Spark fixtures for the distributed-pipeline tests."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from ocr_spark.spark.session import get_spark

    s = get_spark("local[4]", app_name="ocr-spark-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


N_DOCS = 24
SKEW_SPANS = 12


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    from ocr_spark.spark.corpus import write_corpus_parquet

    d = tmp_path_factory.mktemp("corpus")
    write_corpus_parquet(str(d), n_docs=N_DOCS, skew_monster_spans=SKEW_SPANS)
    return str(d)


@pytest.fixture(scope="session")
def oracle_extracted():
    """doc_id -> (spans, metrics) from the single-process oracle."""
    from ocr_spark.core import process_document
    from ocr_spark.fixtures import build_corpus

    docs, media = build_corpus(n_docs=N_DOCS, skew_monster_spans=SKEW_SPANS)
    lookup = {m["media_ref"]: m["png"] for m in media}
    return {
        d["doc_id"]: process_document(
            d["doc_id"], d["spans"], lambda r: lookup.get(r)
        )
        for d in docs
    }
