from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from legal_text_retrieval_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="lts-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus_pdf():
    from legal_text_retrieval_spark.fixtures import make_corpus

    return make_corpus(200)


@pytest.fixture(scope="session")
def tiny_queries_pdf():
    from legal_text_retrieval_spark.fixtures import make_queries

    return make_queries(40)


@pytest.fixture(scope="session")
def tiny_docs(spark, tiny_corpus_pdf):
    """(doc_id, content, …) Spark DF with insertion-order doc_id."""
    pdf = tiny_corpus_pdf.copy()
    pdf.insert(0, "doc_id", range(len(pdf)))
    return spark.createDataFrame(pdf).cache()


@pytest.fixture(scope="session")
def tiny_queries(spark, tiny_queries_pdf):
    return spark.createDataFrame(tiny_queries_pdf).cache()
