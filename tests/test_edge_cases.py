"""Degenerate inputs the driver or a user could throw at the engine:
single-doc corpus, single-token docs, empty-string docs, lang-filtered
(pushdown) builds."""

from __future__ import annotations

import tempfile

import pandas as pd
import pytest

from legal_text_retrieval_spark.config import BM25Params, IndexParams
from legal_text_retrieval_spark.index import builder, wand
from legal_text_retrieval_spark.operators import bm25 as B

PARAMS = IndexParams(block_size=4, segment_doc_window=8, bm25=BM25Params(k1=1.2))


def _check(spark, docs_pdf, query_text, k):
    docs = spark.createDataFrame(docs_pdf)
    root = tempfile.mkdtemp(prefix="edge_")
    builder.build_index(spark, docs, root, PARAMS)
    idx = wand.FulltextIndex.load(spark, root)
    q = spark.createDataFrame(pd.DataFrame({"query_id": ["q"], "query_text": [query_text]}))
    got = wand.query_topk(idx, q, k=k).toPandas().sort_values("rank")
    want = (
        B.bm25_topk(docs, q, PARAMS.bm25, k=k, score_round=None).toPandas().sort_values("rank")
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert (got["score"].values.view("int64") == want["score"].values.view("int64")).all()
    return got


def test_single_doc_corpus(spark):
    pdf = pd.DataFrame({"doc_id": [0], "content": ["def foo return"]})
    got = _check(spark, pdf, "def", k=3)
    assert len(got) == 1  # only one doc exists — k capped by corpus


def test_empty_string_docs(spark):
    pdf = pd.DataFrame(
        {"doc_id": [0, 1, 2], "content": ["", "def foo", "  "]}
    )
    _check(spark, pdf, "def", k=3)


def test_all_docs_identical(spark):
    pdf = pd.DataFrame({"doc_id": list(range(10)), "content": ["x y z"] * 10})
    got = _check(spark, pdf, "x", k=5)
    # perfect ties → reference argsort order: highest doc_ids first
    assert got["doc_id"].tolist() == [9, 8, 7, 6, 5]


def test_lang_filtered_build_pushes_filter(spark, tiny_docs, tmp_path):
    """SURVEY §4: lang-filtered index builds ride on parquet predicate
    pushdown — the filter must reach the scan."""
    from pyspark.sql import functions as F

    from legal_text_retrieval_spark.plans.explain import formatted_plan

    p = str(tmp_path / "corpus")
    tiny_docs.write.mode("overwrite").parquet(p)
    src = spark.read.parquet(p).filter(F.col("lang") == "py")
    plan = formatted_plan(src)
    assert "PushedFilters" in plan and "lang" in plan.split("PushedFilters", 1)[1][:300]
    root = str(tmp_path / "pyidx")
    builder.build_index(spark, src, root, PARAMS)
    idx = wand.FulltextIndex.load(spark, root)
    assert idx.manifest["n_docs"] == src.count()
