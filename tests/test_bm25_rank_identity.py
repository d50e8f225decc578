"""M0 rank-identity gate: the Spark engine's BM25 must match the pure-
NumPy clone of the reference scorer (scores ≤1e-9 rel tol, top-k docID
sequences exact) on the synthetic fixture corpus, including the
duplicate-term / OOV / empty-token query paths."""

from __future__ import annotations

import numpy as np
import pytest

from legal_text_retrieval_spark.config import BM25Params, NORTH_STAR_BM25, REFERENCE_BM25
from legal_text_retrieval_spark.operators import bm25 as B
from legal_text_retrieval_spark.oracle.reference_scorer import (
    RefBM25,
    standardize_data,
    topk_desc,
    ws_split,
)


def _oracle(tiny_corpus_pdf, tiny_queries_pdf, params):
    corpus_tokens = [ws_split(standardize_data(c)) for c in tiny_corpus_pdf["content"]]
    ref = RefBM25(corpus_tokens, params)
    mat = np.stack(
        [
            ref.get_scores(ws_split(standardize_data(q)))
            for q in tiny_queries_pdf["query_text"]
        ]
    )
    return mat


@pytest.mark.parametrize("params", [REFERENCE_BM25, NORTH_STAR_BM25, BM25Params(variant="okapi")])
def test_scores_match_reference(
    spark, tiny_docs, tiny_queries, tiny_corpus_pdf, tiny_queries_pdf, params
):
    mat = _oracle(tiny_corpus_pdf, tiny_queries_pdf, params)
    got = (
        B.bm25_scores(tiny_docs, tiny_queries, params, score_round=None)
        .toPandas()
        .sort_values(["query_id", "doc_id"])
    )
    qids = sorted(tiny_queries_pdf["query_id"])
    qpos = {q: i for i, q in enumerate(tiny_queries_pdf["query_id"])}
    n_docs = len(tiny_corpus_pdf)
    assert len(got) == len(qids) * n_docs  # every (query, doc) pair scored
    want = np.stack([mat[qpos[q]] for q in qids]).ravel()
    np.testing.assert_allclose(got["score"].values, want, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("k", [10, 150])
def test_topk_rank_identical(spark, tiny_docs, tiny_queries, tiny_corpus_pdf, tiny_queries_pdf, k):
    params = REFERENCE_BM25
    mat = _oracle(tiny_corpus_pdf, tiny_queries_pdf, params)
    got = B.bm25_topk(tiny_docs, tiny_queries, params, k=k, score_round=None).toPandas()
    by_q = {q: g.sort_values("rank")["doc_id"].tolist() for q, g in got.groupby("query_id")}
    for i, q in enumerate(tiny_queries_pdf["query_id"]):
        want = topk_desc(mat[i], k).tolist()
        have = by_q[q]
        if have != want:
            # allow swaps only among score-exact ties at the same rank region
            s = mat[i]
            assert sorted(have) == sorted(want)
            for a, b in zip(have, want):
                if a != b:
                    assert s[a] == pytest.approx(s[b], rel=1e-12), (q, a, b)


def test_duplicate_query_terms_double_contribution(spark, tiny_docs, tiny_corpus_pdf):
    """A term appearing twice in a query contributes twice
    (/root/reference/src/custom_rank_bm25.py:149-160)."""
    import pandas as pd

    qdf = spark.createDataFrame(
        pd.DataFrame(
            {"query_id": ["single", "double"], "query_text": ["def", "def def"]}
        )
    )
    got = (
        B.bm25_scores(tiny_docs, qdf, REFERENCE_BM25, score_round=None)
        .toPandas()
        .pivot(index="doc_id", columns="query_id", values="score")
    )
    np.testing.assert_allclose(got["double"].values, 2 * got["single"].values, rtol=1e-9)
