"""TF-IDF cosine + combination modes vs the NumPy reference clone
(sklearn-default semantics; /root/reference/src/tfidf_classifier.py)."""

from __future__ import annotations

import numpy as np
import pytest

from legal_text_retrieval_spark.config import REFERENCE_BM25
from legal_text_retrieval_spark.operators import combine as CB
from legal_text_retrieval_spark.operators import tfidf as TF
from legal_text_retrieval_spark.oracle.reference_scorer import (
    RefBM25,
    RefTfidf,
    combine_interleave,
    combine_weighted,
    standardize_data,
    topk_desc,
    ws_split,
)


@pytest.fixture(scope="module")
def oracle_mats(tiny_corpus_pdf, tiny_queries_pdf):
    std_docs = [standardize_data(c) for c in tiny_corpus_pdf["content"]]
    tf = RefTfidf(std_docs)
    bm = RefBM25([ws_split(d) for d in std_docs], REFERENCE_BM25)
    cos = np.stack(
        [tf.cosine_scores(standardize_data(q)) for q in tiny_queries_pdf["query_text"]]
    )
    b25 = np.stack(
        [bm.get_scores(ws_split(standardize_data(q))) for q in tiny_queries_pdf["query_text"]]
    )
    return cos, b25


def _check_topk(got, mat, qids, k, rtol=1e-9):
    by_q = {q: g.sort_values("rank")["doc_id"].tolist() for q, g in got.groupby("query_id")}
    for i, q in enumerate(qids):
        want = topk_desc(mat[i], k).tolist()
        have = by_q[q]
        if have != want:
            assert sorted(have) == sorted(want), q
            for a, b in zip(have, want):
                if a != b:
                    assert mat[i][a] == pytest.approx(mat[i][b], rel=1e-9), (q, a, b)


def test_tfidf_cosine_topk_matches_oracle(
    spark, tiny_docs, tiny_queries, tiny_queries_pdf, oracle_mats
):
    cos, _ = oracle_mats
    got = TF.tfidf_cosine_topk(tiny_docs, tiny_queries, k=10, score_round=None).toPandas()
    _check_topk(got, cos, tiny_queries_pdf["query_id"], 10)
    # spot-check score values
    sample = got.head(50)
    qpos = {q: i for i, q in enumerate(tiny_queries_pdf["query_id"])}
    for r in sample.itertuples():
        assert cos[qpos[r.query_id]][r.doc_id] == pytest.approx(r.score, rel=1e-9, abs=1e-12)


def test_combine_weighted_matches_oracle(
    spark, tiny_docs, tiny_queries, tiny_queries_pdf, oracle_mats
):
    cos, b25 = oracle_mats
    final = combine_weighted(cos, b25)
    got = CB.combine_weighted_topk(
        tiny_docs, tiny_queries, REFERENCE_BM25, k=10, score_round=None
    ).toPandas()
    _check_topk(got, final, tiny_queries_pdf["query_id"], 10)


def test_combine_interleave_matches_oracle(
    spark, tiny_docs, tiny_queries, tiny_queries_pdf, oracle_mats
):
    cos, b25 = oracle_mats
    k = 10
    idx_tfidf = cos.argsort(kind="stable")[:, ::-1][:, :k]
    idx_bm25 = b25.argsort(kind="stable")[:, ::-1][:, :k]
    want = combine_interleave(idx_tfidf, idx_bm25, k)
    got = CB.combine_interleave_topk(tiny_docs, tiny_queries, REFERENCE_BM25, k=k).toPandas()
    by_q = {q: g.sort_values("rank")["doc_id"].tolist() for q, g in got.groupby("query_id")}
    mismatch = 0
    for i, q in enumerate(tiny_queries_pdf["query_id"]):
        if by_q[q] != want[i]:
            mismatch += 1
    # interleave depends on exact source-rank order; float-tie swaps in
    # either source list may permute it — allow a small fraction
    assert mismatch <= max(1, len(want) // 10), f"{mismatch} interleaves differ"


def test_stopwords_exists_semantics(spark, tiny_docs, tiny_corpus_pdf):
    """A8: term kept if weight < t in ANY doc (EXISTS, not ALL)."""
    thr = 0.2
    std_docs = [standardize_data(c) for c in tiny_corpus_pdf["content"]]
    tf = RefTfidf(std_docs)
    want = set()
    for vec in tf.doc_vecs:
        for term, w in vec.items():
            if w < thr:
                want.add(term)
    got = {
        r.term
        for r in TF.stopwords_low_tfidf(tiny_docs, threshold=thr).collect()
    }
    # float-boundary terms may differ by engine rounding; allow tiny slack
    assert len(got.symmetric_difference(want)) <= max(1, len(want) // 200)
