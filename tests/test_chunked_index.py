"""The reference retrieval configuration (docs ∪ chunks + parent
keep-first dedup, /root/reference/src/utils.py:263,169-183) served from
the packed index: WAND output must equal the relational
bm25_chunked_topk exactly, and serving mode must match both."""

from __future__ import annotations

import pytest

from legal_text_retrieval_spark.config import BM25Params
from legal_text_retrieval_spark.index import serving
from legal_text_retrieval_spark.operators.chunk import (
    CHUNK_ID_BASE,
    bm25_chunked_topk,
    bm25_chunked_topk_indexed,
    build_chunked_index,
)

PARAMS = BM25Params()
K = 10
CHUNK = dict(size=12, stride=6)


@pytest.fixture(scope="module")
def chunked_root(spark, tiny_docs, tmp_path_factory):
    return str(tmp_path_factory.mktemp("chunked_idx"))


@pytest.fixture(scope="module")
def indexed_hits(spark, tiny_docs, tiny_queries, chunked_root):
    return (
        bm25_chunked_topk_indexed(
            spark, tiny_docs, tiny_queries, PARAMS, k=K, out_dir=chunked_root, **CHUNK
        )
        .orderBy("query_id", "rank")
        .collect()
    )


def test_corpus_actually_has_chunks(spark, tiny_docs):
    from legal_text_retrieval_spark.operators.chunk import chunked_corpus

    corpus = chunked_corpus(tiny_docs, **CHUNK)
    n_chunks = corpus.filter(f"doc_id >= {CHUNK_ID_BASE}").count()
    assert n_chunks > 0  # otherwise the parity tests prove nothing


def test_indexed_matches_relational(spark, tiny_docs, tiny_queries, indexed_hits):
    want = (
        bm25_chunked_topk(tiny_docs, tiny_queries, PARAMS, k=K, **CHUNK)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [tuple(r) for r in indexed_hits] == [tuple(r) for r in want]


def test_chunks_place_in_topk(indexed_hits, spark, tiny_docs, tiny_queries):
    """At least one query's top-k must have been reordered/deduped by a
    chunk hit — i.e. the union corpus changes retrieval vs plain docs —
    otherwise the configuration under test degenerates."""
    from legal_text_retrieval_spark.operators.bm25 import bm25_topk

    plain = (
        bm25_topk(tiny_docs, tiny_queries, PARAMS, k=K)
        .select("query_id", "doc_id", "rank")
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [tuple(r) for r in indexed_hits] != [tuple(r) for r in plain]


def test_serving_parents_match_distributed(
    spark, tiny_docs, tiny_queries, tiny_queries_pdf, chunked_root, indexed_hits
):
    # the index was built by the indexed_hits fixture (resume hit here)
    build_chunked_index(spark, tiny_docs, chunked_root, PARAMS, **CHUNK)
    srv = serving.LocalIndexServer.load(spark, chunked_root)
    by_q: dict = {}
    for r in indexed_hits:
        by_q.setdefault(r.query_id, []).append(r.doc_id)
    for _, row in tiny_queries_pdf.iterrows():
        got = srv.query_parents(row.query_text, k=K)
        assert got == by_q.get(row.query_id, []), row.query_id
