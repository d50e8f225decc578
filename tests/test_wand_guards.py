"""Scale/correctness guards on the index query path: the term_id
driver-collect size guard and the okapi negative-ε precondition."""

from __future__ import annotations

import pandas as pd
import pytest

from legal_text_retrieval_spark.config import BM25Params, IndexParams


def _build(spark, docs, path, variant="plus"):
    from legal_text_retrieval_spark.index import builder, wand

    params = IndexParams(
        block_size=16, segment_doc_window=64, bm25=BM25Params(variant=variant)
    )
    paths = builder.build_index(spark, docs, str(path), params)
    return wand.FulltextIndex.load(spark, paths.root)


def test_term_id_guard_semi_join_same_results(
    spark, tiny_docs, tiny_queries, tmp_path, monkeypatch
):
    """Above TERM_ID_PUSHDOWN_LIMIT the postings restriction switches
    from an .isin literal list to a broadcast LEFT SEMI join — results
    must be identical."""
    from legal_text_retrieval_spark.index import wand

    index = _build(spark, tiny_docs, tmp_path / "idx")
    want = sorted(
        map(tuple, wand.query_topk(index, tiny_queries, k=5, score_round=6).collect())
    )
    monkeypatch.setattr(wand, "TERM_ID_PUSHDOWN_LIMIT", 1)
    got_df = wand.query_topk(index, tiny_queries, k=5, score_round=6)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan
    assert sorted(map(tuple, got_df.collect())) == want


def test_wide_query_batch_over_guard(spark, tiny_docs, tmp_path):
    """A query whose term count exceeds the pushdown guard still runs
    (semi-join path) and returns a full top-k."""
    from legal_text_retrieval_spark.index import wand

    index = _build(spark, tiny_docs, tmp_path / "idx2")
    # 10k-term query text: mostly OOV terms + a few real ones
    terms = [f"zz{i}" for i in range(10_000)] + ["the", "def"]
    q = spark.createDataFrame(
        pd.DataFrame({"query_id": [0], "query_text": [" ".join(terms)]})
    )
    assert len(terms) > wand.TERM_ID_PUSHDOWN_LIMIT
    out = wand.query_topk(index, q, k=3, score_round=6).collect()
    assert len(out) == 3


def test_okapi_negative_eps_index_refused(spark, tmp_path):
    """Repetitive tiny-vocab corpus → mean idf0 < 0 → negative ε floor:
    the index/serving paths must refuse (WAND bounds and δ-padding
    assume non-negative weights); the relational path handles it via
    its dense fallback (test_plans.py)."""
    from legal_text_retrieval_spark.index import wand
    from legal_text_retrieval_spark.index.serving import LocalIndexServer

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(6),
                "content": ["aa bb", "aa bb", "aa bb cc", "aa cc", "bb cc", "aa bb cc"],
            }
        )
    )
    index = _build(spark, docs, tmp_path / "idx3", variant="okapi")
    assert index.manifest["min_idf"] < 0
    q = spark.createDataFrame(pd.DataFrame({"query_id": [0], "query_text": ["aa"]}))
    with pytest.raises(ValueError, match="negative idf"):
        wand.query_topk(index, q, k=3)
    with pytest.raises(ValueError, match="negative idf"):
        LocalIndexServer.load(spark, str(tmp_path / "idx3"))
