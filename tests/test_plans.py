"""Physical-plan gates: the plans the engine must produce at scale —
broadcast joins for dictionary/query sides, term_id pushdown into the
postings scan, column pruning."""

from __future__ import annotations

import pandas as pd
import pytest

from legal_text_retrieval_spark.config import NORTH_STAR_BM25
from legal_text_retrieval_spark.plans import explain as X


def test_bm25_query_side_broadcasts(spark, tiny_docs, tiny_queries):
    from legal_text_retrieval_spark.operators.bm25 import bm25_scores

    df = bm25_scores(tiny_docs, tiny_queries, NORTH_STAR_BM25)
    # small sides (query terms, per-query constants) must broadcast;
    # the big score-matrix left join may legitimately shuffle at scale.
    plan = X.assert_broadcast_join(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_postings_scan_prunes_term_ids(spark, tiny_docs, tiny_queries, tmp_path):
    from legal_text_retrieval_spark.config import BM25Params, IndexParams
    from legal_text_retrieval_spark.index import builder, wand

    params = IndexParams(block_size=16, segment_doc_window=64, bm25=BM25Params(k1=1.2))
    paths = builder.build_index(spark, tiny_docs, str(tmp_path / "idx"), params)
    index = wand.FulltextIndex.load(spark, paths.root)
    out = wand.query_topk(index, tiny_queries.limit(3), k=5)
    plan = X.formatted_plan(out)
    assert "PushedFilters" in plan and "term_id" in plan.split("PushedFilters", 1)[1][:500]


def test_docstats_scan_prunes_columns(spark, tiny_docs, tmp_path):
    from legal_text_retrieval_spark.operators.stats import doc_lengths

    p = str(tmp_path / "docs.parquet")
    tiny_docs.write.mode("overwrite").parquet(p)
    df = doc_lengths(spark.read.parquet(p))
    X.assert_read_schema_only(df, {"doc_id", "content"})
    assert X.codegen_stage_count(df) >= 1
