"""Distributed term-id assignment must equal the single-window
assignment exactly (dense ids in global lexical order)."""

from __future__ import annotations

import pandas as pd


def test_distributed_assignment_matches_window(spark, tiny_docs):
    from legal_text_retrieval_spark.index.builder import assign_term_ids
    from legal_text_retrieval_spark.operators.stats import document_frequencies

    dfreq = document_frequencies(tiny_docs)
    a = (
        assign_term_ids(dfreq, distributed=False)
        .select("term", "term_id")
        .toPandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    b = (
        assign_term_ids(dfreq, distributed=True)
        .select("term", "term_id")
        .toPandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    # dense 0..V-1, lexical order
    assert sorted(a["term_id"]) == list(range(len(a)))
    assert a.sort_values("term_id")["term"].is_monotonic_increasing
