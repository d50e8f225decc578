"""Chunking (P5) exact-loop parity + pair-generation / evaluation
semantics (J1, E2/E3)."""

from __future__ import annotations

import pandas as pd
import pytest


def _ref_article_content(full_content: str, size: int, stride: int) -> list[str]:
    """Literal semantic clone of _article_content
    (/root/reference/src/utils.py:215-232), subs only."""
    words = full_content.split(" ")
    subs: list[str] = []
    if len(words) > size:
        for i_start in range(0, len(words), size - stride):
            sub = " ".join(words[i_start : i_start + size])
            subs.append(sub)
            if len(words[i_start : i_start + size]) < size:
                break
    # load_data_kse keeps a_content_s[1:10]; a_content_s[0] is the FULL
    # article (the parent), so the kept sub-articles are sub_contents
    # [0:9] = windows 0..8 — exactly subs[:9] here (verified by
    # executing the reference; see operators/chunk.py docstring).
    return subs[:9]


@pytest.mark.parametrize("size,stride", [(10, 5), (30, 15), (7, 3), (5, 4)])
def test_chunking_matches_reference_loop(spark, size, stride):
    from legal_text_retrieval_spark.operators.chunk import chunk_documents

    texts = [
        " ".join(f"w{i}" for i in range(n))
        for n in [0, 1, 4, 5, 6, 9, 10, 11, 14, 15, 19, 20, 21, 49, 50, 51, 100, 137]
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "content": texts})
    got = (
        chunk_documents(spark.createDataFrame(pdf), size=size, stride=stride)
        .toPandas()
        .sort_values(["doc_id", "sub_id"])
    )
    for i, t in enumerate(texts):
        want = _ref_article_content(t, size, stride)
        have = got[got.doc_id == i]["chunk"].tolist()
        assert have == want, (i, size, stride, len(t.split(" ")))


def test_pair_generation_append_gold(spark):
    from legal_text_retrieval_spark.operators.pairs import generate_pairs

    retrieved = spark.createDataFrame(
        pd.DataFrame({"query_id": [1, 1, 2], "doc_id": [10, 11, 20]})
    )
    qrels = spark.createDataFrame(
        pd.DataFrame({"query_id": [1, 2, 2], "doc_id": [11, 20, 99]})
    )
    got = generate_pairs(retrieved, qrels).toPandas()
    rows = {(r.query_id, r.doc_id): r.label for r in got.itertuples()}
    assert rows == {(1, 10): 0, (1, 11): 1, (2, 20): 1, (2, 99): 1}


def test_micro_eval_formula(spark):
    from legal_text_retrieval_spark.operators.evaluate import micro_eval

    pred = spark.createDataFrame(pd.DataFrame({"query_id": [1, 1, 2], "doc_id": [10, 11, 20]}))
    gold = spark.createDataFrame(pd.DataFrame({"query_id": [1, 2, 2], "doc_id": [11, 20, 99]}))
    r = micro_eval(pred, gold).collect()[0]
    assert (r.n_gold, r.n_pred, r.n_true) == (3, 3, 2)
    assert r.p == pytest.approx(2 / 3, rel=1e-9)
    assert r.r == pytest.approx(2 / 3, rel=1e-9)
    assert r.f1 == pytest.approx(2 / 3, rel=1e-9)
    assert r.f2 == pytest.approx(2 / 3, rel=1e-9)
