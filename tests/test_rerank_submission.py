"""Rerank ingestion (S11 TSV → softmax/argmax → ensemble/eval) and the
submission JSON sink (S10) — the reference's second-stage plumbing."""

from __future__ import annotations

import json
import math
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def logits_pdf():
    rng = np.random.default_rng(3)
    n = 40
    return pd.DataFrame(
        {
            "query_id": np.repeat(np.arange(8), 5),
            "doc_id": np.tile(np.arange(5), 8),
            "logit0": rng.normal(size=n),
            "logit1": rng.normal(size=n),
        }
    )


def test_rerank_softmax_matches_numpy(spark, logits_pdf):
    """prob == softmax(logits)[:, 1] (the torch.softmax clone,
    /root/reference/src/infer.py:143-145) and pred == argmax."""
    from legal_text_retrieval_spark.operators.rerank import rerank_ingest

    got = (
        rerank_ingest(spark.createDataFrame(logits_pdf), prob_round=None)
        .toPandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    z = logits_pdf[["logit0", "logit1"]].to_numpy()
    m = z.max(axis=1, keepdims=True)
    e = np.exp(z - m)
    want = e[:, 1] / e.sum(axis=1)
    assert np.allclose(got["prob"].to_numpy(), want, rtol=0, atol=1e-12)
    assert (got["pred"].to_numpy() == (z[:, 1] > z[:, 0]).astype(int)).all()


def test_rerank_from_prediction_tsv(spark, tmp_path, logits_pdf):
    """S11 → rerank: the TSV the reference writes
    (/root/reference/src/utils.py:341-345 reads test_results_mrpc.txt)
    round-trips through read_predictions_tsv into rerank_ingest."""
    from legal_text_retrieval_spark.operators.rerank import rerank_ingest
    from legal_text_retrieval_spark.sources.sinks import read_predictions_tsv

    p = tmp_path / "test_results_mrpc.txt"
    logits_pdf.to_csv(p, sep="\t", index=False)
    df = read_predictions_tsv(spark, str(p)).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("logit0").cast("double").alias("logit0"),
        F.col("logit1").cast("double").alias("logit1"),
    )
    got = rerank_ingest(df).toPandas()
    assert len(got) == len(logits_pdf)
    assert set(got.columns) == {"query_id", "doc_id", "prob", "pred"}
    assert got["prob"].between(0, 1).all()


def test_rerank_eval_chain_fallback(spark):
    """A query whose every pair is predicted negative must still
    contribute its best-prob candidate (J6 negative fallback —
    /root/reference/src/infer.py:325-331)."""
    from legal_text_retrieval_spark.operators.ensemble import (
        ensemble_predictions,
        with_negative_fallback,
    )
    from legal_text_retrieval_spark.operators.rerank import (
        rerank_ingest,
        rerank_model_output,
    )

    pdf = pd.DataFrame(
        {
            "query_id": [1, 1, 2, 2],
            "doc_id": [10, 11, 10, 11],
            # q1: one positive; q2: all negative (logit0 > logit1)
            "logit0": [0.0, 2.0, 3.0, 4.0],
            "logit1": [1.0, 0.0, 1.0, 2.0],
        }
    )
    m = rerank_model_output(rerank_ingest(spark.createDataFrame(pdf)))
    final = with_negative_fallback(ensemble_predictions([m])).toPandas()
    q2 = final[final.query_id == 2]
    # fallback picks the best mean_score among q2's candidates:
    # sigmoid(2-4) > sigmoid(1-3)? equal gaps -> tie on prob, doc_id
    # DESC wins -> doc 11
    assert len(q2) == 1 and q2.iloc[0].doc_id == 11 and q2.iloc[0].predicted == 1
    q1 = final[final.query_id == 1]
    assert len(q1) == 1 and q1.iloc[0].doc_id == 10


def test_submission_json_roundtrip(spark, tmp_path):
    """S10: nested submission objects match infer.py:336-348's shape
    and survive a write/read round-trip."""
    from legal_text_retrieval_spark.sources.sinks import (
        submission_nested,
        write_submission_json,
    )

    preds = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": ["H30-1-A", "H30-1-A", "H30-2-E"],
                "key": ["law1-->886-->", "law1-->887-->", "law9-->12-->"],
            }
        )
    )
    out = str(tmp_path / "submission")
    write_submission_json(preds, out)
    rows = []
    for f in Path(out).glob("part-*"):
        rows += [json.loads(line) for line in f.read_text().splitlines()]
    got = {r["question_id"]: r["relevant_articles"] for r in rows}
    assert got == {
        "H30-1-A": [
            {"law_id": "law1", "article_id": "886"},
            {"law_id": "law1", "article_id": "887"},
        ],
        "H30-2-E": [{"law_id": "law9", "article_id": "12"}],
    }
    # nested builder agrees with the files
    nested = {
        r.question_id: [a.asDict() for a in r.relevant_articles]
        for r in submission_nested(preds).collect()
    }
    assert nested == got


def test_chunked_retrieval_maps_to_parents(spark):
    """docs ∪ chunks retrieval: every returned doc_id is a PARENT id,
    ranks are dense from 1, and a long doc findable only through a
    late chunk is still retrieved."""
    from legal_text_retrieval_spark.config import NORTH_STAR_BM25
    from legal_text_retrieval_spark.operators.chunk import bm25_chunked_topk

    filler = " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "content": [
                    "alpha beta gamma",
                    filler + " needle haystack special",  # needle in window 1+
                    "unrelated text entirely",
                ],
            }
        )
    )
    qs = spark.createDataFrame(
        pd.DataFrame({"query_id": [0], "query_text": ["needle special"]})
    )
    got = bm25_chunked_topk(docs, qs, NORTH_STAR_BM25, k=3, size=30, stride=15).toPandas()
    assert set(got["doc_id"]) <= {0, 1, 2}
    assert sorted(got[got.query_id == 0]["rank"]) == list(range(1, len(got) + 1))
    assert got.sort_values("rank").iloc[0]["doc_id"] == 1
