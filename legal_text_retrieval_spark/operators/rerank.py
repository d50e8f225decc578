"""Neural-rerank score ingestion (stage 2 of the reference pipeline).

The reference's second stage consumes the lexical top-k as (query, doc)
pairs, runs a cross-encoder, and turns the resulting 2-class logits
into predictions:

- ``torch.softmax(logits, dim=1)`` → per-pair probability of the
  positive class (/root/reference/src/infer.py:143-145,
  /root/reference/src/utils.py:345,361);
- predicted label = argmax ⇔ ``logit1 > logit0``
  (/root/reference/src/utils.py:391);
- positive pairs (keep-first dedup) feed the ensemble/eval path
  (/root/reference/src/utils.py:357-370).

This module is the relational form of that ingestion: the logits
relation (query_id, doc_id, logit0, logit1) — the shape the reference
reads from ``test_results_mrpc.txt`` + ``test.tsv``
(/root/reference/src/utils.py:341-345, read via sinks.read_predictions_tsv)
— goes through an exact 2-class softmax (a pure expression: no fold
needed for two elements, max-shifted for stability like torch) and the
exact argmax predicate.  Everything is whole-stage-codegen Spark SQL
with a byte-identical DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import round_sql

# shared formula strings (identical parse trees in Spark and DuckDB)
_MX = "greatest(logit0, logit1)"
_PROB1 = f"exp(logit1 - {_MX}) / (exp(logit0 - {_MX}) + exp(logit1 - {_MX}))"
_PRED = "CASE WHEN logit1 > logit0 THEN 1 ELSE 0 END"


def rerank_ingest(logits: DataFrame, prob_round: int | None = 6) -> DataFrame:
    """(query_id, doc_id, prob, pred) from a 2-logit relation —
    softmax positive-class probability + argmax label."""
    out = logits.select(
        "query_id",
        "doc_id",
        F.expr(_PROB1).alias("prob"),
        F.expr(_PRED).cast("long").alias("pred"),
    )
    if prob_round is not None:
        out = out.withColumn("prob", F.expr(round_sql("prob", prob_round)))
    return out


def rerank_ingest_sql(logits_sql: str, prob_round: int | None = 6) -> str:
    p = round_sql(_PROB1, prob_round) if prob_round is not None else _PROB1
    return f"""
SELECT query_id, doc_id, {p} AS prob, ({_PRED})::BIGINT AS pred
FROM ({logits_sql})
ORDER BY query_id, doc_id
"""


def rerank_model_output(ingested: DataFrame) -> DataFrame:
    """(query_id, doc_id, score, pred) — the ensemble-input shape
    (score = positive-class prob, pred = argmax), the relational
    aggregate_results feed (/root/reference/src/utils.py:357-370;
    keep-first dedup is a no-op here because (query, doc) is unique).
    Compose with ensemble.ensemble_predictions +
    with_negative_fallback + evaluate.micro_eval for the reference's
    full evaluate-by-label path (E5)."""
    return ingested.select(
        "query_id", "doc_id", F.col("prob").alias("score"), "pred"
    )


def rerank_from_tsv(spark, path: str, prob_round: int | None = 6) -> DataFrame:
    """S11 → ingestion in one call: read the reference-format prediction
    TSV (query_id, doc_id, logit0, logit1 — utils.py:341-345 shape) and
    produce (query_id, doc_id, prob, pred)."""
    from pyspark.sql import functions as F

    from ..sources.sinks import read_predictions_tsv

    raw = read_predictions_tsv(spark, path).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("logit0").cast("double").alias("logit0"),
        F.col("logit1").cast("double").alias("logit1"),
    )
    return rerank_ingest(raw, prob_round)


def rerank_accuracy(ingested: DataFrame, labels: DataFrame) -> DataFrame:
    """Task-5 accuracy of argmax predictions vs gold labels
    (/root/reference/src/utils.py:374-398): one row
    (n_true, n_total, accuracy)."""
    j = ingested.join(labels.select("query_id", "doc_id", "label"), ["query_id", "doc_id"])
    return j.agg(
        F.sum((F.col("pred") == F.col("label")).cast("long")).alias("n_true"),
        F.count("*").alias("n_total"),
    ).select(
        "n_true",
        "n_total",
        F.expr(round_sql("CAST(n_true AS DOUBLE) / n_total", 9)).alias("accuracy"),
    )


def rerank_accuracy_sql(ingested_sql: str, labels_sql: str) -> str:
    return f"""
WITH ing AS ({ingested_sql}), lab AS ({labels_sql}),
j AS (SELECT ing.pred, lab.label FROM ing JOIN lab USING (query_id, doc_id)),
c AS (SELECT sum(CASE WHEN pred = label THEN 1 ELSE 0 END)::BIGINT AS n_true,
             count(*)::BIGINT AS n_total FROM j)
SELECT n_true, n_total, {round_sql("CAST(n_true AS DOUBLE) / n_total", 9)} AS accuracy
FROM c
"""
