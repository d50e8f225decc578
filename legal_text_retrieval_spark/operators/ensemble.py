"""J5/J6: ensemble union of per-model predictions + negative fallback
(SURVEY.md §2.6; /root/reference/src/utils.py:410-469,
/root/reference/src/infer.py:325-331).

Reference semantics: a (query, doc) is predicted positive iff ANY
model predicts positive; its ensemble score is the MEAN of the models'
scores; a query left with no positive prediction falls back to its
single best-scoring candidate (top-1 among negatives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import round_sql


def ensemble_predictions(models: list[DataFrame]) -> DataFrame:
    """models: DFs of (query_id, doc_id, score, pred) → ensembled
    (query_id, doc_id, mean_score, predicted)."""
    u = models[0]
    for m in models[1:]:
        u = u.unionByName(m)
    return (
        u.groupBy("query_id", "doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("score"))).alias("a"),
            F.max("pred").alias("predicted"),
            F.count("*").alias("nm"),
        )
        .select(
            "query_id",
            "doc_id",
            F.expr(
                round_sql(
                    "aggregate(a, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.score) / nm", 6
                )
            ).alias("mean_score"),
            F.col("predicted").cast("long").alias("predicted"),
        )
    )


def with_negative_fallback(ensembled: DataFrame) -> DataFrame:
    """J6: queries with no positive prediction contribute their top-1
    (mean_score DESC, doc_id DESC) row flagged predicted=1."""
    pos = ensembled.filter(F.col("predicted") == 1)
    has_pos = pos.select("query_id").distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("mean_score"), F.desc("doc_id"))
    fallback = (
        ensembled.join(has_pos, "query_id", "left_anti")
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("query_id", "doc_id", "mean_score", F.lit(1).cast("long").alias("predicted"))
    )
    return pos.select("query_id", "doc_id", "mean_score", "predicted").unionByName(fallback)


def ensemble_sql(model_sqls: list[str], fallback: bool = True) -> str:
    """DuckDB twin; each model SQL must yield
    (query_id, doc_id, score, pred)."""
    union = " UNION ALL ".join(f"SELECT * FROM ({m})" for m in model_sqls)
    base = f"""
WITH u AS ({union}),
ens AS (
  SELECT query_id, doc_id,
         {round_sql("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(score ORDER BY score)), (x, y) -> x + y) / count(*)", 6)} AS mean_score,
         max(pred)::BIGINT AS predicted
  FROM u GROUP BY query_id, doc_id)
"""
    if not fallback:
        return base + "SELECT * FROM ens ORDER BY query_id, doc_id"
    return (
        base
        + """,
pos AS (SELECT * FROM ens WHERE predicted = 1),
nofb AS (SELECT DISTINCT query_id FROM pos),
fb AS (
  SELECT query_id, doc_id, mean_score, 1::BIGINT AS predicted FROM (
    SELECT e.*, row_number() OVER (PARTITION BY query_id ORDER BY mean_score DESC, doc_id DESC) AS r
    FROM ens e LEFT JOIN nofb USING (query_id) WHERE nofb.query_id IS NULL)
  WHERE r = 1)
SELECT query_id, doc_id, mean_score, predicted FROM pos
UNION ALL
SELECT query_id, doc_id, mean_score, predicted FROM fb
ORDER BY query_id, doc_id
"""
    )
