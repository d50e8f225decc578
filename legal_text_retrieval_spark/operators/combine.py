"""Score-combination operators Q6/Q7 (SURVEY.md §2.4) — the two final
modes of the reference's ``do_classify``
(/root/reference/src/tfidf_classifier.py:44-51).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import BM25Params
from ..functions.numeric import dlit, round_sql
from . import tfidf as TF
from .bm25 import bm25_scores, topk


def combine_weighted_topk(
    docs: DataFrame,
    queries: DataFrame,
    params: BM25Params,
    k: int,
    text_col: str = "content",
    score_round: int | None = 6,
) -> DataFrame:
    """Q6: final = 0.33·cosine + 0.67·bm25/max(bm25), where max is over
    the WHOLE queries×docs bm25 matrix
    (/root/reference/src/tfidf_classifier.py:44-46)."""
    b = bm25_scores(docs, queries, params, text_col=text_col)
    c = TF.tfidf_cosine_scores(docs, queries, text_col=text_col)
    bmax = b.agg(F.max("score")).collect()[0][0]
    j = (
        b.withColumnRenamed("score", "bs")
        .join(c.withColumnRenamed("score", "cs"), ["query_id", "doc_id"])
        .withColumn(
            "score",
            F.expr(
                f"CAST(0.33 AS DOUBLE) * cs + CAST(0.67 AS DOUBLE) * bs / {dlit(bmax)}"
            ),
        )
        .select("query_id", "doc_id", "score")
    )
    if score_round is not None:
        j = j.withColumn("score", F.expr(round_sql("score", score_round)))
    return topk(j, k)


def combine_weighted_topk_sql(
    table: str,
    queries_sql: str,
    params: BM25Params,
    k: int,
    text_col: str = "text",
    score_round: int = 6,
) -> str:
    from .bm25 import bm25_ctes, topk_sql

    return (
        "WITH "
        + bm25_ctes(table, queries_sql, params, text_col)
        + ",\n"
        + TF.cosine_ctes(table, None, text_col)
        + ",\nw_max AS (SELECT max(score) AS m FROM b_scored),\n"
        + "w_scored AS (SELECT query_id, doc_id, "
        + "CAST(0.33 AS DOUBLE) * c.score + CAST(0.67 AS DOUBLE) * b.score / w_max.m AS score "
        + "FROM b_scored b JOIN c_scored c USING (query_id, doc_id), w_max)"
        + topk_sql("w_scored", k, score_round)
    )


def combine_interleave_topk(
    docs: DataFrame,
    queries: DataFrame,
    params: BM25Params,
    k: int,
    text_col: str = "content",
    score_round: int = 6,
) -> DataFrame:
    """Q7: alternate bm25[j], tfidf[j] per rank j, dedup keep-first,
    stop at k (/root/reference/src/utils.py:188-205).  Output
    (query_id, doc_id, rank) — the interleave has no score.

    Both source rank lists use the shared-rounded score so the
    interleave order is engine-independent.
    """
    b = topk(
        bm25_scores(docs, queries, params, text_col=text_col, score_round=score_round), k
    ).select("query_id", "doc_id", (2 * F.col("rank") - 1).alias("pos"))
    t = TF.tfidf_cosine_topk(docs, queries, k, text_col=text_col, score_round=score_round).select(
        "query_id", "doc_id", (2 * F.col("rank")).alias("pos")
    )
    merged = b.unionByName(t)
    first = merged.groupBy("query_id", "doc_id").agg(F.min("pos").alias("pos"))
    w = Window.partitionBy("query_id").orderBy("pos")
    return (
        first.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank")
    )


def combine_interleave_topk_sql(
    table: str,
    queries_sql: str,
    params: BM25Params,
    k: int,
    text_col: str = "text",
    score_round: int = 6,
) -> str:
    from .bm25 import bm25_ctes

    sc = round_sql("score", score_round)
    return f"""WITH {bm25_ctes(table, queries_sql, params, text_col)},
{TF.cosine_ctes(table, None, text_col)},
i_b AS (
  SELECT query_id, doc_id, 2 * rank - 1 AS pos FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id ORDER BY {sc} DESC, doc_id DESC) AS rank
    FROM b_scored) WHERE rank <= {k}),
i_t AS (
  SELECT query_id, doc_id, 2 * rank AS pos FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id ORDER BY {sc} DESC, doc_id DESC) AS rank
    FROM c_scored) WHERE rank <= {k}),
i_first AS (
  SELECT query_id, doc_id, min(pos) AS pos
  FROM (SELECT * FROM i_b UNION ALL SELECT * FROM i_t)
  GROUP BY query_id, doc_id)
SELECT query_id, doc_id, rank FROM (
  SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id ORDER BY pos) AS rank
  FROM i_first)
WHERE rank <= {k}
ORDER BY query_id, rank
"""
