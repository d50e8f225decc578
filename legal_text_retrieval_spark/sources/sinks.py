"""Sinks S6-S11 (SURVEY.md §2.1): TREC run file, MRPC/CoLA training
CSVs, submission JSON — all plain ``df.write``; the line/row formats
clone the reference byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trec_run_lines(ranked: DataFrame, tag: str = "JNLP") -> DataFrame:
    """S9: ``qid Q0 docid rank score TAG`` lines
    (/root/reference/src/utils.py:594-601).  Score fixed to 6 decimals
    for cross-engine byte stability."""
    return ranked.select(
        F.format_string(
            f"%s Q0 %s %d %.6f {tag}",
            F.col("query_id").cast("string"),
            F.col("doc_id").cast("string"),
            F.col("rank").cast("int"),
            F.col("score"),
        ).alias("line")
    )


def trec_run_lines_sql(ranked_sql: str, tag: str = "JNLP") -> str:
    return f"""
SELECT printf('%s Q0 %s %d %.6f {tag}',
              query_id::VARCHAR, doc_id::VARCHAR, rank::INTEGER, score) AS line
FROM ({ranked_sql})
ORDER BY line
"""


def write_trec_run(ranked: DataFrame, path: str, tag: str = "JNLP") -> None:
    trec_run_lines(ranked, tag).coalesce(1).write.mode("overwrite").text(path)


def mrpc_rows(pairs_hydrated: DataFrame) -> DataFrame:
    """S6: MRPC-format training rows
    (label, #1 ID, #2 ID, sentence1, sentence2) with newline scrub (P8)
    (/root/reference/src/data_generator.py:108-123)."""
    return pairs_hydrated.select(
        F.col("label").cast("long").alias("label"),
        F.col("query_id").cast("string").alias("id1"),
        F.col("doc_id").cast("string").alias("id2"),
        F.regexp_replace(F.col("sentence1"), "\n", " ").alias("sentence1"),
        F.regexp_replace(F.col("sentence2"), "\n", " ").alias("sentence2"),
    )


def write_mrpc_csv(pairs_hydrated: DataFrame, path: str) -> None:
    mrpc_rows(pairs_hydrated).write.mode("overwrite").option("header", True).csv(path)


def cola_rows(labeled_queries: DataFrame) -> DataFrame:
    """S7: CoLA-format training rows (sentence, label, id) with the
    newline scrub — ``gen_cola_data``
    (/root/reference/src/data_generator.py:126-137): one row per
    labeled query, column order sentence,label,id (pandas dict
    insertion order), written with header like the reference's
    ``to_csv(index=False)``.  Input: (query_id, query_text, label)."""
    return labeled_queries.select(
        F.regexp_replace(F.col("query_text"), "\n", " ").alias("sentence"),
        F.col("label").cast("long").alias("label"),
        F.regexp_replace(F.col("query_id").cast("string"), "\n", " ").alias("id"),
    )


def write_cola_csv(labeled_queries: DataFrame, path: str) -> None:
    cola_rows(labeled_queries).write.mode("overwrite").option("header", True).csv(path)


def submission_rows(predictions: DataFrame) -> DataFrame:
    """S10 flat form: (question_id, law_id, article_id) — one row per
    predicted relevant article, parsed from the composite doc key
    exactly like ``Article.from_string``
    (/root/reference/src/infer.py:338-341, utils.py:44-47).  Input:
    (query_id, key) with key = 'l_id-->a_id-->'."""
    from ..functions.text import parse_composite_key

    parsed = parse_composite_key(F.col("key"))
    return predictions.select(
        F.col("query_id").cast("string").alias("question_id"),
        parsed.getItem(0).alias("law_id"),
        parsed.getItem(1).alias("article_id"),
    )


def submission_nested(predictions: DataFrame) -> DataFrame:
    """S10 nested form: (question_id, relevant_articles:
    array<struct<law_id, article_id>>) — the exact submission object
    shape of /root/reference/src/infer.py:336-348, with the article
    list deterministically sorted."""
    return (
        submission_rows(predictions)
        .groupBy("question_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("law_id", "article_id"))
            ).alias("relevant_articles")
        )
    )


def write_submission_json(predictions: DataFrame, path: str) -> None:
    """S10: one JSON object per question
    (/root/reference/src/infer.py:336-348)."""
    submission_nested(predictions).coalesce(1).write.mode("overwrite").json(path)


def write_stopwords_json(stopwords: DataFrame, path: str) -> None:
    """S8: stopword list as a single JSON array
    (/root/reference/src/stopwords_tfidf_generator.py:25-29)."""
    import json as _json
    from pathlib import Path as _P

    words = sorted(r.term for r in stopwords.select("term").collect())
    _P(path).parent.mkdir(parents=True, exist_ok=True)
    _P(path).write_text(_json.dumps(words, ensure_ascii=False))


def read_predictions_tsv(spark, path: str) -> DataFrame:
    """S11: prediction TSV scan (pd.read_csv(sep='\\t') equivalent;
    /root/reference/src/utils.py:139-141)."""
    return spark.read.option("sep", "\t").option("header", True).csv(path)
