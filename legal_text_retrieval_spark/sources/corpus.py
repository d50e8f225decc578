"""Corpus sources (S1-S3) and the driver-testdata adapter.

Production shape is the Iceberg-style table
``(repo, path, commit, lang, content)`` (BASELINE.json input_hint);
``doc_id`` is a dense int64 assigned by insertion order just like the
reference's list index (/root/reference/src/utils.py:312-318).

The driver's correctness gate runs over
``/root/testdata/sf*/documents.parquet`` (doc_id, text, lang, source,
n_chars) — ``load_documents`` maps ``text → content`` so every operator
works on both shapes.

The benchmark/eval query set is DERIVED from the corpus itself
(every 50th doc, first 8 tokens) so the Spark and DuckDB sides compute
identical queries with no side-channel — plus it guarantees real term
matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ids import assign_dense_ids
from ..functions.sqlgen import std_sql, tokens_sql
from ..functions.text import standardize

QUERY_STRIDE = 50
QUERY_LEN = 8


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → (doc_id, content, lang, source, n_chars)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("text").alias("content"), "lang", "source", "n_chars"
    )


def load_corpus(
    spark: SparkSession,
    path: str,
    distributed: bool | None = None,
    materialize_path: str | None = None,
) -> DataFrame:
    """Iceberg-shaped corpus (repo, path, commit, lang, content) →
    + dense doc_id + content_sha integrity column (input_hint).

    doc_id = dense rank under ORDER BY (repo, path, commit):
    deterministic, mirrors the reference's insertion-order docID.  At
    10^12-file scale a single global window would push every row
    through ONE task, so assignment uses the same range-partition +
    broadcast-offset scheme as term ids (functions/ids.assign_dense_ids
    — identical ids, parallel windows); done ONCE at ingest, all later
    stages key on the materialized doc_id.
    """
    df = spark.read.parquet(path) if not path.startswith("table:") else spark.read.table(path[6:])
    return assign_dense_ids(
        df, ["repo", "path", "commit"], "doc_id", distributed, materialize_path
    ).withColumn("content_sha", F.sha2(F.col("content"), 256))


def derived_queries(docs: DataFrame) -> DataFrame:
    """(query_id, query_text): every QUERY_STRIDE-th doc, first
    QUERY_LEN whitespace tokens of the standardized text."""
    return (
        docs.filter(F.col("doc_id") % QUERY_STRIDE == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.concat_ws(
                " ", F.slice(F.split(standardize(F.col("content")), " ", -1), 1, QUERY_LEN)
            ).alias("query_text"),
        )
    )


def derived_queries_sql(table: str, text_col: str = "text") -> str:
    return (
        f"SELECT doc_id AS query_id, "
        f"array_to_string(({tokens_sql(text_col)})[1:{QUERY_LEN}], ' ') AS query_text "
        f"FROM {table} WHERE doc_id % {QUERY_STRIDE} = 0"
    )


def derived_qrels(docs: DataFrame) -> DataFrame:
    """Deterministic gold labels for J1/E2 operators: for each derived
    query q (doc_id d), relevant docs = {d, d+1, d+7} ∩ corpus."""
    q = docs.filter(F.col("doc_id") % QUERY_STRIDE == 0).select(
        F.col("doc_id").alias("query_id")
    )
    offsets = F.array(F.lit(0), F.lit(1), F.lit(7))
    cand = q.select("query_id", F.explode(offsets).alias("off")).select(
        "query_id", (F.col("query_id") + F.col("off")).alias("doc_id")
    )
    return cand.join(docs.select("doc_id"), "doc_id", "left_semi").select("query_id", "doc_id")


def derived_qrels_sql(table: str) -> str:
    return (
        f"SELECT query_id, doc_id FROM ("
        f"SELECT doc_id AS query_id, unnest([doc_id, doc_id + 1, doc_id + 7]) AS doc_id "
        f"FROM {table} WHERE doc_id % {QUERY_STRIDE} = 0) "
        f"WHERE doc_id IN (SELECT doc_id FROM {table})"
    )
