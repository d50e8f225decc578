"""J1-J3: training-pair generation from retrieval candidates + gold
labels (SURVEY.md §2.6), relational form of
``generate_pair_inputs`` / ``aggregate_sentence_pairs``
(/root/reference/src/data_generator.py:26-92).

The reference does an O(n) ``list.index`` lookup per pair (J3); here
both label-join and hydration are hash joins (queries broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def generate_pairs(
    retrieved: DataFrame, qrels: DataFrame, append_gold: bool = True
) -> DataFrame:
    """(query_id, doc_id, label) — label 1 iff (query, doc) ∈ qrels;
    ``append_gold`` unions gold docs missed by retrieval (label 1),
    mirroring data_generator.py:26-49."""
    labeled = (
        retrieved.select("query_id", "doc_id")
        .join(qrels.withColumn("label", F.lit(1)), ["query_id", "doc_id"], "left")
        .fillna({"label": 0})
        .select("query_id", "doc_id", F.col("label").cast("long").alias("label"))
    )
    if not append_gold:
        return labeled
    missed = (
        qrels.join(retrieved.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_anti")
        .select("query_id", "doc_id", F.lit(1).cast("long").alias("label"))
    )
    return labeled.unionByName(missed)


def generate_pairs_sql(retrieved_sql: str, qrels_sql: str, append_gold: bool = True) -> str:
    base = f"""
WITH retrieved AS ({retrieved_sql}),
qrels AS ({qrels_sql}),
labeled AS (
  SELECT r.query_id, r.doc_id,
         CASE WHEN g.doc_id IS NOT NULL THEN 1 ELSE 0 END::BIGINT AS label
  FROM retrieved r LEFT JOIN qrels g USING (query_id, doc_id))
"""
    if not append_gold:
        return base + "SELECT query_id, doc_id, label FROM labeled ORDER BY query_id, doc_id"
    return (
        base
        + """
SELECT query_id, doc_id, label FROM labeled
UNION ALL
SELECT g.query_id, g.doc_id, 1::BIGINT AS label
FROM qrels g LEFT JOIN retrieved r USING (query_id, doc_id)
WHERE r.doc_id IS NULL
ORDER BY query_id, doc_id
"""
    )


def train_test_split(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """J7: deterministic split — idx % 10 < 2 → 'test', else 'train'
    (/root/reference/src/utils.py:297-309)."""
    return df.select(
        id_col,
        F.when(F.pmod(F.col(id_col), 10) < 2, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def train_test_split_sql(table: str, id_col: str = "doc_id") -> str:
    return (
        f"SELECT {id_col}, CASE WHEN {id_col} % 10 < 2 THEN 'test' ELSE 'train' END AS split "
        f"FROM {table} ORDER BY {id_col}"
    )


def hydrate_pairs(
    pairs: DataFrame, docs: DataFrame, queries: DataFrame, text_col: str = "content"
) -> DataFrame:
    """J3: (query_id, doc_id, label, sentence1, sentence2) — two hash
    joins instead of the reference's per-pair list scans."""
    return (
        pairs.join(F.broadcast(queries.select("query_id", F.col("query_text").alias("sentence1"))), "query_id")
        .join(docs.select("doc_id", F.col(text_col).alias("sentence2")), "doc_id")
        .select("query_id", "doc_id", "label", "sentence1", "sentence2")
    )
