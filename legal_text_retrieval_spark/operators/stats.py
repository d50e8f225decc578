"""Index-build statistics operators A1-A5 (SURVEY.md §2.3).

All native Spark SQL expressions — Catalyst does two-phase hash
aggregation, predicate pushdown and column pruning; nothing here
touches Python at runtime.

Each operator has a DuckDB SQL twin (``*_sql``) with identical
semantics, used by the driver correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import round_col, round_sql
from ..functions.sqlgen import tokens_sql
from ..functions.text import tokenize


def tokenized(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, toks) — standardize + whitespace split (P1+P2)."""
    return docs.select("doc_id", tokenize(F.col(text_col)).alias("toks"))


def doc_lengths(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """A3: (doc_id, dl). dl counts empty tokens, like the reference
    (/root/reference/src/custom_rank_bm25.py:35)."""
    return tokenized(docs, text_col).select("doc_id", F.size("toks").cast("long").alias("dl"))


def doc_lengths_sql(table: str, text_col: str = "text") -> str:
    return (
        f"SELECT doc_id, len({tokens_sql(text_col)})::BIGINT AS dl "
        f"FROM {table} ORDER BY doc_id"
    )


def corpus_stats(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """(corpus_size, total_tokens, avgdl) — one row.  avgdl computed as
    exact integer sum ÷ count (deterministic across engines)."""
    return doc_lengths(docs, text_col).agg(
        F.count("*").alias("corpus_size"),
        F.sum("dl").alias("total_tokens"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )


def corpus_stats_sql(table: str, text_col: str = "text") -> str:
    return (
        f"SELECT count(*)::BIGINT AS corpus_size, sum(dl)::BIGINT AS total_tokens, "
        f"sum(dl)::DOUBLE / count(*) AS avgdl "
        f"FROM (SELECT len({tokens_sql(text_col)}) AS dl FROM {table})"
    )


def term_frequencies(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """A1: (doc_id, term, tf) — explode + two-phase hash agg."""
    return (
        tokenized(docs, text_col)
        .select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def term_frequencies_sql(table: str, text_col: str = "text") -> str:
    return (
        f"SELECT doc_id, term, count(*)::BIGINT AS tf "
        f"FROM (SELECT doc_id, unnest({tokens_sql(text_col)}) AS term FROM {table}) "
        f"GROUP BY doc_id, term ORDER BY doc_id, term"
    )


def term_frequencies_with_dl(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """A1 + A3 in one pass: (doc_id, dl, term, tf).  dl is the token
    count of the doc (``size(toks)`` — identical to Σ tf per doc, empty
    tokens included) computed BEFORE the explode and carried through the
    aggregation as a grouping key, so downstream consumers that need
    (term, doc, tf, dl) rows — the index pack stage, the relational BM25
    scorer — skip the doc_id-keyed docstats join entirely (guide §2.4).
    Exact same (doc_id, term, tf) relation as :func:`term_frequencies`
    (integer arithmetic; dl is functionally dependent on doc_id)."""
    return (
        tokenized(docs, text_col)
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("dl"),
            F.explode("toks").alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )


def document_frequencies(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """A2: (term, df) — per-doc-distinct terms exploded, then ONE
    count aggregation.  ``array_distinct`` dedups (doc, term) pairs
    inside the row, so the former two-shuffle plan (groupBy (doc, term)
    then groupBy term) collapses to a single term-keyed exchange whose
    input rows are already per-doc-distinct (guide §2.3/§2.4); counts
    are integers, bit-identical to the previous plan."""
    return (
        tokenized(docs, text_col)
        .select(F.explode(F.array_distinct("toks")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )


def document_frequencies_sql(table: str, text_col: str = "text") -> str:
    return (
        f"SELECT term, count(*)::BIGINT AS df FROM ("
        f"SELECT DISTINCT doc_id, term FROM "
        f"(SELECT doc_id, unnest({tokens_sql(text_col)}) AS term FROM {table})"
        f") GROUP BY term ORDER BY term"
    )


def idf_plus(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """A4: BM25Plus idf = ln((N+1)/df)
    (/root/reference/src/custom_rank_bm25.py:144-147).  Rounded to 9dp
    for cross-engine float stability (full precision used internally)."""
    n = docs.count()
    return (
        document_frequencies(docs, text_col)
        .withColumn("idf", round_col(F.log((n + 1) / F.col("df")), 9))
    )


def idf_plus_sql(table: str, text_col: str = "text") -> str:
    dfq = (
        f"SELECT term, count(*) AS df FROM ("
        f"SELECT DISTINCT doc_id, unnest({tokens_sql(text_col)}) AS term FROM {table}"
        f") GROUP BY term"
    )
    return (
        f"WITH n AS (SELECT count(*)::DOUBLE AS n FROM {table}), d AS ({dfq}) "
        f"SELECT term, df::BIGINT AS df, {round_sql('ln((n.n + 1) / df)', 9)} AS idf "
        f"FROM d, n ORDER BY term"
    )


def idf_okapi(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """A5: BM25Okapi idf with eps·avg_idf floor on negatives
    (/root/reference/src/custom_rank_bm25.py:84-104)."""
    n = docs.count()
    raw = document_frequencies(docs, text_col).withColumn(
        "idf0", F.log(F.lit(float(n)) - F.col("df") + 0.5) - F.log(F.col("df") + 0.5)
    )
    # average over raw idfs (incl. negatives) with a term-ordered fold
    # so the ε floor is bit-identical across engines/paths
    from .bm25 import _ordered_mean_idf0

    eps = 0.25 * _ordered_mean_idf0(raw)
    return raw.select(
        "term",
        "df",
        round_col(F.when(F.col("idf0") < 0, F.lit(eps)).otherwise(F.col("idf0")), 9).alias("idf"),
    )


def idf_okapi_sql(table: str, text_col: str = "text") -> str:
    from .bm25 import mean_idf0_ctes

    dfq = (
        f"SELECT term, count(*) AS df FROM ("
        f"SELECT DISTINCT doc_id, unnest({tokens_sql(text_col)}) AS term FROM {table}"
        f") GROUP BY term"
    )
    return (
        f"WITH n AS (SELECT count(*)::DOUBLE AS n FROM {table}), "
        f"d AS ({dfq}), "
        f"raw AS (SELECT term, df, ln(n.n - df + 0.5) - ln(df + 0.5) AS idf0 FROM d, n), "
        + mean_idf0_ctes("raw", "e_")
        + f", a AS (SELECT CAST(0.25 AS DOUBLE) * mean AS eps FROM e_mean) "
        f"SELECT term, df::BIGINT AS df, "
        f"{round_sql('CASE WHEN idf0 < 0 THEN a.eps ELSE idf0 END', 9)} AS idf "
        f"FROM raw, a ORDER BY term"
    )
