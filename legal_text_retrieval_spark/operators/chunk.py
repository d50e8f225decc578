"""P5: sliding-window document chunking — exact clone of
``_article_content`` (/root/reference/src/utils.py:215-232) plus the
first-9-chunks cap applied at load time (:263, ``[1:10]``).

Reference semantics (verified by execution):
- chunks only when len(words) > size;
- window starts at multiples of step = size - stride;
- the loop APPENDS the first short window (including a possibly-empty
  tail when the start lies past the end) and then breaks — but only
  for starts < len(words) (range bound);
- chunking happens on the RAW content (before standardize), split on
  single spaces, empties kept.

Pure native expressions in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CHUNKS = 9  # load_data_kse keeps sub_contents[1:10]


def _nw_expr(size: int, step: int) -> str:
    """Number of windows to emit (before the cap): m+1 full-ish windows
    plus the short tail iff its start is < n (range bound)."""
    m = f"CAST(floor((n - {size}) / {step}) AS BIGINT)"
    return f"(({m} + 1) + (CASE WHEN ({m} + 1) * {step} <= n - 1 THEN 1 ELSE 0 END))"


def chunk_documents(
    docs: DataFrame, size: int = 100, stride: int = 50, text_col: str = "content"
) -> DataFrame:
    """(doc_id, sub_id, chunk) — sub_id 0-based like
    ``Article.get_subid`` enumeration
    (/root/reference/src/data_generator.py / utils.py:51-52)."""
    step = size - stride
    nw = _nw_expr(size, step)
    base = docs.select(
        "doc_id",
        F.split(F.col(text_col), " ", -1).alias("words"),
        F.size(F.split(F.col(text_col), " ", -1)).alias("n"),
    )
    return (
        base.withColumn(
            "js",
            F.expr(
                f"CASE WHEN n > {size} THEN sequence(0, least({nw}, {MAX_CHUNKS}) - 1) "
                f"ELSE array() END"
            ),
        )
        .select("doc_id", F.explode("js").alias("sub_id"), "words")
        .select(
            "doc_id",
            F.col("sub_id").cast("long").alias("sub_id"),
            F.expr(f"concat_ws(' ', slice(words, sub_id * {step} + 1, {size}))").alias("chunk"),
        )
    )


def chunk_documents_sql(
    table: str, size: int = 100, stride: int = 50, text_col: str = "text"
) -> str:
    step = size - stride
    nw = _nw_expr(size, step)
    return f"""
WITH base AS (
  SELECT doc_id, string_split({text_col}, ' ') AS words, len(string_split({text_col}, ' ')) AS n
  FROM {table})
SELECT doc_id, j::BIGINT AS sub_id,
       array_to_string(words[j * {step} + 1 : j * {step} + {size}], ' ') AS chunk
FROM base, unnest(CASE WHEN n > {size}
                       THEN generate_series(0, least({nw}, {MAX_CHUNKS}) - 1)
                       ELSE [] END) AS t(j)
ORDER BY doc_id, sub_id
"""
