"""Text-analysis operators for training-data pipelines: language ID
(stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex pre-tokenizer), and rolling-hash document
fingerprinting.

All native expressions; integer or fold-ordered float arithmetic only,
so every operator has an exact DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import dlit, round_sql
from ..functions.sqlgen import md5_hash60_sql, std_sql, tokens_sql
from ..functions.text import md5_hash60, standardize, tokenize

# tiny per-language function-word lists (public knowledge); ASCII only
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "dans", "pour"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "de", "en", "por"],
}

# GPT-2-ish pre-tokenizer shape: word pieces OR single non-space symbols
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def token_counts(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens, n_chars_std)."""
    std = standardize(F.col(text_col))
    return docs.select(
        "doc_id",
        F.size(tokenize(F.col(text_col))).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
        F.length(std).cast("long").alias("n_chars_std"),
    )


def token_counts_sql(table: str, text_col: str = "text") -> str:
    return f"""
SELECT doc_id,
       len({tokens_sql(text_col)})::BIGINT AS n_ws_tokens,
       len(regexp_extract_all({text_col}, '{BPE_ISH_PATTERN}'))::BIGINT AS n_bpe_tokens,
       length({std_sql(text_col)})::BIGINT AS n_chars_std
FROM {table} ORDER BY doc_id
"""


def language_id(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, lang_pred, lang_score) — argmax stopword-hit ratio;
    ties and zero hits → 'und' (deterministic: langs checked in fixed
    order, strict > to win)."""
    toks = docs.select("doc_id", F.explode(tokenize(F.col(text_col))).alias("t"))
    per_lang = []
    for lang, words in LANG_STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        per_lang.append(
            F.sum(F.expr(f"CASE WHEN t IN ({lst}) THEN 1 ELSE 0 END")).alias(f"hits_{lang}")
        )
    hits = toks.groupBy("doc_id").agg(F.count("*").alias("n"), *per_lang)
    langs = list(LANG_STOPWORDS)
    best = "CAST(0.0 AS DOUBLE)"
    pred = "'und'"
    for lang in langs:
        ratio = f"(CAST(hits_{lang} AS DOUBLE) / n)"
        pred = f"CASE WHEN {ratio} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"greatest({ratio}, {best})"
    return hits.select(
        "doc_id",
        F.expr(pred).alias("lang_pred"),
        F.expr(round_sql(best, 9)).alias("lang_score"),
    )


def language_id_sql(table: str, text_col: str = "text") -> str:
    hit_cols = ", ".join(
        "sum(CASE WHEN t IN ({lst}) THEN 1 ELSE 0 END) AS hits_{lang}".format(
            lst=", ".join(f"'{w}'" for w in words), lang=lang
        )
        for lang, words in LANG_STOPWORDS.items()
    )
    best = "CAST(0.0 AS DOUBLE)"
    pred = "'und'"
    for lang in LANG_STOPWORDS:
        ratio = f"(CAST(hits_{lang} AS DOUBLE) / n)"
        pred = f"CASE WHEN {ratio} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"greatest({ratio}, {best})"
    return f"""
WITH toks AS (SELECT doc_id, unnest({tokens_sql(text_col)}) AS t FROM {table}),
hits AS (SELECT doc_id, count(*) AS n, {hit_cols} FROM toks GROUP BY doc_id)
SELECT doc_id, {pred} AS lang_pred, {round_sql(best, 9)} AS lang_score
FROM hits ORDER BY doc_id
"""


def quality_scores(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, n_tokens, mean_token_len, punct_ratio, digit_ratio,
    stopword_ratio, quality) — composite [0,1] quality heuristic
    (length band + punct/digit penalties + stopword prior)."""
    en = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    toks = docs.select(
        "doc_id", F.col(text_col).alias("raw"), F.explode(tokenize(F.col(text_col))).alias("t")
    )
    agg = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.length("t")).alias("char_sum"),
        F.sum(F.expr(f"CASE WHEN t IN ({en}) THEN 1 ELSE 0 END")).alias("sw"),
    )
    base = docs.select(
        "doc_id",
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^\w\s]"), 0)).alias("n_punct"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[0-9]"), 0)).alias("n_digit"),
    )
    mean_len = "CAST(char_sum AS DOUBLE) / n_tokens"
    punct_r = "CASE WHEN n_chars = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(n_punct AS DOUBLE) / n_chars END"
    digit_r = "CASE WHEN n_chars = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(n_digit AS DOUBLE) / n_chars END"
    sw_r = "CAST(sw AS DOUBLE) / n_tokens"
    len_band = (
        f"CASE WHEN n_tokens >= 20 AND n_tokens <= 1000 THEN CAST(1.0 AS DOUBLE) "
        f"ELSE CAST(n_tokens AS DOUBLE) / 20 END"
    )
    quality = (
        f"greatest(CAST(0.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE), "
        f"{dlit(0.5)} * least({len_band}, CAST(1.0 AS DOUBLE)) "
        f"+ {dlit(0.3)} * (1 - least(({punct_r}) * 4, CAST(1.0 AS DOUBLE))) "
        f"+ {dlit(0.2)} * least(({sw_r}) * 5, CAST(1.0 AS DOUBLE))))"
    )
    return (
        agg.join(base, "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long"),
            F.expr(round_sql(mean_len, 9)).alias("mean_token_len"),
            F.expr(round_sql(punct_r, 9)).alias("punct_ratio"),
            F.expr(round_sql(digit_r, 9)).alias("digit_ratio"),
            F.expr(round_sql(sw_r, 9)).alias("stopword_ratio"),
            F.expr(round_sql(quality, 9)).alias("quality"),
        )
    )


def quality_scores_sql(table: str, text_col: str = "text") -> str:
    en = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    mean_len = "CAST(char_sum AS DOUBLE) / n_tokens"
    punct_r = "CASE WHEN n_chars = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(n_punct AS DOUBLE) / n_chars END"
    digit_r = "CASE WHEN n_chars = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(n_digit AS DOUBLE) / n_chars END"
    sw_r = "CAST(sw AS DOUBLE) / n_tokens"
    len_band = (
        "CASE WHEN n_tokens >= 20 AND n_tokens <= 1000 THEN CAST(1.0 AS DOUBLE) "
        "ELSE CAST(n_tokens AS DOUBLE) / 20 END"
    )
    quality = (
        f"greatest(CAST(0.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE), "
        f"{dlit(0.5)} * least({len_band}, CAST(1.0 AS DOUBLE)) "
        f"+ {dlit(0.3)} * (1 - least(({punct_r}) * 4, CAST(1.0 AS DOUBLE))) "
        f"+ {dlit(0.2)} * least(({sw_r}) * 5, CAST(1.0 AS DOUBLE))))"
    )
    return f"""
WITH toks AS (SELECT doc_id, unnest({tokens_sql(text_col)}) AS t FROM {table}),
agg AS (SELECT doc_id, count(*) AS n_tokens, sum(length(t)) AS char_sum,
               sum(CASE WHEN t IN ({en}) THEN 1 ELSE 0 END) AS sw
        FROM toks GROUP BY doc_id),
base AS (SELECT doc_id, length({text_col})::BIGINT AS n_chars,
                len(regexp_extract_all({text_col}, '[^\\w\\s]')) AS n_punct,
                len(regexp_extract_all({text_col}, '[0-9]')) AS n_digit
         FROM {table})
SELECT doc_id, n_tokens::BIGINT AS n_tokens,
       {round_sql(mean_len, 9)} AS mean_token_len,
       {round_sql(punct_r, 9)} AS punct_ratio,
       {round_sql(digit_r, 9)} AS digit_ratio,
       {round_sql(sw_r, 9)} AS stopword_ratio,
       {round_sql(quality, 9)} AS quality
FROM agg JOIN base USING (doc_id) ORDER BY doc_id
"""


_FP_MOD = 2147483647
_FP_TERM_MOD = 1000003


def fingerprint(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, fp) — order-sensitive rolling hash over the token
    stream: tokens → 60-bit md5 ints mod 1000003, folded as
    h = (h·31 + t) mod (2^31−1).  Pure integer fold, bit-identical
    across engines."""
    t = docs.select("doc_id", tokenize(F.col(text_col)).alias("toks"))
    return t.select(
        "doc_id",
        F.expr(
            f"aggregate("
            f"transform(toks, x -> CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT) % {_FP_TERM_MOD}), "
            f"CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % {_FP_MOD})"
        ).alias("fp"),
    )


def fingerprint_sql(table: str, text_col: str = "text") -> str:
    h = "('0x' || substr(md5(x), 1, 15))::BIGINT"
    return f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform({tokens_sql(text_col)}, x -> ({h}) % {_FP_TERM_MOD})),
         (acc, x) -> (acc * 31 + x) % {_FP_MOD}) AS fp
FROM {table} ORDER BY doc_id
"""


def clean_corpus(
    docs: DataFrame,
    min_quality: float = 0.3,
    allowed_langs: tuple[str, ...] = ("en", "de", "fr"),
    text_col: str = "content",
) -> DataFrame:
    """(doc_id, quality, lang_pred, is_dup, keep) — the composed
    C4-style corpus-cleaning decision a training-data pipeline runs
    before tokenization: quality floor + language allowlist + exact
    dedup (keep the smallest doc_id per identical content).

    All three gates are single-pass relational sub-plans over the same
    corpus scan; the dedup gate joins only (sha, keeper) pairs."""
    from .dedup import dedup_exact

    q = quality_scores(docs, text_col).select("doc_id", "quality")
    lang = language_id(docs, text_col).select("doc_id", "lang_pred")
    keepers = dedup_exact(docs, text_col).select(
        F.col("keep_doc_id").alias("doc_id"), F.lit(False).alias("is_dup_")
    )
    langs = ", ".join(f"'{l}'" for l in allowed_langs)
    return (
        q.join(lang, "doc_id")
        .join(keepers, "doc_id", "left")
        .select(
            "doc_id",
            "quality",
            "lang_pred",
            F.coalesce(F.col("is_dup_"), F.lit(True)).alias("is_dup"),
            F.expr(
                f"CAST(quality >= {dlit(min_quality)} AND lang_pred IN ({langs}) "
                f"AND is_dup_ IS NOT NULL AS BOOLEAN)"
            ).alias("keep"),
        )
    )


def clean_corpus_sql(
    table: str,
    min_quality: float = 0.3,
    allowed_langs: tuple[str, ...] = ("en", "de", "fr"),
    text_col: str = "text",
) -> str:
    langs = ", ".join(f"'{l}'" for l in allowed_langs)
    return f"""
WITH q AS (SELECT doc_id, quality FROM ({quality_scores_sql(table, text_col)})),
lang AS (SELECT doc_id, lang_pred FROM ({language_id_sql(table, text_col)})),
keepers AS (SELECT min(doc_id) AS doc_id, FALSE AS is_dup_
            FROM {table} GROUP BY sha256({text_col}))
SELECT q.doc_id, q.quality, lang.lang_pred,
       COALESCE(is_dup_, TRUE) AS is_dup,
       (q.quality >= {dlit(min_quality)} AND lang_pred IN ({langs})
        AND is_dup_ IS NOT NULL) AS keep
FROM q JOIN lang USING (doc_id) LEFT JOIN keepers USING (doc_id)
ORDER BY doc_id
"""


# exact lower-interpolation quantiles of the whitespace token count —
# distributed via a value histogram + cumulative sum over DISTINCT
# counts (bounded by max doc length, never by corpus size), no global
# row sort.  rank_q = floor(q·(n−1)) + 1 with q as exact fractions.
_QUANTS = ((1, 4, "p25"), (1, 2, "p50"), (3, 4, "p75"), (9, 10, "p90"))


def token_count_quantiles(docs: DataFrame, text_col: str = "content") -> DataFrame:
    from pyspark.sql import Window

    counts = token_counts(docs, text_col).select("n_ws_tokens")
    hist = counts.groupBy("n_ws_tokens").agg(F.count("*").alias("c"))
    # the window runs over DISTINCT count values only (bounded by max
    # doc length, not corpus size) — cheap even at 10^12 rows
    w = Window.orderBy("n_ws_tokens").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("c").over(w))
    n = counts.count()
    aggs = []
    for num, den, name in _QUANTS:
        r = (num * (n - 1)) // den + 1
        aggs.append(
            F.min(F.when(F.col("cum") >= r, F.col("n_ws_tokens"))).cast("long").alias(name)
        )
    return cum.agg(*aggs).select(
        F.lit(n).cast("long").alias("n"), *[F.col(x[2]) for x in _QUANTS]
    )


def token_count_quantiles_sql(table: str, text_col: str = "text") -> str:
    qcols = []
    for num, den, name in _QUANTS:
        r = f"(({num} * (n.n - 1)) // {den} + 1)"
        qcols.append(
            f"(SELECT min(n_ws_tokens) FROM cum, n WHERE cum >= {r})::BIGINT AS {name}"
        )
    return f"""
WITH counts AS (SELECT len({tokens_sql(text_col)})::BIGINT AS n_ws_tokens FROM {table}),
hist AS (SELECT n_ws_tokens, count(*) AS c FROM counts GROUP BY n_ws_tokens),
cum AS (SELECT n_ws_tokens, sum(c) OVER (ORDER BY n_ws_tokens) AS cum FROM hist),
n AS (SELECT count(*)::BIGINT AS n FROM counts)
SELECT n.n AS n, {", ".join(qcols)}
FROM n
"""
