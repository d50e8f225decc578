"""DuckDB ANSI-SQL fragments that mirror ``functions/text.py`` byte-for-byte.

Every Spark operator registered in ``__spark_entry__.queries()`` has an
oracle built from these fragments, so the driver's DuckDB comparison
exercises identical semantics (same normalization, same empty-token
rules, same deterministic hashes, same fold-ordered float sums).
"""

from __future__ import annotations

from ..config import PUNCT_CHARS, SKLEARN_TOKEN_PATTERN

_SPACES = " " * len(PUNCT_CHARS)
# SQL string literal for the punctuation set: escape single quotes.
_PUNCT_SQL = PUNCT_CHARS.replace("'", "''")


def std_sql(expr: str) -> str:
    """standardize_data: punct→space, strip (regex, 'g'), lower."""
    return (
        f"lower(regexp_replace(translate({expr}, '{_PUNCT_SQL}', '{_SPACES}'), "
        f"'^\\s+|\\s+$', '', 'g'))"
    )


def tokens_sql(expr: str) -> str:
    """Whitespace tokens of the standardized string (keeps empties;
    '' → [''])."""
    return f"string_split({std_sql(expr)}, ' ')"


def sklearn_tokens_sql(expr: str) -> str:
    return f"regexp_extract_all({std_sql(expr)}, '{SKLEARN_TOKEN_PATTERN}')"


def md5_hash60_sql(expr: str) -> str:
    """60-bit md5-prefix hash — identical to text.md5_hash60."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"
