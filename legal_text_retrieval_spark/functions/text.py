"""Text normalization + tokenization as native Spark Column expressions.

These clone the reference's normalize→split contract exactly
(/root/reference/src/utils.py:16-28 ``standardize_data`` and
/root/reference/src/tfidf_classifier.py:24,40 ``d.split(" ")``):

- each of the 13 punctuation chars → one space (``F.translate`` is the
  1:1 char→space equivalent of the reference's chained ``.replace``);
- the two dead regexes in the reference are no-ops (SURVEY.md §1.4) and
  are dropped;
- consecutive spaces are NOT collapsed — ``split(" ")`` keeps
  empty-string tokens, which count toward doc_len/avgdl and form a
  vocabulary term, exactly like Python ``str.split(" ")``;
- strip (Python ``str.strip`` semantics — any whitespace) then lower.

Everything here is JVM-side whole-stage-codegen'd — zero Python in the
tokenize hot path.  ``functions/sqlgen.py`` holds the byte-identical
DuckDB fragments used by the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import PUNCT_CHARS, SKLEARN_TOKEN_PATTERN

_SPACES = " " * len(PUNCT_CHARS)
# Java regex \s == [ \t\n\x0B\f\r] — superset of the whitespace that can
# appear in the corpus; mirrors Python str.strip().
_STRIP_RE = r"^\s+|\s+$"


def standardize(col: Column) -> Column:
    """standardize_data(row): punct→space, strip, lower."""
    return F.lower(F.regexp_replace(F.translate(col, PUNCT_CHARS, _SPACES), _STRIP_RE, ""))


def ws_tokens(col: Column) -> Column:
    """Whitespace tokens of a *standardized* string.

    ``F.split(col, ' ', -1)`` == Python ``s.split(' ')``: keeps empty
    tokens, and '' → ['']  (a 1-token doc), matching the reference's
    doc_len semantics (/root/reference/src/custom_rank_bm25.py:35).
    """
    return F.split(col, " ", -1)


def tokenize(col: Column) -> Column:
    """standardize + whitespace split — the BM25 token stream."""
    return ws_tokens(standardize(col))


def sklearn_tokens(col: Column) -> Column:
    """sklearn ``TfidfVectorizer`` default analyzer word tokens
    (token_pattern ``\\b\\w\\w+\\b``) over the standardized string —
    the TF-IDF token stream (/root/reference/src/tfidf_classifier.py:20).
    """
    return F.regexp_extract_all(standardize(col), F.lit(SKLEARN_TOKEN_PATTERN), 0)


def bigram_expr(tokens_colname: str) -> Column:
    """Adjacent-pair bigram array from an ArrayType(String) column name."""
    t = tokens_colname
    return F.expr(
        f"CASE WHEN size({t}) < 2 THEN array() "
        f"ELSE transform(sequence(1, size({t}) - 1), "
        f"i -> concat(element_at({t}, i), ' ', element_at({t}, i + 1))) END"
    )


def shingle_expr(tokens_colname: str, n: int = 3) -> Column:
    """n-token shingles joined by spaces (for MinHash / Jaccard dedup).

    Docs shorter than n tokens yield a single shingle of the whole doc,
    so every doc has ≥1 shingle.
    """
    t = tokens_colname
    parts = ", ".join(f"element_at({t}, i + {j})" for j in range(n))
    return F.expr(
        f"CASE WHEN size({t}) < {n} THEN array(concat_ws(' ', {t})) "
        f"ELSE transform(sequence(1, size({t}) - {n} + 1), "
        f"i -> concat_ws(' ', {parts})) END"
    )


def composite_key(l_col: Column, a_col: Column) -> Column:
    """P7: the reference's composite article key ``"{l}-->{a}-->"``
    (/root/reference/src/utils.py:43-49)."""
    return F.concat(l_col, F.lit("-->"), a_col, F.lit("-->"))


def parse_composite_key(key_col: Column) -> Column:
    """P7 inverse: split on '-->' → [l_id, a_id, ''] array
    (/root/reference/src/utils.py:43-46)."""
    return F.split(key_col, "-->", -1)


def strip_sub_id(key_col: Column) -> Column:
    """P9: map a chunk key back to its parent article key —
    ``re.sub(r'-sub\\d+', '', id)`` (/root/reference/src/utils.py:416,478)."""
    return F.regexp_replace(key_col, r"-sub\d+", "")


def md5_hash60(col: Column) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex chars of md5.

    Chosen because Spark (``conv``) and DuckDB (``('0x'||…)::bigint``)
    compute it identically — the cross-engine base hash for MinHash /
    SimHash / fingerprint operators.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
