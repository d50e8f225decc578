"""Normalize/tokenize contract: Spark expressions == reference Python
semantics (/root/reference/src/utils.py:16-28, SURVEY.md §1.4)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from legal_text_retrieval_spark.functions.text import standardize, tokenize
from legal_text_retrieval_spark.oracle.reference_scorer import standardize_data, ws_split

CASES = [
    "Vi,  điều khoản (theo) 'luật' ABC-1.",
    "def foo(bar):  return baz!",
    "a  b",  # double space → empty token
    "",  # empty doc → ['']
    "  leading and trailing  ",
    'quotes “curly” and "straight" mix?',
    "under_score kept-together? no: split",
    "x." * 5,
    "UPPER lower MiXeD",
    "tab\there newline\nthere",  # internal whitespace is NOT split (only ' ')
]


def test_standardize_matches_reference(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": CASES}))
    got = [r[0] for r in df.select(standardize(F.col("s"))).collect()]
    want = [standardize_data(c) for c in CASES]
    assert got == want


def test_tokenize_matches_reference_split(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": CASES}))
    got = [r[0] for r in df.select(tokenize(F.col("s"))).collect()]
    want = [ws_split(standardize_data(c)) for c in CASES]
    assert got == want


def test_empty_tokens_count_in_doclen(spark):
    from legal_text_retrieval_spark.operators.stats import doc_lengths

    pdf = pd.DataFrame({"doc_id": [0, 1], "content": ["a  b", ""]})
    df = spark.createDataFrame(pdf)
    got = {r.doc_id: r.dl for r in doc_lengths(df).collect()}
    # 'a  b' → ['a','','b'] → 3; '' → [''] → 1 (reference doc_len semantics)
    assert got == {0: 3, 1: 1}
