"""input_hint guard: 'no per-row Python' — only Arrow-vectorized
pandas UDFs (mapInPandas / applyInPandas / pandas_udf) are allowed;
row-at-a-time F.udf / @udf must never appear in the engine."""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "legal_text_retrieval_spark"

FORBIDDEN = [
    re.compile(r"\bF\.udf\s*\("),
    re.compile(r"^\s*@udf\b", re.M),
    re.compile(r"\bfrom pyspark\.sql\.functions import .*\budf\b"),
    re.compile(r"\.rdd\.map\b"),
    re.compile(r"\bflatMap\s*\("),
]


def test_no_row_wise_python():
    offenders = []
    for p in PKG.rglob("*.py"):
        src = p.read_text()
        for rx in FORBIDDEN:
            if rx.search(src):
                offenders.append((str(p), rx.pattern))
    assert not offenders, offenders
