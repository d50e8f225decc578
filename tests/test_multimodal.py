"""Multimodal binary-column plumbing: the mapInPandas feature kernel
must agree with the DuckDB recomputation in BYTE semantics, including
non-ASCII payloads (UTF-8 multi-byte characters)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest


def test_payload_features_non_ascii_parity(spark):
    from legal_text_retrieval_spark.operators.multimodal import (
        payload_features,
        payload_features_sql,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["héllo wörld", "日本語テキスト", "plain ascii", ""],
        }
    )
    docs = spark.createDataFrame(pdf).withColumnRenamed("text", "content")
    got = (
        payload_features(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.sql(payload_features_sql("documents")).df()
    cols = ["doc_id", "n_bytes", "feature_sum"]
    assert got[cols].astype("int64").equals(want[cols].astype("int64"))
    # multi-byte check: n_bytes counts UTF-8 bytes, not characters
    assert int(got.loc[got.doc_id == 1, "n_bytes"].iloc[0]) == len(
        "日本語テキスト".encode()
    )


def test_decode_real_is_explicit_stub():
    from legal_text_retrieval_spark.operators.multimodal import decode_real

    with pytest.raises(NotImplementedError):
        decode_real(b"\x89PNG")
