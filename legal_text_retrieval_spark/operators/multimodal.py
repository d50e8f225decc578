"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, decoded / feature-extracted via Arrow-batched ``mapInPandas``.

The image/audio codecs are NOT in this container, so the decode step is
a clearly-marked STUB (``decode_real`` raises NotImplementedError); the
Spark-side plumbing — schema, batching, UDF signature, deterministic
fake features — is real and oracle-checked: the fake feature is a pure
function of the payload bytes, so DuckDB can recompute ``feature_sum``
from the text and the driver hash-compares the Python path end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8
_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
        T.StructField("feature_sum", T.LongType()),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """(doc_id, payload: binary, meta: struct) — models an opaque
    image/audio/video column with typed metadata."""
    return docs.select(
        "doc_id",
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(text_col).cast("binary")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_real(payload: bytes) -> None:
    """Real decode (image resize / audio resample / video frame-sample)
    would go here; the codecs are not available in this environment."""
    raise NotImplementedError(
        "media codecs unavailable in this container — use decode_features (stub)"
    )


def decode_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Stub kernel: FEATURE_DIM buckets of byte-value sums mod 997 —
    deterministic, so the whole mapInPandas path is verifiable against
    SQL recomputation from the source text."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats, sums, nbytes = [], [], []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if len(arr):
                    bins = np.bincount(
                        np.arange(len(arr)) % FEATURE_DIM, weights=arr, minlength=FEATURE_DIM
                    )
                else:
                    bins = np.zeros(FEATURE_DIM)
                f = (bins % 997).astype(np.float64)
                feats.append(f.tolist())
                sums.append(int(f.sum()) % 997)
                nbytes.append(len(arr))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                    "feature": feats,
                    "feature_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return payloads.mapInPandas(kernel, _FEATURE_SCHEMA)


def payload_features(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """attach → decode; oracle-facing projection (no raw array)."""
    return decode_features(attach_payload(docs, text_col)).select(
        "doc_id", "mime", "n_bytes", "feature_sum"
    )


def payload_features_sql(table: str, text_col: str = "text") -> str:
    """DuckDB recomputation of the stub kernel from the source text,
    in BYTE semantics exactly like the Spark/Arrow path (the payload is
    the UTF-8 encoding of the text, processed as raw bytes): the text
    is hex-encoded (``hex(encode(t))``, 2 hex chars per byte) and byte
    i is parsed back from the hex — correct for non-ASCII documents
    where character ``ord``/``length`` would diverge from bytes.  Byte
    i goes to bucket i % FEATURE_DIM; bucket sums mod 997; the output
    checksum is (Σ buckets%997) % 997."""
    d = FEATURE_DIM
    byte_i = "('0x' || substr(h, 2 * i - 1, 2))::BIGINT"
    bucket = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(1, octet_length(encode(t))), i -> "
        f"CASE WHEN (i - 1) % {d} = (b - 1) THEN {byte_i} ELSE 0 END)), "
        f"(x, y) -> x + y) % 997"
    )
    return f"""
WITH base AS (SELECT doc_id, {text_col} AS t, hex(encode({text_col})) AS h FROM {table}),
buckets AS (
  SELECT doc_id, b, {bucket} AS v
  FROM base, unnest(generate_series(1, {d})) AS s(b)),
agg AS (SELECT doc_id, sum(v) % 997 AS feature_sum FROM buckets GROUP BY doc_id)
SELECT doc_id, 'application/octet-stream' AS mime,
       octet_length(encode(t))::BIGINT AS n_bytes, feature_sum::BIGINT AS feature_sum
FROM agg JOIN base USING (doc_id) ORDER BY doc_id
"""
