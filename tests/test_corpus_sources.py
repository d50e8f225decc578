"""Iceberg-shaped corpus ingest: dense insertion-order doc_id
assignment + sha256 integrity column (input_hint)."""

from __future__ import annotations

import pandas as pd


def test_load_corpus_assigns_dense_docids(spark, tmp_path):
    from legal_text_retrieval_spark.fixtures import make_corpus
    from legal_text_retrieval_spark.sources.corpus import load_corpus

    pdf = make_corpus(50)  # (repo, path, commit, lang, content) — no doc_id
    p = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(p)

    docs = load_corpus(spark, p).toPandas().sort_values("doc_id")
    assert docs["doc_id"].tolist() == list(range(50))
    # ordering key: (repo, path, commit)
    keys = list(zip(docs["repo"], docs["path"], docs["commit"]))
    assert keys == sorted(keys)
    # integrity column matches sha256 of content
    import hashlib

    row = docs.iloc[7]
    assert row["content_sha"] == hashlib.sha256(row["content"].encode()).hexdigest()
