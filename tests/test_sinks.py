"""Sink format parity: TREC run lines, MRPC rows, stopword JSON,
prediction TSV round-trip."""

from __future__ import annotations

import json

import pandas as pd


def test_trec_run_line_format(spark):
    from legal_text_retrieval_spark.sources.sinks import trec_run_lines

    ranked = spark.createDataFrame(
        pd.DataFrame(
            {"query_id": [7], "doc_id": [42], "rank": [1], "score": [6.543318]}
        )
    )
    line = trec_run_lines(ranked).collect()[0].line
    # reference format: "qid Q0 docid rank score JNLP" (utils.py:597-601)
    assert line == "7 Q0 42 1 6.543318 JNLP"


def test_mrpc_rows_scrub_newlines(spark):
    from legal_text_retrieval_spark.sources.sinks import mrpc_rows

    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": ["q1"],
                "doc_id": [3],
                "label": [1],
                "sentence1": ["line\nbreak"],
                "sentence2": ["ok"],
            }
        )
    )
    r = mrpc_rows(pairs).collect()[0]
    assert r.sentence1 == "line break"
    assert (r.label, r.id1, r.id2) == (1, "q1", "3")


def test_stopwords_json_roundtrip(spark, tmp_path):
    from legal_text_retrieval_spark.sources.sinks import write_stopwords_json

    sw = spark.createDataFrame(pd.DataFrame({"term": ["b", "a", "c"]}))
    p = tmp_path / "stopwords.json"
    write_stopwords_json(sw, str(p))
    assert json.loads(p.read_text()) == ["a", "b", "c"]


def test_predictions_tsv_roundtrip(spark, tmp_path):
    from legal_text_retrieval_spark.sources.sinks import read_predictions_tsv

    p = tmp_path / "pred.tsv"
    p.write_text("query_id\tdoc_id\tscore\nq1\t3\t0.5\n")
    got = read_predictions_tsv(spark, str(p)).collect()
    assert got[0].query_id == "q1" and got[0].doc_id == "3"


def test_cola_rows_format(spark, tmp_path):
    """S7: column order sentence,label,id with newline scrub + header
    (gen_cola_data, /root/reference/src/data_generator.py:126-137)."""
    from legal_text_retrieval_spark.sources.sinks import cola_rows, write_cola_csv

    labeled = spark.createDataFrame(
        pd.DataFrame(
            {"query_id": ["q1", "q2"], "query_text": ["a\nb", "ok"], "label": [1, 0]}
        )
    )
    df = cola_rows(labeled)
    assert df.columns == ["sentence", "label", "id"]
    rows = {r.id: r for r in df.collect()}
    assert rows["q1"].sentence == "a b" and rows["q1"].label == 1
    assert rows["q2"].label == 0
    out = tmp_path / "cola"
    write_cola_csv(labeled, str(out))
    csv_files = list(out.glob("*.csv"))
    assert csv_files and any(
        f.read_text().startswith("sentence,label,id") for f in csv_files
    )
