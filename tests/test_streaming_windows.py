"""Streaming analytics: watermarked windowed counts converge to the
batch twin, and the applyInPandasWithState running totals match a
batch groupBy — including out-of-order arrival across micro-batches."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest


def _events_pdf():
    rows = []
    base = dt.datetime(2024, 1, 1)
    # two days of events, deliberately shuffled so file 2 carries
    # EARLIER timestamps than file 1 (out-of-order but inside the
    # 2-day watermark horizon)
    spec = [
        (0, 10, "click", 0, 1.0),
        (1, 10, "click", 5, 2.0),
        (2, 11, "view", 26, 3.0),
        (3, 11, "click", 30, 4.0),
        (4, 10, "view", 2, 5.0),
        (5, 12, "click", 27, 6.0),
    ]
    for eid, uid, etype, hours, val in spec:
        rows.append(
            {
                "event_id": eid,
                "user_id": uid,
                "event_type": etype,
                "ts": base + dt.timedelta(hours=hours),
                "value": val,
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture()
def event_files(spark, tmp_path):
    pdf = _events_pdf()
    d = tmp_path / "events_stream"
    d.mkdir()
    # file 1: the LATER half; file 2: the earlier half (out-of-order)
    spark.createDataFrame(pdf.iloc[3:]).coalesce(1).write.mode("overwrite").parquet(
        str(d / "f1")
    )
    spark.createDataFrame(pdf.iloc[:3]).coalesce(1).write.mode("overwrite").parquet(
        str(d / "f2")
    )
    # flatten: the stream source reads one directory of parquet files
    flat = tmp_path / "events_flat"
    flat.mkdir()
    i = 0
    for sub in sorted(d.glob("f*/")):
        for f in sub.glob("*.parquet"):
            f.rename(flat / f"part-{i}.parquet")
            i += 1
    return str(flat), pdf


def test_windowed_counts_match_batch_twin(spark, event_files, tmp_path):
    from legal_text_retrieval_spark.streaming.windows import (
        read_events_stream,
        windowed_event_counts,
    )

    path, pdf = event_files
    stream = windowed_event_counts(read_events_stream(spark, path), "1 day", "2 days")
    q = (
        stream.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.sql("SELECT * FROM win_counts")
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    batch = (
        windowed_event_counts(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert got.equals(batch), (got, batch)
    # sanity: both days present, late-but-inside-horizon rows counted
    assert got["n_events"].sum() == len(pdf)


def test_stateful_running_totals(spark, event_files, tmp_path):
    from legal_text_retrieval_spark.streaming.windows import (
        read_events_stream,
        running_user_totals,
    )

    path, pdf = event_files
    stream = running_user_totals(read_events_stream(spark, path))
    q = (
        stream.writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode emits one row per user per batch — the LAST row per
    # user is the final running total
    rows = spark.sql("SELECT * FROM user_totals").toPandas()
    final = rows.groupby("user_id").last()
    want = pdf.groupby("user_id").agg(
        n_events=("event_id", "count"), total_value=("value", "sum")
    )
    got_cmp = final[["n_events", "total_value"]].astype({"n_events": "int64"})
    assert got_cmp.sort_index().equals(want.sort_index().astype({"n_events": "int64"}))
