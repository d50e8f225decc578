"""Structured-Streaming analytics over the events stream: watermarked
windowed aggregation (late-data tolerant) and a custom stateful
operator via ``applyInPandasWithState``.

The batch twin of the windowed count is
``operators/relational.events_daily_counts`` — a streaming run over the
same rows produces the same counts once the watermark closes the
windows (tests/test_streaming_windows.py drives both and compares).

Scale notes:
- the windowed count is a streaming state-store aggregation keyed by
  (window, event_type): state is bounded by watermark retention, not
  stream length; partial aggregation happens map-side per micro-batch;
- the stateful session operator keeps ONE small state row per user_id
  group and emits on timeout — the applyInPandasWithState pattern for
  operators Spark lacks natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def read_events_stream(spark, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over an events directory (new parquet files =
    new micro-batches)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 day", watermark: str = "2 days"
) -> DataFrame:
    """(window_start, event_type, n_events, total_value) — sliding-free
    tumbling-window counts with a watermark: events later than
    ``watermark`` behind the max seen ts are dropped, everything else
    (including out-of-order rows inside the horizon) lands in its
    window.  Works identically on a batch DataFrame (watermark is a
    no-op there), which is how the test cross-checks the batch twin."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # DECIMAL(18,4) sum: exact, order-independent — the state-
            # store merge order (streaming) and the partition merge
            # order (batch) then cannot produce different doubles (the
            # repo-wide float-determinism rule; relational._DSUM)
            F.expr("CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            F.col("n_events").cast("long"),
            "total_value",
        )
    )


_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        # Σvalue in fixed-point 1e-4 units (the DECIMAL(18,4) rule from
        # windowed_event_counts): integer addition is exact and
        # order-independent, so replay/restart with different
        # micro-batch boundaries cannot drift the running total
        T.StructField("total_units", T.LongType()),
    ]
)
# STATE SCHEMA v2 (total_units LONG replaced total_value DOUBLE).
# applyInPandasWithState state is positional in the checkpoint — a
# stream restarted from a checkpoint written under the v1 schema would
# misread the slot.  Schema changes here REQUIRE a fresh checkpoint
# directory; there is no migration path (Spark does not version
# flatMapGroupsWithState state).  Bump this marker on any change.
_SESSION_STATE_VERSION = 2
_SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _session_fn(key, pdf_iter, state: GroupState):
    """Running per-user aggregate: state carries (n, Σvalue in 1e-4
    fixed-point units) across micro-batches; emits the updated running
    totals each batch.  Per-value quantization is HALF_UP at 4 dp —
    the same rounding Spark's CAST(… AS DECIMAL(18,4)) applies in the
    windowed twin."""
    import numpy as np
    import pandas as pd

    n, units = state.get if state.exists else (0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        v = pdf["value"].to_numpy(np.float64)
        q = np.sign(v) * np.floor(np.abs(v) * 1e4 + 0.5)
        units += int(q.astype(np.int64).sum())
    state.update((n, units))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [units / 1e4]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running event count + value total, maintained across micro-batches.
    Update-mode output: one row per user per batch with the new
    totals."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
