"""Distributed dense-id assignment (0..n-1 in global sort order).

Replaces the global no-partition window (`Window.orderBy(...)` — every
row through ONE task) for large relations:

1. ``repartitionByRange`` on the order columns (same-key rows land in
   one partition; partitions are globally ordered),
2. stamp the producing partition id as a COLUMN and **materialize** the
   stamped relation — either durably (write+read parquet when
   ``materialize_path`` is given) or via ``localCheckpoint(eager)``
   which truncates lineage so a lost partition FAILS the job instead of
   being silently recomputed with different range boundaries,
3. per-partition parallel ``row_number`` windows + broadcast cumulative
   offsets.

The id assignment is bit-identical to the single global window for any
relation whose order columns are unique (tests/test_term_ids.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# row count above which assignment switches from one global window to
# the range-partition + offset scheme
DISTRIBUTED_ID_THRESHOLD = 1_000_000


def assign_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str,
    distributed: bool | None = None,
    materialize_path: str | None = None,
) -> DataFrame:
    """Add ``id_col`` = dense int64 rank of the row under
    ``ORDER BY order_cols`` (0-based)."""
    spark = df.sparkSession
    if distributed is None:
        # bounded probe, not a full-scan count(): LocalLimit stops each
        # partition after THRESHOLD+1 rows, so auto mode costs O(threshold)
        # reads regardless of relation size
        distributed = (
            df.limit(DISTRIBUTED_ID_THRESHOLD + 1).count() > DISTRIBUTED_ID_THRESHOLD
        )
    if not distributed:
        w = Window.orderBy(*order_cols)
        return df.withColumn(id_col, F.row_number().over(w).cast("long") - 1)

    p = max(2, spark.sparkContext.defaultParallelism)
    stamped = df.repartitionByRange(p, *order_cols).withColumn(
        "__part__", F.spark_partition_id()
    )
    if materialize_path is not None:
        stamped.write.mode("overwrite").parquet(materialize_path)
        stamped = spark.read.parquet(materialize_path)
    else:
        stamped = stamped.localCheckpoint(eager=True)
    sizes = {
        r["__part__"]: r["cnt"]
        for r in stamped.groupBy("__part__").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for part in sorted(sizes):
        offsets.append((part, acc))
        acc += sizes[part]
    off_df = spark.createDataFrame(offsets, ["__part__", "__off__"])
    w = Window.partitionBy("__part__").orderBy(*order_cols)  # parallel windows
    return (
        stamped.join(F.broadcast(off_df), "__part__")
        .withColumn(id_col, (F.row_number().over(w) + F.col("__off__") - 1).cast("long"))
        .drop("__part__", "__off__")
    )
