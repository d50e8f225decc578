"""Incremental index maintenance with Structured Streaming.

The batch build (index/builder.py) is the source of truth; this module
keeps an index fresh as new corpus files land, Lucene-style:

- ``readStream`` over the corpus directory → ``foreachBatch``;
- each micro-batch packs its OWN posting segments (same codec, same
  layout) and appends them under ``postings/`` as a new *generation* —
  no rewrite of existing segments, so the stream only ever appends;
- new terms are appended to the dictionary with ids above the current
  max (existing term_ids are immutable);
- doc stats are appended; global scalars (N, avgdl, idf) are
  snapshotted in the manifest and refreshed by ``compact()`` — between
  compactions, queries score with the last snapshot's statistics
  (standard trade-off for incremental inverted indexes; exactness is
  restored by a compaction, which tests verify).

Checkpointing/restart comes free from Structured Streaming's
checkpoint dir (north_rule resumability on the streaming path).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexParams
from ..index.builder import POSTINGS_SCHEMA, IndexPaths, _make_pack_fn
from ..operators import stats as ops_stats


def _append_batch(
    batch: DataFrame, paths: IndexPaths, params: IndexParams, text_col: str
) -> None:
    spark = batch.sparkSession
    manifest = json.loads(Path(paths.manifest).read_text())
    avgdl = manifest["avgdl"]  # snapshot stats (refreshed at compact())

    batch = batch.select("doc_id", text_col).withColumn(
        "content_sha", F.sha2(F.col(text_col), 256)
    )
    batch.write.mode("append").parquet(paths.docs)

    dl = ops_stats.doc_lengths(batch, text_col)
    dl.write.mode("append").parquet(paths.docstats)

    # dictionary merge: new terms appended above current max id
    dictionary = spark.read.parquet(paths.dictionary)
    max_id = dictionary.agg(F.max("term_id")).collect()[0][0]
    terms = ops_stats.document_frequencies(batch, text_col)
    new_terms = terms.join(dictionary.select("term"), "term", "left_anti")
    if new_terms.count() > 0:
        from pyspark.sql import Window

        w = Window.orderBy("term")
        add = new_terms.withColumn(
            "term_id", (F.row_number().over(w) + F.lit(max_id)).cast("long")
        ).withColumn("idf", F.lit(0.0))  # refreshed at compact()
        add.select(*[c for c in dictionary.columns]).write.mode("append").parquet(
            paths.dictionary
        )
        dictionary = spark.read.parquet(paths.dictionary)

    tf = ops_stats.term_frequencies(batch, text_col)
    flat = (
        tf.join(F.broadcast(dictionary.select("term", "term_id")), "term")
        .join(dl, "doc_id")
        .withColumn("seg_id", (F.col("doc_id") / params.segment_doc_window).cast("long"))
        .select("term_id", "seg_id", "doc_id", "tf", "dl")
    )
    packed = (
        flat.repartition(
            max(1, spark.sparkContext.defaultParallelism), "term_id", "seg_id"
        )
        .sortWithinPartitions("term_id", "seg_id", "doc_id")
        .mapInPandas(_make_pack_fn(params, avgdl), POSTINGS_SCHEMA)
    )
    packed.write.mode("append").parquet(paths.postings)


def start_incremental(
    spark: SparkSession,
    watch_dir: str,
    index_root: str,
    params: IndexParams,
    checkpoint_dir: str,
    text_col: str = "content",
    schema=None,
):
    """Start the file-watch stream; returns the StreamingQuery.
    The index at ``index_root`` must already exist (batch-built)."""
    paths = IndexPaths(index_root)
    src = spark.readStream.schema(
        schema or spark.read.parquet(watch_dir).schema
    ).parquet(watch_dir)
    return (
        src.writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda b, _eid: _append_batch(b, paths, params, text_col))
        .trigger(availableNow=True)
        .start()
    )


def compact(spark: SparkSession, index_root: str, params: IndexParams, text_col: str = "content"):
    """Full-exactness restore: rebuild global stats + idf + repack all
    segments from the accumulated docs (a batch build over the union).
    Returns the refreshed IndexPaths."""
    from ..index.builder import build_index

    paths = IndexPaths(index_root)
    docs = spark.read.parquet(paths.docs).select("doc_id", text_col)
    tmp_root = index_root.rstrip("/") + ".compact"
    new_paths = build_index(spark, docs, tmp_root, params, text_col=text_col, resume=False)
    import shutil

    backup = index_root.rstrip("/") + ".old"
    shutil.rmtree(backup, ignore_errors=True)
    Path(index_root).rename(backup)
    Path(tmp_root).rename(index_root)
    shutil.rmtree(backup, ignore_errors=True)
    # the same paths now hold different data: invalidate cached plans
    spark.catalog.clearCache()
    paths = IndexPaths(index_root)
    for p in (paths.dictionary, paths.docstats, paths.postings, paths.docs):
        try:
            spark.catalog.refreshByPath(p)
        except Exception:
            pass
    return paths
