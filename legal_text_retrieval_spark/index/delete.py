"""Document deletion from a packed index — repack, not tombstones.

``delete_docs(spark, root, doc_ids, out_dir)`` removes a batch of
documents and produces an index bit-identical to a fresh build over
the surviving corpus (tests/test_index_delete.py), without re-running
the build shuffle:

- **postings**: one map-only pass over the packed rows — decode,
  mask out deleted doc_ids (broadcast sorted array; deletes are
  batch-sized, not corpus-sized), re-pack against the NEW avgdl
  (maxima recompute is mandatory: avgdl moves when docs leave).
  Surviving doc_ids/deltas are unchanged, so segments re-encode to
  the bytes a rebuild would produce.
- **dictionary**: df is recomputed FROM the filtered packed rows
  (df = Σ n_docs over a term's segments), terms with df=0 drop out,
  and term_ids are reassigned as dense lexical ranks over the
  surviving vocabulary — the same rule as build/merge, so the WAND
  kernel's per-doc fold order matches a rebuild exactly.  idf (and
  the okapi ε-fold) recompute from the new (term, df) + n_docs.
- **docs / docstats**: anti-join on the deleted set.

The reference engine has no deletion at all (its index is a pickled
in-memory scorer rebuilt from scratch — /root/reference/src/
data_generator.py:186-199); batch deletion (takedowns, license
filtering, dedup sweeps feeding back into the index) is a first-class
need at training-corpus scale.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import codec
from .builder import (
    POSTINGS_SCHEMA,
    IndexPaths,
    _done,
    _pack_group,
    dictionary_from_dfreq,
    input_fingerprint,
    write_lineage_and_metrics,
)
from .merge import _params_from_manifest


def _make_delete_fn(params, avgdl: float, deleted_bc):
    """mapInPandas kernel: each packed row is one (term_id, seg_id)
    group — decode, drop deleted doc_ids, re-pack with maxima against
    the post-delete avgdl.  Emits nothing for fully-deleted groups."""
    window = params.segment_doc_window

    def fn(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        deleted = deleted_bc.value
        out = []

        def emit():
            pdf = pd.DataFrame(out)
            pdf["build_part"] = pid
            return pdf

        for pdf in batches:
            for term_id, seg_id, ids_enc, tfs_enc, dls_enc in zip(
                pdf["term_id"].to_numpy(np.int64),
                pdf["seg_id"].to_numpy(np.int64),
                pdf["doc_ids_enc"],
                pdf["tfs_enc"],
                pdf["dls_enc"],
            ):
                base = int(seg_id) * window
                d = codec.decode_docids(bytes(ids_enc), base)
                keep = ~np.isin(d, deleted, assume_unique=False)
                if not keep.any():
                    continue
                t = codec.decode_varint(bytes(tfs_enc)).astype(np.int64)[keep]
                l = codec.decode_varint(bytes(dls_enc)).astype(np.int64)[keep]
                out.append(
                    _pack_group(int(term_id), int(seg_id), d[keep], t, l, params, avgdl)
                )
                if len(out) >= 256:
                    yield emit()
                    out = []
        if out:
            yield emit()

    return fn


def delete_docs(
    spark: SparkSession,
    root: str,
    doc_ids,
    out_dir: str,
    resume: bool = True,
) -> IndexPaths:
    """Delete ``doc_ids`` (iterable of int, or a single-column
    DataFrame) from the index at ``root`` into a new index at
    ``out_dir`` — bit-identical to a rebuild over the surviving docs."""
    if isinstance(doc_ids, DataFrame):
        doc_ids = [r[0] for r in doc_ids.collect()]
    deleted = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    src = IndexPaths(root)
    m = json.loads(Path(src.manifest).read_text())
    params = _params_from_manifest(m)
    paths = IndexPaths(out_dir)

    ds = spark.read.parquet(src.docstats)
    del_df = spark.createDataFrame([(int(x),) for x in deleted], "doc_id bigint")
    dropped = ds.join(F.broadcast(del_df), "doc_id", "left_semi")
    n_dropped, tokens_dropped = dropped.agg(
        F.count("*"), F.coalesce(F.sum("dl"), F.lit(0))
    ).collect()[0]
    n_docs = int(m["n_docs"]) - int(n_dropped)
    if n_docs <= 0:
        raise ValueError("deleting every document — refuse to build an empty index")
    total_tokens = int(m["total_tokens"]) - int(tokens_dropped)
    avgdl = float(total_tokens) / n_docs
    input_fp = input_fingerprint(
        "delete", root, m.get("n_docs"), m.get("total_tokens"),
        [int(x) for x in deleted],
    )
    manifest: dict = {
        "format_version": m["format_version"],
        "eps_fold": m["eps_fold"],
        "params": m["params"],
        "stages": {},
        "deleted_from": root,
        "n_deleted": int(n_dropped),
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": avgdl,
        "input_fp": input_fp,
    }
    if resume and Path(paths.manifest).exists():
        old = json.loads(Path(paths.manifest).read_text())
        if old.get("input_fp") == input_fp:
            # resume only timing bookkeeping — never the derived stats,
            # which the old manifest would clobber with stale values
            manifest["stages"] = old.get("stages", {})
        else:
            # different source/doc_ids into the same out_dir: the _done
            # markers on disk belong to another operation — recompute
            resume = False

    def stage(name: str, path: str, producer) -> DataFrame:
        t0 = time.time()
        if not (resume and _done(path)):
            producer().write.mode("overwrite").parquet(path)
            manifest["stages"][name] = {
                "path": path,
                "seconds": round(time.time() - t0, 3),
                "resumed": False,
            }
        else:
            manifest["stages"].setdefault(name, {"path": path, "seconds": 0.0})
            manifest["stages"][name]["resumed"] = True
        return spark.read.parquet(path)

    stage(
        "docs",
        paths.docs,
        lambda: spark.read.parquet(src.docs).join(del_df, "doc_id", "left_anti"),
    )
    stage("docstats", paths.docstats, lambda: ds.join(del_df, "doc_id", "left_anti"))

    # -- filtered postings under OLD term_ids (one map-only pass)
    deleted_bc = spark.sparkContext.broadcast(deleted)
    filtered_path = f"{out_dir}/_postings_filtered"
    if not (resume and _done(filtered_path)):
        (
            spark.read.parquet(src.postings)
            .mapInPandas(_make_delete_fn(params, avgdl, deleted_bc), POSTINGS_SCHEMA)
            .write.mode("overwrite")
            .parquet(filtered_path)
        )
    filtered = spark.read.parquet(filtered_path)

    # -- dictionary: df from the filtered rows (df = Σ n_docs per term),
    # dropped terms vanish, dense lexical term_ids reassigned
    old_dict = spark.read.parquet(src.dictionary)

    def make_dictionary():
        dfreq = (
            filtered.groupBy("term_id")
            .agg(F.sum("n_docs").alias("df"))
            .withColumnRenamed("term_id", "term_id_old")
            .join(
                old_dict.select(F.col("term_id").alias("term_id_old"), "term"),
                "term_id_old",
            )
            .select("term", "df")
        )
        return dictionary_from_dfreq(dfreq, n_docs, params, total_tokens, out_dir)

    dictionary = stage("dictionary", paths.dictionary, make_dictionary)
    manifest["min_idf"] = float(dictionary.agg(F.min("idf")).collect()[0][0])

    def make_postings():
        remapped = (
            filtered.withColumnRenamed("term_id", "term_id_old")
            .join(
                old_dict.select(F.col("term_id").alias("term_id_old"), "term"),
                "term_id_old",
            )
            .join(dictionary.select("term", "term_id"), "term")
            .select(*[f.name for f in POSTINGS_SCHEMA.fields])
        )
        return remapped.repartitionByRange(
            max(1, spark.sparkContext.defaultParallelism), "term_id", "seg_id"
        ).sortWithinPartitions("term_id", "seg_id")

    stage("postings", paths.postings, make_postings)
    write_lineage_and_metrics(spark, paths, manifest, resume)
    return paths
