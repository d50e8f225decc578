"""SPIMI-style inverted-index build (SURVEY.md §7 M2; north_rule).

Physical design, chosen for 10^12-file scale:

- **Posting segments, not whole posting lists.** The shuffle key is
  ``(term_id, seg_id = doc_id // segment_doc_window)``, so a group
  never exceeds the doc window regardless of term df — high-df code
  terms ("def", "import") can never create a hot reducer.  This IS the
  skew handling demanded by the north rule: the salt is the docID
  range, which (unlike a random salt) is also exactly what block-max
  WAND wants — docID-sorted, range-aligned segments that can be merged
  streamingly at query time.
- **Two-phase agg for tf** (Catalyst partial+final) — the SPIMI
  per-partition "local run" is the partial hash agg; the shuffle-merge
  by term is the final agg + segment pack.
- **Arrow-vectorized pack UDF only at the very end**: one
  ``applyInPandas`` per (term, segment) group that delta+varint-packs
  docIDs/tfs/dls and computes per-block max scores.  No per-row Python.
- **Checkpoint-resumable**: each stage writes Parquet with _SUCCESS;
  re-running skips completed stages (north_rule resumability).
- **Integrity**: per-row sha256(content) stored at ingest and verified
  against the source (input_hint).

Replaces the reference's in-memory dict index
(/root/reference/src/custom_rank_bm25.py:30-52) and pickle artifacts
(/root/reference/src/data_generator.py:186-199,257-258).
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import BM25Params, IndexParams
from ..functions.ids import DISTRIBUTED_ID_THRESHOLD, assign_dense_ids
from ..operators import stats as ops_stats
from . import codec

# Single source of truth for the on-disk index layout version: the
# builder writes it into every manifest and FulltextIndex/serving
# require it at load (wand.FulltextIndex.REQUIRED_FORMAT_VERSION is
# this same constant, so the writer and the readers cannot drift).
# Bump on any layout change (v3 = min_idf + block-max layout).
FORMAT_VERSION = 3

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("build_part", T.IntegerType()),  # producing shuffle partition
        T.StructField("term_id", T.LongType()),
        T.StructField("seg_id", T.LongType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("doc_ids_enc", T.BinaryType()),
        T.StructField("tfs_enc", T.BinaryType()),
        T.StructField("dls_enc", T.BinaryType()),
        T.StructField("block_first", T.ArrayType(T.LongType())),
        T.StructField("block_last", T.ArrayType(T.LongType())),
        T.StructField("block_max_tfpart", T.ArrayType(T.DoubleType())),
        T.StructField("seg_max_tfpart", T.DoubleType()),
        T.StructField("enc_bytes", T.LongType()),
    ]
)


@dataclass
class IndexPaths:
    root: str

    @property
    def docs(self) -> str:
        return f"{self.root}/docs"

    @property
    def docstats(self) -> str:
        return f"{self.root}/docstats"

    @property
    def dictionary(self) -> str:
        return f"{self.root}/dictionary"

    @property
    def postings(self) -> str:
        return f"{self.root}/postings"

    @property
    def manifest(self) -> str:
        return f"{self.root}/manifest.json"

    @property
    def lineage(self) -> str:
        return f"{self.root}/lineage"

    @property
    def lineage_partitions(self) -> str:
        return f"{self.root}/lineage_partitions"


def _done(path: str) -> bool:
    return Path(path, "_SUCCESS").exists()


def input_fingerprint(*parts) -> str:
    """Stable hash of an incremental operation's inputs (source roots,
    deleted-id sets, source index stats).  Recorded as ``input_fp`` in
    the output manifest; merge/delete/upsert refuse to resume from an
    out_dir whose manifest carries a different fingerprint — reusing
    ``_done`` stages keyed only on out_dir would silently return the
    previous call's index (round-3 ADVICE, medium)."""
    import hashlib

    return hashlib.sha256(
        json.dumps(parts, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


# vocab size above which term-id assignment switches from a single
# global window to the distributed range-partition + offset scheme
DISTRIBUTED_TERMID_THRESHOLD = DISTRIBUTED_ID_THRESHOLD


def assign_term_ids(
    df: DataFrame, distributed: bool | None = None, materialize_path: str | None = None
) -> DataFrame:
    """Dense lexical-order term_id over a (term, …) relation.

    Small vocabularies: one global row_number window.  Code-corpus
    vocabularies (identifiers → billions of terms) would serialize on
    that window, so above DISTRIBUTED_TERMID_THRESHOLD the assignment
    runs as range-partition by term → materialize (durable parquet when
    ``materialize_path`` is given, else a lineage-truncating local
    checkpoint — a lost partition fails instead of silently recomputing
    different range boundaries) → per-partition parallel windows +
    broadcast offsets.  The term→id mapping is identical either way
    (global lexical order): functions/ids.py.
    """
    return assign_dense_ids(df, ["term"], "term_id", distributed, materialize_path)


def _pack_group(term_id, seg_id, doc_ids, tfs, dls, params: IndexParams, avgdl: float):
    """Pack one (term, segment) group of docID-sorted postings."""
    bs = params.block_size
    p = params.bm25
    base = int(seg_id) * params.segment_doc_window
    ids_enc = codec.encode_docids(doc_ids, base)
    tfs_enc = codec.encode_varint(tfs)
    dls_enc = codec.encode_varint(dls)
    tfp = codec.tf_part(tfs, dls, p.k1, p.b, avgdl, p.variant)
    n = len(doc_ids)
    nblocks = (n + bs - 1) // bs
    bf, bl, bm = [], [], []
    for i in range(nblocks):
        s, e = i * bs, min((i + 1) * bs, n)
        bf.append(int(doc_ids[s]))
        bl.append(int(doc_ids[e - 1]))
        bm.append(float(tfp[s:e].max()))
    return {
        "build_part": -1,  # stamped by the pack kernel
        "term_id": int(term_id),
        "seg_id": int(seg_id),
        "n_docs": n,
        "doc_ids_enc": ids_enc,
        "tfs_enc": tfs_enc,
        "dls_enc": dls_enc,
        "block_first": bf,
        "block_last": bl,
        "block_max_tfpart": bm,
        "seg_max_tfpart": float(tfp.max()),
        "enc_bytes": len(ids_enc) + len(tfs_enc) + len(dls_enc),
    }


def _make_pack_fn(params: IndexParams, avgdl: float):
    """Streaming pack kernel for mapInPandas over partitions that are
    hash-partitioned by (term_id, seg_id) and sorted by
    (term_id, seg_id, doc_id): groups are contiguous runs; a carry
    buffer stitches runs that span Arrow batch boundaries.  No pandas
    per-group frames, no per-group sort — pure numpy slicing."""

    def pack(batches) -> "pd.DataFrame":
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        carry = None  # (term_id, seg_id, doc_ids, tfs, dls) columns of the open run

        def emit(rows):
            pdf = pd.DataFrame(rows)
            pdf["build_part"] = pid
            return pdf

        rows = []

        def flush_groups(t, s, d, tf, dl, final: bool):
            """Pack all complete groups in the concatenated arrays;
            return the trailing open run (or None if final)."""
            nonlocal rows
            if len(t) == 0:
                return None
            # boundaries where (term_id, seg_id) changes
            change = np.flatnonzero((t[1:] != t[:-1]) | (s[1:] != s[:-1])) + 1
            starts = np.concatenate([[0], change])
            ends = np.concatenate([change, [len(t)]])
            last = len(starts) - 1
            for gi in range(last + (1 if final else 0)):
                a, b = starts[gi], ends[gi]
                rows.append(
                    _pack_group(t[a], s[a], d[a:b], tf[a:b], dl[a:b], params, avgdl)
                )
            if final:
                return None
            a = starts[last]
            return (t[a:], s[a:], d[a:], tf[a:], dl[a:])

        for pdf in batches:
            t = pdf["term_id"].to_numpy(np.int64)
            s = pdf["seg_id"].to_numpy(np.int64)
            d = pdf["doc_id"].to_numpy(np.int64)
            tf = pdf["tf"].to_numpy(np.int64)
            dl = pdf["dl"].to_numpy(np.int64)
            if carry is not None:
                t = np.concatenate([carry[0], t])
                s = np.concatenate([carry[1], s])
                d = np.concatenate([carry[2], d])
                tf = np.concatenate([carry[3], tf])
                dl = np.concatenate([carry[4], dl])
            carry = flush_groups(t, s, d, tf, dl, final=False)
            if len(rows) >= 256:
                yield emit(rows)
                rows = []
        if carry is not None:
            flush_groups(*carry, final=True)
        if rows:
            yield emit(rows)

    return pack


def dictionary_from_dfreq(
    dfreq: DataFrame,
    n_docs: int,
    params: IndexParams,
    total_tokens: int,
    out_dir: str,
) -> DataFrame:
    """(term, df) → (term, df, idf, term_id): variant idf (okapi with
    the md5-bucketed ε-fold) + dense lexical term_id.  Shared by the
    full build and by index merge (merge recomputes idf from summed
    df + combined n_docs, so merged == rebuilt bit-for-bit)."""
    if params.bm25.variant == "plus":
        idf = dfreq.withColumn("idf", F.expr(f"ln(CAST({n_docs + 1} AS DOUBLE) / df)"))
    else:
        raw = dfreq.withColumn(
            "idf0",
            F.expr(
                f"ln(CAST({n_docs} - df AS DOUBLE) + CAST(0.5 AS DOUBLE)) "
                f"- ln(df + CAST(0.5 AS DOUBLE))"
            ),
        )
        from ..operators.bm25 import _ordered_mean_idf0

        eps = params.bm25.epsilon * _ordered_mean_idf0(raw)
        idf = raw.withColumn(
            "idf", F.expr(f"CASE WHEN idf0 < 0 THEN CAST({eps!r} AS DOUBLE) ELSE idf0 END")
        ).drop("idf0")
    # vocab ≤ total_tokens, already measured by the docstats stage:
    # small corpora skip the auto-mode probe job entirely
    distributed = False if total_tokens <= DISTRIBUTED_TERMID_THRESHOLD else None
    return assign_term_ids(
        idf, distributed=distributed, materialize_path=f"{out_dir}/_termid_ranged"
    )


def write_lineage_and_metrics(
    spark: SparkSession, paths: IndexPaths, manifest: dict, resume: bool = True
) -> None:
    """Lineage + metrics over the packed postings table (north_rule:
    postings/sec, bytes, skew ratio, per-partition records) and the
    final manifest write.  Shared by build and merge."""
    postings = spark.read.parquet(paths.postings)

    # max_group (largest (term, seg) group) rides along in lineage so
    # every whole-index metric below derives from these two SMALL tables
    # — the former extra full-postings aggregation job is gone (guide
    # §1.2: don't compute things twice).  Freshly computed tables are
    # cached so the metrics aggregate reuses the write's
    # materialization instead of re-reading the parquet it just wrote.
    fresh_lineage = not (resume and _done(paths.lineage))
    fresh_lp = not (resume and _done(paths.lineage_partitions))
    if fresh_lineage:
        lineage = postings.groupBy("term_id").agg(
            F.sum("n_docs").alias("postings"),
            F.sum("enc_bytes").alias("bytes"),
            F.count("*").alias("segments"),
            F.max("n_docs").alias("max_group"),
        ).cache()
    else:
        lineage = spark.read.parquet(paths.lineage)
    if fresh_lp:
        # per shuffle-partition record of the pack stage: which worker
        # partition produced how many groups/postings/bytes
        lineage_partitions = postings.groupBy("build_part").agg(
            F.count("*").alias("groups"),
            F.sum("n_docs").alias("postings"),
            F.sum("enc_bytes").alias("bytes"),
            F.min("term_id").alias("first_term_id"),
            F.max("term_id").alias("last_term_id"),
        ).cache()
    else:
        lineage_partitions = spark.read.parquet(paths.lineage_partitions)

    # the two bookkeeping writes are independent scans of the packed
    # table — overlap them (guide §2.6)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fa = pool.submit(
            lambda: fresh_lineage
            and lineage.write.mode("overwrite").parquet(paths.lineage)
        )
        fb = pool.submit(
            lambda: fresh_lp
            and lineage_partitions.write.mode("overwrite").parquet(
                paths.lineage_partitions
            )
        )
        fa.result()
        fb.result()
    # ONE combined metrics job over the (vocab-sized) lineage table plus
    # the (partition-count-sized) lineage_partitions table — the packed
    # postings themselves are never re-aggregated, and fresh tables are
    # served from the cache the writes just filled
    agg = (
        lineage.agg(
            F.sum("postings"),
            F.sum("bytes"),
            F.count("*"),
            F.sum("segments"),
            F.max("max_group"),
            F.max("postings"),
            F.avg("postings"),
        )
        .crossJoin(
            lineage_partitions.agg(F.count("*").alias("n_build_partitions"))
        )
        .collect()[0]
    )
    (total_postings, total_bytes, vocab, n_groups,
     max_group, max_term_postings, mean_term_postings, n_build_partitions) = agg
    mean_group = total_postings / max(1, n_groups)
    n_build_partitions = int(n_build_partitions)
    if fresh_lineage:
        lineage.unpersist()
    if fresh_lp:
        lineage_partitions.unpersist()
    build_secs = sum(s.get("seconds", 0) for s in manifest["stages"].values())
    n_docs = manifest["n_docs"]
    manifest.update(
        {
            "vocab_size": int(vocab),
            "total_postings": int(total_postings),
            "bytes_compressed": int(total_bytes),
            "bytes_per_posting": round(total_bytes / max(1, total_postings), 3),
            # skew before segment-salting (per-term posting-list sizes) vs
            # after (per-shuffle-group sizes, hard-bounded by the window)
            "skew_ratio_term": round(max_term_postings / max(1e-9, mean_term_postings), 2),
            "skew_ratio_group": round(max_group / max(1e-9, mean_group), 2),
            "max_term_postings": int(max_term_postings),
            "max_group_postings": int(max_group),
            "build_seconds": round(build_secs, 3),
            "n_build_partitions": n_build_partitions,
            "docs_per_sec": round(n_docs / max(1e-9, build_secs), 1),
            "postings_per_sec": round(total_postings / max(1e-9, build_secs), 1),
        }
    )
    Path(paths.manifest).write_text(json.dumps(manifest, indent=2))


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    params: IndexParams | None = None,
    text_col: str = "content",
    resume: bool = True,
) -> IndexPaths:
    """Build (or resume building) the full index under ``out_dir``.

    ``docs`` must carry a dense int64 ``doc_id`` (see
    sources.corpus.load_corpus for assignment from the Iceberg shape).
    """
    params = params or IndexParams()
    paths = IndexPaths(out_dir)
    # format_version bumps on any on-disk layout change; eps_fold names
    # the okapi ε-floor fold algorithm — indexes built under the round-1
    # flat term-ordered fold carry no eps_fold key and must be rebuilt,
    # not trusted (the md5-bucketed two-level fold changes ε in the last
    # ulps, so scores/oracle hashes are version-incompatible).
    manifest: dict = {"format_version": FORMAT_VERSION,
                      "eps_fold": "md5-bucketed-1024-two-level",
                      "params": {**asdict(params.bm25), "block_size": params.block_size,
                                 "segment_doc_window": params.segment_doc_window},
                      "stages": {}}
    if resume and Path(paths.manifest).exists():
        manifest.update(json.loads(Path(paths.manifest).read_text()))

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

    # -- ingest parallelism: a handful of big input files must not
    # serialize the tokenize stage; spread to 2× total cores up front.
    # (capture cached-ness of the CALLER's relation first — the
    # repartition wrapper below reports StorageLevel NONE even when its
    # child is an InMemoryRelation)
    _src_lvl = docs.storageLevel
    src_cached = _src_lvl.useMemory or _src_lvl.useDisk
    target_parts = spark.sparkContext.defaultParallelism * 2
    if docs.rdd.getNumPartitions() < target_parts:
        docs = docs.repartition(target_parts)

    # -- stage: docs (+ sha256 integrity column, input_hint invariant),
    # and stage: termfreq — the SPIMI local runs.  Tokenize + explode
    # exactly ONCE; docstats, dictionary and postings all derive from
    # termfreq.  dl is computed AT tokenize time (size of the token
    # array — identical to Σ tf per doc, empty-token terms included) and
    # carried through the (doc_id, term) aggregation, so the postings
    # stage needs NO doc_id-keyed join against docstats (guide §2.4:
    # one less corpus-volume exchange) — the extra 8 bytes per grouped
    # row is the whole cost.
    #
    # When the caller's source relation is CACHED, the two stages are
    # independent (evaluating an InMemoryRelation twice costs nothing)
    # and run overlapped from a 2-thread pool (guide §2.6).  For
    # uncached/computed sources (chunked_corpus's explode union, a raw
    # corpus scan at 100 TB) termfreq instead reads the docs stage's
    # parquet back, so the source is evaluated exactly once.
    from concurrent.futures import ThreadPoolExecutor

    docs_cols = [c for c in ("doc_id", "repo", "path", "commit", "lang", text_col) if c in docs.columns]

    def make_docs():
        return docs.select(*docs_cols).withColumn(
            "content_sha", F.sha2(F.col(text_col), 256)
        )

    # `background` holds stage writes NOTHING downstream consumes (the
    # docs table feeds only integrity checks; docstats feeds only query
    # time) — they run off the critical path and are joined before the
    # manifest is finalized.
    pool = ThreadPoolExecutor(max_workers=3)
    background = []
    try:
        if src_cached:
            background.append(pool.submit(stage, "docs", paths.docs, make_docs))
            termfreq = stage(
                "termfreq",
                f"{out_dir}/termfreq",
                lambda: ops_stats.term_frequencies_with_dl(
                    docs.select("doc_id", text_col), text_col
                ),
            )
        else:
            docs_idx = stage("docs", paths.docs, make_docs)
            termfreq = stage(
                "termfreq",
                f"{out_dir}/termfreq",
                lambda: ops_stats.term_frequencies_with_dl(docs_idx, text_col),
            )

        # -- stage docstats (background) ∥ the n_docs/total_tokens
        # scalars (critical path): both derive from the termfreq parquet
        # with no mutual dependency (dl is constant within a doc_id
        # group: max == the value; count/sum over the grouped relation
        # equal the old docstats-table aggregate exactly)
        background.append(
            pool.submit(
                stage,
                "docstats",
                paths.docstats,
                lambda: termfreq.groupBy("doc_id").agg(F.max("dl").alias("dl")),
            )
        )
        n_docs, total_tokens = (
            termfreq.groupBy("doc_id")
            .agg(F.max("dl").alias("dl"))
            .agg(F.count("*"), F.sum("dl"))
            .collect()[0]
        )
        avgdl = float(total_tokens) / n_docs
        manifest["n_docs"] = int(n_docs)
        manifest["total_tokens"] = int(total_tokens)
        manifest["avgdl"] = avgdl

        # -- stage: dictionary (term → dense term_id in lexical order + df + idf)
        dictionary = stage(
            "dictionary",
            paths.dictionary,
            lambda: dictionary_from_dfreq(
                termfreq.groupBy("term").agg(F.count("*").alias("df")),
                n_docs,
                params,
                total_tokens,
                out_dir,
            ),
        )
        # -- stage: postings (segment-partitioned, packed, block-max metadata)
        # Pack-shuffle partition count scales with posting volume
        # (total_tokens is an exact upper bound on postings — Σ dl is
        # already in hand), bounding per-partition sort/pack state instead
        # of pinning it to core count: at 3.2M docs the 149M-posting pack
        # through defaultParallelism partitions needed a 24g heap; sized
        # partitions keep the per-task working set flat as the corpus
        # grows.  Same sizing rule as operators/dedup.py
        # (dedup_shuffle_partitions); never below the core count.
        pack_parts = int(
            min(
                4096,
                max(
                    max(1, spark.sparkContext.defaultParallelism),
                    int(total_tokens) // 4_000_000 + 1,
                ),
            )
        )

        def make_postings():
            flat = (
                termfreq.join(F.broadcast(dictionary.select("term", "term_id")), "term")
                .withColumn("seg_id", (F.col("doc_id") / params.segment_doc_window).cast("long"))
                .select("term_id", "seg_id", "doc_id", "tf", "dl")
            )
            # RANGE-partition by group key, sort within partitions, stream-
            # pack: ONE shuffle, contiguous runs, no pandas per-group
            # overhead, and the output is already term_id-clustered for
            # parquet row-group min/max pruning at query time.  The former
            # shape (hash repartition → pack → repartitionByRange) paid a
            # second full exchange of the packed rows AND ran the pack
            # kernel TWICE, because RangePartitioner samples its child plan
            # — sampling here re-runs only the map-side scan+broadcast-join
            # (measured r7: postings stage 0.98 s → 0.60 s at sf0.1, and
            # one packed-volume exchange removed at every scale).
            return (
                flat.repartitionByRange(pack_parts, "term_id", "seg_id")
                .sortWithinPartitions("term_id", "seg_id", "doc_id")
                .mapInPandas(_make_pack_fn(params, avgdl), POSTINGS_SCHEMA)
            )

        # min_idf < 0 (okapi negative eps floor) invalidates WAND's
        # block-max bounds — recorded so the query path can refuse loudly.
        # The tiny dictionary aggregate is independent of the pack shuffle,
        # so it overlaps the postings stage (guide §2.6).
        background.append(
            pool.submit(lambda: manifest.__setitem__(
                "min_idf", float(dictionary.agg(F.min("idf")).collect()[0][0])
            ))
        )
        stage("postings", paths.postings, make_postings)
        # join every background job (docs/docstats writes, min_idf)
        # before the manifest is finalized — a failure there fails the
        # build here
        for f in background:
            f.result()
    finally:
        pool.shutdown(wait=True)

    # -- lineage + metrics (north_rule: postings/sec, bytes, skew ratio,
    # per-partition records)
    write_lineage_and_metrics(spark, paths, manifest, resume)
    return paths


def verify_integrity(spark: SparkSession, paths: IndexPaths, source: DataFrame, text_col: str = "content") -> int:
    """sha256(content) equality vs the source table, every row
    (input_hint).  Returns the number of violating rows (0 = pass)."""
    idx = spark.read.parquet(paths.docs).select("doc_id", "content_sha")
    src = source.select("doc_id", F.sha2(F.col(text_col), 256).alias("src_sha"))
    joined = idx.join(src, "doc_id", "full")
    return joined.filter(
        F.col("content_sha").isNull()
        | F.col("src_sha").isNull()
        | (F.col("content_sha") != F.col("src_sha"))
    ).count()
