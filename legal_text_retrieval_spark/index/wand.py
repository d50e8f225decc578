"""Top-k BM25 query engine over the packed index — block-max WAND.

Plan shape (all-queries-at-once, SURVEY.md §2.4 Q1/Q5):

    queries → tokenize → (query_id, term, qtf)
            → broadcast-join dictionary → (query_id, term_id, qtf, idf)
    postings.filter(term_id ∈ query terms)      ← parquet min/max pruning
            → broadcast-join query terms
            → groupBy(query_id, seg_id).applyInPandas(WAND kernel)
            → global window top-k merge → + per-query δ-constant
            → δ-padding for queries with < k matched docs

The kernel is Arrow-vectorized NumPy; it prunes at block granularity
using (block_first, block_last, block_max_tfpart) metadata and is
**bit-identical** to exhaustive scoring by construction:

- terms are processed in term_id (= lexical term) order, so surviving
  docs accumulate contributions in exactly the order the relational
  path folds them;
- any decoded block's docs all become candidates, and blocks
  intersecting candidates are always decoded, so a surviving doc's
  score is complete;
- a block is skipped only when block_ub + remaining-terms-ub < θ
  (θ = current k-th partial score), which proves every doc first seen
  in it can never reach the true top-k.

Correctness-fallback ``mode="exhaustive"`` decodes everything; tests
assert bitwise equality of the two modes (SURVEY.md §5.3).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import BM25Params
from . import codec
from .builder import IndexPaths

# max distinct query term_ids pushed down as an .isin literal list
# (parquet min/max pruning); larger batches use a broadcast semi-join
TERM_ID_PUSHDOWN_LIMIT = 4096

_KERNEL_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("ms", T.DoubleType()),
        T.StructField("n_cand", T.LongType()),
    ]
)


@dataclass
class FulltextIndex:
    spark: SparkSession
    paths: IndexPaths
    manifest: dict

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "FulltextIndex":
        paths = IndexPaths(root)
        manifest = json.loads(Path(paths.manifest).read_text())
        # the index dirs may have been rewritten in-place (compaction,
        # resumed builds) — drop any stale cached relations for them
        for p in (paths.dictionary, paths.docstats, paths.postings, paths.docs):
            try:
                spark.catalog.refreshByPath(p)
            except Exception:
                pass
        return cls(spark, paths, manifest)

    @property
    def params(self) -> BM25Params:
        p = self.manifest["params"]
        return BM25Params(
            k1=p["k1"], b=p["b"], delta=p["delta"], variant=p["variant"], epsilon=p["epsilon"]
        )

    _dict_cache: DataFrame | None = None
    _docstats_cache: DataFrame | None = None

    def dictionary(self) -> DataFrame:
        if self._dict_cache is None:
            self._dict_cache = self.spark.read.parquet(self.paths.dictionary).cache()
        return self._dict_cache

    def postings(self) -> DataFrame:
        return self.spark.read.parquet(self.paths.postings)

    def docstats(self) -> DataFrame:
        if self._docstats_cache is None:
            self._docstats_cache = self.spark.read.parquet(self.paths.docstats).cache()
        return self._docstats_cache


def _make_kernel(
    params: BM25Params, avgdl: float, window: int, k: int, prune: bool, block_size: int = 128
):
    p = params
    bs = block_size

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["qid"].iloc[0]
        seg_id = int(pdf["seg_id"].iloc[0])
        base = seg_id * window
        pdf = pdf.sort_values("term_id")  # fold order == lexical term order

        cand_ids = np.zeros(0, dtype=np.int64)
        cand_scores = np.zeros(0, dtype=np.float64)
        weights = (pdf["qtf"].to_numpy(np.float64) * pdf["idf"].to_numpy(np.float64))
        seg_ubs = weights * pdf["seg_max_tfpart"].to_numpy(np.float64)
        rem_ub = float(seg_ubs.sum())

        for i, row in enumerate(pdf.itertuples(index=False)):
            w = weights[i]
            rem_after = rem_ub - seg_ubs[i]
            rem_ub = rem_after
            theta = (
                float(np.partition(cand_scores, len(cand_scores) - k)[len(cand_scores) - k])
                if prune and len(cand_scores) >= k
                else -np.inf
            )
            bf = np.asarray(row.block_first, dtype=np.int64)
            blast = np.asarray(row.block_last, dtype=np.int64)
            bmax = np.asarray(row.block_max_tfpart, dtype=np.float64)
            # decode-block decision (vectorized over blocks)
            if prune and theta > -np.inf and len(cand_ids):
                lo = np.searchsorted(cand_ids, bf, side="left")
                hi = np.searchsorted(cand_ids, blast, side="right")
                intersects = hi > lo
                keep = intersects | (w * bmax + rem_after >= theta)
            elif prune and theta > -np.inf:
                keep = w * bmax + rem_after >= theta
            else:
                keep = np.ones(len(bf), dtype=bool)
            if not keep.any():
                continue
            ids_all = codec.decode_docids(row.doc_ids_enc, base)
            tfs_all = codec.decode_varint(row.tfs_enc).astype(np.int64)
            dls_all = codec.decode_varint(row.dls_enc).astype(np.int64)
            if keep.all():
                ids, tfs, dls = ids_all, tfs_all, dls_all
            else:
                # blocks are fixed-size except the last — expand the
                # per-block mask with the TRUE build block size (an
                # inferred size would misalign on a short tail block)
                sel = np.repeat(keep, bs)[: len(ids_all)]
                ids, tfs, dls = ids_all[sel], tfs_all[sel], dls_all[sel]
            contrib = w * codec.tf_part(tfs, dls, p.k1, p.b, avgdl, p.variant)
            # merge into candidates (keeps docID-sorted order)
            merged = np.concatenate([cand_ids, ids])
            scores = np.concatenate([cand_scores, contrib])
            uids, inv = np.unique(merged, return_inverse=True)
            # bincount adds in array order: existing candidates first,
            # then this term — i.e. ascending term order per doc.
            cand_scores = np.bincount(inv, weights=scores, minlength=len(uids))
            cand_ids = uids

        n_cand = len(cand_ids)
        if n_cand == 0:
            return pd.DataFrame(
                {"qid": pd.Series([], dtype=str), "doc_id": [], "ms": [], "n_cand": []}
            ).astype({"doc_id": "int64", "ms": "float64", "n_cand": "int64"})
        k_loc = min(k, n_cand)
        order = np.lexsort((cand_ids, cand_scores))  # asc score, asc doc_id
        sel = order[-k_loc:][::-1]  # desc score, desc doc_id among ties
        return pd.DataFrame(
            {
                "qid": qid,
                "doc_id": cand_ids[sel],
                "ms": cand_scores[sel],
                "n_cand": np.int64(n_cand),
            }
        )

    return kernel


def query_topk(
    index: FulltextIndex,
    queries: DataFrame,
    k: int,
    query_col: str = "query_text",
    mode: str = "wand",
    score_round: int | None = None,
) -> DataFrame:
    """(query_id, doc_id, rank, score) — rank-identical to the
    reference scorer (argsort-parity tie-break, δ-padding for queries
    with fewer than k matching docs)."""
    from ..functions.numeric import round_sql
    from ..operators.bm25 import query_term_occurrences

    spark = index.spark
    params = index.params
    avgdl = index.manifest["avgdl"]
    window = index.manifest["params"]["segment_doc_window"]

    qmap = queries.select(
        F.col("query_id"), F.col("query_id").cast("string").alias("qid")
    ).distinct()
    qocc = query_term_occurrences(queries, query_col).withColumn(
        "qid", F.col("query_id").cast("string")
    )
    qterms = qocc.join(
        F.broadcast(index.dictionary().select("term", "term_id", "idf")), "term", "inner"
    ).select("qid", "term_id", "qtf", "idf")

    # per-query δ-constant over ALL occurrences (OOV → idf 0 → drops out)
    if params.variant == "plus":
        qconst = (
            qterms.groupBy("qid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("term_id", (F.col("qtf") * F.col("idf")).alias("v")))
                ).alias("a")
            )
            .select(
                "qid",
                F.expr(
                    f"CAST({params.delta!r} AS DOUBLE) * "
                    "aggregate(a, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.v)"
                ).alias("qconst"),
            )
        )
    else:
        qconst = qmap.select("qid", F.lit(0.0).alias("qconst"))
    qconst = qmap.join(qconst, "qid", "left").fillna({"qconst": 0.0}).select("qid", "query_id", "qconst")

    # okapi precondition: WAND's block-max bounds assume non-negative
    # term weights (w·block_max is only an upper bound for w ≥ 0), and
    # the δ-padding appends pads after matched rows (matched ≥ 0 = pad
    # score).  A negative ε floor (mean idf0 < 0: tiny-vocab/repetitive
    # corpora) breaks both — refuse loudly; the relational bm25_topk
    # handles that corner with its dense fallback.
    if params.variant == "okapi" and index.manifest.get("min_idf", 0.0) < 0:
        raise ValueError(
            "index has negative idf values (okapi eps floor < 0); the WAND/"
            "index path requires non-negative weights — use operators.bm25."
            "bm25_topk (dense fallback) for this corpus"
        )

    # term_id pruning: an .isin literal list buys parquet row-group
    # min/max pruning, but collecting an unbounded distinct set to the
    # driver is a scale hazard — above the guard, switch to a broadcast
    # LEFT SEMI join (same rows, no driver materialization).
    id_rows = (
        qterms.select("term_id").distinct().limit(TERM_ID_PUSHDOWN_LIMIT + 1).collect()
    )
    if len(id_rows) <= TERM_ID_PUSHDOWN_LIMIT:
        post = index.postings().where(
            F.col("term_id").isin([r.term_id for r in id_rows])
        )
    else:
        post = index.postings().join(
            F.broadcast(qterms.select("term_id").distinct()), "term_id", "left_semi"
        )
    joined = post.join(F.broadcast(qterms), "term_id")

    kernel = _make_kernel(
        params,
        avgdl,
        window,
        k,
        prune=(mode == "wand"),
        block_size=index.manifest["params"].get("block_size", 128),
    )
    # local top-k rows are tiny (≤ queries × segments × k) — cache so the
    # merge window, the deficit count and the padding anti-join reuse
    # one kernel materialization.
    local = joined.groupBy("qid", "seg_id").applyInPandas(kernel, _KERNEL_SCHEMA).cache()

    w = Window.partitionBy("qid").orderBy(F.desc("ms"), F.desc("doc_id"))
    matched = (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )

    # matched-doc deficit per query (0 rows or < k candidates → pad).
    # Row count is the right statistic: when the true matched total is
    # < k every segment emits ALL its candidates (rows == matched), and
    # when it's ≥ k the row count is ≥ k so no padding triggers.
    # (Σ n_cand over rows would double-count — each row repeats its
    # segment's candidate count.)
    counts = local.groupBy("qid").agg(F.count("*").alias("n_matched"))
    need = (
        qconst.join(counts, "qid", "left")
        .fillna({"n_matched": 0})
        .withColumn("deficit", F.greatest(F.lit(0), F.lit(k) - F.col("n_matched")))
    )
    out = matched.join(qconst, "qid").select(
        "qid",
        "query_id",
        "doc_id",
        "rank",
        (F.col("qconst") + F.col("ms")).alias("score"),
    )

    # δ-padding is part of the plan unconditionally — when no query has
    # a deficit the broadcast side is empty and the branch costs ~0
    # (avoids an extra driver-blocking count() job per query batch).
    deficits = need.filter(F.col("deficit") > 0)
    # unmatched docs all score exactly qconst; reference argsort puts
    # higher docIDs first among ties → take the highest unmatched ids.
    all_matched = local.select("qid", "doc_id")
    top_unmatched = (
        index.docstats()
        .select("doc_id")
        .crossJoin(F.broadcast(deficits.select("qid", "query_id", "qconst", "n_matched")))
        .join(all_matched, ["qid", "doc_id"], "left_anti")
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("doc_id"))
    pad = (
        top_unmatched.withColumn("r2", F.row_number().over(w2))
        .filter(F.col("r2") <= F.lit(k) - F.col("n_matched"))
        .select(
            "qid",
            "query_id",
            "doc_id",
            (F.col("n_matched") + F.col("r2")).cast("long").alias("rank"),
            F.col("qconst").alias("score"),
        )
    )
    out = out.unionByName(pad)

    out = out.select("query_id", "doc_id", "rank", "score")
    if score_round is not None:
        out = out.withColumn("score", F.expr(round_sql("score", score_round)))
    return out
