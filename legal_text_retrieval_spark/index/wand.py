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
from .builder import FORMAT_VERSION, IndexPaths

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

    # manifest invariants an index must carry to be scored correctly:
    # eps_fold (okapi ε provenance) and the current format_version
    # (min_idf + block-max layout).  merge.py guards the same keys
    # pairwise (_COMPAT_KEYS); load guards them absolutely.  The value
    # is builder.FORMAT_VERSION — the writer's constant — so a layout
    # bump cannot leave readers accepting stale indexes (or rejecting
    # fresh ones).
    REQUIRED_FORMAT_VERSION = FORMAT_VERSION

    @classmethod
    def load(
        cls, spark: SparkSession, root: str, allow_legacy: bool = False
    ) -> "FulltextIndex":
        paths = IndexPaths(root)
        manifest = json.loads(Path(paths.manifest).read_text())
        fv = manifest.get("format_version")
        legacy = fv != cls.REQUIRED_FORMAT_VERSION or "eps_fold" not in manifest
        if legacy:
            msg = (
                f"index at {root}: format_version={fv!r}, "
                f"eps_fold={'present' if 'eps_fold' in manifest else 'MISSING'} — "
                f"expected format_version={cls.REQUIRED_FORMAT_VERSION} with eps_fold; "
                "okapi ε-fold provenance and block-max layout cannot be trusted. "
                "Rebuild the index, or pass allow_legacy=True to open anyway."
            )
            if not allow_legacy:
                raise ValueError(msg)
            import warnings

            warnings.warn(msg, stacklevel=2)
        # the index dirs may have been rewritten in-place (compaction,
        # resumed builds) — drop any stale cached relations for them
        for p in (paths.dictionary, paths.docstats, paths.postings, paths.docs):
            try:
                spark.catalog.refreshByPath(p)
            except Exception:
                pass
        idx = cls(spark, paths, manifest)
        # opening an index hydrates its metadata tables (dictionary,
        # docstats) into the cache eagerly — every query needs them, and
        # serving-style loads (index/serving.py) have always done the
        # equivalent.  One small job at open instead of inside the first
        # query's critical path.
        idx.dictionary().count()
        idx.docstats().count()
        return idx

    @property
    def params(self) -> BM25Params:
        p = self.manifest["params"]
        return BM25Params(
            k1=p["k1"], b=p["b"], delta=p["delta"], variant=p["variant"], epsilon=p["epsilon"]
        )

    _dict_cache: DataFrame | None = None
    _docstats_cache: DataFrame | None = None
    _n_terms_cache: int | None = None

    @staticmethod
    def _pinned(df: DataFrame) -> DataFrame:
        """Re-register the cache if a query_scope / clearCache dropped
        it (storageLevel reads NONE then) — keeps long-lived index
        handles valid across batch-scoped cache lifecycles."""
        lvl = df.storageLevel
        if not (lvl.useMemory or lvl.useDisk):
            df.cache()
        return df

    def dictionary(self) -> DataFrame:
        if self._dict_cache is None:
            self._dict_cache = self.spark.read.parquet(self.paths.dictionary).cache()
        return self._pinned(self._dict_cache)

    def n_terms(self) -> int:
        """Vocabulary size, computed once per index lifetime (manifest
        stats if recorded, else one count over the cached dictionary) —
        lets repeated query batches skip the per-batch isin-vs-semi-join
        probe when the whole vocabulary fits the pushdown limit."""
        if self._n_terms_cache is None:
            n = self.manifest.get("vocab_size")
            self._n_terms_cache = int(n) if n is not None else self.dictionary().count()
        return self._n_terms_cache

    def postings(self) -> DataFrame:
        return self.spark.read.parquet(self.paths.postings)

    def docstats(self) -> DataFrame:
        if self._docstats_cache is None:
            self._docstats_cache = self.spark.read.parquet(self.paths.docstats).cache()
        return self._pinned(self._docstats_cache)


def _make_group_fn(
    params: BM25Params, avgdl: float, window: int, k: int, prune: bool, block_size: int = 128
):
    """The per-(qid, segment) WAND evaluation on raw arrays — shared by
    the applyInPandas kernel (kept for the property tests) and the
    streaming mapInPandas kernel, so both are the same math bit for
    bit.  ``rows`` fields must already be in ascending term_id order
    (fold order == lexical term order)."""
    p = params
    bs = block_size

    def group_topk(seg_id, qtf_arr, idf_arr, segmax_arr, blocks, bufs):
        """blocks[i] = (block_first, block_last, block_max) lists;
        bufs[i] = (doc_ids_enc, tfs_enc, dls_enc).  Returns
        (doc_ids, scores, n_cand) of the segment-local top-k, or None
        when no candidate survives.

        Dense window-local accumulator (the serving-mode scatter-add
        trick, index/serving.py): scores/seen are arrays indexed by
        doc_id − base, so a term merges in O(postings) instead of the
        previous O(candidates·log) np.unique merge.  Bit-identity is
        preserved: each (doc, term) contributes exactly one float add,
        applied in ascending term order — the same adds in the same
        order as the sorted-merge version (tests/test_wand_kernel_
        property.py, test_index_engine.py)."""
        base = int(seg_id) * window
        scores = np.zeros(window, dtype=np.float64)
        seen = np.zeros(window, dtype=bool)
        n_seen = 0
        weights = qtf_arr * idf_arr
        seg_ubs = weights * segmax_arr
        rem_ub = float(seg_ubs.sum())

        for i in range(len(weights)):
            w = weights[i]
            rem_after = rem_ub - seg_ubs[i]
            rem_ub = rem_after
            theta = (
                float(np.partition(scores[seen], n_seen - k)[n_seen - k])
                if prune and n_seen >= k
                else -np.inf
            )
            bf = np.asarray(blocks[i][0], dtype=np.int64)
            blast = np.asarray(blocks[i][1], dtype=np.int64)
            bmax = np.asarray(blocks[i][2], dtype=np.float64)
            # decode-block decision (vectorized over blocks)
            if prune and theta > -np.inf and n_seen:
                # any seen doc inside [bf, bl]?  prefix-sum range test
                cs = np.concatenate([[0], np.cumsum(seen)])
                intersects = cs[blast - base + 1] - cs[bf - base] > 0
                keep = intersects | (w * bmax + rem_after >= theta)
            elif prune and theta > -np.inf:
                keep = w * bmax + rem_after >= theta
            else:
                keep = np.ones(len(bf), dtype=bool)
            if not keep.any():
                continue
            ids_all = codec.decode_docids(bufs[i][0], base)
            tfs_all = codec.decode_varint(bufs[i][1]).astype(np.int64)
            dls_all = codec.decode_varint(bufs[i][2]).astype(np.int64)
            if keep.all():
                ids, tfs, dls = ids_all, tfs_all, dls_all
            else:
                # blocks are fixed-size except the last — expand the
                # per-block mask with the TRUE build block size (an
                # inferred size would misalign on a short tail block)
                sel = np.repeat(keep, bs)[: len(ids_all)]
                ids, tfs, dls = ids_all[sel], tfs_all[sel], dls_all[sel]
            contrib = w * codec.tf_part(tfs, dls, p.k1, p.b, avgdl, p.variant)
            # dense scatter-add: one add per (doc, term), term order
            slots = ids - base
            scores[slots] += contrib
            seen[slots] = True
            n_seen = int(seen.sum())

        if n_seen == 0:
            return None
        cand_ids = np.flatnonzero(seen) + base
        cand_scores = scores[seen]
        k_loc = min(k, n_seen)
        order = np.lexsort((cand_ids, cand_scores))  # asc score, asc doc_id
        sel = order[-k_loc:][::-1]  # desc score, desc doc_id among ties
        return cand_ids[sel], cand_scores[sel], n_seen

    return group_topk


def _group_arrays(pdf: pd.DataFrame):
    """Column extraction shared by both kernels (pdf already in
    ascending term_id order)."""
    qtf = pdf["qtf"].to_numpy(np.float64)
    idf = pdf["idf"].to_numpy(np.float64)
    segmax = pdf["seg_max_tfpart"].to_numpy(np.float64)
    blocks = list(zip(pdf["block_first"], pdf["block_last"], pdf["block_max_tfpart"]))
    bufs = list(zip(pdf["doc_ids_enc"], pdf["tfs_enc"], pdf["dls_enc"]))
    return qtf, idf, segmax, blocks, bufs


def _make_kernel(
    params: BM25Params, avgdl: float, window: int, k: int, prune: bool, block_size: int = 128
):
    """applyInPandas form (one call per (qid, seg_id) group)."""
    group_topk = _make_group_fn(params, avgdl, window, k, prune, block_size)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["qid"].iloc[0]
        seg_id = int(pdf["seg_id"].iloc[0])
        pdf = pdf.sort_values("term_id")  # fold order == lexical term order
        res = group_topk(seg_id, *_group_arrays(pdf))
        if res is None:
            return pd.DataFrame(
                {"qid": pd.Series([], dtype=str), "doc_id": [], "ms": [], "n_cand": []}
            ).astype({"doc_id": "int64", "ms": "float64", "n_cand": "int64"})
        ids, scores, n_cand = res
        return pd.DataFrame(
            {"qid": qid, "doc_id": ids, "ms": scores, "n_cand": np.int64(n_cand)}
        )

    return kernel


def _make_stream_kernel(
    params: BM25Params, avgdl: float, window: int, k: int, prune: bool, block_size: int = 128
):
    """mapInPandas form: the joined relation arrives hash-partitioned
    by (qid, seg_id) and sorted by (qid, seg_id, term_id), so groups
    are contiguous runs; a carry buffer stitches runs spanning Arrow
    batch boundaries.  Identical math to the applyInPandas kernel (the
    shared _make_group_fn), but without Spark's per-group overhead —
    the same streaming-runs trick the posting pack kernel uses
    (builder._make_pack_fn)."""
    group_topk = _make_group_fn(params, avgdl, window, k, prune, block_size)

    def kernel(batches):
        carry: pd.DataFrame | None = None
        out: list[pd.DataFrame] = []

        def run_group(g: pd.DataFrame) -> None:
            res = group_topk(int(g["seg_id"].iloc[0]), *_group_arrays(g))
            if res is None:
                return
            ids, scores, n_cand = res
            out.append(
                pd.DataFrame(
                    {
                        "qid": g["qid"].iloc[0],
                        "doc_id": ids,
                        "ms": scores,
                        "n_cand": np.int64(n_cand),
                    }
                )
            )

        def emit():
            nonlocal out
            if out:
                yield pd.concat(out, ignore_index=True)
                out = []

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            q = pdf["qid"].to_numpy(object)
            s = pdf["seg_id"].to_numpy(np.int64)
            change = np.flatnonzero((q[1:] != q[:-1]) | (s[1:] != s[:-1])) + 1
            starts = np.concatenate([[0], change])
            ends = np.concatenate([change, [len(pdf)]])
            # last run may continue in the next batch — carry it
            for gi in range(len(starts) - 1):
                run_group(pdf.iloc[starts[gi] : ends[gi]])
            if len(starts):
                carry = pdf.iloc[starts[-1] :]
            yield from emit()
        if carry is not None and len(carry):
            run_group(carry)
        yield from emit()

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

    qocc = query_term_occurrences(queries, query_col).withColumn(
        "qid", F.col("query_id").cast("string")
    )
    # ONE broadcast hydration of the query terms: qterms (the candidate
    # generator) and qconst (the δ-constant) both derive from it, so the
    # former qmap.distinct() exchange and its left-join back are gone
    # (guide §2.4).  Every query appears in qocc — tokenize('') is [''],
    # a 1-token doc — so qconst still covers all-OOV queries.
    qjoin = qocc.join(
        F.broadcast(index.dictionary().select("term", "term_id", "idf")), "term", "left"
    ).fillna({"idf": 0.0})
    # idf == 0 terms (okapi df == n/2 exactly) contribute nothing but
    # would mark their postings as "matched" candidates — the relational
    # plan (and the reference) filters them out (bm25.py: idf != 0), so
    # the index path must too, or candidacy/deficit/pad sets diverge and
    # w == 0 invalidates the block-skip bound.
    qterms = (
        qjoin.filter(F.col("idf") != 0).select("qid", "term_id", "qtf", "idf")
    )

    # per-query δ-constant over ALL occurrences, folded in term order
    # exactly like the relational qconst (bm25.py) — OOV/zero-idf terms
    # contribute an exact IEEE 0.0 at their fold position, so the sum is
    # bit-identical to the old in-vocabulary term_id-ordered fold
    if params.variant == "plus":
        qconst = (
            qjoin.groupBy("qid", "query_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("term", (F.col("qtf") * F.col("idf")).alias("v")))
                ).alias("a")
            )
            .select(
                "qid",
                "query_id",
                F.expr(
                    f"CAST({params.delta!r} AS DOUBLE) * "
                    "aggregate(a, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.v)"
                ).alias("qconst"),
            )
        )
    else:
        qconst = queries.select(
            F.col("query_id").cast("string").alias("qid"),
            "query_id",
            F.lit(0.0).alias("qconst"),
        )
    # one row per query, referenced by the matched join, the deficit
    # probe AND the pad branch — cache it so the probe job's
    # materialization is reused instead of re-aggregating the query
    # terms in every downstream job (session-lifetime by design, see
    # CLAUDE.md cache policy / session.query_scope)
    qconst = qconst.cache()

    # okapi negative-ε corner (mean idf0 < 0: tiny-vocab/repetitive
    # corpora): WAND's block-max bounds assume non-negative weights
    # (w·block_max is only an upper bound for w ≥ 0) and matched docs
    # can score BELOW the unmatched 0, so pads may outrank matched.
    # Handled exactly: pruning off (exhaustive decode — still the
    # compressed-index path), pads generated for EVERY query and
    # re-ranked together with matched rows.  Indexes built before
    # min_idf was recorded must not silently default to "safe": compute
    # it from the (cached, small) dictionary instead.
    negative_weights = False
    if params.variant == "okapi":
        min_idf = index.manifest.get("min_idf")
        if min_idf is None:
            min_idf = index.dictionary().agg(F.min("idf")).collect()[0][0]
        negative_weights = min_idf < 0

    # term_id pruning: an .isin literal list buys parquet row-group
    # min/max pruning, but collecting an unbounded distinct set to the
    # driver is a scale hazard — above the guard, switch to a broadcast
    # LEFT SEMI join (same rows, no driver materialization).  When the
    # whole VOCABULARY fits the limit (manifest vocab_size, cached per
    # index — no job after the first call) the query term set trivially
    # does too, so the limit+1 probe is skipped and the only collect is
    # the one that builds the literal list itself.
    if index.n_terms() <= TERM_ID_PUSHDOWN_LIMIT:
        id_rows = qterms.select("term_id").distinct().collect()
    else:
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

    # negative-weight mode must emit EVERY candidate from the kernel
    # (k_eff = window): the pad anti-join below treats "not in local"
    # as unmatched, and a matched doc dropped by a segment-local top-k
    # would be resurrected as a score-qconst pad — wrong when its true
    # score is below qconst.
    kernel = _make_stream_kernel(
        params,
        avgdl,
        window,
        window if negative_weights else k,
        prune=(mode == "wand" and not negative_weights),
        block_size=index.manifest["params"].get("block_size", 128),
    )
    # hash-partition by group key + sort within partitions: groups are
    # contiguous term_id-sorted runs for the streaming kernel — ONE
    # shuffle, no per-group pandas overhead (same layout as the pack
    # stage).  local top-k rows are tiny (≤ queries × segments × k) —
    # cache so the merge window, the deficit count and the padding
    # anti-join reuse one kernel materialization.
    # explicit partition count: the kernel is CPU-heavy per input byte,
    # so AQE's size-based coalescing (which a countless repartition
    # would enable) collapses a small-but-compute-dense batch onto one
    # or two cores — measured r7: batch 1.1 s → 2.7 s.  Keep one
    # partition per core and eat the mostly-empty Python round-trips on
    # tiny batches instead.
    spark_parallelism = max(1, spark.sparkContext.defaultParallelism)
    local = (
        joined.repartition(spark_parallelism, "qid", "seg_id")
        .sortWithinPartitions("qid", "seg_id", "term_id")
        .mapInPandas(kernel, _KERNEL_SCHEMA)
        .cache()
    )

    # per-query relations (qconst, counts, pad_queries) are one row per
    # query — broadcast them explicitly so the planner never sort-merges
    # a tiny side (post-aggregation estimates are unreliable; guide §3.1)
    w = Window.partitionBy("qid").orderBy(F.desc("ms"), F.desc("doc_id"))
    matched = (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .join(F.broadcast(qconst), "qid")
        .select(
            "qid",
            "query_id",
            "doc_id",
            "rank",
            (F.col("qconst") + F.col("ms")).alias("score"),
        )
    )

    # matched-doc deficit per query (0 rows or < k candidates → pad).
    # Row count is the right statistic: when the true matched total is
    # < k every segment emits ALL its candidates (rows == matched), and
    # when it's ≥ k the row count is ≥ k so no padding triggers.
    # (Σ n_cand over rows would double-count — each row repeats its
    # segment's candidate count.)
    counts = local.groupBy("qid").agg(F.count("*").alias("n_matched"))
    need = (
        qconst.join(F.broadcast(counts), "qid", "left")
        .fillna({"n_matched": 0})
        .withColumn("deficit", F.greatest(F.lit(0), F.lit(k) - F.col("n_matched")))
    )

    # δ-padding is part of the plan unconditionally — when no query has
    # a deficit the broadcast side is empty and the branch costs ~0
    # (avoids an extra driver-blocking count() job per query batch).
    # With negative weights (okapi ε < 0) EVERY query pads, because
    # unmatched docs (score qconst) can outrank matched ones.
    pad_queries = need if negative_weights else need.filter(F.col("deficit") > 0)
    pad_queries = pad_queries.select("qid", "query_id", "qconst")
    # short-circuit: one tiny job over the (cached) kernel output
    # decides whether any query pads.  In the common case (none) the
    # returned plan is just `matched`, skipping the pad/merge/anti
    # branch's ~5 sequential stage materializations per action
    # (negative-weight mode always pads, so it keeps the full plan
    # without paying the probe).  Bit-identical: with no pad queries,
    # whole == matched and merged is empty.
    if not negative_weights and pad_queries.limit(1).count() == 0:
        out = matched.select("query_id", "doc_id", "rank", "score")
        if score_round is not None:
            out = out.withColumn("score", F.expr(round_sql("score", score_round)))
        return out
    # unmatched docs all score exactly qconst; reference argsort puts
    # higher docIDs first among ties → the k highest unmatched ids are
    # the only pad candidates that can ever appear in the top k.
    # Those k ids live inside the global top-(k + m) doc_ids, where m
    # bounds the query's matched docs within that prefix — so the pad
    # branch crosses a POOL of that size, never the full docstats
    # (which would be Q×D when every query pads, e.g. negative-ε).
    # Deficit mode: n_matched < k, so top-(2k−1) always suffices.
    # Negative-weight mode: m ≤ max matched rows over pad queries (one
    # tiny agg over the cached kernel output); if that pool would reach
    # the whole corpus, fall back to the unsorted full table.
    all_matched = local.select("qid", "doc_id")
    if negative_weights:
        max_matched = need.agg(F.max("n_matched")).collect()[0][0] or 0
        pool_n = k + int(max_matched)
    else:
        # deficit mode: pad queries have < k matched rows each, so the
        # anti-join's right side shrinks to |pad_queries|·(k−1) once
        # semi-filtered — broadcast-safe at any scale
        all_matched = F.broadcast(
            all_matched.join(
                F.broadcast(pad_queries.select("qid")), "qid", "left_semi"
            )
        )
        pool_n = 2 * k - 1
    doc_pool = index.docstats().select("doc_id")
    n_docs_total = index.manifest.get("n_docs")
    if n_docs_total is None or pool_n < int(n_docs_total):
        doc_pool = doc_pool.orderBy(F.desc("doc_id")).limit(pool_n)
    w2 = Window.partitionBy("qid").orderBy(F.desc("doc_id"))
    pads = (
        doc_pool.crossJoin(F.broadcast(pad_queries))
        .join(all_matched, ["qid", "doc_id"], "left_anti")
        .withColumn("r2", F.row_number().over(w2))
        .filter(F.col("r2") <= k)
        .select("qid", "query_id", "doc_id", F.col("qconst").alias("score"))
    )
    # pad queries re-rank their matched rows TOGETHER with the pad
    # candidates (handles both the deficit case and negative-weight
    # corpora exactly); untouched queries keep their matched ranks.
    merged_src = (
        matched.join(F.broadcast(pad_queries.select("qid")), "qid", "left_semi")
        .select("qid", "query_id", "doc_id", "score")
        .unionByName(pads)
    )
    w3 = Window.partitionBy("qid").orderBy(F.desc("score"), F.desc("doc_id"))
    merged = (
        merged_src.withColumn("rank", F.row_number().over(w3).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "query_id", "doc_id", "rank", "score")
    )
    whole = matched.join(F.broadcast(pad_queries.select("qid")), "qid", "left_anti")
    out = whole.unionByName(merged).select("query_id", "doc_id", "rank", "score")
    if score_round is not None:
        out = out.withColumn("score", F.expr(round_sql("score", score_round)))
    return out
