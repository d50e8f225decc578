#!/usr/bin/env python
"""Scale evidence for the dedup / ANN suite (round-2 VERDICT #2): run
dedup_minhash_lsh, dedup_keep, ann_lsh_topk and near_dup_pairs on
200k/400k/800k synthetic corpora with PLANTED near-duplicates, and
record wall-time, candidate volume vs n², and recall on the planted
pairs (ground truth known by construction, so no O(n²) oracle run is
needed at scale).

Text corpora: make_corpus_fast(n) with every (100i, 100i+1) pair made a
near-dup (every 16th token replaced → shingle Jaccard ≈ 0.6-0.75, above
the 0.5 sweep threshold; banded hit prob 1-(1-j²)^8 ≥ 0.99).

Embeddings: n unit gaussian vectors (dim 64, float32); every query
vector (vec_id % 50 == 0) gets 5 planted neighbors at cos ≈ 0.98 —
background max cos at n=800k is ≈ 0.65, so the planted set IS the true
top-5.  rbits auto-sized (lsh_auto_rbits) so per-band buckets stay
~16 vectors at every n; 8 bands.

Usage:
  python scripts/dedup_ann_bench.py [n1,n2,...]   (default 200000,400000,800000)
Prints one JSON line per (op, n); appends nothing to BASELINE.md (copy
the numbers there by hand with the round context).
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DIM = 64
EVERY = 100  # plant one near-dup pair per EVERY docs


def text_corpus(spark, n: int):
    import numpy as np

    from legal_text_retrieval_spark.fixtures import make_corpus_fast

    path = f"/tmp/lts_dedup_bench_{n}.parquet"
    if not Path(path + ".ok").exists():
        pdf = make_corpus_fast(n)[["doc_id", "content"]]
        # plant near-dups: doc 100i+1 := doc 100i with every 16th token swapped
        src = pdf["content"].to_numpy()
        for i in range(0, n - 1, EVERY):
            toks = src[i].split(" ")
            for j in range(3, len(toks), 16):
                toks[j] = f"zm{j}"
            src[i + 1] = " ".join(toks)
        pdf["content"] = src
        shutil.rmtree(path, ignore_errors=True)
        Path(path).unlink(missing_ok=True)
        pdf.to_parquet(path, index=False, row_group_size=20000)
        Path(path + ".ok").write_text("ok")
    return spark.read.parquet(path), {
        (i, i + 1) for i in range(0, n - 1, EVERY)
    }


def emb_corpus(spark, n: int):
    import numpy as np
    import pandas as pd

    path = f"/tmp/lts_ann_bench_{n}.parquet"
    planted = {
        (q, q + j) for q in range(0, n - 5, 50) for j in range(1, 6)
    }
    if not Path(path + ".ok").exists():
        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(n, DIM))
        for q in range(0, n - 5, 50):
            for j in range(1, 6):
                vecs[q + j] = vecs[q] + 0.22 * rng.normal(size=DIM)
        vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
        pdf = pd.DataFrame({"vec_id": range(n), "embedding": list(vecs)})
        shutil.rmtree(path, ignore_errors=True)
        Path(path).unlink(missing_ok=True)
        pdf.to_parquet(path, index=False, row_group_size=20000)
        Path(path + ".ok").write_text("ok")
    return spark.read.parquet(path), planted


def main(sizes: list[int], ops: set[str] | None = None) -> None:
    from pyspark.sql import functions as F

    from legal_text_retrieval_spark.operators.dedup import (
        dedup_keep,
        dedup_minhash_lsh,
        minhash_band_candidates,
    )
    from legal_text_retrieval_spark.operators.similarity import (
        ann_candidates,
        ann_lsh_topk,
        ivf_auto_stride,
        ivf_topk,
        lsh_auto_rbits,
        near_dup_pairs,
    )
    from legal_text_retrieval_spark.session import get_spark, query_scope

    # SPARK_GRAFT_IO_CODEC=zstd: shuffle/cache compression codec
    # override.  The 3.2M text sweep writes >78 GB of accumulated
    # shuffle+spilled-cache under lz4 — past this box's free disk;
    # zstd's ~2× text ratio is the standard petabyte-cluster lever for
    # exactly this (CPU-for-disk trade), so the boundary run documents
    # both codecs.
    import os

    codec = os.environ.get("SPARK_GRAFT_IO_CODEC")
    spark = get_spark(
        app_name="dedup-ann-bench",
        master="local[16]",
        extra_conf={"spark.io.compression.codec": codec} if codec else None,
    )

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    def want(op: str) -> bool:
        return ops is None or op in ops

    for n in sizes:
        # query_scope restores the sweep-raised sized-shuffle confs
        # (shuffle.partitions + AQE coalesce floor) after each leg
        # group, so one 1.6M sweep doesn't pin later (smaller) legs —
        # or anything else in a shared session — to its floor.
        text_scope = None
        if want("dedup_minhash_lsh") or want("dedup_keep"):
            text_scope = query_scope(spark)
            text_scope.__enter__()
            docs, planted = text_corpus(spark, n)
            docs = docs.cache()
            docs.count()

        if want("dedup_minhash_lsh"):
            # barrier selection now lives in the operator (round-6
            # VERDICT next #2): resolve the operator's own auto rule
            # here (projected single-lineage footprint vs free disk)
            # so the emitted row records whether the barrier fired and
            # the candidate relation stays countable from a known dir
            from legal_text_retrieval_spark.operators.dedup import (
                _auto_checkpoint_dir,
                estimate_shingle_rows,
            )

            ckpt_env = os.environ.get("SPARK_GRAFT_DEDUP_CKPT", "auto")
            if ckpt_env == "auto":
                ckpt = _auto_checkpoint_dir(spark, estimate_shingle_rows(docs))
            else:
                ckpt = ckpt_env or None
            t0 = time.time()
            found = {
                (r.doc_a, r.doc_b)
                for r in dedup_minhash_lsh(
                    docs, threshold=0.5, checkpoint_dir=ckpt
                ).collect()
            }
            lsh_s = time.time() - t0
            if ckpt:
                # the barrier already materialized the candidate
                # relation — count it instead of re-running the job
                n_cand = spark.read.parquet(ckpt + "/candidates").count()
            else:
                n_cand = minhash_band_candidates(docs).count()
            # ground truth = planted pairs whose EXACT jaccard clears the
            # threshold (short docs lose all shingles to one mutation and
            # legitimately fall below it) — computed with the candidate-
            # bounded kernel on just the planted list, cheap at any n
            from legal_text_retrieval_spark.operators.dedup import dedup_ngram_jaccard

            planted_df = spark.createDataFrame(
                sorted(planted), ["doc_a", "doc_b"]
            )
            planted = {
                (r.doc_a, r.doc_b)
                for r in dedup_ngram_jaccard(
                    docs, threshold=0.5, pairs=planted_df
                ).collect()
            }
            emit(
                op="dedup_minhash_lsh",
                n=n,
                seconds=round(lsh_s, 1),
                pairs=len(found),
                candidates=n_cand,
                cand_vs_n2=round(n_cand / (n * (n - 1) / 2), 8),
                planted=len(planted),
                planted_recall=round(len(found & planted) / len(planted), 4),
                shuffle_partitions=int(
                    spark.conf.get("spark.sql.shuffle.partitions")
                ),
                checkpointed=bool(ckpt),
            )

        if want("dedup_keep"):
            # share leg 1's sweep when it ran (dedup_keep(pairs=...) is
            # the documented shared-sweep mode): re-running the full
            # LSH sweep inside the same session doubles live shuffle
            # data and filled the disk at 1.6M docs
            kw = {}
            if want("dedup_minhash_lsh"):
                kw["pairs"] = spark.createDataFrame(
                    sorted(found), ["doc_a", "doc_b"]
                )
            t0 = time.time()
            kept = dedup_keep(docs, threshold=0.5, **kw).count()
            emit(
                op="dedup_keep",
                n=n,
                seconds=round(time.time() - t0, 1),
                kept=kept,
                pairs_precomputed=bool(kw),
            )
        if text_scope is not None:
            docs.unpersist()
            text_scope.__exit__(None, None, None)
            shutil.rmtree(f"/tmp/lts_dedup_ckpt_{n}", ignore_errors=True)

        emb_ops = [
            o
            for o in ("ann_lsh_topk", "near_dup_pairs", "ivf_topk", "ivf_probe")
            if want(o)
        ]
        if not emb_ops:
            spark.catalog.clearCache()
            continue
        emb_scope = query_scope(spark)
        emb_scope.__enter__()
        emb, eplanted = emb_corpus(spark, n)
        emb = emb.cache()
        emb.count()
        rbits = lsh_auto_rbits(n, target_bucket=16)
        nq = len(range(0, n - 5, 50))

        if want("ann_lsh_topk"):
            t0 = time.time()
            hits = ann_lsh_topk(emb, k=5, nbands=8, rbits=rbits, dim=DIM).select(
                "query_vec_id", "vec_id"
            ).collect()
            ann_s = time.time() - t0
            got = {(r.query_vec_id, r.vec_id) for r in hits}
            n_acand = ann_candidates(emb, nbands=8, rbits=rbits, dim=DIM).count()
            emit(
                op="ann_lsh_topk",
                n=n,
                queries=nq,
                rbits=rbits,
                seconds=round(ann_s, 1),
                candidates=n_acand,
                cand_vs_brute=round(n_acand / (nq * (n - 1)), 6),
                planted=len(eplanted),
                planted_recall=round(len(got & eplanted) / len(eplanted), 4),
            )

        if want("near_dup_pairs"):
            # mode selection now lives in the operator (round-6
            # VERDICT next #2): "auto" picks injoin when the projected
            # candidate-hydrate exchange outgrows the banded sides
            # (the measured >80 GB disk death at 3.2M).  Resolve the
            # same rule here so the emitted row records which plan ran.
            nd_mode = os.environ.get("SPARK_GRAFT_ND_MODE", "auto")
            # SPARK_GRAFT_ND_BANDS: band-count override for the recall
            # knob curve (8 is the protocol default; 12/16 trade ~linear
            # cost for recall — BASELINE.md 1.6M band sweep)
            nd_bands = int(os.environ.get("SPARK_GRAFT_ND_BANDS", "8"))
            if nd_mode == "auto":
                from legal_text_retrieval_spark.operators.similarity import (
                    _AUTO_INJOIN_MIN_BYTES,
                    banded_exchange_bytes,
                    hydrate_exchange_bytes,
                )

                hb = hydrate_exchange_bytes(n, nd_bands, rbits, DIM)
                nd_mode = (
                    "injoin"
                    if hb > max(banded_exchange_bytes(n, nd_bands, DIM), _AUTO_INJOIN_MIN_BYTES)
                    else "hydrate"
                )
            t0 = time.time()
            ndp = near_dup_pairs(
                emb, threshold=0.9, nbands=nd_bands, rbits=rbits, dim=DIM, mode=nd_mode
            )
            pair_rows = {(r.vec_a, r.vec_b) for r in ndp.collect()}
            emit(
                op="near_dup_pairs",
                n=n,
                seconds=round(time.time() - t0, 1),
                pairs=len(pair_rows),
                planted=len(eplanted),
                planted_recall=round(
                    len(pair_rows & eplanted) / len(eplanted), 4
                ),
                mode=nd_mode,
                nbands=nd_bands,
            )
        if want("ivf_probe"):
            # build-once / probe-many split (round-3 VERDICT next #7):
            # the trained index persists (centroids + centroid_id-
            # partitioned inverted lists) and the probe leg measures
            # ONLY query cost against it — the deployment shape where
            # IVF earns its keep vs per-run banded LSH
            from pyspark.sql import functions as F2

            from legal_text_retrieval_spark.operators.similarity import (
                QUERY_STRIDE,
                build_ivf_index,
                ivf_probe_indexed,
            )

            root = f"/tmp/lts_ivf_index_{n}"
            t0 = time.time()
            build_ivf_index(emb, root, iters=2, stride=None, method="matmul")
            train_s = time.time() - t0
            queries = emb.filter(F2.col("vec_id") % QUERY_STRIDE == 0)
            probe = lambda: ivf_probe_indexed(  # noqa: E731
                spark, root, queries, k=5, nprobe=4, method="matmul"
            ).select("query_vec_id", "vec_id").collect()
            probe()  # warm
            t0 = time.time()
            phits = probe()
            probe_s = time.time() - t0
            pgot = {(r.query_vec_id, r.vec_id) for r in phits}
            man = json.loads(Path(root, "manifest.json").read_text())
            emit(
                op="ivf_probe",
                n=n,
                n_centroids=man["n_centroids"],
                train_build_seconds=round(train_s, 1),
                probe_only_seconds=round(probe_s, 1),
                queries=nq,
                nprobe=4,
                planted=len(eplanted),
                planted_recall=round(len(pgot & eplanted) / len(eplanted), 4),
            )
            shutil.rmtree(root, ignore_errors=True)

        if want("ivf_topk"):
            stride = ivf_auto_stride(n)
            t0 = time.time()
            ihits = ivf_topk(
                emb, k=5, nprobe=4, stride=stride, method="matmul"
            ).select("query_vec_id", "vec_id").collect()
            ivf_s = time.time() - t0
            igot = {(r.query_vec_id, r.vec_id) for r in ihits}
            emit(
                op="ivf_topk",
                n=n,
                stride=stride,
                n_centroids=n // stride,
                nprobe=4,
                method="matmul",
                seconds=round(ivf_s, 1),
                planted=len(eplanted),
                planted_recall=round(len(igot & eplanted) / len(eplanted), 4),
            )

        emb.unpersist()
        emb_scope.__exit__(None, None, None)
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    sizes = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [200_000, 400_000, 800_000]
    )
    # optional 2nd arg: comma-separated op filter, e.g.
    #   python scripts/dedup_ann_bench.py 1600000 dedup_minhash_lsh,dedup_keep
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    main(sizes, only)
