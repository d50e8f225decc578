"""ANN quality gates (VERDICT round-2 #3/#4): banded OR-amplified LSH
reaches recall@5 ≥ 0.9 on clustered embeddings with a bounded candidate
set (no single bucket widened), and Lloyd-trained IVF beats the stride
quantizer at equal nprobe."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

DIM = 32
N = 300


@pytest.fixture(scope="module")
def clustered_emb(spark):
    """Every query vector (vec_id % 50 == 0) has 5 planted neighbors at
    cos ≈ 0.95 (ids q+1..q+5); the rest are i.i.d. gaussian — a
    realistic near-dup / retrieval structure, unlike pure noise."""
    rng = np.random.default_rng(99)
    vecs = rng.normal(size=(N, DIM))
    for q in range(0, N, 50):
        base = vecs[q]
        for j in range(1, 6):
            vecs[q + j] = base + 0.22 * rng.normal(size=DIM)
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(N), "embedding": [v.tolist() for v in vecs]})
    return spark.createDataFrame(pdf).cache(), vecs


def test_lsh_auto_rbits_sizing():
    from legal_text_retrieval_spark.operators.similarity import lsh_auto_rbits

    assert lsh_auto_rbits(500, target_bucket=16) == 5
    assert lsh_auto_rbits(10**9, target_bucket=2048) == 19
    assert lsh_auto_rbits(8, target_bucket=16) == 1
    # occupancy n/2^r stays within [target/2, target] for any n
    for n in (10**4, 10**6, 10**8):
        r = lsh_auto_rbits(n, target_bucket=1024)
        assert 512 <= n / 2**r <= 1024


def test_ann_auto_rbits_path(spark, clustered_emb):
    """rbits=None derives the band width from the corpus size and
    returns a well-formed top-k."""
    from legal_text_retrieval_spark.operators.similarity import ann_lsh_topk

    df, _ = clustered_emb
    got = ann_lsh_topk(df, k=3, rbits=None, dim=DIM).toPandas()
    assert len(got) > 0
    assert set(got.columns) == {"query_vec_id", "vec_id", "rank", "cos"}
    assert got.groupby("query_vec_id")["rank"].max().max() <= 3


def test_banded_ann_recall_and_candidate_bound(spark, clustered_emb):
    """recall@5 ≥ 0.9 via band count (OR-amplification), with the
    candidate set bounded well below brute force — buckets stay at the
    auto-sized occupancy, bands are the recall knob."""
    from legal_text_retrieval_spark.operators.similarity import (
        ann_candidates,
        ann_recall,
        lsh_auto_rbits,
    )

    df, _ = clustered_emb
    rbits = lsh_auto_rbits(N, target_bucket=16)  # 5 bits → ~9/bucket
    rec = ann_recall(df, k=5, nbands=8, rbits=rbits, dim=DIM).toPandas()
    assert rec["recall"].mean() >= 0.9, rec

    n_queries = len(rec)
    n_cand = ann_candidates(df, nbands=8, rbits=rbits, dim=DIM).count()
    frac = n_cand / (n_queries * (N - 1))
    assert frac <= 0.35, frac  # vs 1.0 for brute force


def test_ivf_auto_stride_sizing_and_argmax_path(spark, clustered_emb):
    """stride=None derives C ≈ √n; nprobe=1 assignment (the groupBy
    argmax path) must pick the same centroids as the window path."""
    from legal_text_retrieval_spark.operators.similarity import (
        _best_centroids,
        ivf_auto_stride,
        ivf_centroids,
        ivf_topk,
    )

    for n in (10_000, 1_000_000, 100_000_000):
        s = ivf_auto_stride(n)
        assert 0.5 <= (n / s) / n**0.5 <= 2.0  # C within 2x of sqrt(n)

    df, _ = clustered_emb
    got = ivf_topk(df, k=3, stride=None).toPandas()
    assert len(got) > 0 and got.groupby("query_vec_id")["rank"].max().max() <= 3

    cents = ivf_centroids(df)
    fast = (
        _best_centroids(df, cents, 1, "vec_id", "embedding")
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    slow = (
        _best_centroids(df, cents, 2, "vec_id", "embedding")
        .where("probe_rank = 1")
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert fast["centroid_id"].tolist() == slow["centroid_id"].tolist()


def test_ivf_matmul_matches_expr(spark, clustered_emb):
    """The BLAS assignment/probe path must agree with the JVM-expr
    oracle path on non-degenerate data (same round-9 + centroid-ASC
    tie-break)."""
    from legal_text_retrieval_spark.operators.similarity import (
        _best_centroids,
        _best_centroids_matmul,
        ivf_centroids,
        ivf_topk,
    )

    df, _ = clustered_emb
    cents = ivf_centroids(df)
    for nprobe in (1, 3):
        a = (
            _best_centroids(df, cents, nprobe, "vec_id", "embedding")
            .toPandas().sort_values(["vec_id", "probe_rank"]).reset_index(drop=True)
        )
        b = (
            _best_centroids_matmul(df, cents, nprobe, "vec_id", "embedding")
            .toPandas().sort_values(["vec_id", "probe_rank"]).reset_index(drop=True)
        )
        assert a["centroid_id"].tolist() == b["centroid_id"].tolist(), nprobe

    e = ivf_topk(df, k=3).toPandas().sort_values(["query_vec_id", "rank"])
    m = ivf_topk(df, k=3, method="matmul").toPandas().sort_values(
        ["query_vec_id", "rank"]
    )
    assert e["vec_id"].tolist() == m["vec_id"].tolist()


def test_trained_ivf_beats_stride(spark, clustered_emb):
    """Lloyd-trained centroids ≥ stride-sampled centroids at equal
    nprobe (VERDICT #4 'Done' criterion), and the training is
    deterministic (two runs, identical bits)."""
    from legal_text_retrieval_spark.operators.similarity import (
        ivf_recall,
        ivf_trained_centroids_exploded,
        ivf_trained_recall,
    )

    df, _ = clustered_emb
    stride = ivf_recall(df, k=5, nprobe=2).toPandas()["recall"].mean()
    trained = ivf_trained_recall(df, k=5, nprobe=2).toPandas()["recall"].mean()
    assert trained >= stride, (trained, stride)
    assert trained > 0

    c1 = ivf_trained_centroids_exploded(df, iters=2).toPandas()
    c2 = ivf_trained_centroids_exploded(df, iters=2).toPandas()
    key = ["centroid_id", "pos"]
    c1 = c1.sort_values(key).reset_index(drop=True)
    c2 = c2.sort_values(key).reset_index(drop=True)
    assert (c1["v"].values.view("int64") == c2["v"].values.view("int64")).all()


def test_trained_ivf_partitions_all_vectors(spark, clustered_emb):
    """Every vector still lands in exactly one trained list, and probed
    search stays exact within the probed lists."""
    from legal_text_retrieval_spark.operators.similarity import (
        _best_centroids,
        cosine_topk,
        ivf_trained_centroids,
        ivf_trained_topk,
    )

    df, _ = clustered_emb
    cents = ivf_trained_centroids(df, iters=2)
    assign = _best_centroids(df, cents, 1, "vec_id", "embedding").toPandas()
    assert len(assign) == N and assign["vec_id"].is_unique

    exact = cosine_topk(df, k=N).toPandas()
    approx = ivf_trained_topk(df, k=5, iters=2).toPandas()
    merged = approx.merge(exact, on=["query_vec_id", "vec_id"], suffixes=("_a", "_e"))
    assert len(merged) == len(approx)
    assert (merged["cos_a"] == merged["cos_e"]).all()


def test_lsh_signature_rejects_wrong_width(spark):
    """Round-3 ADVICE: zip_with null-pads on width mismatch, silently
    degrading signatures for callers who forget dim= — the signature
    expression now asserts size(embedding) == dim in-plan."""
    from legal_text_retrieval_spark.operators.similarity import lsh_signatures

    bad = spark.createDataFrame(
        [(1, [1.0] * 32)], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(Exception, match="embedding width"):
        lsh_signatures(bad).collect()  # default dim=64
    ok = lsh_signatures(bad, dim=32).collect()
    assert len(ok) == 1


def test_ivf_probe_indexed_matches_trained(spark, clustered_emb, tmp_path):
    """Persisted IVF (build_ivf_index → ivf_probe_indexed) must return
    exactly what the in-memory trained path returns for the same
    queries — the probe reads only the probed lists' partitions."""
    from pyspark.sql import functions as F

    from legal_text_retrieval_spark.operators.similarity import (
        QUERY_STRIDE,
        build_ivf_index,
        ivf_probe_indexed,
        ivf_trained_topk,
    )

    emb, _ = clustered_emb
    root = str(tmp_path / "ivfidx")
    build_ivf_index(emb, root, iters=2, stride=16, method="matmul")
    queries = emb.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    got = (
        ivf_probe_indexed(spark, root, queries, k=5, nprobe=2, method="matmul")
        .toPandas()
        .sort_values(["query_vec_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        ivf_trained_topk(emb, k=5, nprobe=2, iters=2, stride=16, method="matmul")
        .toPandas()
        .sort_values(["query_vec_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
