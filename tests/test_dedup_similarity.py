"""Semantic invariants for the dedup / similarity / textstats suite
(beyond the DuckDB hash parity the driver checks)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = "def foo return bar " * 10
    rows = [
        {"doc_id": 0, "content": base},
        {"doc_id": 1, "content": base},  # exact dup of 0
        {"doc_id": 2, "content": base.replace("bar", "baz", 1)},  # near dup
        {"doc_id": 3, "content": "import os sys json " * 12},
        {"doc_id": 4, "content": "class A B C D E F G H I J " * 5},
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_dedup_exact_groups(spark, dup_docs):
    from legal_text_retrieval_spark.operators.dedup import dedup_exact

    got = dedup_exact(dup_docs).toPandas()
    assert len(got) == 4  # 0/1 collapse
    g = got[got.n_dups == 2]
    assert len(g) == 1 and g.iloc[0].keep_doc_id == 0


def test_jaccard_finds_near_dup(spark, dup_docs):
    from legal_text_retrieval_spark.operators.dedup import dedup_ngram_jaccard

    got = dedup_ngram_jaccard(dup_docs, threshold=0.5).toPandas()
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in got.itertuples()}
    assert pairs[(0, 1)] == 1.0  # exact dup
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.5  # near dup
    assert (0, 3) not in pairs


def test_minhash_lsh_subset_and_high_sim_recall(spark):
    """LSH candidates ⊆ exact pairs, and recall ≈ 1 on genuinely
    similar pairs (j ≥ 0.5, where P[banded hit] = 1-(1-j²)^8 ≥ 0.9).
    Low-sim pairs are MEANT to be missed — that's the n²-avoidance."""
    import numpy as np

    from legal_text_retrieval_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    for i in range(30):
        toks = list(rng.choice(vocab, size=60))
        rows.append({"doc_id": 2 * i, "content": " ".join(toks)})
        mut = toks.copy()
        for j in rng.choice(60, size=4, replace=False):  # ~93% shingle overlap
            mut[j] = str(rng.choice(vocab))
        rows.append({"doc_id": 2 * i + 1, "content": " ".join(mut)})
    docs = spark.createDataFrame(pd.DataFrame(rows))

    exact_hi = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(docs, threshold=0.5).collect()
    }
    lsh = {(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(docs, threshold=0.5).collect()}
    exact_all = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(docs, threshold=0.0).collect()
    }
    assert lsh <= exact_all
    assert exact_hi, "fixture should contain high-sim pairs"
    recall = len(lsh & exact_hi) / len(exact_hi)
    assert recall >= 0.9, recall


def test_simhash_near_dup_close(spark, dup_docs):
    from legal_text_retrieval_spark.operators.dedup import simhash

    got = {r.doc_id: r.simhash for r in simhash(dup_docs).collect()}
    assert got[0] == got[1]

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(got[0], got[2]) <= 6  # near dup → few bits differ
    assert ham(got[0], got[3]) > ham(got[0], got[2])


def test_cosine_topk_matches_numpy(spark):
    from legal_text_retrieval_spark.operators.similarity import QUERY_STRIDE, cosine_topk

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(120, 16)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(120), "embedding": [v.tolist() for v in vecs]})
    got = cosine_topk(spark.createDataFrame(pdf), k=5).toPandas()
    V = vecs.astype(np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    for q in range(0, 120, QUERY_STRIDE):
        s = S[q].copy()
        s[q] = -np.inf
        want = set(np.argsort(s)[::-1][:5])
        have = set(got[got.query_vec_id == q]["vec_id"])
        assert have == want, q


def test_ann_lsh_is_bucketed_subset(spark):
    from legal_text_retrieval_spark.operators.similarity import ann_lsh_topk, cosine_topk

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(200, 16)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(200), "embedding": [v.tolist() for v in vecs]})
    df = spark.createDataFrame(pdf)
    ann = ann_lsh_topk(df, k=5).toPandas()
    assert len(ann) > 0
    # every ANN hit's cos must equal the exact cos (it IS exact within bucket)
    exact = cosine_topk(df, k=200).toPandas()
    merged = ann.merge(exact, on=["query_vec_id", "vec_id"], suffixes=("_a", "_e"))
    assert (merged["cos_a"] == merged["cos_e"]).all()


def test_fingerprint_order_sensitive(spark):
    from legal_text_retrieval_spark.operators.textstats import fingerprint

    pdf = pd.DataFrame(
        {"doc_id": [0, 1, 2], "content": ["a b c", "c b a", "a b c"]}
    )
    got = {r.doc_id: r.fp for r in fingerprint(spark.createDataFrame(pdf)).collect()}
    assert got[0] == got[2]
    assert got[0] != got[1]


def test_language_id_picks_stopword_language(spark):
    from legal_text_retrieval_spark.operators.textstats import language_id

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "content": [
                "the cat is in the house and the dog",
                "der hund ist nicht mit der katze und",
                "zz yy xx ww",
            ],
        }
    )
    got = {r.doc_id: r.lang_pred for r in language_id(spark.createDataFrame(pdf)).collect()}
    assert got[0] == "en" and got[1] == "de" and got[2] == "und"
