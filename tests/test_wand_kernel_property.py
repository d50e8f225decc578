"""Hypothesis property test for the block-max WAND kernel in isolation:
for randomized posting segments and query weights, pruned evaluation
must equal exhaustive evaluation bit-for-bit (the SURVEY §5.3 safety
property, without Spark in the loop)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from legal_text_retrieval_spark.config import BM25Params
from legal_text_retrieval_spark.index import codec
from legal_text_retrieval_spark.index.wand import _make_kernel

PARAMS = BM25Params(k1=1.2)
WINDOW = 256
BLOCK = 8
AVGDL = 37.5


def _segment_row(rng, term_id, seg_id, n_docs):
    base = seg_id * WINDOW
    ids = base + np.sort(rng.choice(WINDOW, size=n_docs, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 30, size=n_docs).astype(np.int64)
    dls = rng.integers(1, 120, size=n_docs).astype(np.int64)
    tfp = codec.tf_part(tfs, dls, PARAMS.k1, PARAMS.b, AVGDL, PARAMS.variant)
    nb = (n_docs + BLOCK - 1) // BLOCK
    bf = [int(ids[i * BLOCK]) for i in range(nb)]
    bl = [int(ids[min((i + 1) * BLOCK, n_docs) - 1]) for i in range(nb)]
    bm = [float(tfp[i * BLOCK : (i + 1) * BLOCK].max()) for i in range(nb)]
    return {
        "qid": "q",
        "seg_id": seg_id,
        "term_id": term_id,
        "qtf": float(rng.integers(1, 3)),
        "idf": float(rng.uniform(0.05, 4.0)),
        "doc_ids_enc": codec.encode_docids(ids, base),
        "tfs_enc": codec.encode_varint(tfs),
        "dls_enc": codec.encode_varint(dls),
        "block_first": bf,
        "block_last": bl,
        "block_max_tfpart": bm,
        "seg_max_tfpart": float(tfp.max()),
    }


@given(
    seed=st.integers(0, 10_000),
    n_terms=st.integers(1, 8),
    k=st.sampled_from([1, 3, 10, 50]),
)
@settings(max_examples=150, deadline=None)
def test_pruned_equals_exhaustive(seed, n_terms, k):
    rng = np.random.default_rng(seed)
    rows = [
        _segment_row(rng, term_id=t, seg_id=5, n_docs=int(rng.integers(1, WINDOW)))
        for t in range(n_terms)
    ]
    pdf = pd.DataFrame(rows)
    out_prune = _make_kernel(PARAMS, AVGDL, WINDOW, k, prune=True, block_size=BLOCK)(pdf.copy())
    out_exh = _make_kernel(PARAMS, AVGDL, WINDOW, k, prune=False, block_size=BLOCK)(pdf.copy())
    assert out_prune["doc_id"].tolist() == out_exh["doc_id"].tolist()
    assert (
        out_prune["ms"].to_numpy().view("int64") == out_exh["ms"].to_numpy().view("int64")
    ).all()
    # n_cand drives the δ-padding decision: pruning may undercount
    # candidates ONLY when ≥ k already exist (θ activates at k), so the
    # "pad needed?" predicate (n_cand < k) is always preserved.
    if len(out_exh):
        ne, np_ = out_exh["n_cand"].iloc[0], out_prune["n_cand"].iloc[0]
        assert (ne == np_) or (ne >= k and np_ >= k)
