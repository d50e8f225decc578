#!/usr/bin/env python
"""Skew stress (north_rule skew handling): a corpus where one term
appears in 50% of all docs (df = n/2 — the pathological hot posting
list) built + queried next to the un-skewed corpus of the same size.

What it demonstrates: the (term_id, doc_id-window) segment salt bounds
every shuffle group by the window regardless of df — skew_ratio_term
explodes with the hot term while skew_ratio_group stays ~flat, and
build/query wall-time stays within noise of the un-skewed corpus.

Usage:
  python scripts/skew_bench.py run <cores> <corpus> <hot|base> <out_json>
  python scripts/skew_bench.py all [n_docs]     # default 200k, local[16]
Appends nothing; prints one JSON line — numbers are copied into
BASELINE.md by hand.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_DOCS_DEFAULT = 200_000
CORES = 16
HOT = "hotterm"


def ensure_corpora(n_docs: int) -> tuple[str, str]:
    base = f"/tmp/lts_skew_base_{n_docs}.parquet"
    hot = f"/tmp/lts_skew_hot_{n_docs}.parquet"
    if not (Path(base + ".ok").exists() and Path(hot + ".ok").exists()):
        import numpy as np

        from legal_text_retrieval_spark.fixtures import make_corpus_fast

        pdf = make_corpus_fast(n_docs)
        pdf.to_parquet(base, index=False, row_group_size=20000)
        # hot variant: every even doc gets the hot term prepended →
        # df(hotterm) = n/2 exactly
        mask = (pdf["doc_id"] % 2 == 0).to_numpy()
        contents = pdf["content"].to_numpy(dtype=object).copy()
        contents[mask] = HOT + " " + contents[mask]
        hot_pdf = pdf.assign(content=contents)
        hot_pdf.to_parquet(hot, index=False, row_group_size=20000)
        Path(base + ".ok").write_text("ok")
        Path(hot + ".ok").write_text("ok")
    return base, hot


def run_one(cores: int, corpus: str, tag: str, out_json: str) -> None:
    import pandas as pd

    from legal_text_retrieval_spark.config import IndexParams, NORTH_STAR_BM25
    from legal_text_retrieval_spark.index.builder import build_index
    from legal_text_retrieval_spark.index.wand import FulltextIndex, query_topk
    from legal_text_retrieval_spark.session import get_spark
    from legal_text_retrieval_spark.sources.corpus import derived_queries

    spark = get_spark(app_name=f"skew-{tag}", master=f"local[{cores}]")
    docs = spark.read.parquet(corpus)
    n_docs = docs.count()
    params = IndexParams(segment_doc_window=1 << 15, bm25=NORTH_STAR_BM25)

    warm = tempfile.mkdtemp(prefix=f"lts_skew_warm_{tag}_")
    build_index(spark, docs, warm, params, resume=False)
    shutil.rmtree(warm, ignore_errors=True)

    times, out_dir = [], ""
    for _ in range(3):
        if out_dir:
            shutil.rmtree(out_dir, ignore_errors=True)
        out_dir = tempfile.mkdtemp(prefix=f"lts_skew_idx_{tag}_")
        t0 = time.time()
        build_index(spark, docs, out_dir, params, resume=False)
        times.append(time.time() - t0)
    build_s = sorted(times)[1]

    index = FulltextIndex.load(spark, out_dir)
    # query batch: derived queries + one query hammering the hot term
    q = derived_queries(docs).limit(49).toPandas()
    q = pd.concat(
        [q, pd.DataFrame({"query_id": [10**9], "query_text": [f"{HOT} lambda parser"]})]
    )
    qdf = spark.createDataFrame(q).cache()
    qdf.count()
    query_topk(index, qdf, k=10).count()  # warm
    t0 = time.time()
    query_topk(index, qdf, k=10).count()
    query_s = time.time() - t0

    m = json.loads(Path(out_dir, "manifest.json").read_text())
    Path(out_json).write_text(
        json.dumps(
            {
                "tag": tag,
                "cores": cores,
                "n_docs": n_docs,
                "build_seconds": round(build_s, 2),
                "build_seconds_runs": [round(t, 2) for t in times],
                "postings_per_sec": round(m["total_postings"] / build_s, 1),
                "total_postings": m["total_postings"],
                "skew_ratio_term": m["skew_ratio_term"],
                "skew_ratio_group": m["skew_ratio_group"],
                "max_term_postings": m["max_term_postings"],
                "max_group_postings": m["max_group_postings"],
                "query_batch_seconds_k10_50q": round(query_s, 2),
            }
        )
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


def run_all(n_docs: int) -> dict:
    import os

    base, hot = ensure_corpora(n_docs)
    results = {}
    for tag, corpus in (("base", base), ("hot", hot)):
        out = f"/tmp/lts_skew_{tag}.json"
        subprocess.run(
            [sys.executable, __file__, "run", str(CORES), corpus, tag, out],
            check=True,
            cwd=str(Path(__file__).resolve().parents[1]),
            env={**os.environ, "SPARK_DRIVER_MEM": "16g"},
        )
        results[tag] = json.loads(Path(out).read_text())
    summary = {
        "n_docs": n_docs,
        "base": results["base"],
        "hot": results["hot"],
        "build_slowdown_hot_vs_base": round(
            results["hot"]["build_seconds"] / results["base"]["build_seconds"], 3
        ),
        "query_slowdown_hot_vs_base": round(
            results["hot"]["query_batch_seconds_k10_50q"]
            / results["base"]["query_batch_seconds_k10_50q"],
            3,
        ),
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    if sys.argv[1] == "run":
        run_one(int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5])
    else:
        run_all(int(sys.argv[2]) if len(sys.argv) > 2 else N_DOCS_DEFAULT)
