#!/usr/bin/env python
"""Round-7 optimization harness (guide §1): per-query isolation with the
noop sink, job labels, and .explain("formatted") capture.

NOT the graded bench — bench.py is frozen.  This file exists so the
optimization round can (a) time each declared bench query's computation
without the sink, (b) dump plan shapes to plans/r07/, and (c) break
index_build into its stage timings.

Usage:
    python bench_extra.py [--plans-suffix before|after] [--repeat 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

PLANS_DIR = Path(__file__).resolve().parent / "plans" / "r07"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-suffix", default=None, help="before|after: dump plans")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from legal_text_retrieval_spark.config import NORTH_STAR_BM25, IndexParams
    from legal_text_retrieval_spark.index.builder import build_index
    from legal_text_retrieval_spark.index.wand import FulltextIndex, query_topk
    from legal_text_retrieval_spark.operators import bm25 as B
    from legal_text_retrieval_spark.operators import stats
    from legal_text_retrieval_spark.session import get_spark
    from legal_text_retrieval_spark.sources import corpus as C

    spark = get_spark(app_name="lts-bench-extra", master=f"local[{cpus}]")
    sc = spark.sparkContext
    docs = C.load_documents(spark, sf_dir).cache()
    docs.count()
    queries_df = C.derived_queries(docs).cache()
    queries_df.count()

    timings: dict[str, float] = {}

    def timed(name, fn, repeat=None):
        sc.setJobDescription(name)
        samples = []
        for _ in range(repeat or args.repeat):
            t0 = time.time()
            fn()
            samples.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        samples.sort()
        timings[name] = samples[len(samples) // 2]
        timings[name + "__samples"] = samples

    def dump_plan(name, df):
        if args.plans_suffix:
            import contextlib
            import io

            PLANS_DIR.mkdir(parents=True, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            (PLANS_DIR / f"{name}_{args.plans_suffix}.txt").write_text(buf.getvalue())

    # --- stats queries (noop-sink isolated) ---
    timed("tokenize_stats_noop", lambda: noop(stats.corpus_stats(docs)))
    dump_plan("tokenize_stats", stats.corpus_stats(docs))
    timed("term_tf_df_noop", lambda: noop(stats.document_frequencies(docs)))
    dump_plan("term_df", stats.document_frequencies(docs))

    # --- relational BM25 ---
    timed(
        "bm25plus_topk150_relational_noop",
        lambda: noop(B.bm25_topk(docs, queries_df, NORTH_STAR_BM25, k=150)),
    )
    dump_plan("bm25plus_topk150_relational", B.bm25_topk(docs, queries_df, NORTH_STAR_BM25, k=150))

    # --- chunked relational (P5+J2+P9 composed) ---
    from legal_text_retrieval_spark.operators.chunk import bm25_chunked_topk

    dump_plan(
        "chunked_relational_topk150",
        bm25_chunked_topk(docs, queries_df, NORTH_STAR_BM25, k=150, size=30, stride=15),
    )

    # --- index build (stage-timed) ---
    idx_root = tempfile.mkdtemp(prefix="lts_bx_idx_")
    iparams = IndexParams(segment_doc_window=1 << 14, bm25=NORTH_STAR_BM25)

    def fresh_build():
        shutil.rmtree(idx_root, ignore_errors=True)
        build_index(spark, docs, idx_root, iparams, resume=False)

    if not args.skip_build:
        timed("index_build", fresh_build)
        stages = json.loads(Path(idx_root, "manifest.json").read_text())["stages"]
        timings["index_build__stages"] = {k: v.get("seconds") for k, v in stages.items()}
    else:
        fresh_build()
    index = FulltextIndex.load(spark, idx_root)

    # --- WAND ---
    timed("wand_topk150", lambda: noop(query_topk(index, queries_df, k=150)), repeat=1)
    timed("wand_topk150_warm", lambda: noop(query_topk(index, queries_df, k=150)))
    timed("wand_topk10_warm", lambda: noop(query_topk(index, queries_df, k=10)))
    dump_plan("wand_topk150", query_topk(index, queries_df, k=150))

    # single-query latency
    singles = queries_df.limit(9).collect()
    lats = []
    for row in singles:
        one = spark.createDataFrame([row])
        t0 = time.time()
        query_topk(index, one, k=10).count()
        lats.append(time.time() - t0)
    lats.sort()
    timings["wand_single_query_p50_s"] = round(lats[len(lats) // 2], 3)

    shutil.rmtree(idx_root, ignore_errors=True)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "timings": timings}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
