#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north_rule): the same
index build at two parallelism levels (default local[4] vs local[16];
override with SCALE_LO/SCALE_HI env) on the same input — the sandbox
substitute for N vs 4N executors.  A busy-loop capacity probe is
reported alongside because this box throttles at high thread counts.

Usage:
  python scripts/scaling_bench.py run <cores> <corpus_parquet> <out_json>
      one measured build (invoked in a fresh process per config)
  python scripts/scaling_bench.py all [n_docs]
      generate corpus once, run both configs as subprocesses, print the
      summary JSON and append the table to BASELINE.md
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

CORPUS = "/tmp/lts_scaling_corpus.parquet"
N_DOCS_DEFAULT = 200_000


def ensure_corpus(n_docs: int) -> str:
    marker = Path(CORPUS + f".{n_docs}.ok")
    if marker.exists():
        return CORPUS
    import pandas as pd

    from legal_text_retrieval_spark.fixtures import make_corpus_fast

    pdf = make_corpus_fast(n_docs)
    shutil.rmtree(CORPUS, ignore_errors=True)
    Path(CORPUS).unlink(missing_ok=True)
    # drop other sizes' markers: the corpus path is shared, so a stale
    # marker would let a later run at that size silently read this one
    for old in Path(CORPUS).parent.glob(Path(CORPUS).name + ".*.ok"):
        old.unlink(missing_ok=True)
    pdf.to_parquet(CORPUS, index=False)
    marker.write_text("ok")
    return CORPUS


def run_one(cores: int, corpus: str, out_json: str) -> None:
    from pyspark.sql import functions as F

    from legal_text_retrieval_spark.config import IndexParams, NORTH_STAR_BM25
    from legal_text_retrieval_spark.index.builder import build_index
    from legal_text_retrieval_spark.index.wand import FulltextIndex, query_topk
    from legal_text_retrieval_spark.session import get_spark
    from legal_text_retrieval_spark.sources.corpus import derived_queries

    spark = get_spark(app_name=f"scaling-{cores}", master=f"local[{cores}]")
    docs = spark.read.parquet(corpus)
    n_docs = docs.count()

    params = IndexParams(segment_doc_window=1 << 15, bm25=NORTH_STAR_BM25)
    # warm-up build (JIT, page cache, python workers), then median of 3
    # measured builds — single-box wall-clock noise is ±20-30%
    warm_dir = tempfile.mkdtemp(prefix=f"lts_scaling_warm_{cores}_")
    build_index(spark, docs, warm_dir, params, resume=False)
    shutil.rmtree(warm_dir, ignore_errors=True)

    times = []
    out_dir = ""
    for _ in range(3):
        if out_dir:
            shutil.rmtree(out_dir, ignore_errors=True)
        out_dir = tempfile.mkdtemp(prefix=f"lts_scaling_idx_{cores}_")
        t0 = time.time()
        build_index(spark, docs, out_dir, params, resume=False)
        times.append(time.time() - t0)
    build_s = sorted(times)[1]

    index = FulltextIndex.load(spark, out_dir)
    q = derived_queries(docs.withColumnRenamed("content", "content")).limit(50).cache()
    q.count()
    query_topk(index, q, k=10).count()  # warm
    t0 = time.time()
    query_topk(index, q, k=10).count()
    query_s = time.time() - t0
    query_topk(index, q, k=150).count()  # warm
    t0 = time.time()
    query_topk(index, q, k=150).count()
    query150_s = time.time() - t0

    manifest = json.loads(Path(out_dir, "manifest.json").read_text())
    Path(out_json).write_text(
        json.dumps(
            {
                "cores": cores,
                "n_docs": n_docs,
                "stage_seconds": {
                    k: v["seconds"] for k, v in manifest["stages"].items()
                },
                "build_seconds": round(build_s, 2),
                "build_seconds_runs": [round(t, 2) for t in times],
                "docs_per_sec": round(n_docs / build_s, 1),
                "postings_per_sec": round(manifest["total_postings"] / build_s, 1),
                "total_postings": manifest["total_postings"],
                "bytes_per_posting": manifest["bytes_per_posting"],
                "skew_ratio_group": manifest["skew_ratio_group"],
                "query_batch_seconds_k10_50q": round(query_s, 2),
                "query_batch_seconds_k150_50q": round(query150_s, 2),
            }
        )
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


CORES_LO, CORES_HI = int(__import__("os").environ.get("SCALE_LO", 4)), int(__import__("os").environ.get("SCALE_HI", 16))  # N and 4N


def _burn(_):
    import time as _t

    t = _t.time()
    x = 0
    while _t.time() - t < 2:
        x += 1
    return x


def hardware_capacity_ratio() -> float:
    """Measured compute capacity of CORES_HI vs CORES_LO busy-loop
    processes on this box.  This sandbox's 32 vCPUs throttle under
    full load (8→32 sustains only ~2.9×), so the honest N→4N pair is
    4→16, where capacity is ~3.9×; we report the measured ceiling next
    to the job's own speedup."""
    import multiprocessing as mp

    burn = _burn
    caps = {}
    for n in (CORES_LO, CORES_HI):
        with mp.Pool(n) as p:
            caps[n] = sum(p.map(burn, range(n)))
    return caps[CORES_HI] / caps[CORES_LO]


def run_all(n_docs: int) -> dict:
    corpus = ensure_corpus(n_docs)
    results = {}
    for cores in (CORES_LO, CORES_HI):
        out = f"/tmp/lts_scaling_{cores}.json"
        import os

        subprocess.run(
            [sys.executable, __file__, "run", str(cores), corpus, out],
            check=True,
            cwd=str(Path(__file__).resolve().parents[1]),
            # plenty of heap: partial-agg hash maps must not spill, or the
            # measurement becomes disk-bound instead of core-bound
            env={**os.environ, "SPARK_DRIVER_MEM": "16g"},
        )
        results[cores] = json.loads(Path(out).read_text())
    speedup = results[CORES_HI]["docs_per_sec"] / results[CORES_LO]["docs_per_sec"]
    ratio = CORES_HI / CORES_LO
    hw = hardware_capacity_ratio()
    summary = {
        "n_docs": n_docs,
        f"local{CORES_LO}": results[CORES_LO],
        f"local{CORES_HI}": results[CORES_HI],
        "speedup": round(speedup, 3),
        "core_ratio": ratio,
        "scaling_efficiency": round(speedup / ratio, 3),
        "hardware_capacity_ratio": round(hw, 3),
        "efficiency_vs_hardware": round(speedup / hw, 3),
    }
    print(json.dumps(summary))
    return summary


def run_chunked(n_docs: int, cores: int = 16) -> dict:
    """Chunked-path scale row (round-3 VERDICT next #5): docs ∪ chunks
    index build, warm k=150 WAND batch + parent dedup, and
    query_parents serving latency at ``n_docs`` — the composed
    reference configuration measured beyond sf0.1."""
    import numpy as np

    from legal_text_retrieval_spark.config import NORTH_STAR_BM25
    from legal_text_retrieval_spark.index.serving import LocalIndexServer
    from legal_text_retrieval_spark.index.wand import query_topk
    from legal_text_retrieval_spark.operators.chunk import (
        build_chunked_index,
        parent_dedup,
    )
    from legal_text_retrieval_spark.session import get_spark
    from legal_text_retrieval_spark.sources.corpus import derived_queries

    corpus = ensure_corpus(n_docs)
    spark = get_spark(app_name=f"scaling-chunked-{cores}", master=f"local[{cores}]")
    docs = spark.read.parquet(corpus).cache()
    docs.count()
    q = derived_queries(docs).limit(50).cache()
    q.count()

    out_dir = tempfile.mkdtemp(prefix="lts_scaling_cidx_")
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    index = build_chunked_index(
        spark, docs, out_dir, NORTH_STAR_BM25, size=30, stride=15,
        segment_doc_window=1 << 15,
    )
    build_s = time.time() - t0
    n_rows = index.manifest["n_docs"]

    def batch():
        return parent_dedup(
            query_topk(index, q, k=150).select("query_id", "doc_id", "rank")
        ).count()

    batch()  # warm
    times = []
    for _ in range(3):
        t0 = time.time()
        batch()
        times.append(time.time() - t0)
    batch_s = sorted(times)[1]

    srv = LocalIndexServer.load(spark, out_dir)
    qtexts = [r.query_text for r in q.collect()]
    lats = []
    for qt in qtexts:
        t0 = time.time()
        srv.query_parents(qt, 150)
        lats.append((time.time() - t0) * 1000)
    lats = np.sort(np.array(lats))
    summary = {
        "op": "chunked_index_scale",
        "n_docs": n_docs,
        "corpus_rows_with_chunks": int(n_rows),
        "cores": cores,
        "chunked_build_seconds": round(build_s, 1),
        "rows_per_sec": round(n_rows / build_s, 1),
        "wand_k150_batch_seconds_warm_50q": round(batch_s, 2),
        "serving_query_parents_p50_ms": round(float(lats[len(lats) // 2]), 1),
        "serving_query_parents_p95_ms": round(float(lats[int(len(lats) * 0.95)]), 1),
    }
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()
    print(json.dumps(summary))
    return summary


def _vm_rss_bytes(field: str = "VmRSS:") -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith(field):
                return int(line.split()[1]) * 1024
    return 0


def _reset_vm_peak() -> None:
    """Reset VmHWM to current VmRSS so the next VmHWM read is the peak
    of the section being measured (Linux clear_refs code 5)."""
    try:
        with open("/proc/self/clear_refs", "w") as f:
            f.write("5")
    except OSError:
        pass


def run_serving(n_docs: int, cores: int = 16) -> dict:
    """Serving-at-scale row (round-5 VERDICT next #6): build (or
    resume) an ``n_docs`` index, then validate the manifest-derived
    ``resident_estimate`` the memory-budget guard relies on against
    the measured Python-process RSS delta across load, and record the
    p50/p95 single-query latency at that scale."""
    import numpy as np

    from legal_text_retrieval_spark.config import IndexParams, NORTH_STAR_BM25
    from legal_text_retrieval_spark.index.builder import IndexPaths, build_index
    from legal_text_retrieval_spark.index.serving import LocalIndexServer
    from legal_text_retrieval_spark.session import get_spark
    from legal_text_retrieval_spark.sources.corpus import derived_queries

    corpus = f"/tmp/lts_serving_bench_{n_docs}.parquet"
    if not Path(corpus + ".ok").exists():
        from legal_text_retrieval_spark.fixtures import make_corpus_fast

        pdf = make_corpus_fast(n_docs)
        shutil.rmtree(corpus, ignore_errors=True)
        Path(corpus).unlink(missing_ok=True)
        pdf.to_parquet(corpus, index=False, row_group_size=20000)
        Path(corpus + ".ok").write_text("ok")

    spark = get_spark(app_name=f"serving-bench-{n_docs}", master=f"local[{cores}]")
    docs = spark.read.parquet(corpus)
    out_dir = f"/tmp/lts_serving_bench_idx_{n_docs}"
    params = IndexParams(segment_doc_window=1 << 15, bm25=NORTH_STAR_BM25)
    t0 = time.time()
    build_index(spark, docs, out_dir, params)  # resume-aware
    build_s = time.time() - t0

    manifest = json.loads(Path(IndexPaths(out_dir).manifest).read_text())
    est = LocalIndexServer.resident_estimate(manifest)
    _reset_vm_peak()
    rss0 = _vm_rss_bytes()
    t0 = time.time()
    srv = LocalIndexServer.load(spark, out_dir)
    load_s = time.time() - t0
    rss_delta = _vm_rss_bytes() - rss0
    peak_delta = _vm_rss_bytes("VmHWM:") - rss0

    qtexts = [
        r.query_text for r in derived_queries(docs).limit(200).collect()
    ]
    for qt in qtexts[:20]:
        srv.query(qt, 150)  # warm
    lats = []
    for qt in qtexts:
        t0 = time.time()
        srv.query(qt, 150)
        lats.append((time.time() - t0) * 1000)
    lats = np.sort(np.array(lats))

    # doc-partition scatter-gather (fork pool, COW-shared postings) —
    # bit-identical to the sequential path (test_query_sharded_bit_identical)
    n_workers = max(2, cores // 2)
    srv.start_workers(n_workers)
    try:
        for qt in qtexts[:20]:
            srv.query_sharded(qt, 150)  # warm
        slats = []
        for qt in qtexts:
            t0 = time.time()
            srv.query_sharded(qt, 150)
            slats.append((time.time() - t0) * 1000)
    finally:
        srv.stop_workers()
    slats = np.sort(np.array(slats))
    summary = {
        "op": "serving_scale",
        "n_docs": n_docs,
        "cores": cores,
        "build_seconds": round(build_s, 1),
        "total_postings": manifest["total_postings"],
        "load_seconds": round(load_s, 1),
        "resident_estimate_gib": round(est / (1 << 30), 2),
        "measured_rss_delta_gib": round(rss_delta / (1 << 30), 2),
        "measured_load_peak_gib": round(peak_delta / (1 << 30), 2),
        "estimate_vs_peak": round(est / max(1, peak_delta), 2),
        "serving_p50_ms": round(float(lats[len(lats) // 2]), 2),
        "serving_p95_ms": round(float(lats[int(len(lats) * 0.95)]), 2),
        "sharded_workers": n_workers,
        "sharded_p50_ms": round(float(slats[len(slats) // 2]), 2),
        "sharded_p95_ms": round(float(slats[int(len(slats) * 0.95)]), 2),
    }
    spark.stop()
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    if sys.argv[1] == "run":
        run_one(int(sys.argv[2]), sys.argv[3], sys.argv[4])
    elif sys.argv[1] == "serving":
        run_serving(
            int(sys.argv[2]) if len(sys.argv) > 2 else 3_200_000,
            int(sys.argv[3]) if len(sys.argv) > 3 else 16,
        )
    elif sys.argv[1] == "chunked":
        run_chunked(
            int(sys.argv[2]) if len(sys.argv) > 2 else 400_000,
            int(sys.argv[3]) if len(sys.argv) > 3 else 16,
        )
    else:
        run_all(int(sys.argv[2]) if len(sys.argv) > 2 else N_DOCS_DEFAULT)
