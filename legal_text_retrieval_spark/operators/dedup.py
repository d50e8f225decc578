"""Deduplication suite for large-scale training-data pipelines:
exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (100 TB corpus):
- exact: one hash-groupBy (two-phase agg), no full-text shuffle — only
  (sha, doc_id) pairs move.
- MinHash+LSH: signatures are a single explode+groupBy pass; the
  candidate join is banded (equi-join on (band, key) — shuffle is
  bounded by bucket sizes, not n²); exact Jaccard verifies candidates
  only.
- n-gram Jaccard all-pairs is the small-scale oracle / verification
  kernel — at scale it runs only on LSH candidates.
- SimHash: near-dup fingerprint via Hamming distance on 32-bit
  signatures; bit-bucket join strategy for scale.

All hashes derive from md5 prefixes (functions.text.md5_hash60) so
Spark and DuckDB agree exactly; everything is integer arithmetic.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import dlit, round_sql
from ..functions.sqlgen import md5_hash60_sql, tokens_sql
from ..functions.text import md5_hash60, shingle_expr, tokenize

# MinHash permutation parameters: (a_i·h + b_i) mod P over the 60-bit
# base hash reduced mod P.  P prime > 2^32; a_i < 2^20 keeps a·h < 2^53.
_P = 4294967311
_NPERM = 16
_BANDS = 8  # × 2 rows/band
_A = [131071 + 2 * i + 1 for i in range(_NPERM)]  # odd, deterministic
_B = [(2654435761 * (i + 1)) % _P for i in range(_NPERM)]


def dedup_exact(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """(content_sha, n_dups, keep_doc_id) — exact duplicate groups;
    keep the smallest doc_id per group."""
    return (
        docs.select("doc_id", F.sha2(F.col(text_col), 256).alias("content_sha"))
        .groupBy("content_sha")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def dedup_exact_sql(table: str, text_col: str = "text") -> str:
    return (
        f"SELECT sha256({text_col}) AS content_sha, count(*)::BIGINT AS n_dups, "
        f"min(doc_id) AS keep_doc_id FROM {table} GROUP BY 1 ORDER BY 1"
    )


def doc_shingles(docs: DataFrame, n: int = 3, text_col: str = "content") -> DataFrame:
    """(doc_id, shingle) distinct n-token shingles of the BM25 token
    stream, carried as their 60-bit md5 hash (md5_hash60 — the same
    value MinHash always derived from, so signatures are unchanged);
    short docs yield one whole-doc shingle.

    Hash-encoding here (round 6) is what every corpus-volume dedup
    exchange ships: (int64, int64) rows instead of ~40 B shingle
    strings — a ~3× byte cut on the verify joins that dominate the
    sweep's shuffle disk at ≥3.2M docs, plus int64 sort-merge keys.
    Jaccard becomes jaccard over hashed shingles; the DuckDB twin
    hashes identically (md5_hash60_sql), so engine and oracle agree
    bit-for-bit INCLUDING any collision (none expected below ~2^30
    distinct shingles; E[colliding pairs] ≈ n²/2^61)."""
    return (
        docs.select("doc_id", tokenize(F.col(text_col)).alias("toks"))
        .select("doc_id", F.explode(shingle_expr("toks", n)).alias("shingle_s"))
        .select("doc_id", md5_hash60(F.col("shingle_s")).alias("shingle"))
        .distinct()
    )


def estimate_shingle_rows(
    docs: DataFrame, text_col: str = "content", sample_docs: int = 2_000
) -> int:
    """Estimated shingle-row volume of a dedup sweep: n_docs × avg
    tokens/doc from a bounded sample (distinct n-shingles ≤ tokens).
    Two tiny jobs; feeds BOTH the partition-sizing rule and the
    disk-barrier auto-selection so the sweep probes the corpus once."""
    n_docs = docs.count()
    frac = min(1.0, sample_docs / max(1, n_docs))
    sample = docs.sample(fraction=frac, seed=7) if frac < 1.0 else docs
    avg_tokens = (
        sample.select(F.avg(F.size(tokenize(F.col(text_col))))).collect()[0][0] or 0.0
    )
    return int(n_docs * avg_tokens)


def dedup_shuffle_partitions(
    docs: DataFrame,
    text_col: str = "content",
    rows_per_partition: int = 1_000_000,
    sample_docs: int = 2_000,
    max_partitions: int = 4_096,
    est_rows: int | None = None,
) -> int:
    """Shuffle-partition count that bounds the dedup sweep's per-
    partition shingle rows (the BASELINE round-3 sizing lesson made
    code: the 1.6M-doc MinHash leg OOMed at 16 partitions — ~30M
    aggregate rows per partition — and completed at 128; partitions
    must grow with n·shingles/doc, not stay at the session default).

    Never returns less than the cluster's default parallelism."""
    spark = docs.sparkSession
    if est_rows is None:
        est_rows = estimate_shingle_rows(docs, text_col, sample_docs)
    base = max(1, spark.sparkContext.defaultParallelism)
    return int(min(max_partitions, max(base, est_rows // rows_per_partition + 1)))


def _ensure_dedup_partitions(
    docs: DataFrame, text_col: str, est_rows: int | None = None
) -> None:
    """Raise (never lower) the session's shuffle partitions to the
    dedup sizing rule.  Session-level by necessity: the returned
    DataFrames are lazy, so the conf must still hold at action time.
    Raising is safe under AQE (coalescePartitions shrinks small
    shuffles back down); NOT raising is what OOMs — AQE never splits
    an oversized aggregate partition.  Note AQE coalesces by
    COMPRESSED shuffle size, so highly compressible shingle text still
    lands in few post-coalesce partitions — that is why the sweep's
    joins are pinned to sort-merge (spill-safe) rather than hash
    builds; aggregates spill natively."""
    spark = docs.sparkSession
    want = dedup_shuffle_partitions(docs, text_col, est_rows=est_rows)
    cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if want > cur:
        spark.conf.set("spark.sql.shuffle.partitions", str(want))
    # Pin the AQE coalesce floor to the sized count as well: AQE
    # coalesces by COMPRESSED shuffle size, and the embedding near-dup
    # sweep measured it re-coalescing a sized 303-way shuffle to 31
    # tasks at 1.6M rows (similarity._ensure_embedding_partitions),
    # recreating the OOM the sizing exists to prevent.  The text sweep
    # survived at 1.6M because shingle rows compress worse, but the
    # hazard is the same class — floor it.  Raise-only, so AQE still
    # coalesces small shuffles down TO the sized count.
    try:
        floor = int(spark.conf.get("spark.sql.adaptive.coalescePartitions.minPartitionNum"))
    except Exception:
        floor = 0
    if want > floor:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionNum", str(want))


def _shingles_sql(table: str, n: int, text_col: str) -> str:
    t = tokens_sql(text_col)
    parts = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    h = md5_hash60_sql("shingle")
    return f"""
SELECT DISTINCT doc_id, {h} AS shingle FROM (
  SELECT doc_id, unnest(CASE WHEN len(toks) < {n}
    THEN [array_to_string(toks, ' ')]
    ELSE list_transform(generate_series(1, len(toks) - {n} + 1), i -> {parts}) END) AS shingle
  FROM (SELECT doc_id, {t} AS toks FROM {table}))
"""


def dedup_ngram_jaccard(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.04,
    text_col: str = "content",
    pairs: DataFrame | None = None,
    _shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) shingle Jaccard ≥ threshold.

    With ``pairs=None`` this is the all-pairs exact kernel — the
    small-scale oracle.  With ``pairs`` (doc_a, doc_b), the whole plan
    is PAIR-FIRST: the candidate list drives the join (pairs → doc_a's
    shingles → equi-join on (doc_b, shingle)), so intermediate volume
    is candidates × shingles-per-doc — LINEAR in the candidate count.
    The earlier form (shingle self-join semi-joined to candidate docs,
    pair restriction after) was still quadratic on hot shingles: when
    most docs appear in some candidate pair the semi-join keeps the
    whole corpus and ``sh a JOIN sh b USING (shingle)`` emits Σ cnt²
    rows per shingle (measured 4.2× wall going 200k→400k docs — the
    quadratic verify, not the banded candidates, was the bottleneck).
    This is the 100 TB verify path used by dedup_minhash_lsh.

    ``_shingles`` lets a caller that already materialized the shingle
    relation (dedup_minhash_lsh caches ONE pass for signatures + both
    verify sides) avoid re-tokenizing the corpus — Catalyst does not
    share the subtree across the plan's five consumers."""
    sh = _shingles if _shingles is not None else doc_shingles(docs, n, text_col)
    sha, shb = sh, sh
    if pairs is not None:
        # semi-joins keep every shingle of a kept doc, so per-doc sizes
        # computed from sha/shb below are still the true full counts.
        # Every join side here scales with the corpus, so join strategy
        # is pinned to sort-merge: AQE sees small COMPRESSED shuffle
        # sizes at runtime and would otherwise (a) convert these joins
        # to driver-built broadcasts (measured fatal at 1.6M docs / 8g
        # heap) or (b) coalesce partitions so far that a shuffle-hash
        # build explodes decompressed (shingle text compresses ~10-20×;
        # also measured fatal).  Sort-merge spills gracefully at any
        # partition size — the only join strategy that is memory-safe
        # under compression-skewed AQE statistics.
        sha = sh.join(
            pairs.select(F.col("doc_a").alias("doc_id")).distinct().hint("merge"),
            "doc_id",
            "left_semi",
        )
        shb = sh.join(
            pairs.select(F.col("doc_b").alias("doc_id")).distinct().hint("merge"),
            "doc_id",
            "left_semi",
        )
    sizes_a = sha.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sizes_b = shb.groupBy("doc_id").agg(F.count("*").alias("sz")) if pairs is not None else sizes_a
    if pairs is not None:
        # pair-first: candidates × |sh(doc_a)| rows, then a unique-key
        # equi-join on (doc_id, shingle) — never a shingle-only join
        inter = (
            pairs.select("doc_a", "doc_b")
            .hint("merge")
            .join(sha.alias("a"), F.col("doc_a") == F.col("a.doc_id"))
            .select("doc_a", "doc_b", F.col("a.shingle").alias("sh_a"))
            .alias("l")
            .join(
                shb.alias("b").hint("merge"),
                (F.col("l.doc_b") == F.col("b.doc_id"))
                & (F.col("l.sh_a") == F.col("b.shingle")),
            )
            .select("doc_a", "doc_b")
        )
    else:
        inter = (
            sha.alias("a")
            .join(shb.alias("b"), "shingle")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        )
    inter = inter.groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter"))
    sz_hint = (lambda d: d.hint("merge")) if pairs is not None else (lambda d: d)
    return (
        inter.join(sz_hint(sizes_a.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza")), "doc_a")
        .join(sz_hint(sizes_b.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb")), "doc_b")
        .withColumn(
            "jaccard",
            F.expr(round_sql("CAST(inter AS DOUBLE) / (sza + szb - inter)", 9)),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def dedup_ngram_jaccard_sql(
    table: str, n: int = 3, threshold: float = 0.04, text_col: str = "text"
) -> str:
    return f"""
WITH sh AS ({_shingles_sql(table, n, text_col)}),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT doc_a, doc_b,
         {round_sql("CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter)", 9)} AS jaccard
  FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b)
WHERE jaccard >= {dlit(threshold)}
ORDER BY doc_a, doc_b
"""


def minhash_signatures(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "content",
    _shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, mh0..mh{15}) MinHash signature from shingle hashes."""
    base = _shingles if _shingles is not None else doc_shingles(docs, n, text_col)
    # doc_shingles already carries md5_hash60(shingle) — same base hash
    # MinHash always used, so signatures are bit-identical to the
    # string-shingle era
    sh = base.withColumn("h", F.col("shingle") % _P)
    aggs = [
        F.min(F.expr(f"({_A[i]} * h + {_B[i]}) % {_P}")).alias(f"mh{i}")
        for i in range(_NPERM)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _signatures_sql(table: str, n: int, text_col: str) -> str:
    # shingle is already the md5_hash60 value (see _shingles_sql)
    mins = ", ".join(
        f"min(({_A[i]} * (shingle % {_P}) + {_B[i]}) % {_P}) AS mh{i}" for i in range(_NPERM)
    )
    return f"SELECT doc_id, {mins} FROM ({_shingles_sql(table, n, text_col)}) GROUP BY doc_id"


# band buckets larger than this are skipped at the candidate stage:
# hot buckets are driven by globally common shingles dominating the
# minhash minima (boilerplate), and Σ bucket² over them makes candidate
# volume quadratic in n (measured: cand/n² constant at 8.5e-5 on the
# zipf corpus without the cap — scripts/dedup_ann_bench.py).  With the
# cap, candidates are ≤ n·bands·cap — LINEAR in n.  True near-dups
# collide in several bands (E[hits] = bands·j² ≈ 3.7 at j=0.68), so
# losing their hot-bucket collisions barely dents recall
# (re-measured ≥0.98 on planted pairs; BASELINE.md round-3).
_BUCKET_CAP = 64


def minhash_band_candidates(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "content",
    bucket_cap: int | None = _BUCKET_CAP,
    _shingles: DataFrame | None = None,
    _owned_caches: list | None = None,
) -> DataFrame:
    """(doc_a, doc_b) distinct banded-LSH candidate pairs (8 bands × 2
    signature rows per key), skipping band buckets with more than
    ``bucket_cap`` docs (the stop-bucket heuristic — see _BUCKET_CAP).
    Exposed so benchmarks can report candidate volume vs n²
    (scripts/dedup_ann_bench.py).  ``_owned_caches`` (internal) lets
    the caller collect the cached relations this builder pins, so the
    checkpoint barrier can unpersist exactly them — never the whole
    session cache (ADVICE r5)."""
    # the band relation is consumed up to 4× (bucket census, semi-join,
    # both sides of the pair join); cache the signature relation it
    # derives from — n rows × 16 ints (session-lifetime cache policy)
    sig = minhash_signatures(docs, n, text_col, _shingles).cache()
    if _owned_caches is not None:
        _owned_caches.append(sig)
    bands = None
    for b in range(_BANDS):
        part = sig.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.concat_ws("_", F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}")).alias("key"),
        )
        bands = part if bands is None else bands.unionByName(part)
    if bucket_cap is not None:
        # the bucket census scales with n (one row per distinct band
        # bucket) — pinned sort-merge keeps AQE from building it as a
        # driver-side broadcast/hash build at large n (see
        # dedup_ngram_jaccard pair-first note)
        small = (
            bands.groupBy("band", "key")
            .agg(F.count("*").alias("bsz"))
            .filter(F.col("bsz") <= bucket_cap)
            .select("band", "key")
            .hint("merge")
        )
        bands = bands.join(small, ["band", "key"], "left_semi")
    return (
        bands.alias("x")
        .join(bands.alias("y").hint("merge"), ["band", "key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def _request_shuffle_cleanup(spark) -> None:
    """Ask the driver JVM to GC so the ContextCleaner deletes shuffle
    files whose dependencies became unreachable (a checkpoint barrier
    just truncated the lineage).  Spark's own periodic GC runs every
    30 min by default — far longer than the window between a barrier
    and the next disk-heavy phase, and the 3.2M text sweep fills this
    box's free disk in 15 min without the nudge.  Asynchronous: the
    cleaner thread deletes in the background while the next phase
    spins up."""
    import gc

    gc.collect()  # drop Py4J refs to consumed DataFrames first
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


#: measured accumulated shuffle+spill bytes per shingle row for a
#: single-lineage sweep (BASELINE round 5: the 3.2M-doc run needed
#: >81 GB for ~256M estimated shingle rows ⇒ ~316 B/row under zstd;
#: rounded up for headroom).  Drives the auto disk-barrier decision.
_SWEEP_SHUFFLE_BYTES_PER_SHINGLE = 320


def _spark_local_dir(spark) -> str:
    """The first directory Spark actually spills shuffle/cache to.
    The runtime SQL conf alone is not enough (ADVICE r6):
    ``spark.local.dir`` is commonly set via the ``SPARK_LOCAL_DIRS``
    env var or spark-defaults and is then ABSENT from the SQL conf, so
    a temp-dir fallback would probe the wrong filesystem and silently
    skip the barrier — reproducing the ENOSPC the auto mode exists to
    prevent.  Resolution order mirrors Spark's own
    (Utils.getConfiguredLocalDirs): env var, SparkConf, SQL conf,
    then the JVM temp-dir default."""
    import os
    import tempfile

    for get in (
        lambda: os.environ.get("SPARK_LOCAL_DIRS"),
        lambda: spark.sparkContext.getConf().get("spark.local.dir", None),
        lambda: spark.conf.get("spark.local.dir", None),
    ):
        try:
            d = get()
        except Exception:
            d = None
        if d:
            return d.split(",")[0]
    return tempfile.gettempdir()


#: barrier roots already registered for removal at interpreter exit —
#: auto-mode barrier/verify parquet lives under the Spark local dir
#: for the SESSION (the returned sliced-verify DataFrame lazily reads
#: it, so it cannot be removed any earlier); without this a long
#: process running many sweeps leaks the dirs (ADVICE r6).
_BARRIER_ROOTS: set = set()


def _register_barrier_root(root) -> None:
    import atexit
    import shutil as _sh

    if str(root) not in _BARRIER_ROOTS:
        _BARRIER_ROOTS.add(str(root))
        atexit.register(_sh.rmtree, str(root), True)  # ignore_errors


def _auto_checkpoint_dir(spark, est_rows: int) -> str | None:
    """Decide the disk barrier from the projected single-lineage
    shuffle footprint vs the Spark local dir's free space (with a 2×
    safety margin — the barrier is bit-identical and its cost is one
    parquet round-trip of the small candidate relation, so false
    positives are cheap; a false negative is the measured ENOSPC death
    at 3.2M docs, BASELINE round 5).  Returns a session-scoped temp
    dir under the local dir (lives until session exit, like the
    operator caches — session-lifetime cache policy, CLAUDE.md) or
    None when the sweep fits."""
    import shutil
    import uuid

    projected = est_rows * _SWEEP_SHUFFLE_BYTES_PER_SHINGLE
    local_dir = _spark_local_dir(spark)
    try:
        free = shutil.disk_usage(local_dir).free
    except OSError:
        return None
    if projected * 2 <= free:
        return None
    if projected // 2 > free:
        # the barrier splits the lineage, but the candidate phase ALONE
        # carries roughly half the projected bytes — past this point no
        # barrier placement fits this disk (measured: 6.4M docs under
        # lz4 filled a 72 GB-free disk inside phase 1, BASELINE round
        # 6).  The operator cannot change the shuffle codec itself
        # (spark.io.compression.codec is fixed at context start), so
        # say what will: zstd's ~2x text ratio, or aggregate shuffle
        # disk (executors), or a smaller slice.
        import warnings

        warnings.warn(
            f"dedup_minhash_lsh: projected sweep shuffle ≈"
            f"{projected / (1 << 30):.0f} GiB vs {free / (1 << 30):.0f} GiB "
            "free in the Spark local dir — even one barriered phase may "
            "not fit. Start the session with "
            "spark.io.compression.codec=zstd (~2x text ratio), add "
            "shuffle disk (more executors on a cluster), or sweep a "
            "partition of the corpus at a time.",
            stacklevel=3,
        )
    root = Path(local_dir) / f"lts_dedup_barrier_{spark.sparkContext.applicationId}"
    _register_barrier_root(root)
    d = root / uuid.uuid4().hex
    d.mkdir(parents=True, exist_ok=True)
    return str(d)


#: effective on-disk shuffle bytes per (candidate-pair × shingle) of
#: one verify slice's exchanges (semi sides + pair-first intersection,
#: zstd).  Measured round 6 at 6.4M docs: ~40M candidates × ~78
#: shingles/doc accumulated >70 GB across the verify lineage.
_VERIFY_BYTES_PER_CAND_SHINGLE = 30


def _auto_verify_slices(spark, n_cand: int, avg_shingles: float) -> int:
    """How many slices the verify phase needs so ONE slice's exchanges
    fit half the local dir's free disk.  1 = unsliced (small sweeps)."""
    import shutil as _sh

    local_dir = _spark_local_dir(spark)
    try:
        free = _sh.disk_usage(local_dir).free
    except OSError:
        return 1
    projected = int(n_cand * avg_shingles * _VERIFY_BYTES_PER_CAND_SHINGLE)
    if projected <= free // 2:
        return 1
    slices = -(-projected // max(1, free // 2))
    if slices > 16:
        # past the 16-slice cap even one slice's verify exchanges may
        # not fit half the free disk — same situation (and remedies) as
        # the no-barrier-placement-fits warning above (ADVICE r6: warn
        # instead of exhausting the disk silently)
        import warnings

        warnings.warn(
            f"dedup_minhash_lsh: verify phase projects ≈"
            f"{projected / (1 << 30):.0f} GiB of exchange disk vs "
            f"{free / (1 << 30):.0f} GiB free — even {16} slices may not "
            "fit. Start the session with spark.io.compression.codec=zstd "
            "(~2x text ratio), add shuffle disk (more executors on a "
            "cluster), or sweep a partition of the corpus at a time.",
            stacklevel=3,
        )
    return min(16, slices)


def dedup_minhash_lsh(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.04,
    text_col: str = "content",
    bucket_cap: int | None = _BUCKET_CAP,
    auto_partitions: bool = True,
    checkpoint_dir: str | None = "auto",
    verify_slices: int | str = "auto",
) -> DataFrame:
    """(doc_a, doc_b, jaccard): banded-LSH candidates (8 bands × 2 rows,
    stop-buckets above ``bucket_cap`` skipped) verified with exact
    shingle Jaccard ≥ threshold.

    The band join shuffles only (band, key, doc_id) rows, and the
    verify step is CANDIDATE-BOUNDED in the Spark plan itself: the
    candidate pair list drives the intersection join
    (dedup_ngram_jaccard(pairs=cand), pair-first) — no shingle-only
    join ever executes, so verify cost is candidates × shingles-per-doc
    regardless of shingle hotness, mirroring the DuckDB twin exactly.

    The shingle relation is tokenized ONCE and cached (session-lifetime
    cache policy, CLAUDE.md): signatures, both verify sides and both
    size relations reuse it — without this the corpus is re-tokenized
    five times per run (measured 5× wall-time at 200k docs).

    ``auto_partitions`` applies the shingle-volume partition sizing
    rule (dedup_shuffle_partitions) before building the plan — raises
    the session's shuffle partitions so per-partition aggregate state
    stays bounded as n grows (the 1.6M single-box OOM fix, made
    automatic).

    ``checkpoint_dir`` inserts a disk barrier between the candidate
    and verify phases: the (small — ≤ n·bands·cap rows) candidate pair
    relation is written to parquet, the sweep's OWN cached relations
    are dropped (never the caller's — ADVICE r5), and the candidate
    job's shuffle files are released for deletion before the verify
    phase starts writing its own.  Without the barrier the two phases'
    shuffle+spill footprints ACCUMULATE (one lineage → nothing is
    cleanable until the final collect), which is what turns a 3.2M-doc
    sweep disk-bound on a single box (measured: >81 GB under zstd,
    >78 GB under lz4 — BASELINE.md round 5).  On a cluster the same
    barrier is what makes the sweep restartable after candidate
    generation.  Output is bit-identical either way
    (tests/test_dedup_similarity.py::test_minhash_lsh_checkpoint_parity);
    cost is one parquet round-trip of the candidates plus re-tokenizing
    the corpus in each verify consumer (4 streamed passes) — in barrier
    mode NOTHING corpus-volume is cached, because the cache spill (not
    the map-side-combined shuffles) is what made the sweep disk- and
    heap-bound at 6.4M docs (BASELINE round 6).

    The default ``checkpoint_dir="auto"`` selects the barrier from the
    same volume estimate the partition-sizing rule uses: when the
    projected single-lineage footprint (est shingle rows ×
    ~320 B/row, the measured round-5 constant) cannot fit the Spark
    local dir's free space with 2× headroom, the barrier is enabled to
    a session-scoped temp dir — so a caller running 3.2M docs with
    defaults no longer reproduces the measured ENOSPC death (VERDICT
    r5 wrong #1).  Pass None to force single-lineage, or a path to
    place the barrier explicitly (restartable-pipeline use).

    ``verify_slices`` (barrier mode only — slices write under
    ``checkpoint_dir``) additionally partitions the candidate pairs
    into deterministic hash slices verified one job at a time, so the
    verify phase's live shuffle is bounded by ONE slice's exchanges —
    the lever for corpora whose verify lineage alone outgrows local
    disk (measured at 6.4M docs, BASELINE round 6).  "auto" sizes the
    slice count from the candidate count × shingles/doc estimate vs
    free disk (1 = unsliced below the threshold); the union is
    bit-identical (test_minhash_lsh_verify_slices_parity)."""
    est_rows = None
    if auto_partitions or checkpoint_dir == "auto":
        est_rows = estimate_shingle_rows(docs, text_col)
    if auto_partitions:
        _ensure_dedup_partitions(docs, text_col, est_rows=est_rows)
    if checkpoint_dir == "auto":
        checkpoint_dir = _auto_checkpoint_dir(docs.sparkSession, est_rows)
    if checkpoint_dir is not None:
        # barrier mode: do NOT cache the shingle relation for the
        # candidate phase.  Signatures consume it exactly once there,
        # and the verify phase re-pins its own copy after the barrier —
        # so the cache would only spill the full exploded relation
        # (est_rows × ~30 B of shingle text) to disk inside the
        # heaviest phase for zero reuse.  Measured at 6.4M docs: the
        # candidate phase alone filled a 72 GB-free disk WITH the
        # phase-1 cache (both codecs); dropping it is what brings
        # phase 1 back under the signature-aggregation shuffle's own
        # footprint (BASELINE round 6).
        sh = None
        owned: list[DataFrame] | None = []
    else:
        sh = doc_shingles(docs, n, text_col).cache()
        owned = [sh]
    cand = minhash_band_candidates(
        docs, n, text_col, bucket_cap, _shingles=sh, _owned_caches=owned
    )
    if checkpoint_dir is not None:
        spark = docs.sparkSession
        cand_path = checkpoint_dir.rstrip("/") + "/candidates"
        cand.write.mode("overwrite").parquet(cand_path)
        # release ONLY the sweep's own caches (shingles + minhash
        # signatures), then drop every local ref to the candidate
        # lineage BEFORE the GC nudge: with `cand`/`sh` still bound,
        # Py4J refs keep the candidate job's shuffle dependencies
        # reachable and the ContextCleaner cannot delete its files
        # (ADVICE r5 ×2)
        for c in owned:
            c.unpersist()
        cand = sh = owned = None
        _request_shuffle_cleanup(spark)
        # verify runs UNCACHED in barrier mode: its four shingle
        # consumers (two sides × sizes + intersection) re-tokenize as
        # streamed map work instead of pinning a corpus-volume cache.
        # Tokenize is minutes of map CPU at 6.4M; the cache spill is
        # what actually broke at that scale — it was ~ALL of the
        # measured 50-80 GB phase footprint (the signature shuffle is
        # map-side-combined to n_docs×16 mins, near-zero bytes) and,
        # re-pinned for verify, the storage blocks squeezed execution
        # memory into a ShuffleExternalSorter heap OOM at default 8g
        # (BASELINE round 6).  Map CPU scales with executors; a
        # corpus-volume cache on one node does not.
        cand = spark.read.parquet(cand_path)
        # ---- sliced verify: bound the verify phase's own disk ----
        # The verify lineage carries several corpus- and candidate-
        # volume exchanges that all coexist until the final action
        # (measured round 6: >70 GB at 6.4M docs even with hashed
        # shingles — the phase itself outgrew the disk the barrier had
        # freed).  Partitioning the CANDIDATE PAIRS into deterministic
        # hash slices and verifying each slice as its own job bounds
        # live shuffle at one slice's worth: each slice writes its
        # (tiny) verified pairs to parquet and releases its shuffles
        # before the next starts.  Verification is per-pair and every
        # pair lands in exactly one slice, so the union is bit-identical
        # to the unsliced verify (test_minhash_lsh_verify_slices_parity);
        # parquet round-trips preserve doubles exactly.  Cost: the
        # corpus-volume semi-join sides are re-shuffled per slice —
        # streamed map+exchange work that scales with executors, traded
        # for a per-slice disk bound no single exchange can break.
        n_slices = verify_slices
        if n_slices == "auto":
            n_cand = cand.count()
            avg_sh = (est_rows / max(1, docs.count())) if est_rows else 80.0
            n_slices = _auto_verify_slices(spark, n_cand, avg_sh)
        if n_slices > 1:
            out_paths = []
            for k in range(n_slices):
                sl = cand.filter(
                    F.pmod(F.xxhash64(F.col("doc_a"), F.col("doc_b")), F.lit(n_slices))
                    == k
                )
                out_path = f"{checkpoint_dir.rstrip('/')}/verify_{k:03d}"
                dedup_ngram_jaccard(docs, n, threshold, text_col, pairs=sl).select(
                    "doc_a", "doc_b", "jaccard"
                ).write.mode("overwrite").parquet(out_path)
                _request_shuffle_cleanup(spark)
                out_paths.append(out_path)
            return spark.read.parquet(*out_paths)
    return dedup_ngram_jaccard(
        docs, n, threshold, text_col, pairs=cand, _shingles=sh
    ).select("doc_a", "doc_b", "jaccard")


def dedup_minhash_lsh_sql(
    table: str,
    n: int = 3,
    threshold: float = 0.04,
    text_col: str = "text",
    bucket_cap: int | None = _BUCKET_CAP,
) -> str:
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, mh{2 * b}::VARCHAR || '_' || mh{2 * b + 1}::VARCHAR AS key FROM sig"
        for b in range(_BANDS)
    )
    cap_ctes = (
        f"""
small AS (SELECT band, key FROM bands0 GROUP BY band, key HAVING count(*) <= {bucket_cap}),
bands AS (SELECT bands0.* FROM bands0 JOIN small USING (band, key)),"""
        if bucket_cap is not None
        else "\nbands AS (SELECT * FROM bands0),"
    )
    return f"""
WITH sh AS ({_shingles_sql(table, n, text_col)}),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
sig AS ({_signatures_sql(table, n, text_col)}),
bands0 AS ({band_selects}),{cap_ctes}
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y USING (band, key) WHERE x.doc_id < y.doc_id),
inter AS (
  SELECT cand.doc_a, cand.doc_b, count(*) AS inter
  FROM cand
  JOIN sh a ON a.doc_id = cand.doc_a
  JOIN sh b ON b.doc_id = cand.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT doc_a, doc_b,
         {round_sql("CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter)", 9)} AS jaccard
  FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b)
WHERE jaccard >= {dlit(threshold)}
ORDER BY doc_a, doc_b
"""


def dedup_keep(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "content",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """(doc_id) — corpus after near-dup removal: greedy keep-lowest
    policy (drop any doc that has a near-duplicate with a smaller
    doc_id).  Deterministic, clustering-free, the standard policy for
    training-data dedup sweeps; pairs come from the LSH+verify path,
    or pass a precomputed ``pairs(doc_a, doc_b, …)`` relation to avoid
    re-running the sweep when both outputs are needed."""
    if pairs is None:
        pairs = dedup_minhash_lsh(docs, n, threshold, text_col)
    drop = pairs.select("doc_b").distinct()
    return docs.join(
        drop.withColumnRenamed("doc_b", "doc_id"), "doc_id", "left_anti"
    ).select("doc_id")


def dedup_keep_sql(
    table: str, n: int = 3, threshold: float = 0.5, text_col: str = "text"
) -> str:
    pairs = dedup_minhash_lsh_sql(table, n, threshold, text_col)
    return f"""
SELECT doc_id FROM {table}
WHERE doc_id NOT IN (SELECT doc_b FROM ({pairs}))
ORDER BY doc_id
"""


def simhash(docs: DataFrame, bits: int = 32, text_col: str = "content") -> DataFrame:
    """(doc_id, simhash) — tf-weighted hyperbit fingerprint.  All
    integer arithmetic; strict s_b > 0 sets the bit.

    One groupBy with ``bits`` conditional-sum aggregates over the
    (doc, term, tf) relation — no per-bit row explosion (the naive
    explode multiplies the termfreq shuffle 32×; integer sums are
    order-free, so the fold needs no ordering).

    ``bits`` is capped at 62: the fingerprint is a signed BIGINT, so
    bit 63 (sign) cannot be set (CAST(2^63 AS BIGINT) overflows) and a
    negative fingerprint corrupts shiftright-based band extraction in
    ``simhash_near_dup``.  60 is the recommended web-scale width (t ≤ 3
    → 15-bit bands)."""
    if bits > 62:
        raise ValueError(
            f"simhash bits={bits} > 62: the fingerprint is a signed BIGINT; "
            "bit 63 overflows and negative values corrupt shiftright band "
            "extraction — use ≤ 62 (60 recommended)"
        )
    tf = (
        docs.select("doc_id", F.explode(tokenize(F.col(text_col))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", md5_hash60(F.col("term")))
    )
    bit_aggs = [
        F.sum(F.expr(f"tf * (2 * (shiftright(h, {b}) % 2) - 1)")).alias(f"sb{b}")
        for b in range(bits)
    ]
    sums = tf.groupBy("doc_id").agg(*bit_aggs)
    sim = " + ".join(
        f"(CASE WHEN sb{b} > 0 THEN CAST({2 ** b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(bits)
    )
    return sums.select("doc_id", F.expr(sim).alias("simhash"))


def simhash_sql(table: str, bits: int = 32, text_col: str = "text") -> str:
    h = md5_hash60_sql("term")
    bit_aggs = ", ".join(
        f"sum(tf * (2 * ((h >> {b}) % 2) - 1)) AS sb{b}" for b in range(bits)
    )
    sim = " + ".join(
        f"(CASE WHEN sb{b} > 0 THEN CAST({2 ** b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(bits)
    )
    return f"""
WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf, {h} AS h
  FROM (SELECT doc_id, unnest({tokens_sql(text_col)}) AS term FROM {table})
  GROUP BY doc_id, term),
sums AS (SELECT doc_id, {bit_aggs} FROM tf GROUP BY doc_id)
SELECT doc_id, ({sim})::BIGINT AS simhash
FROM sums ORDER BY doc_id
"""


def simhash_near_dup(
    docs: DataFrame,
    t: int = 3,
    bits: int = 32,
    text_col: str = "content",
    bucket_cap: int | None = _BUCKET_CAP,
    sims: DataFrame | None = None,
    auto_partitions: bool = True,
) -> DataFrame:
    """(doc_a, doc_b, hamming) — SimHash near-duplicate pairs with
    Hamming distance ≤ ``t``, the C4/RefinedWeb-style fingerprint dedup
    (Manku et al., WWW'07 banding): split the ``bits``-bit fingerprint
    into t+1 bands; by pigeonhole any pair within distance t agrees
    EXACTLY on ≥ 1 band, so the banded equi-join has recall 1.0 (not
    probabilistic like MinHash), and ``bit_count(xor)`` verifies each
    candidate.

    Scale design: candidates shuffle as (band, band_value, doc_id) —
    per-bucket cost is bucket², so band width w = bits/(t+1) must keep
    2^w ≥ n/target_bucket.  At web scale run 60-bit fingerprints with
    t ≤ 3 (w = 15 → 32k buckets/band); the 32-bit default matches the
    ``simhash`` gate entry at test scale.  Hot buckets (boilerplate
    fingerprints) are capped like the MinHash path (stop-bucket
    heuristic, ``bucket_cap`` docs) — a true near-dup pair within
    distance t in a capped bucket still collides in any OTHER agreeing
    band, so only pairs whose every agreeing band is hot are lost.
    Verify is pair-first: the xor runs on the candidate pair rows,
    never on a bucket-keyed join output."""
    if bits > 62:
        raise ValueError(
            f"simhash bits={bits} > 62: signed-BIGINT fingerprints corrupt "
            "shiftright band extraction above bit 62 — use ≤ 62 (60 recommended)"
        )
    if sims is None:
        if auto_partitions:
            # the (doc, term, tf) relation is token-volume-sized — same
            # partition sizing rule as the MinHash sweep
            _ensure_dedup_partitions(docs, text_col)
        sims = simhash(docs, bits, text_col)
    nb = t + 1
    w = bits // nb
    widths = [w + 1 if b < bits % nb else w for b in range(nb)]
    offs = [sum(widths[:b]) for b in range(nb)]
    structs = [
        f"named_struct('band', {b}, 'bv', shiftright(simhash, {offs[b]}) % {2 ** widths[b]})"
        for b in range(nb)
    ]
    bands = sims.select(
        "doc_id",
        "simhash",
        F.explode(F.expr("array(" + ",".join(structs) + ")")).alias("x"),
    ).select("doc_id", "simhash", F.col("x.band").alias("band"), F.col("x.bv").alias("bv"))
    if bucket_cap is not None:
        # census + self-join sides scale with the corpus — pin
        # sort-merge (see dedup_ngram_jaccard's AQE note)
        small = (
            bands.groupBy("band", "bv")
            .agg(F.count("*").alias("bsz"))
            .filter(F.col("bsz") <= bucket_cap)
            .select("band", "bv")
            .hint("merge")
        )
        bands = bands.join(small, ["band", "bv"], "left_semi")
    return (
        bands.alias("x")
        .join(bands.alias("y").hint("merge"), ["band", "bv"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.expr("CAST(bit_count(x.simhash ^ y.simhash) AS BIGINT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= t)
        .distinct()
    )


def simhash_near_dup_sql(
    table: str,
    t: int = 3,
    bits: int = 32,
    text_col: str = "text",
    bucket_cap: int | None = _BUCKET_CAP,
) -> str:
    nb = t + 1
    w = bits // nb
    widths = [w + 1 if b < bits % nb else w for b in range(nb)]
    offs = [sum(widths[:b]) for b in range(nb)]
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band, (simhash >> {offs[b]}) % {2 ** widths[b]} AS bv FROM sims"
        for b in range(nb)
    )
    cap_ctes = (
        f"""
small AS (SELECT band, bv FROM bands0 GROUP BY band, bv HAVING count(*) <= {bucket_cap}),
bands AS (SELECT bands0.* FROM bands0 JOIN small USING (band, bv)),"""
        if bucket_cap is not None
        else "\nbands AS (SELECT * FROM bands0),"
    )
    # simhash_sql ends with ORDER BY — strip for CTE use
    inner = simhash_sql(table, bits, text_col).rstrip().rsplit("ORDER BY", 1)[0]
    return f"""
WITH sims AS ({inner}),
bands0 AS ({band_selects}),{cap_ctes}
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         bit_count(CAST(xor(x.simhash, y.simhash) AS BIGINT))::BIGINT AS hamming
  FROM bands x JOIN bands y USING (band, bv) WHERE x.doc_id < y.doc_id)
SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= {t}
ORDER BY doc_a, doc_b
"""
