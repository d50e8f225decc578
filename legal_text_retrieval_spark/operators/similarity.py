"""Embedding similarity search over an ``array<float>`` column:
brute-force cosine top-k (exact baseline) and a hyperplane-LSH
bucketed variant (the 100 TB scale path), plus cosine near-dup pairs.

Determinism: every dot product is a strictly sequential left-to-right
fold over vector positions (``aggregate(zip_with(...))`` in Spark,
``list_reduce`` over an indexed ``list_transform`` in DuckDB), float32
elements cast exactly to float64 — so both engines produce identical
bits before the shared rounding.

Scale notes:
- brute force is O(Q·N·d) — exact, fine for a broadcast query batch;
  at 10^12 rows use the LSH variant: deterministic ±1 hyperplanes from
  md5(plane, dim), 16-bit signatures, search only within the query's
  bucket (tunable recall via band count).
- near-dup pairs use the same bucket join to avoid the n² pair blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import dlit, round_sql

QUERY_STRIDE = 50  # vec_id % 50 == 0 → query vectors (self-derived)

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_NORM = (
    "sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
)


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, len({a})), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), "
        f"(x, y) -> x + y)"
    )


def _norm_sql(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({a}, x -> x::DOUBLE * x::DOUBLE)), (x, y) -> x + y))"
    )


def cosine_topk(embeddings: DataFrame, k: int = 5) -> DataFrame:
    """(query_vec_id, vec_id, rank, cos) — exact brute-force cosine
    top-k of every stride-th vector against the full table (self
    excluded); tie-break vec_id DESC."""
    q = embeddings.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_vec_id"), F.col("embedding").alias("qe")
    )
    pairs = (
        embeddings.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_vec_id"))
        .withColumn(
            "cos",
            F.expr(
                round_sql(
                    _DOT.format(a="qe", b="embedding")
                    + " / (" + _NORM.format(a="qe") + " * " + _NORM.format(a="embedding") + ")",
                    6,
                )
            ),
        )
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("cos"), F.desc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_vec_id", "vec_id", "rank", "cos")
    )


def cosine_topk_sql(table: str, k: int = 5) -> str:
    cos = round_sql(
        _dot_sql("q.qe", "e.embedding") + f" / ({_norm_sql('q.qe')} * {_norm_sql('e.embedding')})",
        6,
    )
    return f"""
WITH q AS (SELECT vec_id AS query_vec_id, embedding AS qe FROM {table}
           WHERE vec_id % {QUERY_STRIDE} = 0),
scored AS (
  SELECT q.query_vec_id, e.vec_id, {cos} AS cos
  FROM {table} e CROSS JOIN q WHERE e.vec_id <> q.query_vec_id)
SELECT query_vec_id, vec_id, rank, cos FROM (
  SELECT query_vec_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_vec_id ORDER BY cos DESC, vec_id DESC) AS rank
  FROM scored)
WHERE rank <= {k}
ORDER BY query_vec_id, rank
"""


# ------------------------------------------------------- LSH scale path

# 2^6 = 64 buckets: at the 500-row test scale this keeps buckets around
# ~8 vectors (real recall/latency trade-off); at cluster scale raise it
# so bucket size ≈ a few thousand.
_NPLANES = 6


def _plane_sign_expr(plane: int, dim_col: str) -> str:
    """Deterministic ±1 from md5('p{plane}_d{dim}') — identical string
    recipe in both engines."""
    return (
        f"(2 * (CAST(conv(substring(md5(concat('p{plane}_d', CAST({dim_col} AS STRING))), 1, 15), 16, 10) AS BIGINT) % 2) - 1)"
    )


def lsh_signatures(embeddings: DataFrame, nplanes: int = _NPLANES) -> DataFrame:
    """(vec_id, sig) — hyperplane-LSH bucket id: bit p = sign of the
    dot product with a deterministic ±1 plane.  Sequential indexed
    fold per plane: one expression, no shuffle at all."""
    bits = []
    for p in range(nplanes):
        dp = (
            f"aggregate(transform(embedding, (x, i) -> CAST(x AS DOUBLE) * {_plane_sign_expr(p, 'i')}), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        bits.append(f"(CASE WHEN {dp} > 0 THEN CAST({2 ** p} AS BIGINT) ELSE 0 END)")
    return embeddings.select("vec_id", F.expr(" + ".join(bits)).alias("sig"))


def lsh_signatures_sql(table: str, nplanes: int = _NPLANES) -> str:
    bits = []
    for p in range(nplanes):
        sign = (
            f"(2 * ((('0x' || substr(md5('p{p}_d' || (i - 1)::VARCHAR), 1, 15))::BIGINT) % 2) - 1)"
        )
        dp = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(generate_series(1, len(embedding)), i -> embedding[i]::DOUBLE * {sign})), "
            f"(x, y) -> x + y)"
        )
        bits.append(f"(CASE WHEN {dp} > 0 THEN CAST({2 ** p} AS BIGINT) ELSE 0 END)")
    return f"SELECT vec_id, {' + '.join(bits)} AS sig FROM {table} ORDER BY vec_id"


def ann_lsh_topk(embeddings: DataFrame, k: int = 5, nplanes: int = _NPLANES) -> DataFrame:
    """Approximate cosine top-k: candidates share the query's LSH
    bucket; exact cosine + window inside buckets.  Recall < 1 by
    design — the exact baseline (cosine_topk) is the oracle for
    quality measurement, not for equality."""
    sig = lsh_signatures(embeddings, nplanes)
    e = embeddings.join(sig, "vec_id")
    q = e.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_vec_id"), F.col("embedding").alias("qe"), "sig"
    )
    pairs = (
        e.join(F.broadcast(q), "sig")
        .filter(F.col("vec_id") != F.col("query_vec_id"))
        .withColumn(
            "cos",
            F.expr(
                round_sql(
                    _DOT.format(a="qe", b="embedding")
                    + " / (" + _NORM.format(a="qe") + " * " + _NORM.format(a="embedding") + ")",
                    6,
                )
            ),
        )
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("cos"), F.desc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_vec_id", "vec_id", "rank", "cos")
    )


def ann_lsh_topk_sql(table: str, k: int = 5, nplanes: int = _NPLANES) -> str:
    cos = round_sql(
        _dot_sql("q.qe", "e.embedding") + f" / ({_norm_sql('q.qe')} * {_norm_sql('e.embedding')})",
        6,
    )
    return f"""
WITH sig AS ({lsh_signatures_sql(table, nplanes)}),
e AS (SELECT t.vec_id, t.embedding, s.sig FROM {table} t JOIN sig s USING (vec_id)),
q AS (SELECT vec_id AS query_vec_id, embedding AS qe, sig FROM e
      WHERE vec_id % {QUERY_STRIDE} = 0),
scored AS (
  SELECT q.query_vec_id, e.vec_id, {cos} AS cos
  FROM e JOIN q USING (sig) WHERE e.vec_id <> q.query_vec_id)
SELECT query_vec_id, vec_id, rank, cos FROM (
  SELECT query_vec_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_vec_id ORDER BY cos DESC, vec_id DESC) AS rank
  FROM scored)
WHERE rank <= {k}
ORDER BY query_vec_id, rank
"""


def ann_recall(embeddings: DataFrame, k: int = 5, nplanes: int = _NPLANES) -> DataFrame:
    """(query_vec_id, n_exact, n_hit, recall) — per-query recall@k of
    the LSH-bucketed ANN against the exact brute-force top-k: the
    quality gauge for tuning nplanes at scale."""
    from ..functions.numeric import round_sql

    exact = cosine_topk(embeddings, k).select("query_vec_id", "vec_id")
    approx = ann_lsh_topk(embeddings, k, nplanes).select("query_vec_id", "vec_id")
    ne = exact.groupBy("query_vec_id").agg(F.count("*").alias("n_exact"))
    nh = (
        exact.join(approx, ["query_vec_id", "vec_id"])
        .groupBy("query_vec_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        ne.join(nh, "query_vec_id", "left")
        .fillna({"n_hit": 0})
        .select(
            "query_vec_id",
            F.col("n_exact").cast("long"),
            F.col("n_hit").cast("long"),
            F.expr(round_sql("CAST(n_hit AS DOUBLE) / n_exact", 9)).alias("recall"),
        )
    )


def ann_recall_sql(table: str, k: int = 5, nplanes: int = _NPLANES) -> str:
    from ..functions.numeric import round_sql

    return f"""
WITH exact AS (SELECT query_vec_id, vec_id FROM ({cosine_topk_sql(table, k)})),
approx AS (SELECT query_vec_id, vec_id FROM ({ann_lsh_topk_sql(table, k, nplanes)})),
ne AS (SELECT query_vec_id, count(*) AS n_exact FROM exact GROUP BY query_vec_id),
nh AS (SELECT query_vec_id, count(*) AS n_hit
       FROM exact JOIN approx USING (query_vec_id, vec_id) GROUP BY query_vec_id)
SELECT query_vec_id, n_exact::BIGINT AS n_exact,
       COALESCE(n_hit, 0)::BIGINT AS n_hit,
       {round_sql("CAST(COALESCE(n_hit, 0) AS DOUBLE) / n_exact", 9)} AS recall
FROM ne LEFT JOIN nh USING (query_vec_id)
ORDER BY query_vec_id
"""


# ------------------------------------------------------- IVF scale path

# every CENTROID_STRIDE-th vector (offset 1, disjoint from the
# QUERY_STRIDE=50 query set) is a coarse centroid — a deterministic,
# training-free quantizer so both engines derive identical lists.  At
# cluster scale you would k-means these; the PLAN (assign → invert →
# probe) is identical.  nprobe=4 of ~14 lists ≈ 3.5× search reduction
# at recall@5 ≈ 0.5 on the (clusterless) random test vectors — the
# ivf_recall gauge exists precisely to tune this on real embeddings.
CENTROID_STRIDE = 37
_NPROBE = 4


def ivf_centroids(embeddings: DataFrame) -> DataFrame:
    return embeddings.filter(
        (F.col("vec_id") % CENTROID_STRIDE == 1)
    ).select(F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce"))


def _best_centroids(
    vectors: DataFrame, centroid_src: DataFrame, nprobe: int, id_col: str, emb_col: str
) -> DataFrame:
    """(id, centroid_id, probe_rank ≤ nprobe) — cosine-nearest coarse
    centroids; ties break centroid_id ASC.  C is a small constant, so
    the broadcast cross join is O(N·C) — linear in N."""
    cents = ivf_centroids(centroid_src)
    cos = round_sql(
        _DOT.format(a=emb_col, b="ce")
        + " / (" + _NORM.format(a=emb_col) + " * " + _NORM.format(a="ce") + ")",
        9,
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("ccos"), F.asc("centroid_id"))
    return (
        vectors.select(F.col(id_col), F.col(emb_col))
        .crossJoin(F.broadcast(cents))
        .withColumn("ccos", F.expr(cos))
        .withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= nprobe)
        .select(id_col, "centroid_id", "probe_rank")
    )


def _best_centroids_sql(
    table: str, nprobe: int, id_col: str, emb_col: str, vec_filter: str = ""
) -> str:
    cos = round_sql(
        _dot_sql(f"v.{emb_col}", "c.ce")
        + f" / ({_norm_sql(f'v.{emb_col}')} * {_norm_sql('c.ce')})",
        9,
    )
    return f"""
SELECT {id_col}, centroid_id, probe_rank FROM (
  SELECT v.{id_col}, c.centroid_id, {cos} AS ccos,
         row_number() OVER (PARTITION BY v.{id_col} ORDER BY {cos} DESC, c.centroid_id ASC) AS probe_rank
  FROM (SELECT vec_id AS {id_col}, embedding AS {emb_col} FROM {table} {vec_filter}) v
  CROSS JOIN (SELECT vec_id AS centroid_id, embedding AS ce FROM {table}
              WHERE vec_id % {CENTROID_STRIDE} = 1) c)
WHERE probe_rank <= {nprobe}
"""


def ivf_assignments(embeddings: DataFrame) -> DataFrame:
    """(vec_id, centroid_id) — each vector's inverted-list bucket
    (nearest centroid): the IVF index relation."""
    return _best_centroids(embeddings, embeddings, 1, "vec_id", "embedding").select(
        "vec_id", "centroid_id"
    )


def ivf_assignments_sql(table: str) -> str:
    return (
        f"SELECT vec_id, centroid_id FROM ({_best_centroids_sql(table, 1, 'vec_id', 'embedding')}) "
        f"ORDER BY vec_id"
    )


def ivf_topk(embeddings: DataFrame, k: int = 5, nprobe: int = _NPROBE) -> DataFrame:
    """Approximate cosine top-k, IVF-style: queries probe their nprobe
    nearest centroids; candidates are the vectors ASSIGNED to those
    lists; exact cosine + window inside the probed lists.  Search cost
    ≈ N·nprobe/C instead of N; recall tunable via nprobe
    (ivf_recall)."""
    assign = ivf_assignments(embeddings)
    q = embeddings.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_vec_id"), F.col("embedding").alias("qe")
    )
    qv = embeddings.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    probes = (
        _best_centroids(qv, embeddings, nprobe, "vec_id", "embedding")
        .withColumnRenamed("vec_id", "query_vec_id")
        .select("query_vec_id", "centroid_id")
    )
    cand = probes.join(assign, "centroid_id").select("query_vec_id", "vec_id").distinct()
    pairs = (
        cand.join(embeddings, "vec_id")
        .join(F.broadcast(q), "query_vec_id")
        .filter(F.col("vec_id") != F.col("query_vec_id"))
        .withColumn(
            "cos",
            F.expr(
                round_sql(
                    _DOT.format(a="qe", b="embedding")
                    + " / (" + _NORM.format(a="qe") + " * " + _NORM.format(a="embedding") + ")",
                    6,
                )
            ),
        )
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("cos"), F.desc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_vec_id", "vec_id", "rank", "cos")
    )


def ivf_topk_sql(table: str, k: int = 5, nprobe: int = _NPROBE) -> str:
    cos = round_sql(
        _dot_sql("q.qe", "e.embedding") + f" / ({_norm_sql('q.qe')} * {_norm_sql('e.embedding')})",
        6,
    )
    return f"""
WITH assign AS (SELECT vec_id, centroid_id FROM ({_best_centroids_sql(table, 1, "vec_id", "embedding")})),
q AS (SELECT vec_id AS query_vec_id, embedding AS qe FROM {table}
      WHERE vec_id % {QUERY_STRIDE} = 0),
probes AS (
  SELECT vec_id AS query_vec_id, centroid_id
  FROM ({_best_centroids_sql(table, nprobe, "vec_id", "embedding", f"WHERE vec_id % {QUERY_STRIDE} = 0")})),
cand AS (SELECT DISTINCT query_vec_id, a.vec_id
         FROM probes JOIN assign a USING (centroid_id)),
scored AS (
  SELECT c.query_vec_id, e.vec_id, {cos} AS cos
  FROM cand c JOIN {table} e ON e.vec_id = c.vec_id
  JOIN q ON q.query_vec_id = c.query_vec_id
  WHERE e.vec_id <> c.query_vec_id)
SELECT query_vec_id, vec_id, rank, cos FROM (
  SELECT query_vec_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_vec_id ORDER BY cos DESC, vec_id DESC) AS rank
  FROM scored)
WHERE rank <= {k}
ORDER BY query_vec_id, rank
"""


def ivf_recall(embeddings: DataFrame, k: int = 5, nprobe: int = _NPROBE) -> DataFrame:
    """(query_vec_id, n_exact, n_hit, recall) — recall@k of IVF-probed
    search vs the exact brute force: the nprobe tuning gauge."""
    exact = cosine_topk(embeddings, k).select("query_vec_id", "vec_id")
    approx = ivf_topk(embeddings, k, nprobe).select("query_vec_id", "vec_id")
    ne = exact.groupBy("query_vec_id").agg(F.count("*").alias("n_exact"))
    nh = (
        exact.join(approx, ["query_vec_id", "vec_id"])
        .groupBy("query_vec_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        ne.join(nh, "query_vec_id", "left")
        .fillna({"n_hit": 0})
        .select(
            "query_vec_id",
            F.col("n_exact").cast("long"),
            F.col("n_hit").cast("long"),
            F.expr(round_sql("CAST(n_hit AS DOUBLE) / n_exact", 9)).alias("recall"),
        )
    )


def ivf_recall_sql(table: str, k: int = 5, nprobe: int = _NPROBE) -> str:
    return f"""
WITH exact AS (SELECT query_vec_id, vec_id FROM ({cosine_topk_sql(table, k)})),
approx AS (SELECT query_vec_id, vec_id FROM ({ivf_topk_sql(table, k, nprobe)})),
ne AS (SELECT query_vec_id, count(*) AS n_exact FROM exact GROUP BY query_vec_id),
nh AS (SELECT query_vec_id, count(*) AS n_hit
       FROM exact JOIN approx USING (query_vec_id, vec_id) GROUP BY query_vec_id)
SELECT query_vec_id, n_exact::BIGINT AS n_exact,
       COALESCE(n_hit, 0)::BIGINT AS n_hit,
       {round_sql("CAST(COALESCE(n_hit, 0) AS DOUBLE) / n_exact", 9)} AS recall
FROM ne LEFT JOIN nh USING (query_vec_id)
ORDER BY query_vec_id
"""


def near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.35, nplanes: int = _NPLANES
) -> DataFrame:
    """(vec_a, vec_b, cos) — embedding-cosine near-duplicate pairs,
    restricted to LSH-bucket co-occupants (the 100 TB scale path: the
    pair join is an equi-join on ``sig``, shuffle bounded by bucket
    sizes, never n²).  Recall < 1 by design; ``near_dup_pairs_exact``
    is the all-pairs oracle for recall measurement
    (tests/test_dedup_similarity.py)."""
    sig = lsh_signatures(embeddings, nplanes)
    e = embeddings.join(sig, "vec_id")
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), "sig")
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), "sig")
    return (
        a.join(b, "sig")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cos",
            F.expr(
                round_sql(
                    _DOT.format(a="ea", b="eb")
                    + " / (" + _NORM.format(a="ea") + " * " + _NORM.format(a="eb") + ")",
                    6,
                )
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )


def near_dup_pairs_sql(table: str, threshold: float = 0.35, nplanes: int = _NPLANES) -> str:
    cos = round_sql(
        _dot_sql("a.ea", "b.eb") + f" / ({_norm_sql('a.ea')} * {_norm_sql('b.eb')})", 6
    )
    return f"""
WITH sig AS ({lsh_signatures_sql(table, nplanes)}),
e AS (SELECT t.vec_id, t.embedding, s.sig FROM {table} t JOIN sig s USING (vec_id)),
a AS (SELECT vec_id AS vec_a, embedding AS ea, sig FROM e),
b AS (SELECT vec_id AS vec_b, embedding AS eb, sig FROM e)
SELECT vec_a, vec_b, cos FROM (
  SELECT vec_a, vec_b, {cos} AS cos FROM a JOIN b USING (sig) WHERE vec_a < vec_b)
WHERE cos >= {dlit(threshold)}
ORDER BY vec_a, vec_b
"""


def near_dup_pairs_exact(embeddings: DataFrame, threshold: float = 0.35) -> DataFrame:
    """All-pairs exact form — the recall oracle for ``near_dup_pairs``;
    O(n²), small-scale verification only."""
    a = embeddings.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = embeddings.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cos",
            F.expr(
                round_sql(
                    _DOT.format(a="ea", b="eb")
                    + " / (" + _NORM.format(a="ea") + " * " + _NORM.format(a="eb") + ")",
                    6,
                )
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )


def near_dup_pairs_exact_sql(table: str, threshold: float = 0.35) -> str:
    cos = round_sql(
        _dot_sql("a.ea", "b.eb") + f" / ({_norm_sql('a.ea')} * {_norm_sql('b.eb')})", 6
    )
    return f"""
WITH a AS (SELECT vec_id AS vec_a, embedding AS ea FROM {table}),
b AS (SELECT vec_id AS vec_b, embedding AS eb FROM {table})
SELECT vec_a, vec_b, cos FROM (
  SELECT vec_a, vec_b, {cos} AS cos FROM a CROSS JOIN b WHERE vec_a < vec_b)
WHERE cos >= {dlit(threshold)}
ORDER BY vec_a, vec_b
"""
