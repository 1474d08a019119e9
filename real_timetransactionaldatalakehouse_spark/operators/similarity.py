"""Embedding similarity search (SURVEY.md section 2 X3, north-star
EXT): brute-force cosine top-k as the exact baseline, plus a
random-hyperplane LSH bucketed variant as the scale path.

Scale design:
- brute force: broadcast the (small) query set against the candidate
  table — a map-side nested loop per partition, then per-query top-k
  via window over (query partition).  Exact; cost O(|Q| x |C|), right
  whenever |Q| is small or as the re-rank stage.
- LSH: deterministic sign-random-projection buckets computed per row
  (no shuffle), equi-join on bucket — candidates shrink by ~2^planes;
  top-k within candidates.  The approximate path for |Q| ~ |C| ~ 10^9.
- dot products stay in DOUBLE via zip_with + aggregate fold, which is
  a sequential left-to-right sum — bit-reproducible across engines
  (the DuckDB oracle folds the same way).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double fold of the elementwise product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, v: s + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda s, v: s + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def knn_bruteforce(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-match excluded).

    Broadcast the query side: the candidate table is scanned once,
    partition-local, no shuffle of candidates; the only shuffle is the
    per-query top-k window (|Q| x |C| -> |Q| x k after partial
    TakeOrdered in each partition... the window partitions by query).
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = candidates.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component in [-1, 1]:
    a splitmix-style integer hash of (plane, d) — data-independent and
    reproducible on any engine, no RNG state."""
    comps = []
    for d in range(dim):
        x = (plane * 1_000_003 + d * 7_919 + 12_345) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 33
        x = (x * 0xFF51AFD7ED558CCD) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 33
        comps.append((x % 2_000_001) / 1_000_000.0 - 1.0)
    return comps


def _planes_matrix_expr(n_planes: int, dim: int) -> Column:
    """All hyperplanes as ONE parsed SQL array<array<double>> literal.
    Building them from per-component F.lit() costs a py4j round trip
    per element (plan construction dominated the query); the D suffix
    types each literal DOUBLE — a bare decimal literal parses as
    DECIMAL and poisons the dot product into decimal math."""
    rows = ",".join(
        "array(" + ",".join(f"{c!r}D" for c in _hyperplane(p, dim)) + ")"
        for p in range(n_planes)
    )
    return F.expr(f"array({rows})")


def lsh_bucket(vec_col: Column, planes: int = 8, dim: int = 64, table: int = 0) -> Column:
    """Sign-random-projection bucket id (0..2^planes-1), per row.
    ``table`` offsets the hyperplane family so independent hash tables
    see independent projections."""
    bits = F.transform(
        _planes_matrix_expr((table + 1) * planes, dim),
        lambda hp: F.when(dot(vec_col, hp) > 0, F.lit(1)).otherwise(F.lit(0)),
    )
    return F.aggregate(
        F.slice(bits, table * planes + 1, planes), F.lit(0), lambda acc, b: acc * 2 + b
    )


def _lsh_banded(df: DataFrame, id_alias: str, vec_alias: str, id_col: str,
                vec_col: str, planes: int, dim: int, tables: int) -> DataFrame:
    """(id, vec, tbl, bucket) rows: ONE transform computes every sign
    bit against the constant plane matrix (2 lambda conversions total,
    not 2 per plane), the bit array is materialized as a column (no CSE
    across lambdas — see operators/dedup.py), then each table's bucket
    is a tiny fold over its bit slice."""
    all_bits = F.transform(
        _planes_matrix_expr(tables * planes, dim),
        lambda hp: F.when(dot(F.col(vec_col), hp) > 0, F.lit(1)).otherwise(F.lit(0)),
    )
    with_bits = df.select(
        F.col(id_col).alias(id_alias),
        F.col(vec_col).alias(vec_alias),
        all_bits.alias("__bits"),
    )
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                F.aggregate(
                    F.slice(F.col("__bits"), t * planes + 1, planes),
                    F.lit(0),
                    lambda acc, b: acc * 2 + b,
                ).alias("bucket"),
            )
            for t in range(tables)
        ]
    )
    return with_bits.select(
        id_alias, vec_alias, F.explode(buckets).alias("tb")
    ).select(id_alias, vec_alias, F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))


def knn_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    planes: int = 4,
    tables: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-table sign-random-projection LSH
    (OR-amplification: a pair is a candidate if it co-buckets in ANY of
    ``tables`` independent hash tables), exact cosine re-rank within
    candidates.

    Recall for a pair at angle theta: 1 - (1 - (1 - theta/pi)^planes)^tables
    — tune planes up for selectivity, tables up for recall.  At 10^9
    vectors each side shuffles ``tables`` small rows per vector on a
    (table, bucket) key; the quadratic cross product never materializes.
    """
    q = _lsh_banded(queries, "query_id", "q_vec", id_col, vec_col, planes, dim, tables)
    c = _lsh_banded(candidates, "neighbor_id", "c_vec", id_col, vec_col, planes, dim, tables)
    cand = (
        c.join(q, ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "q_vec", "neighbor_id", "c_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("q_vec"), F.col("c_vec")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def ivf_centroids(
    candidates: DataFrame,
    k: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantizer: k centroids via deterministic Lloyd
    iterations (init = evenly-strided existing vectors, so no RNG).

    Each iteration is one broadcast-join assignment pass + one groupBy
    mean — the standard scalable k-means shape: the candidate table
    streams once per iteration, centroids (k x dim doubles) broadcast.
    Returns (centroid_id, centroid array<double>).
    """
    n = candidates.count()
    stride = max(n // k, 1)
    init = (
        candidates.select(
            F.col(id_col).alias("cid_src"),
            F.col(vec_col).alias("centroid"),
        )
        .orderBy("cid_src")
        .limit(k * stride)
        .filter((F.col("cid_src") % stride) == 0)
        .limit(k)
    )
    cents = init.select(
        F.row_number().over(Window.orderBy("cid_src")).alias("centroid_id"),
        F.transform(F.col("centroid"), lambda x: x.cast("double")).alias("centroid"),
    )
    for _ in range(iterations):
        assigned = _assign_nearest(candidates, cents, id_col, vec_col)
        cents = (
            assigned.groupBy("centroid_id")
            .agg(
                F.array(
                    *[
                        F.avg(F.col("c_vec")[i].cast("double")).alias(f"d{i}")
                        for i in range(_dim_of(candidates, vec_col))
                    ]
                ).alias("centroid")
            )
        )
    return cents


def _dim_of(df: DataFrame, vec_col: str) -> int:
    return len(df.select(vec_col).first()[0])


def _assign_nearest(candidates: DataFrame, cents: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine):
    broadcast cross join + per-vector top-1 window."""
    c = candidates.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("c_vec"))
    scored = c.crossJoin(F.broadcast(cents)).select(
        "vid", "c_vec", "centroid_id", cosine(F.col("c_vec"), F.col("centroid")).alias("sim")
    )
    w = Window.partitionBy("vid").orderBy(F.col("sim").desc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vid", "c_vec", "centroid_id")
    )


def knn_ivf(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """X3 scale path B: IVF — partition candidates by nearest centroid
    (the inverted file), probe only the ``n_probe`` closest cells per
    query, exact cosine re-rank within the probed cells.

    At 10^9 vectors: the inverted file is a one-off build (centroids
    broadcast, one shuffle on centroid_id); each query touches
    n_probe/n_centroids of the data.  Recall is controlled by n_probe.
    """
    cents = ivf_centroids(candidates, k=n_centroids, id_col=id_col, vec_col=vec_col)
    inv = _assign_nearest(candidates, cents, id_col, vec_col).select(
        F.col("vid").alias("neighbor_id"), "c_vec", "centroid_id"
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    q_probe = (
        q.crossJoin(F.broadcast(cents))
        .select("query_id", "q_vec", "centroid_id", cosine(F.col("q_vec"), F.col("centroid")).alias("sim"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("centroid_id").asc())
            ),
        )
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "q_vec", "centroid_id")
    )
    scored = (
        inv.join(q_probe, "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    max_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold).  ``max_id`` bounds the oracle query; the scale path is
    the same computation fed by LSH buckets instead of a cross join."""
    base = df if max_id is None else df.filter(F.col(id_col) < max_id)
    a = base.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = base.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("score"))
        .filter(F.col("score") >= threshold)
    )
