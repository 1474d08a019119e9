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

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType


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
    """Sequential-fold cosine — bit-equal to the DuckDB list_reduce
    twin.  INPUT CONTRACT: nonzero-norm vectors.  Under Spark 4's
    default ANSI mode a zero divisor is a DIVIDE_BY_ZERO *error*, not
    NaN, so every cosine consumer in this module assumes embeddings
    were filtered/validated upstream — :func:`valid_embeddings` is
    that upstream filter (r10).  ``semantic_dedup`` filters
    ``norm > 0`` itself (a zero-vector test corpus surfaced the
    error there); the other consumers document the assumption here —
    a zero vector carries no direction and has no place in a cosine
    index."""
    return dot(a, b) / (norm(a) * norm(b))


def valid_embeddings(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """The cosine input contract as a reusable FILTER: keep rows whose
    vector is non-NULL, (optionally) exactly ``dim`` wide, all-finite,
    and of nonzero norm.  Every cosine consumer in this module states
    "embeddings filtered/validated upstream" — this is that upstream
    step, so pipelines ingesting real-world embedding tables (dead
    docs, padding rows, NaN-poisoned encoder output — all common at
    corpus scale) have a named, tested gate instead of re-deriving the
    predicate per call site.

    Wholly codegen (exists + aggregate over the array; no Python), one
    narrow filter — prune-friendly wherever it lands in the plan.  A
    zero-norm check via ``exists(x != 0)`` rather than computing the
    norm: no sqrt, early-exits on the first nonzero element, and
    avoids the (x*x) overflow corner entirely."""
    v = F.col(vec_col)
    ok = v.isNotNull()
    if dim is not None:
        ok = ok & (F.size(v) == dim)
    finite = ~F.exists(
        v, lambda x: x.cast("double").isNull() | F.isnan(x.cast("double"))
        | (F.abs(x.cast("double")) == float("inf"))
    )
    nonzero = F.exists(v, lambda x: x.cast("double") != 0.0)
    return df.filter(ok & finite & nonzero)


def knn_bruteforce(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    validate: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-match excluded).

    Broadcast the query side: the candidate table is scanned once,
    partition-local, no shuffle of candidates; the only shuffle is the
    per-query top-k window (|Q| x |C| -> |Q| x k after partial
    TakeOrdered in each partition... the window partitions by query).

    ``validate=True`` (r11, VERDICT r10 #6) applies
    :func:`valid_embeddings` to BOTH sides at the gate, so a
    NaN-poisoned or zero-norm table fails into a clean filtered set
    here instead of a mid-job ANSI DIVIDE_BY_ZERO.  Opt-in rather than
    default because the gate silently DROPS offending rows — for a
    pipeline that already validated upstream that's a redundant pass,
    and for one that didn't, dropping must be an explicit decision
    (the emit-nothing discipline every gate in this repo follows).
    """
    if validate:
        queries = valid_embeddings(queries, vec_col)
        candidates = valid_embeddings(candidates, vec_col)
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            norm(F.col(vec_col)).alias("q_norm"),
        )
    )
    # guarded fan before the per-pair fold work (r6): a single-split
    # candidate scan otherwise streams all |Q| x |C| interpreted dots
    # through one task; no-op on a well-split table
    from ..sources import fan_out

    candidates = fan_out(candidates)
    # norms are computed ONCE per row on each side, not once per pair:
    # cosine(a,b) folds three 64-element aggregates; factoring the two
    # norms out of the |Q| x |C| product leaves one dot fold per pair.
    # score = dot/(norm_a*norm_b) is the same expression tree as
    # cosine(), so values stay bit-identical to the oracle.
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))).alias("score"),
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


def _query_matrix(queries: DataFrame, id_col: str, vec_col: str):
    """Collect a kNN lookup's query side to the driver, sorted by id.

    The query side of a top-k lookup is metadata-sized by definition —
    it is a serving batch, not a table (the |Q| ~ |C| regime is the
    all-pairs problem, handled by the LSH/IVF *pair* operators).  Like
    the IVF centroid matrix, it is planner state: collecting it lets
    the data plane run as ONE closure-shipped Arrow kernel over the
    candidate stream instead of a per-pair interpreted fold, and at
    10^9 candidates nothing about this collect grows."""
    import numpy as np

    rows = sorted(queries.select(id_col, vec_col).collect(), key=lambda r: r[0])
    ids = np.array([r[0] for r in rows], dtype="int64")
    if not rows:  # keep Q 2-D so downstream `nq, dim = Q.shape` holds
        return ids, np.zeros((0, 1), dtype="float64")
    Q = np.array([list(r[1]) for r in rows], dtype="float64")
    return ids, Q


def _empty_topk(df: DataFrame) -> DataFrame:
    """Empty result with the kNN output schema — the fused serving
    kernels short-circuit to this when the collected query batch is
    empty (matching :func:`knn_bruteforce`, whose join path yields no
    rows naturally)."""
    return df.sparkSession.createDataFrame(
        [], "query_id long, neighbor_id long, rank int, score double"
    )


def _seq_norms(M):
    """Row norms accumulated column-by-column — the same left-to-right
    addition order as the ``norm()`` fold and DuckDB's ``list_reduce``,
    so values are bit-identical to the declarative path."""
    import numpy as np

    acc = np.zeros(M.shape[0], dtype="float64")
    for d in range(M.shape[1]):
        acc = acc + M[:, d] * M[:, d]
    return np.sqrt(acc)


def knn_topk_smallq(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k, serving-shaped: the metadata-sized
    query matrix rides in an Arrow kernel closure; each candidate
    partition emits only its LOCAL top-k per query, so the single
    shuffle carries |partitions| x |Q| x k rows — never the |Q| x |C|
    product (the same partial-TakeOrdered-then-merge shape Spark uses
    for global top-k).  Scores accumulate left-to-right over the
    dimension, bit-identical to :func:`knn_bruteforce` / the DuckDB
    oracle's sequential ``list_reduce`` fold.

    This is X3's exact path (reference north-star EXT); at 10^9
    candidates the kernel streams once over the table with no Python
    round trip on the pair space.  For |Q| at table scale use
    :func:`knn_lsh` / :func:`knn_ivf`.
    """
    q_ids, Q = _query_matrix(queries, id_col, vec_col)
    if len(q_ids) == 0:
        return _empty_topk(candidates)
    pairs = candidates.select(id_col, vec_col).mapInPandas(
        _fused_lookup_kernel(q_ids, Q, k, None, id_col, vec_col),
        schema="query_id long, neighbor_id long, score double",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def _fused_lookup_kernel(q_ids, Q, k: int, match_fn, id_col: str, vec_col: str):
    """One-pass ANN serving lookup: for each candidate batch, decide
    probe membership against the closure-shipped query structures
    (``match_fn(V) -> bool (n, nq)``; None = exact brute force), score
    with the left-to-right fold (oracle-exact order), and emit the
    batch-local top-k per query over matched pairs.  The candidate
    table is scanned once; no pair space, no vector shuffle — the
    downstream carries |partitions| x |Q| x k narrow rows.  (When
    lookups repeat against the same corpus, persist the banded/
    inverted table and use the join path instead — this kernel is the
    index-free one-shot.)"""
    import numpy as np

    q_norm = _seq_norms(Q)
    nq, dim = Q.shape

    def lookup(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            nid = pdf[id_col].to_numpy().astype("int64")
            match = (
                np.ones((V.shape[0], nq), dtype=bool)
                if match_fn is None
                else match_fn(V)
            )
            c_norm = _seq_norms(V)
            S = np.zeros((V.shape[0], nq), dtype="float64")
            for d in range(dim):  # left-to-right: oracle-exact fold order
                S = S + V[:, d, None] * Q[None, :, d]
            S = S / (q_norm[None, :] * c_norm[:, None])
            out_q, out_n, out_s = [], [], []
            for j in range(nq):
                keep = np.nonzero(match[:, j] & (nid != q_ids[j]))[0]
                if keep.size == 0:
                    continue
                order = np.lexsort((nid[keep], -S[keep, j]))[:k]
                sel = keep[order]
                out_q.append(np.full(sel.size, q_ids[j], dtype="int64"))
                out_n.append(nid[sel])
                out_s.append(S[sel, j])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "score": np.concatenate(out_s),
                    }
                )

    return lookup


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


def _np_planes(n_planes: int, dim: int):
    import numpy as np

    return np.array([_hyperplane(p, dim) for p in range(n_planes)], dtype="float64")


def _lsh_buckets_udf(planes: int, dim: int, tables: int):
    """Arrow-batched kernel: all ``tables`` bucket ids per vector in one
    (batch x dim) @ (dim x tables*planes) matmul.  The higher-order
    expression equivalent folds tables*planes interpreted 64-element
    dots per ROW; the vectorized kernel is two orders of magnitude
    cheaper and the plane matrix rides inside the closure (broadcast
    once per executor, never shuffled)."""
    import numpy as np

    P = _np_planes(tables * planes, dim).T  # (dim, tables*planes)
    pows = (2 ** np.arange(planes - 1, -1, -1)).astype("int64")

    @F.pandas_udf(ArrayType(IntegerType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        V = np.vstack(vecs.to_numpy()).astype("float64")  # (n, dim)
        bits = (V @ P) > 0  # (n, tables*planes)
        out = np.empty((V.shape[0], tables), dtype="int64")
        for t in range(tables):
            out[:, t] = bits[:, t * planes:(t + 1) * planes] @ pows
        return pd.Series(list(out.astype("int32")))

    return buckets


def derive_planes(
    n: int, target_bucket: int = 128, lo: int = 4, hi: int = 24
) -> int:
    """Default plane count for the sign-LSH family, derived from the
    CORPUS SIZE: ``ceil(log2(n / target_bucket))`` clamped to
    [``lo``, ``hi``] — i.e. enough hyperplanes that the expected
    bucket holds ~``target_bucket`` vectors.  A fixed plane count
    does not scale (VERDICT r7 #3: planes=4 -> 16 buckets per table
    was tuned for sf0.1 recall; at the 50x replica BOTH engines faced
    ~10^9 in-bucket candidate pairs): in-bucket pair work grows as
    n^2 / 2^planes per table, so planes must track log2(n) to keep
    per-bucket cost flat.  The price is recall at a fixed ``tables``
    — per-table co-bucket probability is match^planes — which is why
    ``tables="auto"`` (:func:`derive_tables`, r9) re-solves the table
    count from the recall model whenever this derivation raises the
    plane count: the two defaults compose, bounded bucket work AND
    held recall.  Bounds:
    ``lo`` keeps tiny corpora from degenerating to planes<=1 (every
    pair co-buckets = brute force); ``hi=24`` caps bucket-id width
    comfortably inside the int32 bucket column."""
    import math

    if n <= 0:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(max(n / target_bucket, 1.0)))))


def _resolve_planes(planes, df: DataFrame, corpus_count: int | None,
                    target_bucket: int = 128) -> int:
    """``planes="auto"`` -> :func:`derive_planes` over the given
    side's row count (``corpus_count`` skips the count job when the
    caller already knows it); integers pass through unchanged.
    NOTE: the "auto" path runs an eager ``count()`` JOB at operator
    CONSTRUCTION time (one scan of the corpus side) — pass
    ``corpus_count`` in pipelines that already know the size."""
    if planes == "auto":
        n = corpus_count if corpus_count is not None else df.count()
        return derive_planes(int(n), target_bucket)
    return int(planes)


def derive_tables(
    threshold: float,
    planes: int,
    target_recall: float = 0.9,
    lo: int = 2,
    hi: int = 64,
) -> int:
    """Default table count for the sign-LSH family, derived from the
    RECALL MODEL so the OR-amplification keeps up when
    :func:`derive_planes` raises the plane count with corpus size
    (VERDICT r8 #3: auto-planes without auto-tables silently traded
    recall — measured 0.929 -> 0.131 going planes 4 -> 10 at
    threshold 0.35 with tables=16).

    For a pair at cosine ``threshold`` the per-table co-bucket
    probability is ``match^planes`` with ``match = 1 - theta/pi``
    (sign-random-projection collision probability, Charikar 2002);
    over ``tables`` independent tables recall is
    ``1 - (1 - match^planes)^tables``.  This solves for the smallest
    ``tables`` reaching ``target_recall`` at the pair the operator is
    DESIGNED to catch (its own ``threshold``): pairs above it are hit
    even more often.  The model is measured-accurate to ~0.04
    absolute against the r8 recall sweep (pytest-pinned).

    Cost is LINEAR in tables (band rows per vector), so ``hi`` caps
    the spend: when even ``hi`` tables cannot reach the target —
    moderate thresholds like 0.35 at high plane counts need hundreds
    — the clamp fires A WARNING naming the achievable recall, because
    silently shipping a low-recall default is the trap this function
    exists to close; the caller should lower ``planes`` (denser
    verify work), raise ``hi`` knowingly, or accept the stated
    recall.  ``lo`` keeps degenerate inputs (match ~ 1) from
    single-table flakiness."""
    import math
    import warnings

    match = 1.0 - math.acos(max(-1.0, min(1.0, float(threshold)))) / math.pi
    p = match ** int(planes)
    if p >= 1.0:
        return lo
    if p <= 0.0 or target_recall >= 1.0:
        # target_recall >= 1 is unreachable for ANY finite table count
        # (the model approaches 1 only asymptotically) — same clamp+warn
        # path as a table count past ``hi``, not a math-domain crash.
        t = float("inf")
    else:
        t = math.log(1.0 - target_recall) / math.log(1.0 - p)
    n = max(lo, min(hi, math.ceil(t) if t != float("inf") else hi))
    if t > hi:
        achievable = 1.0 - (1.0 - p) ** hi
        warnings.warn(
            f"derive_tables: target recall {target_recall} at cosine "
            f">= {threshold} needs ~{math.ceil(t) if t != float('inf') else 'inf'} "
            f"tables at planes={planes}; clamped to {hi} "
            f"(achievable recall ~{achievable:.3f}). Lower planes, raise "
            f"hi, or accept the stated recall.",
            stacklevel=3,
        )
    return n


def _resolve_tables(tables, threshold: float, planes: int,
                    target_recall: float = 0.9) -> int:
    """``tables="auto"`` -> :func:`derive_tables` at the operator's
    own threshold and the RESOLVED plane count (call after
    ``_resolve_planes`` so auto-planes and auto-tables compose);
    integers pass through unchanged."""
    if tables == "auto":
        return derive_tables(threshold, planes, target_recall)
    return int(tables)


def _lsh_banded_narrow(df: DataFrame, id_alias: str, id_col: str,
                       vec_col: str, planes: int, dim: int,
                       tables: int) -> DataFrame:
    """(id, tbl, bucket) band rows WITHOUT the vector — the band table
    a 100 TB corpus actually shuffles: ~24 bytes x ``tables`` per
    vector instead of replicating the embedding into every band row
    (a 64-dim double vector is ~512 B; fat banding moves it ``tables``
    times through the bucket exchange AND again through the pair
    dedup).  Score-time vectors join back by id — each embedding
    crosses the wire once, keyed, instead of 2 x tables times."""
    buckets = _lsh_buckets_udf(planes, dim, tables)
    return df.select(
        F.col(id_col).alias(id_alias),
        buckets(F.col(vec_col)).alias("__buckets"),
    ).select(id_alias, F.posexplode(F.col("__buckets")).alias("tbl", "bucket"))


def knn_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    planes: int | str = "auto",
    tables: int | str = "auto",
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    collect_queries: bool = False,
    corpus_count: int | None = None,
    recall_at: float = 0.9,
    target_recall: float = 0.9,
) -> DataFrame:
    """Approximate top-k: multi-table sign-random-projection LSH
    (OR-amplification: a pair is a candidate if it co-buckets in ANY of
    ``tables`` independent hash tables), exact cosine re-rank within
    candidates.

    Recall for a pair at angle theta: 1 - (1 - (1 - theta/pi)^planes)^tables
    — tune planes up for selectivity, tables up for recall.  At 10^9
    vectors each side shuffles ``tables`` small rows per vector on a
    (table, bucket) key; the quadratic cross product never materializes.
    ``planes="auto"`` (default) derives the plane count from the
    candidate-side row count (:func:`derive_planes` — in-bucket pair
    work grows n^2/2^planes per table, so a FIXED plane count stops
    scaling past its tuned corpus size); pass ``corpus_count`` to skip
    the count job when the size is already known.  NOTE: the auto
    derivation runs that ``count()`` as an eager job at operator
    CONSTRUCTION time.  ``tables="auto"`` (default, r9) closes the
    recall side of the same loop: :func:`derive_tables` solves the
    recall model for the table count that keeps recall >=
    ``target_recall`` at cosine ``recall_at`` (the design point a
    top-k caller cares about — there is no threshold parameter to
    read it from) AFTER planes resolve, so growing the corpus raises
    planes for bounded bucket work and tables for held recall
    together.  MIND THE TWO 0.9-DEFAULT KNOBS: ``recall_at`` is a
    COSINE (where on the similarity axis recall is guaranteed), NOT a
    recall — to ask for more recall raise ``target_recall``.  RAISING
    ``recall_at`` relaxes the design point (higher-cosine pairs
    co-bucket more often), so the derivation returns FEWER tables and
    recall at any looser operating threshold silently drops.

    ``collect_queries=True`` is the index-free serving shape for a
    metadata-sized query batch: the query bucket table (same bit math
    as the executor kernel) rides in a fused lookup kernel's closure —
    ONE streaming pass over the candidates does bucket membership,
    exact re-rank, and batch-local top-k; no banded table, no join, no
    vector shuffle (the OR-amplification dedup is the membership
    test's ``any`` over tables).  Leave False when the query side is a
    real table, or persist the banded table when lookups repeat.
    """
    planes = _resolve_planes(planes, candidates, corpus_count)
    tables = _resolve_tables(tables, recall_at, planes, target_recall)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    if collect_queries:
        import numpy as np

        q_ids, Q = _query_matrix(queries, id_col, vec_col)
        if len(q_ids) == 0:
            return _empty_topk(candidates)
        P = _np_planes(tables * planes, dim).T
        pows = (2 ** np.arange(planes - 1, -1, -1)).astype("int64")
        QB = np.empty((len(q_ids), tables), dtype="int64")
        q_bits = (Q @ P) > 0
        for t in range(tables):
            QB[:, t] = q_bits[:, t * planes:(t + 1) * planes] @ pows

        def co_bucket(V):
            bits = (V @ P) > 0  # identical math to _lsh_buckets_udf
            M = np.empty((V.shape[0], tables), dtype="int64")
            for t in range(tables):
                M[:, t] = bits[:, t * planes:(t + 1) * planes] @ pows
            return (M[:, None, :] == QB[None, :, :]).any(axis=2)

        pairs = candidates.select(id_col, vec_col).mapInPandas(
            _fused_lookup_kernel(q_ids, Q, k, co_bucket, id_col, vec_col),
            schema="query_id long, neighbor_id long, score double",
        )
        return (
            pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "score")
        )
    # narrow-band form (r7): the bucket join and candidate dedup move
    # vector-free rows; query vectors (the small side) then candidate
    # vectors join back once by key for the exact re-rank — see
    # semantic_contamination_lsh for the traffic arithmetic
    c = _lsh_banded_narrow(candidates, "neighbor_id", id_col, vec_col, planes, dim, tables)
    q = _lsh_banded_narrow(queries, "query_id", id_col, vec_col, planes, dim, tables)
    cand = (
        c.join(q, ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_vec_norm"),
    )
    cv = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_vec_norm"),
    )
    scored = (
        cand.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_vec_norm") * F.col("c_vec_norm"))).alias("score"),
        )
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def _nearest_cells_udf(centroids, n_probe: int):
    """Arrow-batched kernel: the ``n_probe`` nearest centroids (by
    cosine) per vector, as an int array.  ``centroids`` (k x dim
    float64) travels in the closure — broadcast once per executor.
    Ties break toward the lower centroid index (argsort is stable)."""
    import numpy as np

    Cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-30
    )

    @F.pandas_udf(ArrayType(IntegerType()))
    def nearest(vecs: pd.Series) -> pd.Series:
        V = np.vstack(vecs.to_numpy()).astype("float64")
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
        S = Vn @ Cn.T  # (n, k)
        idx = np.argsort(-S, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(idx.astype("int32")))

    return nearest


def ivf_centroids(
    candidates: DataFrame,
    k: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """IVF coarse quantizer: k centroids via deterministic Lloyd
    iterations (init = the k vectors with the smallest md5-prefix hash
    of their id — a deterministic uniform sample, no RNG, no id-density
    assumption, and reproducible in ANSI SQL: with ``iterations=0`` the
    quantizer is a pure data sample any engine can reconstruct, which
    is what makes the declared IVF query oracle-checkable).
    Returns a (k x dim) float64 numpy matrix.

    The init is a TakeOrdered with a k-row heap per partition (k ~ 16)
    — constant driver memory at any table size, unlike stride-based
    sampling which needs a count() pass and funnels ~n rows through a
    global limit on dense id spaces.  Each Lloyd iteration is one
    vectorized assignment pass (centroid matrix in the kernel closure)
    + one groupBy mean; the k x dim result is collected to the driver
    between iterations — centroids are metadata-sized (k*dim doubles)
    by construction, which is what makes k-means scalable: the
    10^9-row table streams, the model doesn't.
    """
    import numpy as np

    id_hash = F.conv(
        F.substring(F.md5(F.col("cid").cast("string")), 1, 15), 16, 10
    ).cast("long")
    init = (
        candidates.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("v"))
        .orderBy(id_hash.asc(), F.col("cid").asc())
        .limit(k)
        .collect()
    )
    C = np.array([list(r.v) for r in sorted(init, key=lambda r: r.cid)], dtype="float64")
    dim = C.shape[1]
    for _ in range(iterations):
        assign = _nearest_cells_udf(C, 1)
        rows = (
            candidates.select(
                F.element_at(assign(F.col(vec_col)), 1).alias("cell"),
                F.col(vec_col).alias("v"),
            )
            .groupBy("cell")
            .agg(*[F.avg(F.col("v")[i].cast("double")).alias(f"d{i}") for i in range(dim)])
            .collect()
        )
        for r in rows:  # cells that lost every member keep their old position
            C[r.cell] = [r[f"d{i}"] for i in range(dim)]
    return C


def knn_ivf(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    collect_queries: bool = False,
) -> DataFrame:
    """X3 scale path B: IVF — partition candidates by nearest centroid
    (the inverted file), probe only the ``n_probe`` closest cells per
    query, exact cosine re-rank within the probed cells.

    At 10^9 vectors: the inverted file is a one-off build (one
    vectorized assignment pass, one shuffle on centroid_id); each query
    touches ~n_probe/n_centroids of the data.  Recall is controlled by
    n_probe.  ``iterations=0`` skips Lloyd refinement: the quantizer is
    then the deterministic hash-sampled seed vectors — reconstructable
    by any engine, which is what the declared oracle query pins.

    ``collect_queries=True``: the index-free serving shape — probe
    cells for the metadata-sized query batch are computed in the
    planner (the centroid matrix already lives there), and ONE fused
    kernel pass over the candidates does cell assignment, probe
    membership, exact re-rank, and batch-local top-k; no inverted
    file, no join.  Persist the inverted table and use the join path
    when lookups repeat against the same corpus.
    """
    import numpy as np

    C = ivf_centroids(
        candidates, k=n_centroids, iterations=iterations,
        id_col=id_col, vec_col=vec_col,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    # normalization replicates _nearest_cells_udf exactly (blocked
    # np.linalg norms are fine for an arg-ranking); the SCORE always
    # uses the sequential fold to stay oracle-exact
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
    if collect_queries:
        q_ids, Q = _query_matrix(queries, id_col, vec_col)
        if len(q_ids) == 0:
            return _empty_topk(candidates)
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
        cells = np.argsort(-(Qn @ Cn.T), axis=1, kind="stable")[:, :n_probe]

        def in_probed_cell(V):
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
            cell = np.argsort(-(Vn @ Cn.T), axis=1, kind="stable")[:, 0]
            return (cell[:, None, None] == cells[None, :, :]).any(axis=2)

        pairs = candidates.select(id_col, vec_col).mapInPandas(
            _fused_lookup_kernel(q_ids, Q, k, in_probed_cell, id_col, vec_col),
            schema="query_id long, neighbor_id long, score double",
        )
        return (
            pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "score")
        )
    assign1 = _nearest_cells_udf(C, 1)
    inv = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("centroid_id"),
    )
    probe = _nearest_cells_udf(C, n_probe)
    q_probe = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
        F.explode(probe(F.col(vec_col))).alias("centroid_id"),
    )
    scored = (
        inv.join(F.broadcast(q_probe), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))).alias("score"),
        )
    )
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
    a = base.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("na"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("nb"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def _exact_dup_probe(df: DataFrame, vec_col: str) -> bool:
    """Build-time duplicate-ratio probe gating the ``collapse_exact``
    passes (VERDICT r8 #2 — make the collapse WORK-PROPORTIONAL): ONE
    agg job compares the row count against the distinct-fingerprint
    count (the same seeded 128-bit xxhash64 pair the collapse itself
    keys on) and returns whether ANY byte-identical vector group
    exists.  On a dup-free corpus the collapse is the identity map but
    still paid a full fingerprint groupBy plus two corpus-wide joins —
    at bench sf0.1 that doubled q_semdedup's steady wall (1.444 s vs
    0.70 s oracle) for zero collapsed rows; gated, the dup-free plan
    IS the plain plan (bit-equal by construction: with no duplicate
    groups every vector is its own representative).  The probe's one
    narrow pass (two longs per row, map-side partial distinct) is the
    price a duplicate-heavy corpus pays ON TOP of the collapse it
    needs anyway — O(n) against the O(n log n + joins) it buys out of
    on the dup-free side.  Deterministic (exact counts over the data),
    so retry- and layout-stable; runs at plan-build time like the seed
    sample and centroid collects (a metadata-sized one-row result)."""
    n_all, n_fp = df.agg(
        F.count(F.lit(1)),
        F.count_distinct(
            F.xxhash64(F.col(vec_col)), F.xxhash64(F.lit(1), F.col(vec_col))
        ),
    ).first()
    return int(n_all) != int(n_fp)


def embedding_neardup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.9,
    planes: int | str = "auto",
    tables: int | str = "auto",
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_count: int | None = None,
    collapse_exact: bool = False,
    max_bucket: int | None = None,
    target_recall: float = 0.9,
    validate: bool = False,
) -> DataFrame:
    """Scale path for embedding near-dup: candidate pairs come from
    multi-table sign-LSH co-bucketing instead of the all-pairs cross
    join, then the SAME exact cosine filter runs on candidates only.

    At 10^9 vectors the shuffle is ``tables`` small rows per vector on
    (table, bucket); a pair at cosine >= 0.9 (angle <= ~26 deg) lands in
    the same bucket of at least one of 8x8-plane tables with
    probability ~1 - (1 - 0.86^8)^8 ~ 0.97 — recall is tunable via
    ``tables`` without ever materializing the quadratic pair space.

    Plan (r7 narrow-band rewrite, same as
    :func:`semantic_contamination_lsh`): the band table is VECTOR-FREE
    (id, tbl, bucket), so the self-join and pair dedup move ~24-byte
    rows; each endpoint's embedding joins back ONCE by key for the
    exact-cosine verify — the fat form replicated every vector
    ``tables`` times through the band build and again through the
    dedup exchange.

    ``planes="auto"`` (default, r8) derives the plane count from the
    corpus size (:func:`derive_planes`): in-bucket candidate pairs
    grow n^2/2^planes per table, so the fixed planes=8 this operator
    shipped with stops scaling past ~10^5 vectors; ``corpus_count``
    skips the derivation's count job when known (otherwise the auto
    path runs one eager ``count()`` at construction).
    ``tables="auto"`` (default, r9, VERDICT r8 #3) derives the table
    count from (``threshold``, resolved planes) via the recall model
    (:func:`derive_tables`, target 0.9 at the operator's own
    threshold) — without it, auto-planes held bucket work flat by
    silently giving up recall as the corpus grew.

    ``collapse_exact=True`` (r8) pre-collapses BYTE-IDENTICAL vectors
    to their min-id representative before banding — the embedding
    twin of :func:`semantic_dedup`'s collapse and
    ``dedup.verified_neardup_clusters``' clique collapse.  On a
    re-crawl/re-render-heavy corpus (or the 50x replica, where every
    vector has 49 exact copies) the m-cliques of identical vectors
    dominate the band table, the bucket self-join AND the verify
    fold-cosines, and concentrate in single tasks (identical vectors
    share EVERY bucket).  With ``max_bucket=None`` (the tested and
    certified combination) the collapse is OUTPUT-EQUIVALENT, bit for
    bit, to plain banding: copies share all band buckets, so (x, y)
    co-buckets iff their reps do; every expanded pair's score is the
    SAME fold expression over the same vector bytes (within-group
    pairs score dot(v,v)/(n*n) — computed once per group — and
    cross-group pairs inherit the rep pair's fold).  With
    ``max_bucket`` SET the collapsed output is a SUPERSET of the
    capped plain output, not bit-equal to it: the capped plain path
    can scatter byte-identical vectors into different subcells (the
    subcell hash keys on the id, which differs per copy) in every
    table and drop those within-group pairs, while the collapse path
    always emits them — strictly better recall, same bound on per-key
    work.  The expansion joins are narrow (id, rep) rows; only the
    output cardinality — which both forms share — is big.

    r9: the collapse is GATED on a build-time duplicate-ratio probe
    (:func:`_exact_dup_probe`, one narrow agg job): a dup-free corpus
    skips the fingerprint groupBy and expansion joins entirely and
    runs the plain plan, which is bit-equal when no duplicate group
    exists.  Work done now tracks duplicates present.

    ``max_bucket`` (r8) is the HOT-BUCKET backstop for densely
    clustered embedding spaces, where near-identical (but not
    byte-identical) vectors co-bucket at ANY plane count and one
    (tbl, bucket) key concentrates millions of candidate pairs into a
    single task (measured: a 100k-vector replica with planted near-dup
    clusters left one straggler running 15+ min while 36 tasks idled).
    A bucket larger than the cap is SPLIT deterministically — members
    scatter over ceil(size/cap) subcells by the md5-hash of their id
    (the :func:`semantic_dedup` ``max_cell`` discipline, portable to
    any ANSI engine) — and pairs are scored only within subcells:
    per-key work is bounded by cap^2/2, no semantic region is ever
    dropped, and cross-subcell pairs inside an oversized bucket are
    the documented recall trade.  Every member still verifies against
    ~cap co-located neighbors per table, and a pair split apart in
    one table's hot bucket still has ``tables - 1`` independent
    chances to co-bucket.  Buckets at or under the cap are untouched,
    so ``None`` (default) is the exact banding.

    The verify deliberately stays a JVM-side fold cosine rather than
    an Arrow kernel: a pandas_udf over candidate PAIRS would ship two
    ~512 B vectors per pair through Arrow (143 GB for the r8
    measurement's 143M candidates — measured strictly slower than
    the fold), while the fold reads the joined vectors in place.
    Arrow kernels win where the batch REDUCES data (signatures,
    bucket ids), not where it would round-trip full vectors per pair.

    ``validate=True`` (r11, VERDICT r10 #6) applies
    :func:`valid_embeddings` at the gate — opt-in because the gate
    silently drops offending rows (see :func:`knn_bruteforce`).

    **Construction-time (eager) jobs** — declaring this operator runs
    up to THREE driver-side Spark jobs before any caller action, the
    same accepted plan-build pattern as q_knn_ivf's centroids and
    semantic_dedup's seeds: (1) the ``planes="auto"`` corpus count
    (skipped when ``corpus_count`` is passed), (2) the
    ``collapse_exact`` duplicate-ratio probe, and (3) the r13
    verify-width sizing agg — one single-row aggregation over the
    persisted band table (sum c*(c-1)/2 over bucket sizes) that prices
    the candidate-pair volume so the pair-dedup/verify exchange width
    tracks the quadratic in-bucket blow-up instead of the input bytes.
    Job (3) also MATERIALIZES the persisted band table at declare
    time; callers that only inspect the plan and never execute or
    release the result (via ``dedup.release_cached``) keep that cache
    in executor memory.  A lazy alternative (AQE coalescing over a
    cap-width exchange) was considered and rejected: the engine's
    measured profile turns AQE off below 2 GB of input
    (session.AQE_MIN_INPUT_BYTES), exactly where a fixed cap width
    over-schedules, and above it AQE already re-splits the verify
    stage — the one-row agg is the portable sizing that serves both
    regimes.
    """
    from .dedup import _attach_cached

    if validate:
        df = valid_embeddings(df, vec_col)
    planes = _resolve_planes(planes, df, corpus_count)
    tables = _resolve_tables(tables, threshold, planes, target_recall)
    if collapse_exact:
        # work-proportional gate (VERDICT r8 #2): on a dup-free corpus
        # the collapse is the identity, so skip its groupBy + expansion
        # joins entirely — the plain banding below is bit-equal to the
        # collapsed form when no duplicate group exists (regardless of
        # max_bucket: identity collapse means reps == members)
        collapse_exact = _exact_dup_probe(df, vec_col)
    if collapse_exact:
        # r14 (guide §2.3/§2.4, same cut as dedup._collapsed_graph):
        # (rep, group size) per member via ONE window over the vector
        # fingerprint — one scan + one keyed exchange where the old
        # groupBy + join-back paid two scans, two exchanges and a
        # corpus-sized SMJ; group rows are a filter over the same
        # cached frame
        wfp = Window.partitionBy("__f1", "__f2")
        member = (
            df.select(
                F.col(id_col).alias("__mid"),
                F.xxhash64(F.col(vec_col)).alias("__f1"),
                F.xxhash64(F.lit(1), F.col(vec_col)).alias("__f2"),
            )
            .select(
                "__mid",
                F.min("__mid").over(wfp).alias("__rep"),
                F.count(F.lit(1)).over(wfp).alias("__n"),
            )
            .persist()
        )
        groups = member.filter(F.col("__mid") == F.col("__rep")).select(
            "__rep", "__n"
        )
        reps = df.join(
            groups.select(F.col("__rep").alias(id_col)), id_col, "left_semi"
        )
        rep_pairs = embedding_neardup_pairs_lsh(
            reps, threshold=threshold, planes=planes, tables=tables,
            dim=dim, id_col=id_col, vec_col=vec_col,
            max_bucket=max_bucket,
        )
        ma, mb = member.alias("ma"), member.alias("mb")
        cross = (
            rep_pairs
            .join(ma, rep_pairs["id_a"] == F.col("ma.__rep"))
            .join(mb, rep_pairs["id_b"] == F.col("mb.__rep"))
            .select(
                F.least(F.col("ma.__mid"), F.col("mb.__mid")).alias("id_a"),
                F.greatest(F.col("ma.__mid"), F.col("mb.__mid")).alias("id_b"),
                F.col("score"),
            )
        )
        # within-group pairs: identical vectors always co-bucket; the
        # score is the self-cosine of the shared bytes (NOT a literal
        # 1.0 — sqrt(s)*sqrt(s) != s in general, and the ANSI twin
        # computes the same fold)
        self_scored = (
            df.join(groups.filter(F.col("__n") > 1)
                    .select(F.col("__rep").alias(id_col)), id_col, "left_semi")
            .select(
                F.col(id_col).alias("__rep"),
                (dot(F.col(vec_col), F.col(vec_col))
                 / (norm(F.col(vec_col)) * norm(F.col(vec_col))))
                .alias("score"),
            )
            .filter(F.col("score") >= threshold)
        )
        within = (
            self_scored
            .join(ma, "__rep")
            .join(mb, "__rep")
            .filter(F.col("ma.__mid") < F.col("mb.__mid"))
            .select(
                F.col("ma.__mid").alias("id_a"),
                F.col("mb.__mid").alias("id_b"),
                "score",
            )
        )
        out = cross.unionByName(within)
        return _attach_cached(
            out, [member] + getattr(rep_pairs, "_cached_deps", [])
        )
    cached = []
    # r13 (optimization, guide §2.2): guarded input-sized fan before
    # the Arrow bucket kernel — a single-row-group embeddings file
    # scans as ONE task, serializing the band build AND (because
    # ``banded`` persists that layout) the in-bucket pair generation
    # that streams through it.  Measured at sf0.1: the 1-task
    # band+pair-gen stage held ~1.0 s of the query's ~3.4 s wall.
    from ..sources import fan_out

    banded = _lsh_banded_narrow(
        fan_out(df, guard=True), "id", id_col, vec_col, planes, dim, tables
    ).persist()
    cached.append(banded)
    cond = (
        (F.col("a.tbl") == F.col("b.tbl"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.id") < F.col("b.id"))
    )
    if max_bucket is not None:
        # deterministic hot-bucket split (see docstring): per-key
        # sizes come from one agg over the band table (<= non-empty
        # buckets rows, same join key as the pair join); oversized
        # buckets scatter members over ceil(size/cap) subcells by the
        # portable md5 id hash
        sizes = banded.groupBy("tbl", "bucket").agg(
            F.count(F.lit(1)).alias("__bsz")
        )
        id_hash = F.conv(
            F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        nsub = F.ceil(F.col("__bsz") / F.lit(int(max_bucket))).cast("long")
        banded = (
            banded.join(sizes, ["tbl", "bucket"])
            .withColumn(
                "__sub",
                F.when(F.col("__bsz") <= max_bucket, F.lit(0).cast("long"))
                .otherwise(F.pmod(id_hash, nsub)),
            )
            .drop("__bsz")
            .persist()
        )
        cached.append(banded)
        cond = cond & (F.col("a.__sub") == F.col("b.__sub"))
    a, b = banded.alias("a"), banded.alias("b")
    # r13 (optimization, guide §2.2/§2.5): the pair-dedup/verify width
    # must track the CANDIDATE-PAIR volume, not the input bytes — the
    # in-bucket pair space is quadratic in bucket sizes, so the
    # input-sized session layout structurally underestimates it (at
    # sf0.1: ~1 MB of embeddings -> width 4, but ~2M candidate pairs x
    # a ~1 KB joined-vector row = ~2 GB of verify-stage volume; the
    # 4-task fold-cosine stage held ~2.3 s of the query's ~3.4 s
    # wall).  One single-row agg over the persisted band table prices
    # the pair space exactly (sum c*(c-1)/2 — an upper bound when
    # ``max_bucket`` splits hot buckets), and the verify row width is
    # two ``dim``-double vectors; the result clamps to the same
    # [session layout, 4x parallelism] band ``tune_for_input`` uses,
    # so at 100 TB the cap binds (thousands of partitions, same as
    # today) and locally the width follows the actual blow-up.  The
    # repartition keys on (id_a, id_b), so dropDuplicates reuses the
    # exchange instead of adding one.
    spark = df.sparkSession
    est_pairs = (
        banded.groupBy("tbl", "bucket")
        .agg(F.count(F.lit(1)).alias("__c"))
        .agg(F.sum(F.col("__c") * (F.col("__c") - 1) / 2).alias("p"))
        .first()["p"]
    ) or 0
    # clamp band: same floor/target/cap as session.tune_for_input —
    # SHUFFLE_TARGET_BYTES per partition, capped at 4x the session's
    # actual parallelism (r14, ADVICE: constants imported, not
    # re-stated, so the two sizing rules cannot drift)
    from ..session import SHUFFLE_TARGET_BYTES

    layout = int(spark.conf.get("spark.sql.shuffle.partitions"))
    verify_bytes = int(est_pairs) * (16 * dim + 24)
    n_verify = int(max(layout, min(
        4 * spark.sparkContext.defaultParallelism,
        verify_bytes // SHUFFLE_TARGET_BYTES,
    )))
    cand = (
        a.join(b, cond)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .repartition(n_verify, "id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = df.select(
        F.col(id_col).alias("__vid"), F.col(vec_col).alias("__v"),
        norm(F.col(vec_col)).alias("__vn"),
    )
    out = (
        cand.join(vecs, cand["id_a"] == vecs["__vid"])
        .select("id_a", "id_b", F.col("__v").alias("va"), F.col("__vn").alias("na"))
        .join(vecs, F.col("id_b") == vecs["__vid"])
        .select(
            "id_a", "id_b",
            (dot(F.col("va"), F.col("__v")) / (F.col("na") * F.col("__vn")))
            .alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
    return _attach_cached(out, cached)


def project_embeddings(
    df: DataFrame,
    out_dim: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    out_col: str = "projected",
) -> DataFrame:
    """Random-projection (Johnson-Lindenstrauss) dimensionality
    reduction: project each vector onto ``out_dim`` deterministic
    pseudo-random hyperplanes — the standard preprocessing that shrinks
    ANN index and shuffle width when the raw embedding dimension is
    overkill for recall.  Angles (hence cosine ranking) are
    approximately preserved with distortion ~ sqrt(log n / out_dim).

    The projection matrix is the same data-independent splitmix
    construction the LSH tables use (`_hyperplane`): reproducible on
    any engine, no RNG state, rides the plan as a literal — nothing is
    broadcast or shuffled.  Per-row cost is ``out_dim`` sequential
    folds (JVM codegen); output is ``array<double>``.
    """
    M = _planes_matrix_expr(out_dim, dim)
    comps = [dot(F.col(vec_col), F.element_at(M, p + 1)) for p in range(out_dim)]
    return df.select(
        F.col(id_col), *[c for c in df.columns if c != id_col and c != vec_col],
        F.array(*comps).alias(out_col),
    )


def embedding_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
    exact: bool = True,
    dyadic_bits: int | None = None,
    repartition: bool = True,
) -> DataFrame:
    """Per-label mean embedding (centroid) — the mean-pooling step of
    cluster summarization, IVF coarse-quantizer refresh, and
    class-prototype classification.  Output: one row per
    (label, dim) with the centroid component and member count (long
    format; pivot back to an array with ``collect_list`` over sorted
    dims when a vector shape is needed).

    ``exact=True`` folds each (label, dim) cell's values in ``id``
    order inside an aggregated array — a FIXED summation order, so
    the result is bit-identical across partitionings and engines
    (float addition does not reassociate here).  The array holds the
    label's member count of scalars: fine up to ~1e6 members per
    label.  ``exact=False`` is a 100 TB path — a plain double sum
    (partial+final, arbitrary merge order, last-ulp tolerance) with
    identical asymptotics to any other aggregation.

    ``dyadic_bits=k`` is the BEST of both — bit-exact AND
    partial-aggregable — when the caller proves every component is an
    exact multiple of 2^-k (any float32 input whose exponents stay
    >= 24-k; k=43 covers magnitudes down to ~1e-6, and the property is
    checkable once per corpus): components scale to exact longs
    (* 2^k, a power-of-two multiply, lossless), accumulate via the
    hi/lo split-long sum (functions.xlsum — exact to 2^39 members per
    label, codegen primitives, arbitrary merge order), and the single
    double rounding happens at the final scale-back.  No per-cell
    member arrays, no ordered fold — the 50x-replica superlinear wall
    (10.7x for 5x data) becomes a plain partial+final agg.

    ``repartition=True`` fans an under-split source to session
    parallelism before the explode (split-count guarded no-op on
    well-split tables) so the posexplode stage uses the cluster.
    """
    if repartition:
        from ..sources import fan_out

        df = fan_out(df)
    e = df.select(
        F.col(label_col).alias("label"),
        F.col(id_col).alias("__i"),
        F.posexplode(F.col(vec_col)).alias("dim", "__v"),
    ).withColumn("__v", F.col("__v").cast("double"))
    if dyadic_bits is not None:
        from ..functions import xlsum

        scale = F.lit(float(2 ** dyadic_bits))
        agg = e.groupBy("label", "dim").agg(
            xlsum((F.col("__v") * scale).cast("long")).alias("__scaled"),
            F.count(F.lit(1)).alias("n_members"),
        )
        return agg.select(
            "label", "dim",
            (F.col("__scaled") / scale / F.col("n_members").cast("double"))
            .alias("centroid"),
            "n_members",
        )
    if exact:
        agg = e.groupBy("label", "dim").agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__i").alias("i"), F.col("__v").alias("v")))
            ).alias("__vs"),
            F.count(F.lit(1)).alias("n_members"),
        )
        total = F.aggregate(
            F.col("__vs"), F.lit(0.0), lambda acc, x: acc + x["v"]
        )
    else:
        agg = e.groupBy("label", "dim").agg(
            F.sum("__v").alias("__total"), F.count(F.lit(1)).alias("n_members")
        )
        total = F.col("__total")
    return agg.select(
        "label", "dim",
        (total / F.col("n_members").cast("double")).alias("centroid"),
        "n_members",
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_max: int = 127,
) -> DataFrame:
    """Symmetric int8 quantization per vector (max-abs scaling) — the
    4x storage/bandwidth shrink ANN indexes ship with: ``q_i =
    round(x_i * q_max / max|x|)``, reconstructed as ``q_i / scale``.

    Map-only higher-order expressions (transform / array_max), zero
    shuffles, no Python; both engines round ties away from zero, so
    the quantized codes are bit-identical cross-engine.  Zero vectors
    get a NULL scale and NULL codes (ANSI-safe guard) rather than a
    divide-by-zero.  Recall cost of int8 on cosine ranking is the
    published ~<1% at 127 levels; keep the float vectors for the
    re-rank stage and feed the codes to the candidate scan.
    """
    v = F.col(vec_col)
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = F.when(maxabs > 0, F.lit(float(q_max)) / maxabs)
    qvec = F.when(
        maxabs > 0,
        F.transform(
            v,
            lambda x: F.round(x.cast("double") * (F.lit(float(q_max)) / maxabs))
            .cast("int"),
        ),
    )
    return df.select(
        F.col(id_col), scale.alias("scale"), qvec.alias("qvec")
    )


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    threshold: float = 0.32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_id: int | None = None,
    max_cell: int | None = None,
    collapse_exact: bool = False,
    validate: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, score pairs ONLY
    within each cluster, connected-component the near-duplicate pairs,
    and keep ONE representative per duplicate group — the member with
    the LOWEST cosine to its cluster centroid (the paper's
    keep-the-least-prototypical rule), ties to the lowest id.  The
    semantic tier of the dedup ladder: exact -> MinHash -> SimHash ->
    embedding-LSH -> cluster-scoped semantic (catches paraphrases and
    re-renders that share no shingles at all).

    Spark-first shape, zero UDFs and zero extra shuffles before the
    pair join: the k seed centroids are the deterministic md5-hash
    sample :func:`ivf_centroids` uses at ``iterations=0``
    (metadata-sized, collected once at plan build, reproducible in
    ANSI SQL); cell assignment is a MAP-ONLY projection over k inline
    cosine folds against centroid literals (no k-row join, no window);
    pair generation is a cell-keyed self-join — candidates only within
    a cell, never the corpus pair space; components are hash-min label
    propagation (``dedup.neardup_clusters``).  Every cosine is the
    sequential left fold (:func:`dot` / :func:`norm`), so scores and
    the keep-ranking are bit-equal to the ANSI-SQL twin.

    At 100 TB: raise ``k`` so cells stay join-sized (the paper runs
    50k clusters over 5B items; centroids stay metadata-sized until
    k*dim outgrows the closure, at which point assignment moves to the
    broadcast-join form).  The cell self-join shuffles each vector
    once on its cell id; skew follows cluster balance.  ``max_cell``
    is the skew backstop when re-seeding is not an option: any cell
    larger than the cap is SPLIT deterministically (md5-hash of the id
    modulo the subcell count — engine-portable, retry-stable) and
    pairs are scored only within subcells.  Unlike hash-banding's
    drop-the-hot-bucket cap this never discards a semantic region —
    every member still gets compared against ~``max_cell`` co-located
    neighbors — but cross-subcell pairs inside an oversized cell go
    unscored: the documented recall trade for bounding the quadratic
    term.  Cells at or under the cap are untouched (SemDeDup's
    in-cell exactness contract), so ``max_cell=None`` (default) is
    the paper-faithful exact form.  ``max_id`` bounds the certifiable
    query exactly as in :func:`embedding_neardup_pairs`.

    ``collapse_exact=True`` pre-collapses BYTE-IDENTICAL vectors (128
    bits of seeded xxhash64 over the array) to one representative
    before assignment — the embedding twin of
    ``dedup.verified_neardup_clusters``'s clique collapse: m exact
    copies of a vector are an m-clique of cosine-1.0 pairs that teach
    label propagation nothing, and on re-render/re-crawl-heavy corpora
    they dominate both the pair stream and the propagation edge table
    (measured on the 50x replica's 50-copy vectors: the capped run's
    residual ~95 s was entirely this graph).  Output-equivalent to the
    uncollapsed unbounded form: copies share cell, ``cent_cos`` and
    every pairwise score, so components expand 1:1, ``cluster_id``
    stays the member-min id and the keep rule ranks identically.
    Zero-norm vectors never pair (NaN cosine) and are excluded from
    the collapse's own-clique logic, exactly as they fall out of the
    pair path.  With ``max_cell`` the combination is RECALL-BETTER
    than uncollapsed+capped (copies merge regardless of subcell
    scatter), not bit-equal to it.

    r9 (VERDICT r8 #2): the collapse is GATED on a build-time
    duplicate-ratio probe (:func:`_exact_dup_probe`) so its cost is
    work-proportional — a dup-free corpus (the common case outside
    re-crawl pipelines; also the sf0.1 bench data, where the
    unconditional pass doubled this operator's steady wall for zero
    collapsed rows) skips the fingerprint groupBy and both expansion
    joins and runs the plain plan, which produces the identical
    output when no duplicate group exists.

    ``validate=True`` (r12, VERDICT r11 #5 — the one cosine
    entry-point the r11 pass missed) applies :func:`valid_embeddings`
    at the gate, matching its three sibling entry-points: a
    NaN-poisoned or NULL-row table fails into a clean filtered set
    instead of a mid-job ANSI error.  Opt-in because the gate DROPS
    rows — same default-off reasoning as :func:`knn_bruteforce`.
    (Zero-norm vectors were already inert here — they never pair —
    but the gate removes them before cell assignment ever folds
    them.)

    Output: ``(id, cell, cluster_id, n_members, keep)`` for every
    member of a duplicate group; singletons never enter the pair graph
    and are implicit keeps (``dedup.neardup_clusters`` contract).
    """
    from .dedup import neardup_clusters

    import math

    if validate:
        df = valid_embeddings(df, vec_col)
    base = df if max_id is None else df.filter(F.col(id_col) < max_id)
    base = base.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("__vn"),
    )
    # zero-norm vectors have no cosine neighborhood: under ANSI mode
    # their assignment division is a DIVIDE_BY_ZERO error, and no pair
    # they could appear in is scorable — exclude them up front; like
    # singletons they are implicit keeps outside the pair graph
    base = base.filter(F.col("__vn") > 0)
    id_hash = F.conv(
        F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    # seeds ALWAYS sample the full base (not the collapsed reps): the
    # seed rule is part of the operator's deterministic contract, and
    # sampling reps instead would move centroids — breaking the
    # collapse's output-equivalence argument
    seeds = (
        base.orderBy(id_hash.asc(), F.col("id").asc()).limit(k).collect()
    )
    groups = member = None
    if collapse_exact:
        # work-proportional gate (VERDICT r8 #2): zero duplicate groups
        # -> the collapse is the identity map -> the plain path below
        # produces the identical output without the fingerprint groupBy
        # or the expansion joins.  The probe is one narrow agg job at
        # plan-build time (see _exact_dup_probe).
        collapse_exact = _exact_dup_probe(base, "v")
    if collapse_exact:
        # 128-bit seeded hash of the raw vector: copies collapse to the
        # min-id representative; the (fp, id) exchange never carries
        # vectors (exact_dedup discipline).  r14 (guide §2.3/§2.4):
        # (rep, group size, group norm) per member via ONE window over
        # the fingerprint instead of groupBy + join-back — one scan and
        # one keyed exchange, not two of each plus an SMJ; group rows
        # are the id == rep filter of the same frame.
        wfp = Window.partitionBy("__f1", "__f2")
        member = (
            base.select(
                "id",
                F.xxhash64(F.col("v")).alias("__f1"),
                F.xxhash64(F.lit(1), F.col("v")).alias("__f2"),
                F.col("__vn"),
            )
            .select(
                "id",
                F.min("id").over(wfp).alias("__rep"),
                F.count(F.lit(1)).over(wfp).alias("__n"),
                F.min("__vn").over(wfp).alias("__gn"),
            )
        )
        groups = member.filter(F.col("id") == F.col("__rep")).select(
            "__rep", "__n", "__gn"
        )
        base = base.join(
            groups.select(F.col("__rep").alias("id")), "id", "left_semi"
        )
    C = [list(r.v) for r in sorted(seeds, key=lambda r: r.id)]
    # Norms factored ONCE (r6): interpreted HOF lambdas are not
    # constant-folded nor CSE'd, so cosine() inlined per centroid
    # re-folded norm(v) k times per row and norm(centroid) k times per
    # row.  The centroid norms are Python floats computed with the
    # IDENTICAL left-to-right sum-of-squares fold + IEEE sqrt, so the
    # scores stay bit-equal to the cosine() tree the oracle replicates.
    def _pynorm(cv):
        s = 0.0
        for x in cv:
            s = s + float(x) * float(x)
        return math.sqrt(s)

    cells = F.array(
        *[
            F.struct(
                (
                    dot(F.col("v"), F.array(*[F.lit(float(x)) for x in cv]))
                    / (F.col("__vn") * F.lit(_pynorm(cv)))
                ).alias("cos"),
                F.lit(-i).alias("negidx"),
            )
            for i, cv in enumerate(C)
        ]
    )
    best = F.array_max(cells)
    assigned = base.select(
        "id",
        "v",
        "__vn",
        (-best["negidx"]).alias("cell"),
        best["cos"].alias("cent_cos"),
    )
    join_keys = ["cell"]
    if max_cell is not None:
        # deterministic oversized-cell split: per-cell size is k rows
        # (metadata-sized, broadcast); members of a cell larger than
        # the cap scatter over ceil(size/cap) subcells by the md5-hash
        # of their id — the same portable hash as the seed sample, so
        # any engine can reconstruct the exact subcell layout
        csz = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("__csz"))
        nsub = F.ceil(F.col("__csz") / F.lit(int(max_cell))).cast("long")
        assigned = (
            assigned.join(F.broadcast(csz), "cell")
            .withColumn(
                "__sub",
                F.when(F.col("__csz") <= max_cell, F.lit(0).cast("long"))
                .otherwise(F.pmod(id_hash, nsub)),
            )
            .drop("__csz")
        )
        join_keys = ["cell", "__sub"]
    a = assigned.select(
        *join_keys, F.col("id").alias("id_a"), F.col("v").alias("va"),
        F.col("__vn").alias("__na"),
    )
    b = assigned.select(
        *join_keys, F.col("id").alias("id_b"), F.col("v").alias("vb"),
        F.col("__vn").alias("__nb"),
    )
    pairs = (
        a.join(b, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("__na") * F.col("__nb")))
            .alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
    comp = neardup_clusters(pairs.select("id_a", "id_b"))
    if collapse_exact:
        # expand representative components back to every copy: copies
        # share cell, cent_cos and all pair scores, so cluster_id (min
        # member id: each rep is its group's min) and the keep ranking
        # reproduce the uncollapsed output exactly; exact-copy groups
        # (n >= 2, nonzero norm) whose rep has no fuzzy edge are their
        # own cosine-1.0 cliques, zero-norm groups never pair
        comp_r = comp.select(F.col("id").alias("__rep"), "cluster_id")
        sizes = (
            comp_r.join(groups.select("__rep", "__n"), "__rep")
            .groupBy("cluster_id")
            .agg(F.sum("__n").alias("n_members"))
        )
        # r14 (guide §2.4): per-rep info (graph reps with cluster+size,
        # lone exact-copy groups as self-clusters) unions on the
        # metadata-sized side first; members expand through ONE join
        # instead of one per branch (same cut as
        # dedup.verified_neardup_clusters)
        lone = (
            groups.filter((F.col("__n") >= 2) & (F.col("__gn") > 0))
            .join(comp_r.select("__rep"), "__rep", "left_anti")
            .select(
                "__rep",
                F.col("__rep").alias("cluster_id"),
                F.col("__n").alias("n_members"),
            )
        )
        rep_info = comp_r.join(sizes, "cluster_id").select(
            "__rep", "cluster_id", "n_members"
        ).unionByName(lone)
        members = (
            member.select("id", "__rep")
            .join(rep_info, "__rep")
            .join(
                assigned.select(
                    F.col("id").alias("__rep"), "cell", "cent_cos"
                ),
                "__rep",
            )
        )
    else:
        members = comp.join(assigned.select("id", "cell", "cent_cos"), "id")
    wk = Window.partitionBy("cluster_id").orderBy(
        F.col("cent_cos").asc(), F.col("id").asc()
    )
    return members.select(
        "id",
        "cell",
        "cluster_id",
        "n_members",
        (F.row_number().over(wk) == 1).alias("keep"),
    )


def semantic_contamination(
    corpus: DataFrame,
    evalset: DataFrame,
    threshold: float = 0.28,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "vec_id",
    eval_vec_col: str = "embedding",
    validate: bool = False,
) -> DataFrame:
    """Embedding-space decontamination: flag corpus members whose
    cosine to ANY held-out eval vector clears ``threshold`` — the
    semantic complement of n-gram decontamination
    (``sampling.decontaminate``): paraphrases and translations share
    no 8-grams yet sit next to the eval item in embedding space, the
    published gap in string-match contamination checks.

    The eval set is metadata-sized by definition (benchmarks are
    thousands of rows, the corpus is billions), so it rides a
    broadcast nested-loop join: the corpus never shuffles, each
    partition streams once against the in-memory eval rows, and the
    per-id aggregation collapses hits map-side before the one
    metadata-sized shuffle of flagged ids.  For an eval side too big
    to broadcast, band BOTH sides with sign-LSH and reuse
    :func:`embedding_neardup_pairs_lsh`'s co-bucket join.  Pairwise
    cosines are sequential folds and MAX over them is order-free, so
    ``top_score`` certifies bit-exact cross-engine.

    Output: flagged rows only — ``(id, n_eval_hits, top_eval_id,
    top_score)`` where ``top_eval_id`` is the best-matching eval item
    (score desc, eval id asc); anti-join the corpus against it to
    ship the clean split, or review the report sorted by
    ``top_score``.

    ``validate=True`` (r11, VERDICT r10 #6) applies
    :func:`valid_embeddings` to BOTH sides at the gate — opt-in
    because the gate silently drops offending rows (see
    :func:`knn_bruteforce`).
    """
    if validate:
        corpus = valid_embeddings(corpus, vec_col)
        evalset = valid_embeddings(evalset, eval_vec_col)
    # guarded fan before the per-pair fold work (r6): a single-split
    # corpus scan (the single-row-group bench file; small ingest
    # batches) otherwise streams EVERY |corpus| x |eval| interpreted
    # dot through one task; on a well-split 100 TB corpus the exchange
    # is a no-op
    from ..sources import fan_out

    corpus = fan_out(corpus)
    # norms factored once per side (r6): cosine() inlined per pair
    # re-folds both norms for every (corpus, eval) combination —
    # |eval| redundant corpus-norm folds per corpus row; the factored
    # score is the same expression tree, bit-equal to the oracle
    c = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("__vn"),
    )
    e = evalset.select(
        F.col(eval_id_col).alias("eid"), F.col(eval_vec_col).alias("ev"),
        norm(F.col(eval_vec_col)).alias("__en"),
    )
    hits = (
        c.crossJoin(F.broadcast(e))
        .select(
            "id", "eid",
            (dot(F.col("v"), F.col("ev")) / (F.col("__vn") * F.col("__en")))
            .alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
    return hits.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_eval_hits"),
        F.max_by(
            F.col("eid"), F.struct(F.col("score").alias("s"), (-F.col("eid")).alias("t"))
        ).alias("top_eval_id"),
        F.max("score").alias("top_score"),
    )


def semantic_contamination_lsh(
    corpus: DataFrame,
    evalset: DataFrame,
    threshold: float = 0.28,
    planes: int | str = "auto",
    tables: int | str = "auto",
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "vec_id",
    eval_vec_col: str = "embedding",
    corpus_count: int | None = None,
    target_recall: float = 0.9,
    validate: bool = False,
) -> DataFrame:
    """Scale path for :func:`semantic_contamination`: candidate
    (corpus, eval) pairs come from multi-table sign-LSH co-bucketing
    instead of the |corpus| x |eval| broadcast product, then the SAME
    exact cosine filter and per-id report run on candidates only.

    When the eval side outgrows a broadcast (benchmark suites
    aggregated across versions, eval sets with per-example
    paraphrase expansions) or the corpus x eval product outgrows the
    cluster (the brute-force twin measured 50 s at the 50x fair
    layout for a 99k x 1k product — at 10^9 x 10^5 it is simply not
    runnable), both sides band into (tbl, bucket) rows — ``tables``
    small rows per vector, the only thing that shuffles — and the
    bucket join yields candidates with recall
    ``1 - (1 - match^planes)^tables`` (~0.97 at cosine 0.9 for 8x8;
    window ``tables`` up for looser thresholds).  The report is the
    same shape as the exact operator; hits the banding misses are the
    documented recall trade every LSH index makes.

    Same-id collisions across the two sides are NOT excluded: the
    operator treats corpus and eval as disjoint universes (dedupe
    first if they share ids, as the exact twin also assumes).

    Plan (r7 narrow-band rewrite): both sides band into VECTOR-FREE
    (id, tbl, bucket) rows, the bucket join and the (id, eid) pair
    dedup move only those ~24-byte rows, and each side's embeddings
    join back ONCE by key for the exact-cosine scoring — at 64-dim
    double embeddings and 8 tables the fat-band form shuffled every
    vector ~16x (band build + pair dedup, both sides); this form
    moves each exactly once.

    ``planes="auto"`` (default, r8) derives the plane count from the
    CORPUS side's row count (:func:`derive_planes`; the eval side is
    assumed the smaller — bucket collision work is corpus-dominated);
    ``corpus_count`` skips the derivation's count job when known
    (otherwise the auto path runs one eager ``count()`` at
    construction).  ``tables="auto"`` (default, r9, VERDICT r8 #3)
    derives the table count from (``threshold``, resolved planes) via
    the recall model (:func:`derive_tables`).  NOTE: this operator's
    default threshold (0.28) is a MODERATE-similarity design point —
    at scale-derived plane counts the 0.9-recall table count exceeds
    the 64-table cap and :func:`derive_tables` warns with the
    achievable recall; decontamination runs that need high recall at
    loose thresholds should lower ``planes`` (paying denser verify
    work) or treat the exact operator as the authority.

    ``validate=True`` (r11, VERDICT r10 #6) applies
    :func:`valid_embeddings` to BOTH sides at the gate — opt-in
    because the gate silently drops offending rows (see
    :func:`knn_bruteforce`).
    """
    if validate:
        corpus = valid_embeddings(corpus, vec_col)
        evalset = valid_embeddings(evalset, eval_vec_col)
    planes = _resolve_planes(planes, corpus, corpus_count)
    tables = _resolve_tables(tables, threshold, planes, target_recall)
    cb = _lsh_banded_narrow(corpus, "id", id_col, vec_col, planes, dim, tables)
    eb = _lsh_banded_narrow(
        evalset, "eid", eval_id_col, eval_vec_col, planes, dim, tables
    )
    cand = (
        cb.join(eb, ["tbl", "bucket"])
        .select("id", "eid")
        .dropDuplicates(["id", "eid"])
    )
    cv = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("v_norm"),
    )
    ev = evalset.select(
        F.col(eval_id_col).alias("eid"), F.col(eval_vec_col).alias("ev"),
        norm(F.col(eval_vec_col)).alias("ev_norm"),
    )
    # eval first (the usually-smaller side — AQE broadcasts it when it
    # fits), then one keyed attach of the corpus vectors
    hits = (
        cand.join(ev, "eid")
        .join(cv, "id")
        .select(
            "id", "eid",
            (dot(F.col("v"), F.col("ev")) / (F.col("v_norm") * F.col("ev_norm")))
            .alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
    return hits.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_eval_hits"),
        F.max_by(
            F.col("eid"),
            F.struct(F.col("score").alias("s"), (-F.col("eid")).alias("t")),
        ).alias("top_eval_id"),
        F.max("score").alias("top_score"),
    )
