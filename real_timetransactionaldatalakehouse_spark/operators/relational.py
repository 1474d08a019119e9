"""Relational core: projections, filters, aggregations, analytic
windows, sorts, set ops (SURVEY.md section 2 B/D/E/F/G).

Everything here is built-in Catalyst surface — predicate pushdown,
column pruning, partial+final hash aggregation, TakeOrderedAndProject
top-k all come for free; nothing needs a custom rule (SURVEY.md
section 4 conclusion).  At 100 TB the scale story per operator:

- filters/projections: pushed to the parquet scan (check
  ``PushedFilters`` in the plan);
- groupBy aggs: map-side partial aggregation bounds shuffle volume;
  Zipf-skewed keys (reference mock_content_generator.py:89-94) are
  absorbed by partial agg + AQE;
- analytic windows: partitioned by entity key — scales with key
  cardinality; no global windows in the hot path;
- top-k: ``orderBy().limit()`` compiles to TakeOrderedAndProject
  (per-partition heap + driver merge), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# --------------------------------------------------------------- windows (E*)

def dedup_latest(df: DataFrame, key_cols: list[str], order_col: str,
                 tiebreak_cols: list[str] | None = None) -> DataFrame:
    """W1/T7: keep the latest row per key (reference CDC dedup,
    ``stream_dims.py:77-80``, ``streaming_job.py:133-135``).

    ROW_NUMBER over (PARTITION BY key ORDER BY order_col DESC,
    tiebreaks DESC) == 1.  A deterministic tiebreak is mandatory for
    oracle parity (SURVEY.md section 7.3).
    """
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_latest_agg(df: DataFrame, key_cols: list[str], order_col: str,
                     tiebreak_cols: list[str] | None = None) -> DataFrame:
    """W1 as aggregation: same keep-latest-per-key result as
    :func:`dedup_latest`, expressed as ``max_by(struct(*), struct(order,
    tiebreaks))``.

    Why it exists: the window form shuffles and per-key sorts EVERY
    input row; the agg form gets map-side partial aggregation, so the
    shuffle carries at most one candidate row per key per map task —
    at 100 TB that is the difference between moving the table and
    moving the key set.  Null order/tiebreak values sort first (struct
    ordering), matching the window form's ``DESC NULLS LAST``.
    Equivalence is pinned by
    ``test_dedup_latest_agg_equals_window_form``.
    """
    ties = tiebreak_cols or []
    ord_t = F.struct(F.col(order_col), *[F.col(c) for c in ties])
    picked = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*[F.col(c) for c in df.columns]), ord_t).alias("__row")
    )
    return picked.select(*[F.col(f"__row.{c}").alias(c) for c in df.columns])


def latest_non_null_agg(df: DataFrame, key_cols: list[str], order_col: str,
                        fill_cols: list[str],
                        tiebreak_cols: list[str] | None = None) -> DataFrame:
    """W2 as aggregation: one row per key whose ``fill_cols`` each hold
    the column's latest non-null value (``max_by`` keyed on a
    conditional order tuple that is NULL when the value is NULL — null
    order keys are ignored by ``max_by``, which is exactly IGNORE
    NULLS).  Same partial-aggregation scale story as
    :func:`dedup_latest_agg`; use :func:`latest_non_null` when every
    input row must be kept."""
    ties = tiebreak_cols or []
    def ord_for(c: str):
        return F.when(
            F.col(c).isNotNull(),
            F.struct(F.col(order_col), *[F.col(t) for t in ties]),
        )
    return df.groupBy(*key_cols).agg(
        *[F.max_by(F.col(c), ord_for(c)).alias(c) for c in fill_cols]
    )


def latest_non_null(df: DataFrame, key_cols: list[str], order_col: str,
                    fill_cols: list[str], tiebreak_cols: list[str] | None = None) -> DataFrame:
    """W2: per key, fill each column with its latest non-null value
    (reference ``streaming_job.py:101-128``: ``first_value(x) IGNORE
    NULLS OVER (PARTITION BY k ORDER BY ts DESC ROWS BETWEEN UNBOUNDED
    PRECEDING AND UNBOUNDED FOLLOWING)``)."""
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in (tiebreak_cols or [])]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    out = df
    for c in fill_cols:
        out = out.withColumn(c, F.first(F.col(c), ignorenulls=True).over(w))
    return out


def max_over_partition(df: DataFrame, key_cols: list[str], col: str, alias: str) -> DataFrame:
    """W3: ``max(col) OVER (PARTITION BY key)`` (reference
    ``streaming_job.py:130-131``)."""
    w = Window.partitionBy(*key_cols)
    return df.withColumn(alias, F.max(F.col(col)).over(w))


def topk_per_group(df: DataFrame, group_cols: list[str], order_col: str, k: int,
                   tiebreak_cols: list[str] | None = None, desc: bool = True) -> DataFrame:
    """W5: ranked top-k per group (reference Dashboard.md:48 trending)."""
    first = F.col(order_col).desc() if desc else F.col(order_col).asc()
    order = [first] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def topk_per_group_salted(df: DataFrame, group_cols: list[str], order_col: str,
                          k: int, tiebreak_cols: list[str] | None = None,
                          desc: bool = True, salt: int = 16) -> DataFrame:
    """W5 under Zipf skew (SURVEY.md section 4 O13): two-phase top-k.

    A plain per-group window sorts each group in ONE partition — a key
    holding 1% of 100 TB serializes ~1 TB through a single task.  The
    salted form splits every group into ``salt`` deterministic
    sub-groups (hash of order+tiebreak cols, so the split needs no
    extra columns), takes top-k within each, then re-ranks the
    <= salt*k survivors per group — the second window's partitions are
    bounded by salt*k rows regardless of key skew.

    Exactly equal to :func:`topk_per_group` whenever (order_col,
    tiebreak_cols) is a total order within each group (same requirement
    the plain form needs for determinism anyway).
    """
    ties = tiebreak_cols or []
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in [order_col, *ties]]), F.lit(salt))
    salted = df.withColumn("__salt", salt_col)
    phase1 = topk_per_group(
        salted, [*group_cols, "__salt"], order_col, k, tiebreak_cols=ties, desc=desc
    ).drop("rank", "__salt")
    return topk_per_group(phase1, group_cols, order_col, k, tiebreak_cols=ties, desc=desc)


def sessionize(df: DataFrame, key_col: str, ts_col: str, gap_minutes: int = 30,
               tiebreak_cols: list[str] | None = None,
               session_col: str = "session_id") -> DataFrame:
    """W4: LAG-based sessionization, the reference's declared-but-unbuilt
    Silver layer (DataModel_SchemaDesign.md:47,58; moved to T+1 batch
    per PipelineArchitecture.md:217-222 to avoid streaming state).

    lag(ts) per key -> gap > threshold flag -> running sum of flags =
    session index.  Scales with key cardinality (one window partition
    per user), never a global window.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    gap_s = gap_minutes * 60
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev.isNull()
        | ((F.col(ts_col).cast("double") - prev.cast("double")) > gap_s),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn(session_col, running)


def _partition_offset_expr(offsets: list[tuple[int, int]],
                           pid_col: str = "__pid",
                           inline_max: int = 256):
    """Per-bucket offsets as an inlined CASE expression, or ``None``
    when the caller should broadcast-join an offset table instead.

    The two-phase prefix-sum operators add each bucket's offset to
    its local running values.  For metadata-sized bucket counts the
    offsets inline as literals — measured 4x cheaper than a broadcast
    hash join at bench scale (the join rebuilds its broadcast exchange
    every execution, ~0.25 s/run for a 32-row table).  Past
    ``inline_max`` the expression would bloat the plan, so the join
    path takes over.

    The CASE fails LOUDLY on a bucket id absent from the offsets pass:
    with literal-boundary bucketing every row's bucket is in
    [0, n_buckets) by construction and the offsets enumerate ALL ids,
    so the otherwise-branch is unreachable — the raise is a tripwire
    for an impossible state (a bug in the bucket expression), never a
    runtime mode."""
    if len(offsets) > inline_max:
        return None
    if not offsets:
        return F.lit(0).cast("long")
    e = F.when(F.col(pid_col) == offsets[0][0], F.lit(offsets[0][1]))
    for pid, off in offsets[1:]:
        e = e.when(F.col(pid_col) == pid, F.lit(off))
    e = e.otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "two-phase prefix sum: bucket id not enumerated by the "
                    "offsets pass (impossible under literal-boundary "
                    "bucketing - bucket-expression bug): id="
                ),
                F.col(pid_col).cast("string"),
            )
        ).cast("long")
    )
    return e.cast("long")


# --------------------------------------------- literal-boundary bucketing
#
# The two-phase prefix-sum operators (global_rank, pack_sequences,
# sampling._global_cumsum, grouped_percentiles_exact) need a row ->
# bucket assignment that is (a) monotone in the total order and (b) a
# PURE FUNCTION of the row.  repartitionByRange is neither: the
# RangePartitioner SAMPLES boundaries per job, so offsets baked from
# one execution's layout silently disagree with a re-execution's (the
# r7 fix pinned the layout with an eager localCheckpoint — correct,
# but it materializes the frame to executor disk and times the pin
# into every build).  Literal boundaries dissolve the problem: sample
# order-key boundaries ONCE at plan build, inline them as literals,
# and compute each row's bucket with a lexicographic comparator
# expression.  Bucket counts, offsets, and per-row positions are then
# layout-independent — any re-execution, any partitioning, any cache
# state produces identical results — so a plain (releasable) persist
# is a pure optimization again, not a correctness pin.
#
# Cost model at 100 TB: the comparator is boundaries x fields inline
# comparisons per row (whole-stage codegen, no shuffle); the window
# exchange hashes on the bucket id exactly where the range exchange
# used to be.  Bucket count is clamped to _MAX_BUCKETS: beyond that
# the linear comparator stops paying for itself and each bucket's
# window sort (spillable) carries data/_MAX_BUCKETS rows — the
# documented trade; a production deployment that needs 10^5 buckets
# would binary-search a broadcast boundary table JVM-side or bucket
# the table by time at write.

_MAX_BUCKETS = 512

# Adaptive bucket floor: below this many rows per bucket the
# comparator/optimizer overhead of extra boundaries outweighs the
# window parallelism they buy (a 32k-row single-task window sort is
# sub-millisecond work; a 31-boundary comparator costs ~0.5 s of
# optimizer time PER EXECUTION).  Applied only when the caller leaves
# ``partitions`` unset — an explicit value is an instruction.
_MIN_BUCKET_ROWS = 32768


def _order_specs(order_cols) -> list[tuple[Column, str]]:
    """Normalize order specs to (expr, 'asc'|'desc') pairs.  Accepts
    column names, plain Column expressions (ascending), or
    ``(name_or_column, 'asc'|'desc')`` tuples.  Sort-order Columns
    (``F.col(c).desc()``) are NOT accepted — the direction must come
    via the tuple form so the comparator can see it."""
    specs: list[tuple[Column, str]] = []
    for c in order_cols:
        if isinstance(c, tuple):
            col, d = c
            col = F.col(col) if isinstance(col, str) else col
            d = str(d).lower()
            if d not in ("asc", "desc"):
                raise ValueError(f"order direction must be asc|desc, got {d!r}")
            specs.append((col, d))
        elif isinstance(c, str):
            specs.append((F.col(c), "asc"))
        else:
            specs.append((c, "asc"))
    return specs


def _lex_lt(specs: list[tuple[Column, str]], bvals: tuple) -> Column:
    """Row strictly PRECEDES the boundary tuple in the total order.
    Null semantics match Spark's defaults: asc = nulls first, desc =
    nulls last — so the bucket assignment is monotone for any data."""
    expr: Column = F.lit(False)
    for (c, d), b in reversed(list(zip(specs, bvals))):
        if d == "asc":
            if b is None:
                lt = F.lit(False)          # nothing precedes null (nulls first)
                eq = c.isNull()
            else:
                lt = c.isNull() | (c < F.lit(b))
                eq = c.eqNullSafe(F.lit(b))
        else:
            if b is None:
                lt = c.isNotNull()         # non-null precedes null (nulls last)
                eq = c.isNull()
            else:
                lt = c.isNotNull() & (c > F.lit(b))
                eq = c.eqNullSafe(F.lit(b))
        expr = lt | (eq & expr)
    return expr


def _bucket_expr(
    specs: list[tuple[Column, str]],
    boundaries: list[tuple],
    dtypes: list[str] | None = None,
) -> Column:
    """Bucket id in [0, len(boundaries)] — the count of boundary
    tuples at or before the row.  Monotone non-decreasing in the total
    order by construction, and a pure function of the row (literal
    boundaries), so re-executions agree regardless of partitioning.

    All-ascending specs with known field types use ONE struct
    comparison per boundary (Spark's struct ordering is exactly asc
    nulls-first per field) — ~4 plan nodes per boundary instead of the
    ~10-node guarded lexicographic expansion, which matters because
    the optimizer walks this expression on every execution.  Any desc
    field falls back to the guarded form (struct ordering cannot
    express per-field direction)."""
    if dtypes is not None and all(d == "asc" for _c, d in specs):
        key = F.struct(*[c for c, _d in specs])
        e: Column = F.lit(0)
        for b in boundaries:
            blit = F.struct(
                *[F.lit(v).cast(t) for v, t in zip(b, dtypes)]
            )
            e = e + (~(key < blit)).cast("int")
        return e.cast("int")
    e = F.lit(0)
    for b in boundaries:
        e = e + (~_lex_lt(specs, b)).cast("int")
    return e.cast("int")


def _boundary_cmp(dirs: list[str]):
    """Python-side comparator matching :func:`_lex_lt`'s order (asc
    nulls first, desc nulls last) for sorting the boundary sample."""
    def cmp(a: tuple, b: tuple) -> int:
        for av, bv, d in zip(a, b, dirs):
            if av is None and bv is None:
                continue
            if d == "asc":
                if av is None:
                    return -1
                if bv is None:
                    return 1
                if av != bv:
                    return -1 if av < bv else 1
            else:
                if av is None:
                    return 1
                if bv is None:
                    return -1
                if av != bv:
                    return -1 if av > bv else 1
        return 0
    return cmp


def _sample_boundaries(
    keyed: DataFrame,
    dirs: list[str],
    n: int,
    total: int,
    oversample: int = 64,
    seed: int = 17,
) -> list[tuple]:
    """~``n - 1`` boundary tuples from a collected sample of the order
    keys (metadata-sized: ``n * oversample`` rows).  The sample only
    steers LOAD BALANCE — correctness never depends on which rows were
    sampled, because the boundaries are inlined as literals before any
    offset is computed.  Consecutive duplicate boundaries are dropped
    (they would only create empty buckets and bloat the comparator)."""
    import functools

    if n <= 1 or total <= 1:
        return []
    target = n * oversample
    frac = min(1.0, target / total)
    rows = keyed.sample(fraction=frac, seed=seed).limit(2 * target).collect()
    if not rows:
        rows = keyed.limit(target).collect()
    keys = sorted(
        (tuple(r) for r in rows),
        key=functools.cmp_to_key(_boundary_cmp(dirs)),
    )
    m = len(keys)
    out: list[tuple] = []
    for i in range(1, n):
        b = keys[(i * m) // n]
        if not out or b != out[-1]:
            out.append(b)
    return out


def _bucketed_layout(
    df: DataFrame,
    specs: list[tuple[Column, str]],
    aggs: list[Column],
    partitions: int | None = None,
    extra_cols: list[Column] | None = None,
):
    """Shared front end of the prefix-sum family: persist the NARROW
    key projection (plus ``extra_cols``, already aliased, for the
    ``aggs`` to reference), sample literal boundaries, and collect one
    row of ``aggs`` per bucket.  Returns ``(bucket_expr, per_bucket,
    keyed)`` where ``per_bucket`` maps bucket id -> agg tuple for ALL
    ids in [0, n_buckets) (empty buckets as None) and ``keyed`` is the
    still-persisted projection (caller unpersists or attaches it).
    One extra narrow pass vs the checkpointed form (count + sample +
    aggs = 3 cached reads), zero materialization of the full frame."""
    spark = df.sparkSession
    keyed = df.select(
        *[c.alias(f"__k{i}") for i, (c, _d) in enumerate(specs)],
        *(extra_cols or []),
    ).persist()
    # job 1: ONE pass for the row count AND the global agg tuple — on
    # the single-bucket path (bench-scale inputs) this is the only
    # build job, and it doubles as the cache-populating action
    g = keyed.agg(F.count(F.lit(1)).alias("__total"), *aggs).collect()[0]
    total = int(g["__total"])
    if partitions is not None:
        n = min(partitions, _MAX_BUCKETS)
    else:
        # adaptive: never more buckets than _MIN_BUCKET_ROWS-row chunks
        # of the data — extra boundaries cost optimizer time per
        # execution and buy nothing on small inputs
        n = max(1, min(
            spark.sparkContext.defaultParallelism,
            _MAX_BUCKETS,
            -(-total // _MIN_BUCKET_ROWS),
        ))
    if n == 1 or total <= 1:
        return F.lit(0).cast("int"), {0: tuple(g)[1:]}, keyed
    kspecs = [(F.col(f"__k{i}"), d) for i, (_c, d) in enumerate(specs)]
    dirs = [d for _c, d in specs]
    dtypes = [
        keyed.schema[f"__k{i}"].dataType.simpleString()
        for i in range(len(specs))
    ]
    key_only = keyed.select(*[f"__k{i}" for i in range(len(specs))])
    boundaries = _sample_boundaries(key_only, dirs, n, total)  # job 2
    bexpr = _bucket_expr(kspecs, boundaries, dtypes)
    n_buckets = len(boundaries) + 1
    rows = (
        keyed.groupBy(bexpr.alias("__b")).agg(*aggs).collect()  # job 3
    )
    per_bucket: dict[int, tuple] = {r["__b"]: tuple(r)[1:] for r in rows}
    full = {b: per_bucket.get(b) for b in range(n_buckets)}
    # re-express the bucket over the ORIGINAL spec expressions so the
    # caller can apply it to the full-width frame
    return _bucket_expr(specs, boundaries, dtypes), full, keyed


def global_rank(df: DataFrame, order_cols: list[str], rank_col: str = "pos",
                partitions: int | None = None) -> DataFrame:
    """S1: global ordering WITHOUT a single-partition window.

    Literal-boundary bucketing (see the block comment above): sample
    order-key boundaries once, bucket each row with an inline
    comparator, rank within each bucket, add per-bucket offsets from a
    metadata-sized collect.  The order keys must form a total order
    (include a unique tiebreak) so positions are well-defined; bucket
    assignment is a pure function of the row, so the result is
    IDENTICAL under any re-execution, cache drop, or input
    repartitioning — no pinned layout, no checkpoint, no full-width
    materialization (the r7 localCheckpoint form paid a full-table
    local-disk write per build; VERDICT r7 #4).

    Scales to arbitrary data: the only full-data exchange is the
    window's hash partition on the bucket id; the build passes run on
    a persisted NARROW key projection, released before return.
    """
    spark = df.sparkSession
    specs = _order_specs(order_cols)
    bexpr, per_bucket, keyed = _bucketed_layout(
        df, specs, [F.count(F.lit(1)).alias("cnt")], partitions
    )
    keyed.unpersist()  # build passes done; the output plan reads df itself
    offsets, acc = [], 0
    for b in sorted(per_bucket):
        offsets.append((b, acc))
        acc += int(per_bucket[b][0]) if per_bucket[b] else 0
    order_exprs = [c.asc() if d == "asc" else c.desc() for c, d in specs]
    w = Window.partitionBy("__b").orderBy(*order_exprs)
    off_expr = _partition_offset_expr(offsets, pid_col="__b")
    out = df.withColumn("__b", bexpr)
    if off_expr is None:
        off_df = F.broadcast(
            spark.createDataFrame(offsets, "__b int, __offset long")
        )
        out = out.join(off_df, "__b")
        off_expr = F.col("__offset")
    out = (
        out.withColumn(rank_col, F.row_number().over(w) + off_expr)
        .drop("__b", "__offset")
    )
    # plan-contract marker only: the boundary/offset collects are real
    # data passes at PLAN BUILD, but the prebuilt plan re-executes its
    # full data path on every run (literal boundaries, r8), so bench
    # times it with run_df and treats the collects as declare-time
    # constants; _layout_frames just exposes the frames to test_plans
    from .dedup import _attach_layout

    return _attach_layout(out, [df])


# ------------------------------------------------------------ aggregates (D*)

def conditional_counts(df: DataFrame, group_cols: list[Column | str],
                       cases: dict[str, Column]) -> DataFrame:
    """G2: multi-metric conditional aggregation (reference
    ``stream_content.py:125-135``): one ``count(when(cond, 1))`` per
    metric, single shuffle, partial+final hash agg."""
    aggs = [F.count(F.when(cond, F.lit(1))).alias(name) for name, cond in cases.items()]
    return df.groupBy(*group_cols).agg(*aggs)


def tumbling_window_counts(df: DataFrame, ts_col: str, duration: str,
                           group_cols: list[str], cases: dict[str, Column]) -> DataFrame:
    """G6/T2: tumbling event-time window + conditional counts — the
    batch shape of the reference's gold aggregation
    (``stream_content.py:123-144``).  Emits ``window_start``."""
    aggs = [F.count(F.when(cond, F.lit(1))).alias(name) for name, cond in cases.items()]
    return (
        df.groupBy(F.window(F.col(ts_col), duration).alias("__w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("__w.start"))
        .drop("__w")
    )


def sliding_window_counts(df: DataFrame, ts_col: str, duration: str, slide: str,
                          group_cols: list[str], cases: dict[str, Column]) -> DataFrame:
    """T9: sliding event-time windows (each row contributes to
    duration/slide windows).  The reference computes sliding rollups at
    read time over tumbling buckets; Spark's ``window(ts, size, slide)``
    expresses them directly — Catalyst expands rows to their covering
    windows before the hash agg, so the shuffle still carries partials.
    """
    aggs = [F.count(F.when(cond, F.lit(1))).alias(name) for name, cond in cases.items()]
    return (
        df.groupBy(F.window(F.col(ts_col), duration, slide).alias("__w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("__w.start"))
        .drop("__w")
    )


def resample_fill(
    df: DataFrame,
    ts_col: str,
    step: str = "1 minute",
    group_cols: list[str] | None = None,
    agg_exprs: dict[str, Column] | None = None,
    bounds: tuple | None = None,
    fill_zero: list[str] | None = None,
) -> DataFrame:
    """Time-series densify: bucket rows to ``step``, aggregate, then
    emit EVERY bucket in the observed (or given) range — gaps become
    zero/NULL rows instead of silently missing (downstream charting,
    rate math and window models all break on missing buckets).

    The bucket spine is generated with ``sequence`` + ``explode`` from
    ONE metadata-sized min/max agg — never a driver loop; with
    ``group_cols`` the spine cross-joins the distinct key set (small
    by definition for a per-key chart) and the observed aggregates
    left-join on (key, bucket).  ``fill_zero`` names the aggregates to
    zero-fill in gap rows (default ``["n"]``, the built-in count);
    other aggregates keep NULL unless coalesced by the caller.
    Explicit ``bounds`` are SNAPPED to their containing window starts
    (r9 review fix): observed buckets are window-aligned, so an
    unsnapped spine built from raw min/max event timestamps joined
    nothing and silently zero/NULL-filled every bucket.
    """
    aggs = agg_exprs or {"n": F.count(F.lit(1))}
    observed = (
        df.groupBy(*(group_cols or []), F.window(F.col(ts_col), step).alias("__w"))
        .agg(*[e.alias(name) for name, e in aggs.items()])
        .select(
            *(group_cols or []),
            F.col("__w.start").alias("bucket"),
            *[F.col(name) for name in aggs],
        )
    )
    spark = df.sparkSession
    if bounds is None:
        # bounds already snapped to window starts by the aggregation;
        # keep them as a one-row frame so the operator stays fully
        # lazy (no driver action at build time)
        bounds_df = observed.agg(
            F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
        )
    else:
        lo, hi = bounds
        # snap to the window start CONTAINING each bound — the spine
        # must land on the same grid as the observed buckets.  One
        # window() per projection: Spark rejects two time-window
        # expressions in a single select.
        bounds_df = (
            spark.range(1)
            .select(
                F.window(F.lit(str(lo)).cast("timestamp"), step)["start"].alias("__lo"),
                F.lit(str(hi)).cast("timestamp").alias("__hi_ts"),
            )
            .select(
                "__lo",
                F.window(F.col("__hi_ts"), step)["start"].alias("__hi"),
            )
        )
    spine = bounds_df.select(
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {step}"))
        ).alias("bucket")
    )
    if group_cols:
        keys = df.select(*group_cols).distinct()
        spine = keys.crossJoin(spine)
    out = spine.join(observed, [*(group_cols or []), "bucket"], "left")
    # zero-fill the named count aggregates; everything else keeps NULL
    # (a name match on the literal "n" alone left every caller-named
    # count NULL in gap rows — the exact breakage the operator exists
    # to prevent; r9 review fix)
    zero_cols = set(fill_zero) if fill_zero is not None else {"n"}
    unknown = zero_cols - set(aggs)
    if unknown:
        raise ValueError(f"fill_zero names not in agg_exprs: {sorted(unknown)}")
    for name in aggs:
        if name in zero_cols:
            out = out.withColumn(name, F.coalesce(F.col(name), F.lit(0)))
    return out


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap: str = "30 minutes",
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """T10 companion: session windows as a first-class GROUP BY unit —
    Spark's ``session_window`` (dynamic-gap event grouping) instead of
    the LAG running-sum formulation in :func:`sessionize`.  The window
    closes when no event arrives within ``gap`` of the last one; an
    event at EXACTLY last+gap still merges (verified semantics: the
    session end is exclusive only beyond last_ts + gap).  Output rows
    are one per (key, session): ``session_start`` = first event ts,
    ``session_end`` = last event ts + gap.

    Scale: Catalyst plans this as a sort-based session aggregation
    partitioned by the keys — work scales with per-key event counts,
    never a global window.  Same operator works unchanged under
    Structured Streaming with a watermark (state pruned per gap).
    Reference: the declared Silver session stitching
    (design_doc/DataModel_SchemaDesign.md:47,58).
    """
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("__w"), *key_cols)
        .agg(*[e.alias(name) for name, e in aggs.items()])
        .select(
            *key_cols,
            F.col("__w.start").alias("session_start"),
            F.col("__w.end").alias("session_end"),
            *[F.col(name) for name in aggs],
        )
    )


def mode_per_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "mode_value",
) -> DataFrame:
    """Deterministic MODE: most frequent value per group, ties broken
    by smallest value — built-in ``mode()`` is tie-nondeterministic
    across engines, so this is the count + ranked-pick formulation
    (two shuffles: (group, value) partial-agg count, then a per-group
    top-1 window over the already-aggregated counts — the window input
    is |distinct values| rows, not raw data).
    """
    counts = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("n").desc(), F.col(value_col).asc()
    )
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *group_cols,
            F.col(value_col).alias(out_col),
            F.col("n").alias("n_occurrences"),
        )
    )


def zscore_normalize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "z",
    scale: int = 4,
    integral: bool = False,
) -> DataFrame:
    """Per-group z-score feature normalization — the standard feature-
    engineering transform ((x - mean) / stddev within each group).

    Group moments come from EXACT decimal accumulation (sum x and
    sum x^2 at ``scale`` fractional digits), so the result is
    independent of Spark's partial-agg merge order and reproducible
    bit-for-bit across engines (built-in stddev is Welford-style and
    float-order dependent).  The per-group stats table is broadcast
    back onto the rows: one shuffle for the moments agg, zero for the
    enrichment join — at 100 TB the fact side never moves.

    Cross-engine caveat: the double -> decimal cast on x^2 rounds, and
    an arbitrary-precision double can land EXACTLY on a decimal tie
    (e.g. any multiple of 1/32 ends in ...5 at the 5th decimal), where
    Spark rounds HALF_UP but DuckDB HALF_EVEN.  For bit-exact
    cross-engine parity feed fixed-point inputs whose squares stay
    exact (<= scale/2 fractional digits); within Spark the result is
    always deterministic regardless.

    Degenerate groups (n = 1, or zero variance) get a NULL z instead
    of the divide-by-zero error Spark 4's default ANSI mode raises —
    the conditional guards below only evaluate the division on the
    live branch.

    ``integral=True`` declares the value column integral (caller
    proves max(x^2) x rows-per-group < 2^63): the moment sums then
    accumulate as primitive longs (whole-stage codegen) instead of
    boxed decimals — identical values for integral inputs, ~4x
    cheaper; Spark 4 ANSI mode turns a misjudged bound into an
    explicit overflow error.
    """
    n = F.count(F.lit(1))
    if integral:
        sx = F.sum(F.col(value_col).cast("long")).cast("double")
        sxx = F.sum(
            (F.col(value_col) * F.col(value_col)).cast("long")
        ).cast("double")
    else:
        sx = F.sum(F.col(value_col).cast(f"decimal(28,{scale})")).cast("double")
        sxx = F.sum(
            (F.col(value_col) * F.col(value_col)).cast(f"decimal(28,{scale})")
        ).cast("double")
    stats = df.groupBy(*group_cols).agg(
        sx.alias("__sx"), sxx.alias("__sxx"), n.alias("__n")
    )
    mean = F.col("__sx") / F.col("__n")
    # clamp the moment-form variance at 0 before sqrt (r9 review fix):
    # sxx - sx*sx/n can round to a TINY NEGATIVE on constant-valued
    # groups, sqrt then yields NaN, and Spark orders NaN ABOVE every
    # number — so the __sd > 0 zero-variance guard below took the live
    # branch and emitted NaN z instead of the documented NULL.
    sd = F.when(
        F.col("__n") > 1,
        F.sqrt(F.greatest(
            (F.col("__sxx") - F.col("__sx") * F.col("__sx") / F.col("__n"))
            / (F.col("__n") - F.lit(1)),
            F.lit(0.0),
        )),
    )
    stats = stats.select(
        *group_cols, mean.alias("__mean"), sd.alias("__sd")
    )
    z = F.when(
        F.col("__sd") > 0,
        (F.col(value_col) - F.col("__mean")) / F.col("__sd"),
    )
    return (
        df.join(F.broadcast(stats), group_cols)
        .withColumn(out_col, z)
        .drop("__mean", "__sd")
    )


def robust_scale(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "scaled",
) -> DataFrame:
    """Per-group robust scaling ((x - median) / IQR) — the outlier-
    resistant companion to :func:`zscore_normalize` (a handful of
    extreme rows moves mean/stddev arbitrarily but not the quartiles),
    the standard feature transform for heavy-tailed metrics.

    Group stats come from the exact interpolated-rank ``percentile``
    (same cross-engine definition as DuckDB's ``quantile_cont`` — the
    q_agg_percentile precedent), broadcast back onto the rows: one
    shuffle for the quartile agg, zero for the enrichment join — the
    fact side never moves.  At 100 TB swap ``percentile`` for
    ``percentile_approx`` (mergeable t-digest) behind the same
    signature.  Zero-IQR groups yield NULL (ANSI-safe guard)."""
    stats = df.groupBy(*group_cols).agg(
        # backtick-quoted so legal-but-non-identifier column names
        # ("response time", dotted names) parse instead of raising —
        # every other path here goes through F.col (r9 review fix).
        # r13: ONE array-argument percentile instead of three scalar
        # aggregates — each scalar percentile keeps its own buffer of
        # every group value and sorts it independently, so the array
        # form cuts the agg-buffer memory and the sort work 3x with
        # bit-identical interpolated values (same buffer, same
        # per-quantile interpolation tree).
        F.expr(
            f"percentile(`{value_col}`, array(0.5, 0.75, 0.25))"
        ).alias("__p"),
    ).select(
        *group_cols,
        F.col("__p")[0].alias("__med"),
        (F.col("__p")[1] - F.col("__p")[2]).alias("__iqr"),
    )
    scaled = F.when(
        F.col("__iqr") > 0,
        (F.col(value_col) - F.col("__med")) / F.col("__iqr"),
    )
    return (
        df.join(F.broadcast(stats), group_cols)
        .withColumn(out_col, scaled)
        .drop("__med", "__iqr")
    )


def spike_detect(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    bin_seconds: int = 600,
    threshold: float = 3.0,
    include_new: bool = False,
) -> DataFrame:
    """Traffic-spike detection per entity — the batch twin of the
    reference's "Supernova" chaos scenario (a virally boosted entity
    must surface on the dashboard; design_doc/MockEventGenerator.md:
    156-163): for each key, the event count in the LATEST time bin
    against the entity's average count over its earlier bins, flagged
    when the ratio clears ``threshold``.

    Plan shape (100 TB-safe): one partial+final count keyed by
    (key, bin); the single-row global MAX(bin) broadcasts back onto
    the binned counts (never the raw events); one more keyed agg folds
    each entity's history into (recent, baseline).  Raw events shuffle
    exactly once, as (key, bin) partial counts.  Bins derive from
    second-truncated epochs so both engines bin identically.

    Binning uses FLOOR division, not Spark's ``DIV`` (which truncates
    toward zero): for pre-1970 timestamps the epoch is negative and the
    two roundings assign different bins, diverging from the DuckDB
    ``//`` (floor) oracle.  ``pmod`` keeps the arithmetic all-integer —
    ``(a - pmod(a, b)) DIV b`` is exact floor division for any long."""
    bin_col = F.expr(
        f"(CAST(date_trunc('second', `{ts_col}`) AS LONG)"
        f" - pmod(CAST(date_trunc('second', `{ts_col}`) AS LONG), {bin_seconds}))"
        f" DIV {bin_seconds}"
    )
    binned = (
        df.select(*key_cols, bin_col.alias("__bin"))
        .groupBy(*key_cols, "__bin")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    last = binned.agg(F.max("__bin").alias("__last"))
    per_key = (
        binned.join(F.broadcast(last))
        .groupBy(*key_cols)
        .agg(
            F.sum(F.when(F.col("__bin") == F.col("__last"), F.col("__cnt"))
                  .otherwise(F.lit(0))).alias("recent_cnt"),
            F.sum(F.when(F.col("__bin") < F.col("__last"), F.col("__cnt"))
                  .otherwise(F.lit(0))).alias("__base_sum"),
            F.count(F.when(F.col("__bin") < F.col("__last"), F.lit(1)))
            .alias("__base_bins"),
        )
    )
    base_avg = F.col("__base_sum").cast("double") / F.col("__base_bins")
    # the default compares an entity against ITS OWN history, so a key
    # whose first-ever events all land in the latest bin has no
    # baseline and emits no row.  include_new=True surfaces those keys
    # too — base_avg/spike_ratio NULL, is_spike TRUE (a burst from zero
    # history is definitionally a spike; the Supernova launch case) —
    # as an OPT-IN because the ratio-based contract and its certified
    # oracle are defined over entities with history (r9 review note).
    has_hist = F.col("__base_bins") > 0
    out = per_key if include_new else per_key.filter(has_hist)
    return out.select(
        *key_cols,
        "recent_cnt",
        F.when(has_hist, base_avg).alias("base_avg"),
        F.when(has_hist, F.col("recent_cnt") / base_avg).alias("spike_ratio"),
        F.when(has_hist, F.col("recent_cnt") / base_avg > F.lit(threshold))
        .otherwise(F.lit(True)).alias("is_spike"),
    )


def funnel_stages(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    steps: list[tuple[str, Column]],
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the first timestamp of
    each step REACHED IN ORDER (step k counts only at/after the user's
    step-(k-1) time) and the final stage index — the conversion-funnel
    primitive (view -> click -> purchase).

    Plan: one filtered min-ts aggregation per step, each keyed by the
    user column and joined to the previous step's result (inner join
    keyed by user; the join input is the per-user stage table, not raw
    events).  K steps = K keyed aggregations of the step's filtered
    subset + K-1 narrow joins — no windows over raw data, no
    collect_list of a user's history; every shuffle carries per-user
    partials.

    Pre-partitioning events by the user column was tried and REJECTED
    (r10, VERDICT r9 #2 measured): repartition(user) does remove the
    per-step agg exchanges, but it shuffles FULL event rows once where
    the current shape shuffles only each step's filtered per-user
    partials — measured slower at both scales (sf0.1 0.425 s vs
    0.368 s; 50x replica 2.14 s vs 1.77 s), and exchange reuse cannot
    rescue it because the step filters push below the repartition,
    making the exchange subtrees distinct.  The K re-scans of the
    source are the cheap part (columnar, pushed filters); callers with
    an expensive upstream (joins/UDFs before the funnel) should
    persist that input instead.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    name0, cond0 = steps[0]
    cur = (
        df.filter(cond0)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(f"t_{name0}"))
    )
    out = cur
    prev_ts = f"t_{name0}"
    for name, cond in steps[1:]:
        nxt = (
            df.filter(cond)
            .join(out.select(user_col, prev_ts), user_col)
            .filter(F.col(ts_col) >= F.col(prev_ts))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{name}"))
        )
        out = out.join(nxt, user_col, "left")
        prev_ts = f"t_{name}"
    stage = sum(
        (F.when(F.col(f"t_{n}").isNotNull(), 1).otherwise(0) for n, _ in steps),
        F.lit(0),
    )
    return out.withColumn("stage", stage.cast("int"))


def grouped_percentiles_exact(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: dict[str, float],
    partitions: int | None = None,
) -> DataFrame:
    """EXACT interpolated percentiles per group as distributed order
    statistics — the shape that survives LOW-cardinality group sets
    at corpus scale, where the classic ``percentile()`` aggregate
    funnels every value into one reducer per group (3 dashboard
    groups over 30M rows = three near-serial sorts; measured 12.0 s
    at the 50x replica vs 1.6 s for this formulation).

    Plan: (1) one parallel hash agg collapses rows to
    ``(group, value, count)`` (map-side combine; duplicate-heavy
    metric columns collapse hard, distinct-valued ones pass through
    but stay FULLY parallel); (2) bucket by LITERAL ``(group, value)``
    boundaries (pure function of the row — layout-independent, no
    pinned materialization) and build each group's running count with
    the two-phase prefix sum (per-bucket windows + a metadata-sized
    per-(bucket, group) totals collect — sized by |groups| x
    |buckets|, so this operator is for dashboard-scale group sets;
    HIGH-cardinality groups don't have the funnel problem and should
    keep the plain aggregate); (3) each needed order statistic
    ``k`` lives in the single row whose count interval covers it
    (``cum - c < k <= cum``) — filter those rows and one tiny final
    agg interpolates ``v_lo * (1 - frac) + v_hi * frac`` — that
    EXACT tree, not the algebraically-equal ``v_lo + frac *
    (v_hi - v_lo)``: both Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` evaluate the two-sided form, and the one-sided
    form differs by 1 ulp on real data (caught by the sf0.001 parity
    gate) — so results stay bit-identical to both.

    ``probs`` maps output column name -> quantile in [0, 1].
    Output: one row per group: ``(group, <name>...)``.
    """
    import math

    from pyspark.sql import Window

    spark = df.sparkSession
    g, v = F.col(group_col), F.col(value_col)
    gtype = df.schema[group_col].dataType.simpleString()
    # NULL semantics (r9 review fix): percentile() and quantile_cont
    # IGNORE null values — unfiltered, a null both inflated the group
    # size and occupied the lowest rank, silently shifting every
    # percentile.  Groups whose values are ALL null re-enter at the
    # end with NULL outputs (the left join below), matching the
    # aggregates; NULL group KEYS are first-class via null-safe joins
    # and matches throughout.
    cnt = df.filter(v.isNotNull()).groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("__c")
    ).persist()
    # literal-boundary buckets over (group, value): the bucket is a
    # pure function of the row, so the per-(bucket, group) offsets
    # collected below stay valid under any re-execution or cache drop
    # — no pinned layout needed (the persist is an optimization; the
    # offset pass and the output pass both read the collapsed frame)
    specs = _order_specs([group_col, value_col])
    # job 1: per-group row counts + value counts in ONE pass (also the
    # cache-populating action); the distinct-pair total drives the
    # adaptive bucket count, and on the single-bucket path the same
    # rows ARE the offsets — no further build job
    per_group = (
        cnt.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__rows"), F.sum("__c").alias("t"))
        .collect()
    )
    total = sum(int(r["__rows"]) for r in per_group)
    if partitions is not None:
        n = min(partitions, _MAX_BUCKETS)
    else:
        n = max(1, min(
            spark.sparkContext.defaultParallelism,
            _MAX_BUCKETS,
            -(-total // _MIN_BUCKET_ROWS),
        ))
    if n == 1 or total <= 1:
        bexpr = F.lit(0).cast("int")
        totals = sorted(
            ((0, r[group_col], r["t"]) for r in per_group),
            key=lambda x: (x[1] is not None, x[1], x[0]),
        )
    else:
        keyed = cnt.select(g.alias("__k0"), v.alias("__k1"))
        dtypes = [gtype, df.schema[value_col].dataType.simpleString()]
        boundaries = _sample_boundaries(keyed, ["asc", "asc"], n, total)
        bexpr = _bucket_expr(specs, boundaries, dtypes)
        # per-(bucket, group) totals: |groups| x |buckets| rows
        totals = sorted(
            ((r["__b"], r[group_col], r["t"]) for r in
             cnt.groupBy(bexpr.alias("__b"), group_col)
             .agg(F.sum("__c").alias("t")).collect()),
            key=lambda x: (x[1] is not None, x[1], x[0]),
        )
    group_n: dict = {}
    offsets: list[tuple[int, object, int]] = []
    for pid, grp, t in totals:
        offsets.append((pid, grp, group_n.get(grp, 0)))
        group_n[grp] = group_n.get(grp, 0) + int(t)
    # needed 1-based positions per group: floor/ceil of rank (n-1)*p
    targets: dict = {}
    for grp, n_g in group_n.items():
        pos = set()
        for p in probs.values():
            rk = (n_g - 1) * p
            pos.add(math.floor(rk) + 1)
            pos.add(math.ceil(rk) + 1)
        targets[grp] = sorted(pos)
    if not offsets:  # no non-null values: every group gets NULL outputs
        cnt.unpersist()
        return df.select(group_col).distinct().select(
            group_col, *[F.lit(None).cast("double").alias(k) for k in probs]
        )
    off_df = F.broadcast(spark.createDataFrame(
        [(p, grp, o) for p, grp, o in offsets],
        f"__b int, {group_col} {gtype}, __off long",
    ))
    w = Window.partitionBy("__b", group_col).orderBy(v).rowsBetween(
        Window.unboundedPreceding, 0
    )
    # null-safe group key joins: a NULL group is a real group to
    # GROUP BY, and a plain equi-join would silently drop it
    binned = cnt.withColumn("__b", bexpr)
    cum = (
        binned.join(
            off_df,
            (binned["__b"] == off_df["__b"])
            & binned[group_col].eqNullSafe(off_df[group_col]),
        )
        .drop(off_df["__b"]).drop(off_df[group_col])
        .withColumn("__cum", F.sum("__c").over(w) + F.col("__off"))
    )
    pos_df = F.broadcast(spark.createDataFrame(
        [(grp, k) for grp, ks in targets.items() for k in ks],
        f"{group_col} {gtype}, __k long",
    ))
    hits = cum.join(
        pos_df, cum[group_col].eqNullSafe(pos_df[group_col])
    ).drop(pos_df[group_col]).filter(
        (F.col("__cum") - F.col("__c") < F.col("__k"))
        & (F.col("__k") <= F.col("__cum"))
    ).select(group_col, "__k", value_col)
    aggs = []
    for name, p in probs.items():
        lo_of, hi_of, frac_of = {}, {}, {}
        for grp, n_g in group_n.items():
            rk = (n_g - 1) * p
            lo_of[grp] = math.floor(rk) + 1
            hi_of[grp] = math.ceil(rk) + 1
            frac_of[grp] = rk - math.floor(rk)

        def _is_grp(grp):
            # null-safe literal match (g == lit(None) is NULL, never true)
            return g.isNull() if grp is None else (g == F.lit(grp))

        def _match(of):
            e = None
            for grp, k in of.items():
                c = _is_grp(grp) & (F.col("__k") == F.lit(k))
                e = c if e is None else e | c
            return e

        v_lo = F.max(F.when(_match(lo_of), F.col(value_col)))
        v_hi = F.max(F.when(_match(hi_of), F.col(value_col)))
        frac = None
        for grp, fr in frac_of.items():
            frac = (F.when(_is_grp(grp), F.lit(fr)) if frac is None
                    else frac.when(_is_grp(grp), F.lit(fr)))
        frac = F.max(frac)
        aggs.append(
            (v_lo * (F.lit(1.0) - frac) + v_hi * frac)
            .cast("double").alias(name)
        )
    out = hits.groupBy(group_col).agg(*aggs)
    # groups whose values were ALL null dropped out at the filter;
    # percentile()/quantile_cont still emit their group row with NULL —
    # restore them with a left join from the distinct group set (the
    # operator targets dashboard-scale group sets, so this side is
    # metadata-sized).  eqNullSafe keeps a NULL group joinable.
    all_groups = df.select(group_col).distinct()
    # rename the right-side key before joining: post-join drop by a
    # df-qualified column resolved ambiguously here and nulled the
    # unmatched groups' keys
    out_r = out.withColumnRenamed(group_col, "__og")
    out = (
        all_groups.join(
            out_r, F.col(group_col).eqNullSafe(F.col("__og")), "left"
        )
        .select(group_col, *[F.col(k) for k in probs])
    )
    from .dedup import _attach_cached, _attach_layout

    out = _attach_layout(out, [cnt])

    return _attach_cached(out, [cnt])


def grouped_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: dict[str, float],
    exact: bool = False,
    accuracy: int = 10_000,
    partitions: int | None = None,
) -> DataFrame:
    """Grouped percentiles with the AT-SCALE default (VERDICT r8 #4):
    ``exact=False`` computes every quantile in ONE hash-aggregate pass
    with ``percentile_approx`` — Spark's Greenwald-Khanna sketch
    aggregate, whose partials are mergeable, so the plan is a plain
    partial/final agg (map-side sketch per partition, one narrow
    shuffle of O(accuracy)-sized sketches per group, no sort, no
    window, no driver-side offsets).  This is the form SURVEY names
    as the 100-TB swap for the robust-scale family: exact grouped
    percentiles are intrinsically sort-heavy (the 50x replica rows
    sat at 2.9-4.7x the oracle), while the sketch scans once and
    shuffles kilobytes.

    ERROR BOUND (documented contract, pinned by
    ``test_grouped_percentiles_approx_rank_bound``): percentile_approx
    returns an ACTUAL element of the group whose rank differs from
    ``floor(p * n)`` by at most ``n / accuracy`` — a rank guarantee,
    not a value guarantee (value error follows the local density; no
    interpolation between elements, so results are NOT bit-comparable
    to the exact form's interpolated statistic).  ``accuracy=10000``
    (Spark's default) bounds rank error to 0.01% of the group.

    ONE SKETCH, ALL QUANTILES (measured, 50x replica / 30M rows):
    the quantile list rides as percentile_approx's ARRAY argument so
    every requested quantile reads the same per-group sketch —
    inserts dominate GK cost and reads are free, so two separate
    sketches at accuracy=10000 cost 5.58 s where the shared sketch
    costs 1.80 s (vs 0.95 s for DuckDB's exact quantile_cont = 1.9x,
    and vs 4.10 s for this repo's exact form — the sketch wins
    exactly where SURVEY said it must).  Accuracy is a linear
    insert-cost knob if a caller wants more margin (4000 measured
    1.23 s at the same replica).

    ``exact=True`` dispatches to :func:`grouped_percentiles_exact` —
    the interpolated, oracle-certified, bit-identical-to-DuckDB form
    (``q_agg_percentile``); keep it for certification and for
    dashboard-sized group sets where exactness is the point."""
    if exact:
        return grouped_percentiles_exact(
            df, group_col, value_col, probs, partitions=partitions
        )
    items = list(probs.items())
    sk = df.groupBy(group_col).agg(
        F.percentile_approx(
            F.col(value_col),
            F.array(*[F.lit(float(p)) for _, p in items]),
            F.lit(int(accuracy)),
        ).alias("__q")
    )
    return sk.select(
        group_col,
        *[
            F.col("__q")[i].cast("double").alias(name)
            for i, (name, _) in enumerate(items)
        ],
    )
