"""Custom stateful streaming operators (T-family EXT): per-key state
that Spark's built-in streaming aggregations cannot express —
order-sensitive folds like an exponentially-weighted moving average,
where each event's contribution depends on everything seen before it.

Built on ``applyInPandasWithState``: state lives in the state store
(checkpointed, exactly-once under replay), arrives and leaves the
Python worker as Arrow batches, and is BOUNDED by an event-time
timeout when a watermark is set — at 100 TB of keys the idle ones
expire instead of accumulating forever.  This is the escape hatch the
engine reserves for genuinely stateful semantics; everything
expressible as a built-in windowed aggregation stays in
``streaming/jobs.py`` on the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def ewma_by_key(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    tiebreak_col: str | None = None,
    watermark: str | None = None,
):
    """Per-key streaming EWMA: ``ew = alpha * v + (1 - alpha) * ew``
    folded over events in (ts, tiebreak) order, with the running state
    carried ACROSS micro-batches in the state store.

    Emits one row per key per micro-batch the key appears in:
    ``(key, n_events, ewma, last_ts_s)`` — monotonically increasing
    ``n_events`` makes "latest emission per key" well-defined for
    readers.  Within a batch, rows are sorted by (ts, tiebreak) before
    folding so the result is independent of Arrow batch boundaries;
    across batches the source must deliver time-ordered chunks (true
    for the bronze replay and any log-ordered source) for the fold to
    equal the batch computation — the deterministic-replay test pins
    exactly that.

    With ``watermark`` set, idle keys time out at the event-time
    watermark and their state is removed — state size tracks ACTIVE
    keys, not ever-seen keys.
    """
    import pandas as pd  # noqa: F401 (worker-side)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType([
        StructField(key_col, LongType()),
        StructField("n_events", LongType()),
        StructField("ewma", DoubleType()),
        StructField("last_ts_s", LongType()),
    ])
    state_schema = StructType([
        StructField("n", LongType()),
        StructField("ew", DoubleType()),
        StructField("last_s", LongType()),
    ])
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
            yield  # pragma: no cover - makes this a generator

        (k,) = key
        n, ew, last_s = state.get if state.exists else (0, None, 0)
        batch = pd.concat(list(pdfs)).sort_values(order)
        for _, row in batch.iterrows():
            v = float(row[value_col])
            ew = v if ew is None else alpha * v + (1.0 - alpha) * ew
            n += 1
            last_s = int(pd.Timestamp(row[ts_col]).value // 1_000_000_000)
        state.update((n, ew, last_s))
        if watermark is not None:
            # Expire once the event-time watermark passes the last event.
            # The timeout must be STRICTLY above the current watermark:
            # last_s truncates to whole seconds, so an event that passed
            # the late-data filter can still truncate below the watermark
            # (e.g. watermark 100500 ms, event 100600 ms -> 100000 ms), and
            # setTimeoutTimestamp throws for timestamps <= watermark,
            # killing the query.  Round the event second UP and clamp to
            # watermark + 1 ms.
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max((last_s + 1) * 1000, wm_ms + 1))
        yield pd.DataFrame(
            [{key_col: k, "n_events": n, "ewma": ew, "last_ts_s": last_s}]
        )

    src = stream_df
    timeout = GroupStateTimeout.NoTimeout
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
    return (
        src.groupBy(key_col)
        .applyInPandasWithState(update, out_schema, state_schema, "update", timeout)
    )


def ewma_batch_oracle(df: DataFrame, key_col: str, ts_col: str,
                      value_col: str, alpha: float = 0.3,
                      tiebreak_col: str | None = None) -> DataFrame:
    """Batch twin of :func:`ewma_by_key`'s FINAL state: fold the
    time-ordered per-key value sequence with ``aggregate`` — pure
    built-in expressions, one shuffle on the key.  Used by the
    multi-batch deterministic-replay test
    (``test_ewma_stream_multibatch_replay_equals_batch_oracle``) and
    the oracle-checked declared query ``q_ewma_state`` (DuckDB
    ``list_reduce`` replicates the identical left-to-right double
    fold, so the hash compare is bit-exact)."""
    order_cols = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    ordered = (
        df.select(
            F.col(key_col),
            F.col(ts_col),
            *( [F.col(tiebreak_col)] if tiebreak_col else [] ),
            F.col(value_col).cast("double").alias("__v"),
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy(key_col).orderBy(*order_cols)
            ),
        )
    )
    seq = ordered.groupBy(key_col).agg(
        F.array_sort(F.collect_list(F.struct("__rn", "__v"))).alias("__s"),
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.col(ts_col)).alias("__max_ts"),
    )
    fold = F.aggregate(
        F.col("__s"),
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x["__v"]).otherwise(
            F.lit(alpha) * x["__v"] + F.lit(1.0 - alpha) * acc
        ),
    )
    return seq.select(
        F.col(key_col),
        F.col("n_events"),
        fold.alias("ewma"),
        F.unix_timestamp(F.col("__max_ts")).alias("last_ts_s"),
    )
