"""Relational operators Spark lacks as built-ins, expressed as single
window passes so they survive skewed keys at scale.

As-of join: the scale-safe realization is NOT ``left.join(right,
on=key).filter(r_ts <= l_ts).groupBy(...).max()`` — that join is
O(|left_k| x |right_k|) per key and a hot key (a power user with many
events on both sides) makes the intermediate quadratic.  Instead we
union both sides into one stream, sort once per key, and carry the
most recent right-side timestamp forward with ``last(..., ignorenulls)``
over a running window.  One shuffle (the sort), no join product, and
AQE can still split a skewed key's sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_last(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (or ``<`` when ``strict``) sharing the
    ``on`` key, as one union + window pass.

    Returns the left rows (all original columns) plus
    ``asof_<right_ts>`` and ``asof_<c>`` for each requested value
    column; left rows with no prior right row carry nulls (left-join
    semantics — filter them out for inner semantics).
    """
    value_cols = value_cols or []
    # Tag sides; right sorts before left at equal timestamps so that a
    # right row at exactly left_ts is visible under <= semantics.  For
    # strict (<) semantics, right sorts after left at equal ts.
    # __tie makes the pick among right rows TIED on (key, right_ts)
    # deterministic (content hash; the highest-hash row wins) — without
    # it, last(..., ignorenulls) would return whichever tied row the
    # shuffle happened to order last, so asof_<c> could differ per run.
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(1 if strict else 0).alias("__side"),
        F.xxhash64(F.col(right_ts), *[F.col(c) for c in value_cols]).alias("__tie"),
        F.col(right_ts).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(0 if strict else 1).alias("__side"),
        F.lit(0).cast("long").alias("__tie"),
        F.lit(None).cast(r.schema["__r_ts"].dataType).alias("__r_ts"),
        *[
            F.lit(None).cast(r.schema[f"__r_{c}"].dataType).alias(f"__r_{c}")
            for c in value_cols
        ],
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    r = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType))
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        "__side",
        "__l",
        F.last("__r_ts", ignorenulls=True).over(w).alias(f"asof_{right_ts}"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    keep_side = 0 if strict else 1
    out = carried.filter(F.col("__side") == keep_side)
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        f"asof_{right_ts}",
        *[f"asof_{c}" for c in value_cols],
    )


def _ms(col: Column) -> Column:
    """Epoch milliseconds; NTZ timestamps go through a session-UTC
    cast first (the repo-wide convention matching DuckDB's naive
    epoch_ms — __spark_entry__.py:214)."""
    return F.unix_millis(col.cast("timestamp"))


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_ms: int,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessionization: consecutive events of one key belong
    to the same session while the inter-event gap stays <= ``gap_ms``
    milliseconds; a larger gap starts a new session.

    One shuffle (the per-key sort), two stacked window passes Catalyst
    fuses into a single Window node chain: lag -> boundary flag ->
    running sum = 1-based ``session_seq``.  ``order_cols`` breaks
    timestamp ties deterministically (default: the key-local ordering
    is (ts, <first extra col>) — pass e.g. the event id).

    Adds ``session_seq`` (per-key session ordinal) and ``session_id``
    ("<key>#<seq>").  Aggregate with ``session_stats`` for per-session
    rows.  At 10^12 events this is the same plan as any keyed window:
    skewed users split by AQE, nothing driver-side.
    """
    order_cols = order_cols or []
    ordering = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*ordering)
    ms = _ms(F.col(ts_col))
    prev = F.lag(ms).over(w)
    new_sess = F.when(prev.isNull() | ((ms - prev) > gap_ms), F.lit(1)).otherwise(F.lit(0))
    out = df.withColumn("__new", new_sess)
    out = out.withColumn(
        "session_seq",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("int"),
    ).drop("__new")
    return out.withColumn(
        "session_id",
        F.concat(F.col(key_col).cast("string"), F.lit("#"), F.col("session_seq").cast("string")),
    )


def session_stats(sessions: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    """Per-session aggregate over a ``sessionize`` result: start/end
    millis, event count, duration.  One groupBy on (key, session_seq)
    — the same shuffle key as the sessionize sort, so with matching
    partitioning Catalyst reuses the exchange."""
    ms = _ms(F.col(ts_col))
    return sessions.groupBy(key_col, "session_seq").agg(
        F.min(ms).alias("start_ms"),
        F.max(ms).alias("end_ms"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max(ms) - F.min(ms)).alias("duration_ms"),
    )
