"""Event-time windowed constraint profiling with watermarks
(SURVEY.md §2.9): the streaming twin of the per-partition constraint
pass — tumbling event-time windows aggregated incrementally, late data
admitted up to the watermark and dropped past it, finalized windows
emitted exactly once in append mode.

This is the plan Structured Streaming is built for: stateful
windowed HashAggregate with watermark-based state eviction — state is
O(open windows x groups), never O(stream), so it runs indefinitely at
10^12-row scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_profile_stream(
    stream_df: DataFrame,
    ts_col: str,
    value_cols: list[str],
    window_duration: str = "10 minutes",
    watermark_delay: str = "5 minutes",
    group_col: str | None = None,
    slide_duration: str | None = None,
) -> DataFrame:
    """Per-window (optionally per-group) profile statistics:
    count, per-column null count / min / max / mean. Append-mode
    emission happens when the watermark passes the window end, so each
    window's row is final — suitable for direct verdict evaluation.

    ``slide_duration`` < ``window_duration`` makes the windows SLIDING
    (each row lands in window_duration/slide_duration overlapping
    windows); state is still O(open windows x groups) and the
    watermark still finalizes/evicts each window as its end passes."""
    win = (
        F.window(F.col(ts_col), window_duration, slide_duration)
        if slide_duration
        else F.window(F.col(ts_col), window_duration)
    )
    keys: list[Column] = [win.alias("win")]
    if group_col:
        keys.append(F.col(group_col))
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in value_cols:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"nulls_{c}"),
            F.min(col).alias(f"min_{c}"),
            F.max(col).alias(f"max_{c}"),
            F.avg(col).alias(f"mean_{c}"),
        ]
    return (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(*keys)
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *([group_col] if group_col else []),
            "n",
            *[f"{s}_{c}" for c in value_cols for s in ("nulls", "min", "max", "mean")],
        )
    )


def session_stats_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_ms: int,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of ``relational.sessionize`` + ``session_stats``:
    per-key gap sessions over an unbounded stream via Spark's built-in
    ``session_window`` — the engine merges/extends open session state
    incrementally and the watermark closes a session once no event can
    extend it, so append mode emits each session exactly once, final.

    Gap semantics: ``session_window`` keeps an event in the session
    while the gap is STRICTLY below its duration, so passing
    ``gap_ms + 1`` makes it match the batch operator's inclusive
    ``gap <= gap_ms`` contract exactly (integer-ms event times) —
    asserted by the batch/stream differential test.

    State is O(open sessions), never O(stream): at 10^12 events the
    per-key state is one (start, end, count) triple that merges
    map-side, the same scale story as the windowed profile."""
    win = F.session_window(F.col(ts_col), f"{gap_ms + 1} milliseconds")
    return (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(F.col(key_col), win.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.unix_millis(F.col("w.start").cast("timestamp")).alias("start_ms"),
            F.col("n_events"),
        )
    )
