"""True stateful Structured Streaming drift detection via
``applyInPandasWithState`` (SURVEY.md §2.9): each group key carries an
arbitrary streaming kernel (CUSUM / PageHinkley / ADWIN / DDM / a
StreamingEnsemble — anything with ``update`` + ``drift_state`` +
``snapshot``) whose state persists ACROSS micro-batches in Spark's
GroupState, so detection is genuinely incremental — no growing window
re-scan, no driver-held state, checkpoint/restore handled by the
streaming engine.

The kernel object is pickled into a single binary state column; at
10^12-row scale the state per key is O(kernel) (a few KB), and keys
shard across executors. Within a micro-batch ALL of a group's Arrow
chunks are concatenated and sorted once by ``order_col`` before the
kernel sees any row — ``applyInPandasWithState`` guarantees no order
across chunks, so a per-chunk sort would silently interleave rows
once a group exceeds one Arrow batch (~10k rows). Across
micro-batches ordering is the stream's arrival order (the standard
streaming contract — use event-time windows upstream if late data
must be reordered).
"""

from __future__ import annotations

import pickle

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "group string, batch_rows long, total_samples long, "
    "state string, n_drift long, statistic double, threshold double"
)
STATE_SCHEMA = "kernel binary"


def stateful_detector_stream(
    stream_df: DataFrame,
    factory,
    group_col: str,
    order_col: str,
    value_cols: list[str],
    output_mode: str = "update",
) -> DataFrame:
    """Attach a per-group streaming kernel to an input stream; emits
    one summary row per (group, micro-batch): rows seen, cumulative
    sample count, the kernel's drift state after the batch, how many
    samples alarmed within the batch, and the kernel's (statistic,
    threshold) snapshot."""
    n_vals = len(value_cols)

    def update_fn(key, pdf_iter, state: GroupState):
        det = pickle.loads(state.get[0]) if state.exists else factory()
        n = 0
        n_drift = 0
        last = None
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(order_col)
            vals = [pdf[c].to_numpy() for c in value_cols]
            for i in range(len(pdf)):
                if n_vals == 1:
                    last = det.update(vals[0][i])
                else:
                    last = det.update(vals[0][i], vals[1][i])
                if last == "drift":
                    n_drift += 1
                n += 1
        state.update((pickle.dumps(det),))
        stat, thr = det.snapshot()
        yield pd.DataFrame(
            {
                "group": [str(key[0])],
                "batch_rows": [n],
                "total_samples": [int(getattr(det, "total_samples", n))],
                "state": [last],
                "n_drift": [n_drift],
                "statistic": [float(stat)],
                "threshold": [float(thr)],
            }
        )

    return (
        stream_df.groupBy(group_col)
        .applyInPandasWithState(
            update_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode=output_mode,
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
