"""Structured Streaming incremental validation (SURVEY.md §2.9): drive
a file-source stream through foreachBatch, each micro-batch validated
as one partition-batch of the sequential drift state machine — the
true-incremental mode of the engine."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from menelaus_spark.checks.hdm import HDDDM


def test_foreach_batch_incremental_hdddm(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    out = []

    # three micro-batch files: two reference-like, one drifted
    rng = np.random.default_rng(5)
    frames = [
        pd.DataFrame({"dur_ms": rng.normal(1000, 100, 300), "sr_hz": rng.normal(16000, 10, 300)}),
        pd.DataFrame({"dur_ms": rng.normal(1000, 100, 300), "sr_hz": rng.normal(16000, 10, 300)}),
        pd.DataFrame({"dur_ms": rng.normal(4000, 100, 300), "sr_hz": rng.normal(16000, 10, 300)}),
    ]
    det = HDDDM(detect_batch=2, seed=42)

    import os

    os.makedirs(src)
    for i, f in enumerate(frames):
        spark.createDataFrame(f).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("dur_ms double, sr_hz double")
        .option("maxFilesPerTrigger", 1).parquet(src)
    )

    def validate(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        if det.total_batches == 0 and det.reference_n == 0:
            det.set_reference(batch_df, batch_id=f"epoch_{epoch_id}")
            out.append((epoch_id, "reference"))
        else:
            state = det.update(batch_df, batch_id=f"epoch_{epoch_id}")
            out.append((epoch_id, state or "pass"))

    q = (
        stream.writeStream.foreachBatch(validate)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    states = [s for _, s in out]
    assert states[0] == "reference"
    assert "drift" in states  # the shifted micro-batch alarms
    assert det.total_batches >= 2
