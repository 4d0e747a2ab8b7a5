"""PCA-CD / LFR / streaming-kdq kernel tests mirroring the reference
suites (test_pca_cd.py, test_lfr.py, test_kdq_tree.py streaming)."""

import numpy as np
import pandas as pd
import pytest

from menelaus_spark.streaming.detectors import (
    PCACD,
    KdqTreeStreaming,
    LinearFourRates,
    apply_streaming_detector,
)


def _pca_data(size=150):
    np.random.seed(1)
    col1 = np.random.randint(1, 10, size).astype(float)
    col2 = np.random.uniform(1, 2, size)
    col3 = np.random.normal(0, 1, size)
    return np.column_stack([col1, col2, col3])


def test_pcacd_build_kl():
    # test_pca_cd.py:7-52: window construction, projection, densities
    ref = _pca_data()
    det = PCACD(window_size=50, divergence_metric="kl")
    for i in range(50):
        det.update(ref[i])
        assert len(det._ref) == i + 1
        assert det.drift_state is None
    assert len(det._test) == 0
    assert det._build_windows is True
    assert det._density_ref is None
    for i in range(50, 100):
        det.update(ref[i])
        assert det.drift_state is None
    assert det._ref_proj.shape[0] == 50
    assert det._test_proj.shape[0] == 50
    assert det._build_windows is False
    assert det._density_ref is not None
    assert det.num_pcs >= 1


def test_pcacd_drift_and_reset():
    # test_pca_cd.py:55-97: drift on changed distribution families, then reset
    np.random.seed(1)
    ref = _pca_data()
    col1 = np.random.uniform(9, 10, 150)
    col2 = np.random.normal(1, 3, 150)
    col3 = np.random.randint(20, 30, 150).astype(float)
    drift = np.column_stack([col1, col2, col3])

    det = PCACD(window_size=50, divergence_metric="kl", delta=0.05)
    for row in ref:
        det.update(row)
    assert det.drift_state is None
    fired = False
    for row in drift:
        if det.update(row) == "drift":
            fired = True
            break
    assert fired
    det.update(drift[0])
    assert det._build_windows is True
    assert det.drift_state is None
    assert det.samples_since_reset == 0


def test_pcacd_intersection_metric():
    np.random.seed(2)
    ref = _pca_data(200)
    det = PCACD(window_size=40, divergence_metric="intersection", delta=0.05)
    for row in ref[:120]:
        det.update(row)
    assert det.drift_state is None
    shifted = ref[:80] * 30 + 100
    fired = any(det.update(r) == "drift" for r in shifted)
    assert fired


def test_kdq_streaming_drift_cycle():
    # test_kdq_tree.py:12-37: stream of uniforms, drift = 50x data
    np.random.seed(123)
    data = np.random.sample((60, 3))
    det = KdqTreeStreaming(window_size=50, count_ubound=3, bootstrap_samples=100)
    for row in data:
        det.update(row)
    assert det.drift_state is None
    assert det._tree is not None
    fired = False
    for row in 50 * data:
        if det.update(row) == "drift":
            fired = True
            break
    assert fired
    # next update resets (reference rebuilds from scratch)
    det.update(data[0])
    assert det.drift_state is None
    assert det._tree is None  # accumulating a fresh reference window


def test_kdq_streaming_validation():
    with pytest.raises(ValueError):
        KdqTreeStreaming(window_size=0)


def test_lfr_drift_on_rate_change():
    np.random.seed(7)
    det = LinearFourRates(burn_in=30, num_mc=500, detect_level=0.01, seed=3)
    # balanced accurate classifier
    for i in range(300):
        y = i % 2
        pred = y if np.random.uniform() > 0.05 else 1 - y
        det.update(y, pred)
    # broken classifier: everything misclassified
    fired = False
    for i in range(300):
        y = i % 2
        if det.update(y, 1 - y) == "drift":
            fired = True
            break
    assert fired
    assert det.retraining_recs[1] is not None


def test_lfr_bounds_memoized():
    det = LinearFourRates(num_mc=200, seed=5)
    b1 = det._bounds_for(0.5, 10)
    b2 = det._bounds_for(0.5, 10)
    assert b1 is b2
    assert b1["lb_detect"] <= b1["lb_warn"] <= b1["ub_warn"] <= b1["ub_detect"]


def test_pcacd_distributed_multivariate(spark):
    # per-group reference-style fixture (distribution-family change,
    # test_pca_cd.py:60-72); each group is an independent stream
    rows = []
    for gi, g in enumerate(("a", "b")):
        np.random.seed(1 + gi)
        base = np.column_stack([
            np.random.randint(1, 10, 150).astype(float),
            np.random.uniform(1, 2, 150),
            np.random.normal(0, 1, 150),
        ])
        drifted = np.column_stack([
            np.random.uniform(9, 10, 150),
            np.random.normal(1, 3, 150),
            np.random.randint(20, 30, 150).astype(float),
        ])
        X = np.vstack([base, drifted])
        for i, row in enumerate(X):
            rows.append((g, i, float(row[0]), float(row[1]), float(row[2])))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "i", "x0", "x1", "x2"]))
    trace = apply_streaming_detector(
        df, lambda: PCACD(window_size=50, delta=0.05), group_col="g",
        order_col="i", value_cols=["x0", "x1", "x2"], multivariate=True,
    ).toPandas()
    assert len(trace) == 600
    for g in ("a", "b"):
        assert "drift" in set(trace[trace["group"] == g]["state"].dropna()), g
