"""Kernel parity tests mirroring the reference suites
(/root/reference/tests/menelaus/change_detection/* and
concept_drift/*), plus the Spark applyInPandas layer."""

import numpy as np
import pandas as pd
import pytest

from menelaus_spark.streaming.detectors import (
    ADWIN,
    CUSUM,
    DDM,
    EDDM,
    STEPD,
    ADWINAccuracy,
    PageHinkley,
    apply_streaming_detector,
)


# --- CUSUM (test_cusum.py) ---

def test_cusum_no_drift():
    np.random.seed(7)
    det = CUSUM(threshold=50)
    for i in range(40):
        det.update(np.random.normal())
        assert det.drift_state is None
        assert det.samples_since_reset == i + 1


def test_cusum_zero_sd_raises():
    det = CUSUM(threshold=10)
    with pytest.raises(ValueError):
        for _ in range(31):
            det.update(1)


def test_cusum_bidirectional_drift():
    np.random.seed(3)
    det = CUSUM(threshold=10)
    for i in range(75):
        if i == 30:
            det.update(100)
            assert det.drift_state == "drift"
        elif i == 61:
            det.threshold = 0
            det.update(100)
            assert det.drift_state == "drift"
        else:
            det.update(np.random.uniform())
            assert det.drift_state is None


def test_cusum_directional():
    np.random.seed(5)
    pos = CUSUM(direction="positive")
    neg = CUSUM(direction="negative")
    for i in range(31):
        x = 100 if i == 30 else np.random.uniform()
        pos.update(x)
        neg.update(x)
    assert pos.drift_state == "drift"
    assert neg.drift_state is None


# --- Page-Hinkley (test_page_hinkley.py) ---

def test_ph_no_drift():
    det = PageHinkley()
    for i in range(det.burn_in * 2):
        det.update(1)
        assert det.drift_state is None
        assert det.samples_since_reset == i + 1


def test_ph_pos_and_neg_drift():
    det = PageHinkley(burn_in=30)
    for i in range(31):
        det.update(1 if i < 30 else 100)
    assert det.drift_state == "drift"
    det.update(1)
    assert det.drift_state is None  # reset on next update

    det = PageHinkley(burn_in=30, direction="negative")
    for i in range(31):
        det.update(1 if i < 30 else -100)
    assert det.drift_state == "drift"


# --- ADWIN (test_adwin.py) ---

def test_adwin_compression_bound():
    det = ADWIN(max_buckets=1, delta=0.000001)
    for element in [1, 2, 3]:
        for _ in range(10):
            det.update(element)
    assert all(len(row[0]) <= det.max_buckets for row in det._rows[:-1] if row is not det._rows[0])


def test_adwin_delta_validation():
    with pytest.raises(ValueError):
        ADWIN(delta=25)


def test_adwin_mean_variance():
    det = ADWIN(new_sample_thresh=2)
    assert det.mean() == 0
    for _ in range(5):
        det.update(1)
    assert det.mean() == 1
    det2 = ADWIN(new_sample_thresh=2)
    assert det2.variance() == 0
    for _ in range(10):
        det2.update(1)
        det2.update(0)
    assert det2.variance() == pytest.approx(0.25)


def test_adwin_drift_and_recs():
    det = ADWIN(new_sample_thresh=2)
    for _ in range(20):
        det.update(0.1)
    drift_found = False
    for _ in range(20):
        det.update(100)
        if det.drift_state == "drift":
            drift_found = True
            break
    assert drift_found
    assert det.retraining_recs[0] is not None
    # window shrank below total
    assert det._n < det.total_samples


def test_adwin_accuracy_wrapper():
    det = ADWINAccuracy(new_sample_thresh=2)
    for _ in range(30):
        det.update(1, 1)
    drift_found = False
    for _ in range(60):
        det.update(1, 0)
        if det.drift_state == "drift":
            drift_found = True
            break
    assert drift_found


# --- DDM / EDDM / STEPD ---

def test_ddm_drift_on_error_jump():
    np.random.seed(11)
    det = DDM(n_threshold=30)
    # accurate phase: 2% errors
    for i in range(200):
        det.update(1, 1 if np.random.uniform() > 0.02 else 0)
    assert det.drift_state != "drift"
    # broken classifier: 70% errors
    fired = False
    for i in range(200):
        det.update(1, 1 if np.random.uniform() > 0.7 else 0)
        if det.drift_state == "drift":
            fired = True
            break
    assert fired
    assert det.retraining_recs[1] is not None


def test_eddm_drift_on_shrinking_error_distance():
    np.random.seed(13)
    det = EDDM(n_threshold=5)
    for i in range(500):
        det.update(1, 1 if np.random.uniform() > 0.01 else 0)
    assert det.drift_state != "drift"
    fired = False
    for i in range(500):
        det.update(1, 1 if np.random.uniform() > 0.5 else 0)
        if det.drift_state == "drift":
            fired = True
            break
    assert fired


def test_stepd_drift_on_accuracy_drop():
    np.random.seed(17)
    det = STEPD(window_size=30)
    fired = False
    for i in range(60):
        det.update(1, 1)
    for i in range(60):
        det.update(1, 0)
        if det.drift_state == "drift":
            fired = True
            break
    assert fired
    # reset on next update
    det.update(1, 1)
    assert det.drift_state is None
    assert det.samples_since_reset == 1


# --- Spark layer ---

def test_apply_streaming_detector_matches_local(spark):
    np.random.seed(23)
    n = 120
    groups = []
    for g in ("a", "b"):
        vals = np.concatenate([np.random.normal(0, 1, 60), np.random.normal(30, 1, 60)])
        groups.append(pd.DataFrame({"g": g, "i": np.arange(n), "x": vals}))
    pdf = pd.concat(groups, ignore_index=True)
    df = spark.createDataFrame(pdf).repartition(4)

    trace = apply_streaming_detector(
        df, lambda: PageHinkley(burn_in=30), group_col="g", order_col="i", value_cols=["x"]
    ).toPandas()

    assert len(trace) == 2 * n
    for g in ("a", "b"):
        sub = trace[trace["group"] == g].sort_values("ord")
        # local replay must match the distributed trace exactly
        det = PageHinkley(burn_in=30)
        local_states = [det.update(v) for v in pdf[pdf["g"] == g].sort_values("i")["x"]]
        assert [s if s else None for s in sub["state"]] == local_states
        assert "drift" in set(sub["state"].dropna())


def test_apply_streaming_detector_concept(spark):
    np.random.seed(29)
    n = 150
    pdf = pd.DataFrame(
        {
            "g": "m1",
            "i": np.arange(n),
            "y_true": 1,
            "y_pred": [1] * 75 + list((np.random.uniform(size=75) > 0.7).astype(int)),
        }
    )
    df = spark.createDataFrame(pdf)
    trace = apply_streaming_detector(
        df, lambda: STEPD(window_size=30), group_col="g", order_col="i",
        value_cols=["y_true", "y_pred"],
    ).toPandas()
    assert "drift" in set(trace["state"].dropna())
