"""End-to-end example-scenario parity (reference examples over the
bundled circle / rainfall datasets, make_example_data.py:116-166):
PCA-CD must flag the circle's 1000-1250 drift window; STEPD (and LFR)
must flag the rainfall concept change at index 12000 when driven by a
frozen pre-drift predictor."""

import numpy as np

from menelaus_spark.sources.scenarios import (
    CIRCLE_DRIFT_START,
    RAINFALL_DRIFT_START,
    fetch_circle_data,
    fetch_rainfall_data,
)


def test_circle_pca_cd_flags_drift_window(spark):
    from menelaus_spark.streaming.detectors import PCACD

    pdf = fetch_circle_data(spark).toPandas().sort_values("idx")
    det = PCACD(window_size=100, divergence_metric="intersection")
    alarms = []
    for i, row in enumerate(pdf[["var1", "var2"]].to_numpy()):
        if det.update(row) == "drift":
            alarms.append(i)
    # at least one alarm, and the first lands in/after the drift window
    # (detection lag bounded by a few windows)
    assert alarms, "PCA-CD never alarmed on the circle drift"
    assert CIRCLE_DRIFT_START <= alarms[0] <= CIRCLE_DRIFT_START + 500


def test_rainfall_stepd_flags_concept_change(spark):
    from menelaus_spark.streaming.detectors import STEPD

    pdf = fetch_rainfall_data(spark).toPandas().sort_values("idx")
    # frozen pre-drift concept: the rule the generator used before the
    # regime change, applied to the features only
    spread = pdf["temperature"] - pdf["dew_point"]
    press_anom = pdf["sea_level_pressure"] - 1013
    y_pred = ((-0.5 * spread - 0.3 * press_anom) > -2.0).astype(int).to_numpy()
    y_true = pdf["rain"].astype(int).to_numpy()

    det = STEPD(window_size=200)
    alarms = [
        i for i in range(len(pdf)) if det.update(y_true[i], y_pred[i]) == "drift"
    ]
    # an alarm lands shortly after the regime change (window-size lag;
    # isolated pre-drift false positives at alpha=0.05 are tolerated)
    assert any(
        RAINFALL_DRIFT_START <= a <= RAINFALL_DRIFT_START + 2000 for a in alarms
    ), f"no STEPD alarm after the regime change: {alarms}"


def test_rainfall_lfr_flags_concept_change(spark):
    from menelaus_spark.streaming.detectors import LinearFourRates

    pdf = fetch_rainfall_data(spark).toPandas().sort_values("idx")
    spread = pdf["temperature"] - pdf["dew_point"]
    press_anom = pdf["sea_level_pressure"] - 1013
    y_pred = ((-0.5 * spread - 0.3 * press_anom) > -2.0).astype(int).to_numpy()
    y_true = pdf["rain"].astype(int).to_numpy()

    det = LinearFourRates(burn_in=1000, num_mc=500, subsample=20, seed=42)
    alarms = [
        i for i in range(len(pdf)) if det.update(y_true[i], y_pred[i]) == "drift"
    ]
    assert any(
        RAINFALL_DRIFT_START <= a <= RAINFALL_DRIFT_START + 3000 for a in alarms
    ), f"no LFR alarm after the regime change: {alarms}"
