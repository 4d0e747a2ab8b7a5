"""Election-scheme parity (reference ensemble/election.py tests'
semantics) + injector transforms."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from menelaus_spark.checks.ensemble import (
    BatchEnsemble,
    ConfirmedElection,
    MinimumApprovalElection,
    OrderedApprovalElection,
    SimpleMajorityElection,
    StreamingEnsemble,
)
from menelaus_spark.checks.hdm import HDDDM
from menelaus_spark.operators import injectors


def test_simple_majority():
    e = SimpleMajorityElection()
    assert e(["drift", "drift", None]) == "drift"
    assert e(["drift", None, None]) is None
    assert e([None, None]) is None


def test_minimum_approval():
    e = MinimumApprovalElection(2)
    assert e(["drift", "drift", None]) == "drift"
    assert e(["drift", None, None]) is None


def test_ordered_approval():
    e = OrderedApprovalElection(1, 1)
    assert e(["drift", "drift", None]) == "drift"
    assert e(["drift", None, None]) is None
    assert e([None, "drift", "drift"]) == "drift"


def test_confirmed_election_waits():
    e = ConfirmedElection(sensitivity=2, wait_time=5)
    # one detector alarms -> not enough
    assert e(["drift", None, None]) is None
    # second detector alarms within wait window -> the first still counts
    assert e([None, "drift", None]) == "drift"


def test_batch_ensemble_with_selectors(spark):
    np.random.seed(1)
    const = np.tile(np.repeat(1.0, 100).reshape(-1, 1), (1, 2))
    shift = np.tile(np.random.randint(2, 10, 150).reshape(-1, 1).astype(float), (1, 2))

    def sdf(a):
        pdf = pd.DataFrame(a, columns=["f0", "f1"])
        pdf.insert(0, "__idx", range(len(pdf)))
        return spark.createDataFrame(pdf)

    ens = BatchEnsemble(
        detectors={
            "h1": HDDDM(order_col="__idx"),
            "h2": HDDDM(order_col="__idx"),
        },
        election=SimpleMajorityElection(),
        column_selectors={"h1": ["__idx", "f0"], "h2": ["__idx", "f1"]},
    )
    ens.set_reference(sdf(const))
    assert ens.update(sdf(shift)) == "drift"
    assert ens.member_states() == {"h1": "drift", "h2": "drift"}


def _idx_df(spark, n=100, cols=("a", "b")):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({c: rng.normal(10, 1, n) for c in cols})
    pdf.insert(0, "idx", range(n))
    pdf["label"] = rng.choice([0, 1], n).astype(int)
    return spark.createDataFrame(pdf)


def test_stream_ensemble_executes_no_drift():
    # reference test_ensemble.py:17-28: 3 STEPDs, one clean sample
    from menelaus_spark.streaming.detectors import STEPD

    se = StreamingEnsemble(
        detectors={"s1": STEPD(window_size=2), "s2": STEPD(window_size=2),
                   "s3": STEPD(window_size=2)},
        election=SimpleMajorityElection(),
    )
    se.update(x=None, y_true=0, y_pred=0)
    assert se.drift_state is None
    assert se.total_samples == 1


def test_stream_ensemble_column_selectors():
    # reference test_ensemble.py:30-71: selectors route per-member input
    from menelaus_spark.streaming.detectors import ADWIN

    seen = {}

    def sel(key):
        def f(x):
            seen[key] = x[key]
            return x[key]
        return f

    se = StreamingEnsemble(
        detectors={"a1": ADWIN(), "a2": ADWIN(), "a3": ADWIN()},
        election=SimpleMajorityElection(),
        column_selectors={"a1": sel("a"), "a2": sel("b"), "a3": sel("c")},
    )
    se.update(x={"a": 0.0, "b": 1.0, "c": 2.0})
    assert se.drift_state is None
    assert seen == {"a": 0.0, "b": 1.0, "c": 2.0}
    for det in se.detectors.values():
        assert det.total_samples == 1


def test_stream_ensemble_reset():
    # reference test_ensemble.py:74-98: reset clears members, keeps
    # total_samples
    from menelaus_spark.streaming.detectors import STEPD

    se = StreamingEnsemble(
        detectors={"s1": STEPD(window_size=2), "s2": STEPD(window_size=2)},
        election=SimpleMajorityElection(),
    )
    se.update(x=None, y_true=0, y_pred=0)
    se.drift_state = "drift"
    for det in se.detectors.values():
        det.drift_state = "drift"
    se.reset()
    assert se.samples_since_reset == 0
    assert se.drift_state is None
    assert se.total_samples == 1
    for det in se.detectors.values():
        assert det.samples_since_reset == 0
        assert det.drift_state is None
        assert det.total_samples == 1


def test_stream_ensemble_states_and_recs():
    # reference test_ensemble.py:103-137: member state / recs reporting
    from menelaus_spark.streaming.detectors import ADWIN, DDM

    se = StreamingEnsemble(
        detectors={"a1": ADWIN(), "a2": ADWIN(), "d1": DDM()},
        election=SimpleMajorityElection(),
    )
    se.detectors["a1"].drift_state = "drift"
    se.detectors["d1"].drift_state = "warning"
    assert se.drift_states == {"a1": "drift", "a2": None, "d1": "warning"}
    # ADWIN and DDM both expose retraining_recs; every member that has
    # the attribute appears in the dict
    recs = se.retraining_recs
    assert set(recs) == {
        n for n, d in se.detectors.items() if hasattr(d, "retraining_recs")
    }
    assert "d1" in recs


def test_stream_ensemble_mixed_members_drift():
    # labels drive DDM/STEPD, features drive CUSUM; election combines
    from menelaus_spark.streaming.detectors import CUSUM, STEPD

    se = StreamingEnsemble(
        detectors={"c": CUSUM(burn_in=10, threshold=3),
                   "s": STEPD(window_size=20)},
        election=MinimumApprovalElection(1),
    )
    # varied burn-in (CUSUM raises on zero sd), then a large level shift
    state = None
    for i in range(60):
        x = (i % 7) * 0.1 if i < 40 else 50.0
        state = se.update(x=x, y_true=1, y_pred=1)
        if state == "drift":
            break
    assert state == "drift"


def test_feature_shift(spark):
    df = _idx_df(spark)
    out = injectors.feature_shift(df, "idx", 50, 100, "a", shift_factor=2.0)
    pdf = out.toPandas().sort_values("idx")
    orig = df.toPandas().sort_values("idx")
    assert np.allclose(pdf["a"][:50], orig["a"][:50])
    assert (pdf["a"][50:] > orig["a"][50:] + 15).all()  # ~ +2*mean(~10)


def test_feature_swap_and_label_swap(spark):
    df = _idx_df(spark)
    out = injectors.feature_swap(df, "idx", 0, 50, "a", "b").toPandas().sort_values("idx")
    orig = df.toPandas().sort_values("idx")
    assert np.allclose(out["a"][:50], orig["b"][:50])
    assert np.allclose(out["b"][:50], orig["a"][:50])
    assert np.allclose(out["a"][50:], orig["a"][50:])

    lab = injectors.label_swap(df, "idx", 0, 100, "label", 0, 1).toPandas().sort_values("idx")
    assert (lab["label"].to_numpy() == 1 - orig["label"].to_numpy()).all()


def test_brownian_noise_and_label_probability(spark):
    df = _idx_df(spark)
    out = injectors.brownian_noise(df, "idx", 20, 80, "a", x0=5.0, seed=3)
    pdf = out.toPandas().sort_values("idx")
    orig = df.toPandas().sort_values("idx")
    assert np.allclose(pdf["a"][:20], orig["a"][:20])
    assert not np.allclose(pdf["a"][20:80], orig["a"][20:80])
    assert np.allclose(pdf["a"][80:], orig["a"][80:])

    lp = injectors.label_probability(df, "idx", 0, 100, "label", {0: 0.9, 1: 0.1}, seed=1)
    frac1 = lp.agg(F.avg("label")).collect()[0][0]
    assert frac1 < 0.3  # deterministic resample heavily favors class 0


def test_feature_cover(spark):
    # feature_manipulation.py:78-114: n = sample_size // n_groups rows
    # drawn per group, concept column removed
    df = _idx_df(spark)  # label in {0, 1} -> 2 groups
    out = injectors.feature_cover(df, "label", sample_size=40, seed=7)
    pdf = out.toPandas()
    assert "label" not in pdf.columns
    assert len(pdf) == 40  # 20 from each of the 2 groups
    # deterministic for a fixed seed
    again = injectors.feature_cover(df, "label", sample_size=40, seed=7).toPandas()
    assert sorted(pdf["idx"]) == sorted(again["idx"])
    # the sample is a subset of the original rows
    orig = df.toPandas()
    assert set(pdf["idx"]).issubset(set(orig["idx"]))


def test_label_dirichlet(spark):
    # label_manipulation.py:189-243: alpha [9, 1] -> expected ~90/10
    # split inside the window; rows outside untouched
    df = _idx_df(spark)
    out = injectors.label_dirichlet(
        df, "idx", 0, 100, "label", alpha={0: 9, 1: 1}, seed=11
    )
    pdf = out.toPandas().sort_values("idx")
    frac1 = pdf["label"].mean()
    assert frac1 < 0.4  # heavily skewed towards class 0
    # windowed variant leaves rows outside [20, 80) unchanged
    out2 = injectors.label_dirichlet(
        df, "idx", 20, 80, "label", alpha={0: 9, 1: 1}, seed=11
    ).toPandas().sort_values("idx")
    orig = df.toPandas().sort_values("idx")
    assert (out2["label"][:20] == orig["label"][:20]).all()
    assert (out2["label"][80:] == orig["label"][80:]).all()
