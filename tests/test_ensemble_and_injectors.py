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
