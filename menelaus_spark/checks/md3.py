"""MD3: Margin Density Drift Detection (Sethi & Kantardzic 2017),
semi-supervised. Semantics per
/root/reference/menelaus/concept_drift/md3.py:10-324:

- set_reference: k-fold CV (k=10, shuffled, seed 42) over the labeled
  reference batch measuring margin-density and accuracy mean/std;
  forgetting_factor = (n-1)/n; oracle_data_length_required defaults to
  the reference length;
- update (unlabeled): margin-inclusion signal through the classifier
  (default |w.x + b| <= 1 with the reference's b = intercept/w[1]
  convention, md3.py:35-58), EWMA margin density; warning when
  |MD - MD_ref| > sensitivity * MD_std, then the detector WAITS for
  oracle labels;
- give_oracle_label: accumulate labeled samples; at the required
  length, drift iff acc_ref - acc_labeled > sensitivity * acc_std;
  reference re-set from the oracle data either way.

sklearn is unavailable here, so the default classifier is a
deterministic numpy linear SVM (Pegasos subgradient, fixed seed) —
any object with fit/predict/coef_/intercept_ works, and a custom
margin_calculation_function covers non-linear classifiers (the
reference's documented extension point, md3.py:72-79).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class LinearSVM:
    """Deterministic linear SVM via the Pegasos subgradient method
    (Shalev-Shwartz et al. 2011). Labels are coerced to {-1, +1}."""

    def __init__(self, lam: float = 0.01, n_iters: int = 2000, seed: int = 42):
        self.lam = lam
        self.n_iters = n_iters
        self.seed = seed
        self.coef_ = None
        self.intercept_ = None
        self._classes = None

    def fit(self, X, y):
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y).ravel()
        self._classes = np.unique(y)
        if len(self._classes) != 2:
            raise ValueError("LinearSVM is binary; got %d classes" % len(self._classes))
        yy = np.where(y == self._classes[1], 1.0, -1.0)
        n, d = X.shape
        rng = np.random.default_rng(self.seed)
        w = np.zeros(d)
        b = 0.0
        w_sum = np.zeros(d)
        b_sum = 0.0
        half = self.n_iters // 2
        radius = 1.0 / np.sqrt(self.lam)
        for t in range(1, self.n_iters + 1):
            i = int(rng.integers(n))
            eta = 1.0 / (self.lam * t)
            margin = yy[i] * (X[i] @ w + b)
            if margin < 1:
                w = (1 - eta * self.lam) * w + eta * yy[i] * X[i]
                b += eta * yy[i]
            else:
                w = (1 - eta * self.lam) * w
            # Pegasos projection onto the 1/sqrt(lam) ball (keeps the
            # functional margin |w.x+b|=1 meaningful)
            norm = np.sqrt(w @ w + b * b)
            if norm > radius:
                w *= radius / norm
                b *= radius / norm
            if t > half:  # averaged iterates for stability
                w_sum += w
                b_sum += b
        self.coef_ = np.array([w_sum / (self.n_iters - half)])
        self.intercept_ = np.array([b_sum / (self.n_iters - half)])
        return self

    def decision_function(self, X):
        return np.asarray(X, dtype=np.float64) @ self.coef_[0] + self.intercept_[0]

    def predict(self, X):
        raw = self.decision_function(X)
        return np.where(raw >= 0, self._classes[1], self._classes[0])

    def clone(self):
        return LinearSVM(self.lam, self.n_iters, self.seed)


def calculate_margin_inclusion_signal(sample, clf) -> int:
    """Reference default margin signal (md3.py:35-58), including its
    b = intercept / w[1] convention."""
    w = np.array(clf.coef_[0])
    b = np.array(clf.intercept_)[0] / w[1]
    return 1 if np.abs(np.dot(w, sample) + b) <= 1 else 0


class MD3:
    def __init__(self, clf=None, margin_calculation_function=None,
                 sensitivity: float = 2, k: int = 10,
                 oracle_data_length_required: int | None = None, seed: int = 42):
        self.classifier = clf if clf is not None else LinearSVM(seed=seed)
        self.margin_calculation_function = (
            margin_calculation_function or calculate_margin_inclusion_signal
        )
        self.sensitivity = sensitivity
        self.k = k
        self.oracle_data_length_required = oracle_data_length_required
        self.seed = seed
        self.total_samples = 0
        self.samples_since_reset = 0
        self.drift_state: str | None = None
        self.waiting_for_oracle = False
        self.oracle_data: pd.DataFrame | None = None
        self.reference_distribution: dict | None = None
        self.curr_margin_density: float | None = None

    # -- reference fitting ------------------------------------------------

    def _kfold_indices(self, n: int):
        """KFold(k, shuffle=True, random_state=42)-style splits: a
        seeded permutation chopped into k contiguous folds."""
        rng = np.random.default_rng(self.seed)
        perm = rng.permutation(n)
        sizes = np.full(self.k, n // self.k)
        sizes[: n % self.k] += 1
        start = 0
        for s in sizes:
            test = perm[start:start + s]
            train = np.concatenate([perm[:start], perm[start + s:]])
            start += s
            yield train, test

    def set_reference(self, X: pd.DataFrame, target_name: str) -> None:
        self.reference_batch_features = X.loc[:, X.columns != target_name]
        self.reference_batch_target = X.loc[:, [target_name]]
        feats = self.reference_batch_features.to_numpy(dtype=np.float64)
        target = self.reference_batch_target.to_numpy().ravel()
        self.classifier.fit(feats, target)

        mds, accs = [], []
        for train_idx, test_idx in self._kfold_indices(len(feats)):
            dup = self.classifier.clone() if hasattr(self.classifier, "clone") else LinearSVM(seed=self.seed)
            dup.fit(feats[train_idx], target[train_idx])
            signals = [
                self.margin_calculation_function(feats[i], dup) for i in test_idx
            ]
            mds.append(sum(signals) / len(signals))
            accs.append(float(np.mean(dup.predict(feats[test_idx]) == target[test_idx])))
        self.reference_distribution = {
            "len": len(X),
            "md": float(np.mean(mds)),
            "md_std": float(np.std(mds)),
            "acc": float(np.mean(accs)),
            "acc_std": float(np.std(accs)),
        }
        if self.oracle_data_length_required is None:
            self.oracle_data_length_required = self.reference_distribution["len"]
        self.forgetting_factor = (
            self.reference_distribution["len"] - 1
        ) / self.reference_distribution["len"]
        self.curr_margin_density = self.reference_distribution["md"]

    # -- streaming updates -------------------------------------------------

    def update(self, X: pd.DataFrame) -> str | None:
        if self.waiting_for_oracle:
            raise ValueError("give_oracle_label must be called to confirm or rule out drift.")
        if len(X) != 1:
            raise ValueError("update takes exactly 1 record.")
        if self.drift_state == "drift":
            self.reset()
        self.total_samples += 1
        self.samples_since_reset += 1
        sample = X.to_numpy(dtype=np.float64)[0]
        signal = self.margin_calculation_function(sample, self.classifier)
        self.curr_margin_density = (
            self.forgetting_factor * self.curr_margin_density
            + (1 - self.forgetting_factor) * signal
        )
        warning_level = abs(self.curr_margin_density - self.reference_distribution["md"])
        if warning_level > self.sensitivity * self.reference_distribution["md_std"]:
            self.drift_state = "warning"
            self.waiting_for_oracle = True
        return self.drift_state

    def give_oracle_label(self, labeled_sample: pd.DataFrame) -> str | None:
        if not self.waiting_for_oracle:
            raise ValueError("give_oracle_label only valid after a drift warning.")
        if len(labeled_sample) != 1:
            raise ValueError("give_oracle_label takes exactly 1 record.")
        feature_cols = list(self.reference_batch_features.columns)
        target_col = list(self.reference_batch_target.columns)
        if set(labeled_sample.columns) != set(feature_cols + target_col):
            raise ValueError("oracle sample columns must match the reference distribution.")
        self.drift_state = None
        self.oracle_data = (
            labeled_sample if self.oracle_data is None
            else pd.concat([self.oracle_data, labeled_sample], ignore_index=True)
        )
        if len(self.oracle_data) == self.oracle_data_length_required:
            X_test = self.oracle_data[feature_cols].to_numpy(dtype=np.float64)
            y_test = self.oracle_data[target_col].to_numpy().ravel()
            acc = float(np.mean(self.classifier.predict(X_test) == y_test))
            drift_level = self.reference_distribution["acc"] - acc
            if drift_level > self.sensitivity * self.reference_distribution["acc_std"]:
                self.drift_state = "drift"
            self.set_reference(self.oracle_data, target_name=target_col[0])
            self.oracle_data = None
            self.waiting_for_oracle = False
        return self.drift_state

    def reset(self) -> None:
        self.samples_since_reset = 0
        self.drift_state = None
        self.curr_margin_density = self.reference_distribution["md"]
