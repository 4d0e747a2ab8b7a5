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

    def update_batch(self, df, order_col: str) -> tuple[str | None, int]:
        """Distributed MD3 over an ORDERED unlabeled Spark batch — the
        scale path the per-sample ``update`` cannot provide.

        The EWMA md_i = f*md_{i-1} + (1-f)*signal_i is associative over
        contiguous segments (segment = (length m, weighted sum
        WS = sum f^(m-i) s_i); A then B folds to WS_A*f^(m_B) + WS_B),
        so the scan runs as two mapInPandas passes over range-
        partitioned, within-partition-sorted data:

        1. per-partition (first_order, m, WS) — driver folds incoming
           md state per partition (O(partitions) scalars collected);
        2. with the incoming state broadcast, each partition finds its
           first warning crossing |md_i - md_ref| > sensitivity*std.

        The earliest crossing wins; the detector stops THERE (exactly
        where sequential update() would raise the warning and start
        waiting for oracle labels) and reports how many samples were
        consumed. Returns (drift_state, n_processed).

        ``order_col`` must be numeric (it is range-partitioned and used
        as the driver-side fold key).
        """
        import pandas as pd_mod
        from pyspark.sql import functions as F

        if self.waiting_for_oracle:
            raise ValueError(
                "give_oracle_label must be called to confirm or rule out drift."
            )
        if self.drift_state == "drift":
            self.reset()
        feat_cols = list(self.reference_batch_features.columns)
        clf = self.classifier
        margin_fn = self.margin_calculation_function
        is_default = margin_fn is calculate_margin_inclusion_signal
        f = float(self.forgetting_factor)
        md_ref = self.reference_distribution["md"]
        thr = self.sensitivity * self.reference_distribution["md_std"]
        md0 = float(self.curr_margin_density)
        # chunk bound so f^(-chunk) stays far below float64 overflow
        chunk = max(1, min(65536, int(300.0 / max(1e-12, -np.log(f)))))

        def signals_of(pdf: pd_mod.DataFrame) -> np.ndarray:
            X = pdf[feat_cols].to_numpy(dtype=np.float64)
            if is_default:
                w = np.array(clf.coef_[0])
                b = np.array(clf.intercept_)[0] / w[1]
                return (np.abs(X @ w + b) <= 1).astype(np.float64)
            return np.array([margin_fn(x, clf) for x in X], dtype=np.float64)

        # persist the range-partitioned projection: both passes must
        # see the SAME partition boundaries (range boundaries come from
        # sampling, which is not stable across separate executions)
        parts = (
            df.select(order_col, *feat_cols)
            .repartitionByRange(F.col(order_col))
            .sortWithinPartitions(order_col)
            .persist()
        )

        def seg_stats(it):
            m, ws, first = 0, 0.0, None
            for pdf in it:
                s = signals_of(pdf)
                if len(s) == 0:
                    continue
                if first is None:
                    first = float(pdf[order_col].iloc[0])
                # fold this chunk into the running segment (blockwise to
                # keep f^-i bounded)
                for lo in range(0, len(s), chunk):
                    blk = s[lo:lo + chunk]
                    k = len(blk)
                    wts = f ** np.arange(k - 1, -1, -1, dtype=np.float64)
                    ws = ws * (f ** k) + float(blk @ wts)
                    m += k
            if m:
                yield pd_mod.DataFrame({"first": [first], "m": [m], "ws": [ws]})

        seg = parts.mapInPandas(seg_stats, "first double, m long, ws double").toPandas()
        seg = seg.sort_values("first").reset_index(drop=True)
        n_total = int(seg["m"].sum())
        if n_total == 0:
            parts.unpersist()
            return self.drift_state, 0
        incoming = {}
        md = md0
        for _, row in seg.iterrows():
            incoming[float(row["first"])] = md
            md = (f ** int(row["m"])) * md + (1 - f) * float(row["ws"])
        md_final = md
        bc = df.sparkSession.sparkContext.broadcast(incoming)

        def find_crossing(it):
            md_in = None
            offset = 0
            out = []
            for pdf in it:
                if len(pdf) == 0:
                    continue
                if md_in is None:
                    md_in = bc.value[float(pdf[order_col].iloc[0])]
                s = signals_of(pdf)
                orders = pdf[order_col].to_numpy()
                for lo in range(0, len(s), chunk):
                    blk = s[lo:lo + chunk]
                    k = len(blk)
                    j = np.arange(1, k + 1, dtype=np.float64)
                    # md_j = f^j * md_in + (1-f) * f^j * cumsum(s_i f^-i)
                    fj = f ** j
                    trace = fj * md_in + (1 - f) * fj * np.cumsum(blk * (f ** (-j)))
                    hit = np.nonzero(np.abs(trace - md_ref) > thr)[0]
                    if len(hit):
                        h = int(hit[0])
                        out.append((float(orders[lo + h]), offset + lo + h + 1,
                                    float(trace[h])))
                        break
                    md_in = float(trace[-1])
                else:
                    offset += len(s)
                    continue
                break
            if out:
                yield pd_mod.DataFrame(out, columns=["order", "local_n", "md"])

        crossings = parts.mapInPandas(
            find_crossing, "order double, local_n long, md double"
        ).toPandas().sort_values("order")

        parts.unpersist()
        if len(crossings):
            first = crossings.iloc[0]
            # samples processed = everything in partitions before the
            # crossing partition + the crossing's local index
            part_key = max(k for k in incoming if k <= first["order"])
            earlier = int(seg[seg["first"] < part_key]["m"].sum())
            processed = earlier + int(first["local_n"])
            self.curr_margin_density = float(first["md"])
            self.total_samples += processed
            self.samples_since_reset += processed
            self.drift_state = "warning"
            self.waiting_for_oracle = True
            return self.drift_state, processed
        self.curr_margin_density = float(md_final)
        self.total_samples += n_total
        self.samples_since_reset += n_total
        return self.drift_state, n_total

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
