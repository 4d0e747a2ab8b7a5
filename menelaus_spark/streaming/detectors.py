"""Streaming change / concept-drift detector kernels + the Spark layer.

Each kernel is a fresh implementation of the published algorithm,
matching the reference's observable semantics (counters, burn-in
gating, reset protocol, threshold formulas — file:line cites below per
class). Kernels are plain-Python state machines over one ordered
series; the reference processes streams the same way (one Python
update per sample), so per-sample cost is at parity.

Spark-first distribution model (SURVEY.md §1.4): a "stream" is a
per-group ordered series. ``apply_streaming_detector`` runs one kernel
per group inside ``groupBy(...).applyInPandas`` — thousands of
independent streams (per speaker, per partition, per device) process
in parallel across executors, each sequential only within its group,
which is exactly the reference's semantics (arrival order is the time
axis, /root/reference/menelaus/detector.py:7-170).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from menelaus_spark.functions.stats import norm_cdf


class StreamingKernel:
    """Counter/reset bookkeeping shared by all kernels (reference
    StreamingDetector, detector.py:7-170)."""

    def __init__(self):
        self.total_samples = 0
        self.samples_since_reset = 0
        self.drift_state: str | None = None

    def reset(self):
        self.samples_since_reset = 0
        self.drift_state = None

    def _tick(self):
        self.total_samples += 1
        self.samples_since_reset += 1

    def snapshot(self) -> tuple[float, float]:
        """(statistic, threshold) for trace output."""
        return float("nan"), float("nan")


class CUSUM(StreamingKernel):
    """Two-sided cumulative-sum change detector (Page 1954).
    Semantics per /root/reference/menelaus/change_detection/cusum.py:5-141,
    including burn-in estimation of target/sd, the zero-sd error, the
    post-drift re-estimation from the trailing ``burn_in`` samples, and
    the stream-indexed recurrence (s uses stream[samples_since_reset-1],
    cusum.py:110-125)."""

    def __init__(self, target=None, sd_hat=None, burn_in=30, delta=0.005,
                 threshold=50, direction=None):
        super().__init__()
        self.target = target
        self.sd_hat = sd_hat
        self.burn_in = burn_in
        self.delta = delta
        self.threshold = threshold
        self.direction = direction
        self._upper = [0.0]
        self._lower = [0.0]
        self._stream: list[float] = []

    def reset(self):
        super().reset()
        self._upper = [0.0]
        self._lower = [0.0]

    def update(self, x: float):
        if self.drift_state == "drift":
            self.target = float(np.mean(self._stream[-self.burn_in:]))
            self.sd_hat = float(np.std(self._stream[-self.burn_in:]))
            self.reset()
        self._tick()
        self._stream.append(float(x))
        if self.target is None and self.samples_since_reset < self.burn_in:
            self._upper.append(0.0)
            self._lower.append(0.0)
        if self.target is None and self.samples_since_reset == self.burn_in:
            self.target = float(np.mean(self._stream))
            self.sd_hat = float(np.std(self._stream))
        if self.sd_hat == 0 and self.samples_since_reset > self.burn_in:
            raise ValueError("Standard deviation is 0; stream needs >1 unique value.")
        if self.target is not None:
            # numpy-division semantics: sd_hat == 0 yields nan/inf (the
            # reference divides numpy scalars; max(0, nan) -> 0), the
            # explicit ValueError above fires one sample later
            num = self._stream[self.samples_since_reset - 1] - self.target
            z = num / self.sd_hat if self.sd_hat != 0 else (
                float("nan") if num == 0 else math.copysign(float("inf"), num)
            )
            self._upper.append(max(0.0, self._upper[self.samples_since_reset - 1] + z - self.delta))
            self._lower.append(max(0.0, self._lower[self.samples_since_reset - 1] - self.delta - z))
        if self.samples_since_reset > self.burn_in:
            hi = self._upper[self.samples_since_reset]
            lo = self._lower[self.samples_since_reset]
            if self.direction is None:
                fired = hi > self.threshold or lo > self.threshold
            elif self.direction == "positive":
                fired = hi > self.threshold
            else:
                fired = lo > self.threshold
            if fired:
                self.drift_state = "drift"
        return self.drift_state

    def snapshot(self):
        i = min(self.samples_since_reset, len(self._upper) - 1)
        return max(self._upper[i], self._lower[i]), float(self.threshold)


class PageHinkley(StreamingKernel):
    """Page-Hinkley test. Semantics per
    /root/reference/menelaus/change_detection/page_hinkley.py:5-153:
    expanding mean, PH cumsum with slack delta, min/max gap vs
    theta = threshold * mean, burn-in gate, full reset on drift."""

    def __init__(self, delta=0.01, threshold=20, burn_in=30, direction="positive"):
        super().__init__()
        self.delta = delta
        self.threshold = threshold
        self.burn_in = burn_in
        self.direction = direction
        self._reset_stats()

    def _reset_stats(self):
        self._max = 0.0
        self._min = 0.0
        self._sum = 0.0
        self._mean = 0.0
        self._last_diff = 0.0
        self._last_theta = 0.0

    def reset(self):
        super().reset()
        self._reset_stats()

    def update(self, x: float):
        if self.drift_state == "drift":
            self.reset()
        self._tick()
        x = float(x)
        self._mean += (x - self._mean) / self.samples_since_reset
        self._sum += x - self._mean - self.delta
        theta = self.threshold * self._mean
        self._min = min(self._min, self._sum)
        self._max = max(self._max, self._sum)
        diff = (self._sum - self._min) if self.direction == "positive" else (self._max - self._sum)
        self._last_diff, self._last_theta = diff, theta
        if diff > theta and self.samples_since_reset > self.burn_in:
            self.drift_state = "drift"
        return self.drift_state

    def snapshot(self):
        return self._last_diff, self._last_theta


class ADWIN(StreamingKernel):
    """ADaptive WINdowing (Bifet & Gavaldà 2007): exponential-histogram
    bucket rows, Chan variance merge on compression, epsilon-cut drift
    test on every subwindow split, window shrink on drift. Semantics
    per /root/reference/menelaus/change_detection/adwin.py:15-496
    (max_buckets=M, drift check every new_sample_thresh samples,
    window/subwindow size gates, the non-conservative eps_cut with the
    2/3 correction term, harmonic mean offset by subwindow_size_thresh).
    Buckets here are a list of (totals, variances) lists per row —
    row i summarizes 2^i elements per bucket."""

    def __init__(self, delta=0.002, max_buckets=5, new_sample_thresh=32,
                 window_size_thresh=10, subwindow_size_thresh=5,
                 conservative_bound=False):
        super().__init__()
        if not 0 <= delta <= 1:
            raise ValueError("ADWIN.delta must take values on the range 0 to 1.")
        self.delta = delta
        self.max_buckets = max_buckets
        self.new_sample_thresh = new_sample_thresh
        self.window_size_thresh = window_size_thresh
        self.subwindow_size_thresh = subwindow_size_thresh
        self.conservative_bound = conservative_bound
        # rows[i] = [totals list, variances list]; row i buckets hold 2^i elems
        self._rows: list[list[list[float]]] = [[[], []]]
        self._total = 0.0
        self._var_sum = 0.0
        self._n = 0
        self.retraining_recs = [None, None]

    def reset(self):
        # drift state only: ADWIN self-heals by shrinking (adwin.py:107-110)
        super().reset()
        self.retraining_recs = [None, None]

    def mean(self):
        return self._total / self._n if self._n else 0.0

    def variance(self):
        return self._var_sum / self._n if self._n else 0.0

    def update(self, x: float):
        if self.drift_state is not None:
            self.reset()
        self._tick()
        x = float(x)
        self._n += 1
        # insert a size-1 bucket at row 0
        self._rows[0][0].append(x)
        self._rows[0][1].append(0.0)
        if self._n > 1:
            prev_mean = self._total / (self._n - 1)
            self._var_sum += (self._n - 1) * (x - prev_mean) ** 2 / self._n
        self._total += x
        self._compress()
        self._shrink()
        return self.drift_state

    def _compress(self):
        i = 0
        while i < len(self._rows):
            totals, variances = self._rows[i]
            if len(totals) == self.max_buckets + 1:
                if i + 1 >= len(self._rows):
                    self._rows.append([[], []])
                n_el = 2 ** i
                m1, m2 = totals[0] / n_el, totals[1] / n_el
                merged_total = totals[0] + totals[1]
                merged_var = variances[0] + variances[1] + n_el * (m1 - m2) ** 2 / 2
                self._rows[i + 1][0].append(merged_total)
                self._rows[i + 1][1].append(merged_var)
                del totals[:2]
                del variances[:2]
                if len(self._rows[i + 1][0]) <= self.max_buckets:
                    break
            else:
                break
            i += 1

    def _check_epsilon(self, n0, t0, n1, t1):
        diff = t0 / n0 - t1 / n1
        v = self.variance()
        n = self._n
        nh = 1 / (n0 - self.subwindow_size_thresh + 1) + 1 / (n1 - self.subwindow_size_thresh + 1)
        if not self.conservative_bound:
            dpd = math.log(2 * math.log(n) / self.delta)
            eps = math.sqrt(2 * nh * v * dpd) + (2 / 3) * nh * dpd
        else:
            dpd = math.log(4 * math.log(n) / self.delta)
            eps = math.sqrt(0.5 * nh * dpd)
        return abs(diff) > eps

    def _remove_last(self):
        # drop oldest bucket from the highest non-empty row (the tail)
        tail = len(self._rows) - 1
        n_curr = 2 ** tail
        totals, variances = self._rows[tail]
        self._n -= n_curr
        self._total -= totals[0]
        mean_curr = totals[0] / n_curr
        if self._n > 0:
            new_mean = self._total / self._n
            self._var_sum -= variances[0] + n_curr * self._n * (mean_curr - new_mean) ** 2 / (
                n_curr + self._n
            )
        else:
            self._var_sum = 0.0
        del totals[0]
        del variances[0]
        if not totals and tail > 0:
            self._rows.pop()
        return n_curr

    def _shrink(self):
        if not (self.total_samples % self.new_sample_thresh == 0
                and self._n > self.window_size_thresh):
            return
        restart = True
        while restart:
            restart = False
            exit_shrink = False
            n0, n1 = 0, self._n
            t0, t1 = 0.0, self._total
            pos = len(self._rows) - 1
            while not exit_shrink and pos >= 0:
                n_inc = 2 ** pos
                totals = self._rows[pos][0]
                for bi in range(len(totals)):
                    n0 += n_inc
                    n1 -= n_inc
                    t0 += totals[bi]
                    t1 -= totals[bi]
                    if pos == 0 and bi == len(totals) - 1:
                        exit_shrink = True
                        break
                    if (n0 >= self.subwindow_size_thresh
                            and n1 >= self.subwindow_size_thresh
                            and self._check_epsilon(n0, t0, n1, t1)):
                        restart = True
                        self.drift_state = "drift"
                        if self._n > 0:
                            n0 -= self._remove_last()
                            self.retraining_recs = [
                                self.total_samples - self._n,
                                self.total_samples - 1,
                            ]
                            exit_shrink = True
                            break
                pos -= 1

    def snapshot(self):
        return self.mean(), float("nan")


class DDM(StreamingKernel):
    """Drift Detection Method (Gama et al. 2004). Semantics per
    /root/reference/menelaus/concept_drift/ddm.py:5-149 including the
    std-accumulator recurrence exactly as implemented there (the
    accumulator is re-used after sqrt each step) and warn/drift scales
    over the minimum error rate."""

    def __init__(self, n_threshold=30, warning_scale=2, drift_scale=3):
        super().__init__()
        self.n_threshold = n_threshold
        self.warning_scale = warning_scale
        self.drift_scale = drift_scale
        self._init_stats()

    def _init_stats(self):
        self._rate = 0.0
        self._std = 0.0
        self._rate_min = float("inf")
        self._std_min = float("inf")
        self.retraining_recs = [None, None]

    def reset(self):
        super().reset()
        self._init_stats()

    def update(self, y_true, y_pred):
        if self.drift_state == "drift":
            self.reset()
        self._tick()
        err = int(y_pred != y_true)
        prev = self._rate
        self._rate += (err - self._rate) / self.samples_since_reset
        self._std = self._std + (err - self._rate) * (err - prev)
        self._std = math.sqrt(self._std / self.samples_since_reset)
        if self.samples_since_reset < self.n_threshold:
            return self.drift_state
        if self._rate + self._std <= self._rate_min + self._std_min:
            self._rate_min = self._rate
            self._std_min = self._std
        if self._rate + self._std >= self._rate_min + self.drift_scale * self._std:
            self.drift_state = "drift"
        elif self._rate + self._std >= self._rate_min + self.warning_scale * self._std:
            self.drift_state = "warning"
        else:
            self.drift_state = None
        if self.drift_state is not None:
            self._recs()
        return self.drift_state

    def _recs(self):
        if self.drift_state == "warning" and self.retraining_recs[0] is None:
            self.retraining_recs[0] = self.total_samples - 1
        if self.drift_state == "drift":
            self.retraining_recs[1] = self.total_samples - 1
            if self.retraining_recs[0] is None:
                self.retraining_recs[0] = self.total_samples - 1

    def snapshot(self):
        return self._rate + self._std, self._rate_min + self.drift_scale * self._std


class EDDM(StreamingKernel):
    """Early DDM (Baena-García et al. 2006): distance-between-errors
    statistic. Semantics per
    /root/reference/menelaus/concept_drift/eddm.py:5-164."""

    def __init__(self, n_threshold=30, warning_thresh=0.95, drift_thresh=0.9):
        super().__init__()
        self.n_threshold = n_threshold
        self.warning_thresh = warning_thresh
        self.drift_thresh = drift_thresh
        self._init_stats()

    def _init_stats(self):
        self._n_errors = 0
        self._idx_curr = 0
        self._idx_last = 0
        self._dist_mean = 0.0
        self._dist_std = 0.0
        self._max_numerator = 0.0
        self.test_statistic = None
        self.retraining_recs = [None, None]

    def reset(self):
        super().reset()
        self._init_stats()

    def update(self, y_true, y_pred):
        if self.drift_state == "drift":
            self.reset()
        self._tick()
        correct = int(y_pred == y_true)
        if not correct:
            self._n_errors += 1
            self._idx_last = self._idx_curr
            self._idx_curr = self.samples_since_reset - 1
            d = self._idx_curr - self._idx_last
            prev_mean = self._dist_mean
            self._dist_mean += (d - self._dist_mean) / self._n_errors
            self._dist_std = self._dist_std + (d - self._dist_mean) * (d - prev_mean)
            self._dist_std = math.sqrt(self._dist_std / self._n_errors)
            if self._n_errors < self.n_threshold:
                return self.drift_state
            numerator = self._dist_mean + 2 * self._dist_std
            if self._max_numerator < numerator:
                self._max_numerator = numerator
            self.test_statistic = numerator / self._max_numerator
            if self.test_statistic <= self.drift_thresh:
                self.drift_state = "drift"
            elif self.test_statistic <= self.warning_thresh:
                self.drift_state = "warning"
            else:
                self.drift_state = None
            if self.drift_state is not None:
                self._recs()
        return self.drift_state

    def _recs(self):
        if self.drift_state == "warning" and self.retraining_recs[0] is None:
            self.retraining_recs[0] = self.total_samples - 1
        if self.drift_state == "drift":
            self.retraining_recs[1] = self.total_samples - 1
            if self.retraining_recs[0] is None:
                self.retraining_recs[0] = self.total_samples - 1

    def snapshot(self):
        return (self.test_statistic if self.test_statistic is not None else float("nan"),
                self.drift_thresh)


class STEPD(StreamingKernel):
    """Statistical Test of Equal Proportions (Nishida & Yamauchi 2007):
    recent-window vs past accuracy, two-proportion z-test with
    continuity correction, one-sided p. Semantics per
    /root/reference/menelaus/concept_drift/stepd.py:6-191."""

    def __init__(self, window_size=30, alpha_warning=0.05, alpha_drift=0.003):
        super().__init__()
        self.window_size = window_size
        self.alpha_warning = alpha_warning
        self.alpha_drift = alpha_drift
        self._init_stats()

    def _init_stats(self):
        self._s = 0
        self._r = 0
        self._window: list[int] = []
        self.test_statistic = None
        self.test_p = None
        self.retraining_recs = [None, None]

    def reset(self):
        super().reset()
        self._init_stats()

    def update(self, y_true, y_pred):
        if self.drift_state == "drift":
            self.reset()
        self._tick()
        correct = int(y_pred == y_true)
        self._s += correct
        self._window.append(correct)
        if len(self._window) > self.window_size:
            self._s -= self._window[0]
            self._r += self._window[0]
            self._window = self._window[1:]
        if self.samples_since_reset >= 2 * self.window_size:
            w = len(self._window)
            recent = self._s / w if w else 0.0
            past_n = self.samples_since_reset - w
            past = self._r / past_n if past_n else 0.0
            overall = (self._r + self._s) / self.samples_since_reset
            inv = 1 / (self.samples_since_reset - self.window_size) + 1 / self.window_size
            denom = math.sqrt(overall * (1 - overall) * inv) if overall not in (0.0, 1.0) else float("nan")
            self.test_statistic = (abs(past - recent) - 0.5 * inv) / denom
            self.test_p = float(1 - norm_cdf(self.test_statistic))
            decreased = past > recent
            if decreased and self.test_p < self.alpha_drift:
                self.drift_state = "drift"
            elif decreased and self.test_p < self.alpha_warning:
                self.drift_state = "warning"
            else:
                self.drift_state = None
                self.retraining_recs = [None, None]
            if self.drift_state is not None:
                if self.retraining_recs[0] is None:
                    self.retraining_recs = [self.total_samples - 1, self.total_samples - 1]
                else:
                    self.retraining_recs[1] += 1
        return self.drift_state

    def snapshot(self):
        return (self.test_p if self.test_p is not None else float("nan"), self.alpha_drift)


class ADWINAccuracy(ADWIN):
    """Concept-drift ADWIN over the accuracy indicator 1[y_true==y_pred]
    (/root/reference/menelaus/concept_drift/adwin_accuracy.py:4-92)."""

    def update(self, y_true, y_pred):  # noqa: D102
        return super().update(int(y_true == y_pred))


# ---------------------------------------------------------------------------
# Spark layer

TRACE_SCHEMA = (
    "group string, ord long, value double, state string, statistic double, threshold double"
)


def apply_streaming_detector(
    df: DataFrame,
    factory,
    group_col: str,
    order_col: str,
    value_cols: list[str],
    multivariate: bool = False,
) -> DataFrame:
    """Run a kernel per group over its ordered rows; emit a per-row
    trace (group, ord, value, state, statistic, threshold).

    ``value_cols``: [x] for univariate change detectors, [y_true,
    y_pred] for concept detectors, feature columns with
    ``multivariate=True`` for row-vector detectors (PCA-CD, streaming
    kdq-tree). Each group is one independent stream — groups
    parallelize across executors; the shuffle key is the group column.
    """
    n_vals = len(value_cols)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        det = factory()
        states, stats_, thresholds = [], [], []
        vals = [pdf[c].to_numpy() for c in value_cols]
        X = np.column_stack(vals) if multivariate else None
        for i in range(len(pdf)):
            if multivariate:
                state = det.update(X[i])
            elif n_vals == 1:
                state = det.update(vals[0][i])
            else:
                state = det.update(vals[0][i], vals[1][i])
            s, t = det.snapshot()
            states.append(state)
            stats_.append(float(s))
            thresholds.append(float(t))
        return pd.DataFrame(
            {
                "group": pdf[group_col].astype(str),
                "ord": pdf[order_col].astype("int64"),
                "value": pdf[value_cols[0]].astype(float),
                "state": states,
                "statistic": stats_,
                "threshold": thresholds,
            }
        )

    return df.groupBy(group_col).applyInPandas(run, schema=TRACE_SCHEMA)


class KdqTreeStreaming(StreamingKernel):
    """Streaming kdq-tree (Dasu 2006). Semantics per
    /root/reference/menelaus/data_drift/kdq_tree.py:267-381, 106-173:
    the first ``window_size`` samples build the tree and the bootstrap
    critical KL (sample_size = window_size); subsequent samples fill
    the test counts cumulatively; once >= window_size test samples have
    arrived, each sample's KL above the critical value increments the
    drift counter, and counter > persistence * window_size alarms.
    After drift, everything resets and a fresh reference accumulates."""

    def __init__(self, window_size, persistence=0.05, alpha=0.01,
                 bootstrap_samples=500, count_ubound=100,
                 cutpoint_proportion_lbound=2e-10, seed=42):
        if not isinstance(window_size, int) or window_size < 1:
            raise ValueError(f"window_size must be positive integer, was {window_size}")
        super().__init__()
        self.window_size = window_size
        self.persistence = persistence
        self.alpha = alpha
        self.bootstrap_samples = bootstrap_samples
        self.count_ubound = count_ubound
        self.cutpoint_proportion_lbound = cutpoint_proportion_lbound
        self.seed = seed
        self._inner_reset()

    def _inner_reset(self):
        self._ref_rows: list = []
        self._tree = None
        self._ref_counts = None
        self._test_counts = None
        self._critical = None
        self._test_data_size = 0
        self._drift_counter = 0
        self.test_dist = None

    def reset(self):
        super().reset()
        self._inner_reset()

    def update(self, x_row):
        from menelaus_spark.checks.kdqtree import (
            KDQTreePartitioner,
            bootstrap_critical_kld,
        )

        if self.drift_state is not None:
            self.reset()
        self._tick()
        row = np.asarray(x_row, dtype=np.float64).reshape(-1)
        if self._tree is None:
            self._ref_rows.append(row)
            if len(self._ref_rows) == self.window_size:
                ary = np.vstack(self._ref_rows)
                self._tree = KDQTreePartitioner(
                    self.count_ubound, self.cutpoint_proportion_lbound
                ).build(ary)
                self._ref_counts = self._tree.leaf_counts_build()
                self._critical = bootstrap_critical_kld(
                    self._ref_counts, self.window_size, self.alpha,
                    self.bootstrap_samples, self.seed,
                )
                self._test_counts = np.zeros(self._tree.n_leaves, dtype=np.int64)
                self._ref_rows = []
            return self.drift_state
        self._test_counts += self._tree.fill_counts(row.reshape(1, -1))
        self._test_data_size += 1
        if self._test_data_size >= self.window_size:
            self.test_dist = self._tree.kl_distance(self._ref_counts, self._test_counts)
            if self.test_dist > self._critical:
                self._drift_counter += 1
                if self._drift_counter > self.persistence * self.window_size:
                    self.drift_state = "drift"
        return self.drift_state

    def snapshot(self):
        return (self.test_dist if self.test_dist is not None else float("nan"),
                self._critical if self._critical is not None else float("nan"))


class PCACD(StreamingKernel):
    """PCA Change Detection (Qahtan et al. 2015). Semantics per
    /root/reference/menelaus/data_drift/pca_cd.py:41-371: fill reference
    then test windows; standardize on the reference; PCA retaining
    ev_threshold explained variance; per-PC densities (Epanechnikov KDE
    for "kl" / aligned histograms for "intersection"); FIFO windows; a
    change score = max per-PC divergence every ``step`` samples, fed to
    an inner Page-Hinkley (threshold = round(0.01 * window_size),
    burn_in=0); PH drift flips the detector to drift and the test
    window becomes the next reference. scipy/sklearn replaced by exact
    numpy equivalents (standardization ddof=0; PCA via SVD with
    explained-variance cutoff; KDE bandwidth 1.06*std*n^(-1/5))."""

    def __init__(self, window_size, ev_threshold=0.99, delta=0.1,
                 divergence_metric="kl", sample_period=0.05, online_scaling=True):
        super().__init__()
        self.window_size = window_size
        self.ev_threshold = ev_threshold
        self.delta = delta
        self.divergence_metric = divergence_metric
        self.step = min(100, round(sample_period * window_size))
        self.ph_threshold = round(0.01 * window_size)
        self.bins = int(np.floor(np.sqrt(window_size)))
        self.online_scaling = online_scaling
        self._ph = PageHinkley(delta=self.delta, threshold=self.ph_threshold, burn_in=0)
        self.num_pcs = None
        self._build_windows = True
        self._ref: list = []
        self._test: list = []
        self._mean = None
        self._std = None
        self._components = None
        self._density_ref = None
        self._ref_proj = None
        self._test_proj = None
        self.change_score = 0.0
        self._lower = self._upper = None

    def _scale(self, ary):
        if not self.online_scaling:
            return ary
        return (ary - self._mean) / self._std

    def _fit_pca(self, ref):
        centered = ref - ref.mean(axis=0)
        _, s, vt = np.linalg.svd(centered, full_matrices=False)
        ev = (s ** 2) / (len(ref) - 1)
        ratio = ev / ev.sum()
        k = int(np.searchsorted(np.cumsum(ratio), self.ev_threshold) + 1)
        self._pca_mean = ref.mean(axis=0)
        self._components = vt[:k]
        self.num_pcs = k

    def _project(self, ary):
        return (ary - self._pca_mean) @ self._components.T

    @staticmethod
    def _kde_density(sample):
        """Epanechnikov KDE evaluated at the sample's own points
        (pca_cd.py:283-303 semantics)."""
        x = np.asarray(sample, dtype=np.float64)
        n = len(x)
        h = 1.06 * np.std(x, ddof=1) * (n ** (-1 / 5))
        if h <= 0 or not np.isfinite(h):
            return np.full(n, 1.0 / max(n, 1))
        u = (x[:, None] - x[None, :]) / h
        k = np.where(np.abs(u) <= 1.0, 0.75 * (1.0 - u ** 2), 0.0)
        return k.sum(axis=1) / (n * h)

    def _hist_density(self, sample, lo, hi):
        density, _ = np.histogram(sample, bins=self.bins, range=(lo, hi), density=True)
        s = density.sum()
        return density / s if s > 0 else density

    def _densities(self, proj):
        out = []
        for i in range(self.num_pcs):
            col = proj[:, i]
            if self.divergence_metric == "intersection":
                out.append(self._hist_density(col, self._lower[i], self._upper[i]))
            else:
                out.append(self._kde_density(col))
        return out

    def update(self, x_row):
        from menelaus_spark.functions.distances import (
            intersection_divergence,
            jensen_shannon,
        )

        self._tick()
        row = np.asarray(x_row, dtype=np.float64).reshape(-1)
        if self._build_windows:
            if self.drift_state is not None:
                self._ref = list(self._test)  # raw (unscaled) rows kept below
                self._test = []
                self.drift_state = None
                self.samples_since_reset = 0
                self._ph.reset()
            elif len(self._ref) < self.window_size:
                self._ref.append(row)
            elif len(self._test) < self.window_size:
                self._test.append(row)
            if len(self._test) == self.window_size:
                self._build_windows = False
                ref = np.vstack(self._ref)
                test = np.vstack(self._test)
                if self.online_scaling:
                    self._mean = ref.mean(axis=0)
                    self._std = ref.std(axis=0)
                    self._std[self._std == 0] = 1.0
                    ref = self._scale(ref)
                    test = self._scale(test)
                self._fit_pca(ref)
                self._ref_proj = self._project(ref)
                self._test_proj = self._project(test)
                if self.divergence_metric == "intersection":
                    self._lower = np.minimum(self._ref_proj.min(axis=0),
                                             self._test_proj.min(axis=0))
                    self._upper = np.maximum(self._ref_proj.max(axis=0),
                                             self._test_proj.max(axis=0))
                self._density_ref = self._densities(self._ref_proj)
            return self.drift_state

        scaled = self._scale(row.reshape(1, -1)) if self.online_scaling else row.reshape(1, -1)
        self._test.pop(0)
        self._test.append(row)
        next_proj = self._project(scaled)
        if self.divergence_metric == "intersection":
            next_proj = np.clip(next_proj, self._lower, self._upper)
        self._test_proj = np.vstack([self._test_proj[1:], next_proj])

        if ((self.total_samples - 1) % self.step) == 0 and (self.total_samples - 1) != 0:
            dens_test = self._densities(self._test_proj)
            scores = []
            for i in range(self.num_pcs):
                if self.divergence_metric == "kl":
                    scores.append(jensen_shannon(self._density_ref[i], dens_test[i]))
                else:
                    scores.append(intersection_divergence(self._density_ref[i], dens_test[i]))
            self.change_score = float(max(scores))
            self._ph.update(self.change_score)
            if self._ph.drift_state is not None:
                self._build_windows = True
                self.drift_state = "drift"
        return self.drift_state

    def snapshot(self):
        return self.change_score, float(self.ph_threshold)


class LinearFourRates(StreamingKernel):
    """LFR (Wang & Abraham 2015): running 2x2 confusion, four rates
    (TPR/TNR/PPV/NPV), time-decayed rate statistic R <- eta*R +
    (1-eta)*1[y==yhat] when the rate moved, Monte Carlo warn/detect
    bounds memoized by rounded (rate, denominator). Semantics per
    /root/reference/menelaus/concept_drift/lfr.py:7-425; the per-column
    DataFrame.apply MC is replaced by one vectorized numpy draw
    (num_mc x denom Bernoulli matrix against the eta-power vector),
    seeded per (rate, denom) for reproducibility."""

    RATES = ("tpr", "tnr", "ppv", "npv")

    def __init__(self, time_decay_factor=0.9, warning_level=0.05, detect_level=0.05,
                 burn_in=50, num_mc=10000, subsample=1,
                 rates_tracked=("tpr", "tnr", "ppv", "npv"), round_val=4, seed=42):
        super().__init__()
        self.eta = time_decay_factor
        self.warning_level = warning_level
        self.detect_level = detect_level
        self.burn_in = burn_in
        self.num_mc = num_mc
        self.subsample = subsample
        self.rates_tracked = list(rates_tracked)
        self.round_val = round_val
        self.seed = seed
        self._bounds: dict = {}
        self._inner_reset()

    def _inner_reset(self):
        self._confusion = np.array([[1, 1], [1, 1]], dtype=np.int64)
        self._p = {r: 0.5 for r in self.RATES}
        self._r_stat = {r: 0.5 for r in self.RATES}
        self._warn = {r: False for r in self.RATES}
        self._alarm = {r: False for r in self.RATES}
        self.retraining_recs = [None, None]

    def reset(self):
        super().reset()
        self._inner_reset()

    @staticmethod
    def _four_rates(confusion):
        tn, fn, fp, tp = confusion.ravel()
        return {"tpr": tp / (tp + fn), "tnr": tn / (tn + fp),
                "ppv": tp / (fp + tp), "npv": tn / (tn + fn)}

    @staticmethod
    def _four_denoms(confusion):
        tn, fn, fp, tp = confusion.ravel()
        return {"tpr": tp + fn, "tnr": tn + fp, "ppv": fp + tp, "npv": tn + fn}

    def _sim_bounds(self, est_rate, denom):
        rng = np.random.default_rng([self.seed, int(denom), int(est_rate * 10 ** 6)])
        prods = self.eta ** np.arange(denom - 1, -1, -1, dtype=np.float64)
        draws = rng.binomial(1, est_rate, size=(self.num_mc, int(denom)))
        stats = (1 - self.eta) * (draws @ prods)
        return {
            "lb_warn": float(np.percentile(stats, self.warning_level * 100)),
            "ub_warn": float(np.percentile(stats, 100 - self.warning_level * 100)),
            "lb_detect": float(np.percentile(stats, self.detect_level * 100)),
            "ub_detect": float(np.percentile(stats, 100 - self.detect_level * 100)),
        }

    def _bounds_for(self, est_rate, denom):
        key = (round(est_rate, self.round_val), round(denom, self.round_val))
        if key not in self._bounds:
            self._bounds[key] = self._sim_bounds(est_rate, denom)
        return self._bounds[key]

    def update(self, y_true, y_pred):
        if self.drift_state == "drift":
            self.reset()
        self._tick()
        y_t, y_p = int(y_true), int(y_pred)
        old = self._four_rates(self._confusion)
        self._confusion[y_p][y_t] += 1
        new = self._four_rates(self._confusion)
        denoms = self._four_denoms(self._confusion)
        self._warn = {r: False for r in self.RATES}
        self._alarm = {r: False for r in self.RATES}
        for rate in self.rates_tracked:
            if new[rate] != old[rate]:
                self._r_stat[rate] = self.eta * self._r_stat[rate] + (
                    1 - self.eta) * (y_t == y_p)
            self._p[rate] = new[rate]
            if (self.samples_since_reset > self.burn_in
                    and self.samples_since_reset % self.subsample == 0):
                b = self._bounds_for(new[rate], denoms[rate])
                r = self._r_stat[rate]
                self._warn[rate] = (r < b["lb_warn"]) | (r > b["ub_warn"])
                self._alarm[rate] = (r < b["lb_detect"]) | (r > b["ub_detect"])
        if any(self._alarm.values()):
            self.drift_state = "drift"
        elif any(self._warn.values()):
            self.drift_state = "warning"
        else:
            self.drift_state = None
        if self.drift_state is not None:
            if self.drift_state == "warning" and self.retraining_recs[0] is None:
                self.retraining_recs[0] = self.total_samples - 1
            if self.drift_state == "drift":
                self.retraining_recs[1] = self.total_samples - 1
                if self.retraining_recs[0] is None:
                    self.retraining_recs[0] = self.total_samples - 1
        return self.drift_state

    def snapshot(self):
        return self._r_stat["tpr"], float("nan")
