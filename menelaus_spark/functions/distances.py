"""Histogram / frequency divergence measures (driver-side numpy on
collected B-bin summaries; B <= sqrt(n) so these arrays are tiny).

Each function documents the reference semantics it reproduces
(file:line into /root/reference). The same formulas also exist as pure
DataFrame aggregations in the ``__spark_entry__`` queries (hellinger /
psi / ks) for the scale path + DuckDB-oracle checks; these numpy twins
feed the sequential epsilon/beta state machines.
"""

from __future__ import annotations

import numpy as np


def hellinger(ref_hist: np.ndarray, test_hist: np.ndarray) -> float:
    """Hellinger distance between two aligned-bin count histograms.

    Semantics of menelaus' HDDDM per-feature distance
    (/root/reference/menelaus/data_drift/histogram_density_method.py:400-424):
    sqrt( sum_bins ( sqrt(t_i/T) - sqrt(r_i/R) )^2 ).
    """
    r = np.asarray(ref_hist, dtype=np.float64)
    t = np.asarray(test_hist, dtype=np.float64)
    rs, ts = r.sum(), t.sum()
    if rs == 0 or ts == 0:
        return 0.0
    return float(np.sqrt(np.sum((np.sqrt(t / ts) - np.sqrt(r / rs)) ** 2)))


def jensen_shannon(p: np.ndarray, q: np.ndarray, base: float | None = None) -> float:
    """Jensen-Shannon distance (sqrt of the divergence), matching
    scipy.spatial.distance.jensenshannon semantics, which menelaus uses
    as its "KL" divergence option
    (/root/reference/menelaus/data_drift/histogram_density_method.py:536-552).
    """
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    ps, qs = p.sum(), q.sum()
    if ps == 0 or qs == 0:
        return 0.0
    p, q = p / ps, q / qs
    m = 0.5 * (p + q)

    def rel_entr(a, b):
        mask = a > 0
        out = np.zeros_like(a)
        out[mask] = a[mask] * np.log(a[mask] / b[mask])
        return out

    js = 0.5 * (rel_entr(p, m).sum() + rel_entr(q, m).sum())
    if base is not None:
        js /= np.log(base)
    return float(np.sqrt(max(js, 0.0)))


def kl_divergence(p: np.ndarray, q: np.ndarray) -> float:
    """KL(p || q) on already-positive smoothed distributions — the kdq
    leaf-histogram comparison (scipy.stats.entropy semantics used at
    /root/reference/menelaus/partitioners/KDQTreePartitioner.py:115-134).
    """
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    p = p / p.sum()
    q = q / q.sum()
    mask = p > 0
    return float(np.sum(p[mask] * np.log(p[mask] / q[mask])))


def dasu_smooth(counts: np.ndarray) -> np.ndarray:
    """(c + 0.5) / (total + n_bins/2) smoothing, matching
    /root/reference/menelaus/partitioners/KDQTreePartitioner.py:136-150."""
    c = np.asarray(counts, dtype=np.float64)
    return (c + 0.5) / (c.sum() + c.size / 2.0)


def psi(ref_freq: np.ndarray, test_freq: np.ndarray, eps: float = 1e-4) -> float:
    """Population Stability Index over aligned category frequencies:
    sum((p - q) * ln(p / q)), zero-frequency cells floored at eps.
    (Not in the reference — required by BASELINE.json north_star.)
    """
    r = np.asarray(ref_freq, dtype=np.float64)
    t = np.asarray(test_freq, dtype=np.float64)
    rs, ts = r.sum(), t.sum()
    if rs == 0 or ts == 0:
        return 0.0
    p = np.maximum(r / rs, eps)
    q = np.maximum(t / ts, eps)
    return float(np.sum((q - p) * np.log(q / p)))


def shannon_entropy(counts: np.ndarray) -> float:
    """Shannon entropy (nats) of a category count vector. (Not in the
    reference — deequ-style profile statistic for the north-star
    validation family: a collapsed categorical distribution — e.g.
    every clip in a partition suddenly the same codec — drops entropy
    toward 0 even when no NEW category appears, which PSI's
    eps-floored log-ratio can understate and accepted-values cannot
    see at all.) Zero-count categories contribute zero."""
    c = np.asarray(counts, dtype=np.float64)
    n = c.sum()
    if n <= 0:
        return 0.0
    p = c[c > 0] / n
    # + 0.0 normalizes the single-category case's -0.0 to +0.0
    return float(-np.sum(p * np.log(p)) + 0.0)


def chi2_homogeneity(ref_counts: np.ndarray, test_counts: np.ndarray
                     ) -> tuple[float, int]:
    """Two-sample chi-squared homogeneity statistic over aligned
    category counts, with its degrees of freedom. (Not in the
    reference — north-star drift-family addition: the hypothesis-test
    sibling of PSI, giving a principled alpha-level threshold via
    chi2_critical instead of PSI's rule-of-thumb 0.1/0.2 bands.)

    Expected counts come from the pooled proportions:
    E[s, i] = n_s * (r_i + t_i) / (R + T); stat = sum (O - E)^2 / E
    over both samples and every category with pooled mass;
    dof = (#pooled-nonzero categories - 1). Categories absent from
    both samples carry no information and are dropped (they would
    divide by zero)."""
    r = np.asarray(ref_counts, dtype=np.float64)
    t = np.asarray(test_counts, dtype=np.float64)
    rs, ts = r.sum(), t.sum()
    if rs == 0 or ts == 0:
        return 0.0, 0
    pooled = r + t
    mask = pooled > 0
    k = int(mask.sum())
    if k <= 1:
        return 0.0, 0
    p = pooled[mask] / (rs + ts)
    er, et = rs * p, ts * p
    stat = float(np.sum((r[mask] - er) ** 2 / er)
                 + np.sum((t[mask] - et) ** 2 / et))
    return stat, k - 1


def ks_statistic(ref_hist: np.ndarray, test_hist: np.ndarray) -> float:
    """Two-sample Kolmogorov-Smirnov statistic approximated on aligned
    cumulative histograms: max |CDF_ref - CDF_test| over bin edges.
    (Not in the reference — required by BASELINE.json north_star.)
    """
    r = np.asarray(ref_hist, dtype=np.float64)
    t = np.asarray(test_hist, dtype=np.float64)
    rs, ts = r.sum(), t.sum()
    if rs == 0 or ts == 0:
        return 0.0
    return float(np.max(np.abs(np.cumsum(r) / rs - np.cumsum(t) / ts)))


def emd_1d(ref_hist: np.ndarray, test_hist: np.ndarray,
           lo: float, hi: float) -> float:
    """First Wasserstein distance (Earth Mover's Distance) between two
    aligned-bin histograms on [lo, hi], in the column's own units:
    binwidth * sum_bins |CDF_ref - CDF_test|. (Not in the reference —
    north-star drift-family addition; integrates the WHOLE CDF gap, so
    a mean shift spread thinly over many bins that KS's single max
    understates still accumulates.) Rides the SAME collected KS
    histograms — zero extra passes."""
    r = np.asarray(ref_hist, dtype=np.float64)
    t = np.asarray(test_hist, dtype=np.float64)
    rs, ts = r.sum(), t.sum()
    if rs == 0 or ts == 0 or hi <= lo:
        return 0.0
    bw = (float(hi) - float(lo)) / r.size
    return float(bw * np.sum(np.abs(np.cumsum(r) / rs - np.cumsum(t) / ts)))


def cvm_statistic(ref_hist: np.ndarray, test_hist: np.ndarray) -> float:
    """Two-sample Cramer-von Mises criterion approximated on aligned
    histograms: sum over bins of the POOLED empirical mass times the
    squared CDF gap, w_i * (CDF_ref_i - CDF_test_i)^2 with
    w_i = (r_i + t_i) / (R + T) — i.e. the integral of the squared gap
    against the pooled distribution (Anderson 1962), so the statistic
    is scale-free in [0, 1]. (Not in the reference — north-star
    drift-family addition.) Complements the family: KS takes the max
    gap (sharp local shifts), EMD the unweighted integral in column
    units (mean shifts), CvM the pooled-weighted squared integral —
    most sensitive to body-of-distribution shifts while down-weighting
    sparse tails that can dominate EMD. Rides the SAME collected KS
    histograms — zero extra passes. Empty bins carry zero pooled mass,
    so unlike emd_1d no bin-span correction is needed."""
    r = np.asarray(ref_hist, dtype=np.float64)
    t = np.asarray(test_hist, dtype=np.float64)
    rs, ts = r.sum(), t.sum()
    if rs == 0 or ts == 0:
        return 0.0
    gap = np.cumsum(r) / rs - np.cumsum(t) / ts
    w = (r + t) / (rs + ts)
    return float(np.sum(w * gap * gap))


def intersection_divergence(p: np.ndarray, q: np.ndarray) -> float:
    """1 - sum(min(p_i, q_i)) on normalized histograms, matching
    /root/reference/menelaus/data_drift/pca_cd.py:347-371."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    ps, qs = p.sum(), q.sum()
    if ps == 0 or qs == 0:
        return 0.0
    return float(1.0 - np.sum(np.minimum(p / ps, q / qs)))
