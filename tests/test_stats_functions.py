import math

import numpy as np

from menelaus_spark.functions import stats
from menelaus_spark.functions import distances as D


def test_norm_ppf_cdf_inverse():
    for p in [0.001, 0.025, 0.05, 0.5, 0.9, 0.975, 0.999]:
        x = stats.norm_ppf(p)
        assert abs(stats.norm_cdf(x) - p) < 1e-9


def test_norm_ppf_known_values():
    assert abs(stats.norm_ppf(0.975) - 1.959963985) < 1e-6
    assert abs(stats.norm_ppf(0.5)) < 1e-12


def test_t_ppf_known_values():
    # textbook t-table values
    assert abs(stats.t_ppf(0.975, 10) - 2.2281) < 1e-3
    assert abs(stats.t_ppf(0.95, 5) - 2.0150) < 1e-3
    # converges to normal for large df
    assert abs(stats.t_ppf(0.975, 100000) - stats.norm_ppf(0.975)) < 1e-3


def test_betainc_symmetry():
    assert abs(stats.betainc(2.0, 3.0, 0.4) + stats.betainc(3.0, 2.0, 0.6) - 1.0) < 1e-12


def test_hellinger_bounds_and_known():
    same = np.array([10, 20, 30.0])
    assert D.hellinger(same, same) == 0.0
    disjoint = np.array([1.0, 0, 0]), np.array([0, 0, 1.0])
    assert abs(D.hellinger(*disjoint) - math.sqrt(2)) < 1e-12


def test_jensen_shannon_matches_manual():
    p = np.array([0.5, 0.5, 0.0])
    q = np.array([0.0, 0.1, 0.9])
    m = (p + q) / 2
    js = 0.5 * sum(pi * math.log(pi / mi) for pi, mi in zip(p, m) if pi > 0) + 0.5 * sum(
        qi * math.log(qi / mi) for qi, mi in zip(q, m) if qi > 0
    )
    assert abs(D.jensen_shannon(p, q) - math.sqrt(js)) < 1e-12
    assert D.jensen_shannon(p, p) == 0.0


def test_kl_and_dasu():
    c = np.array([2, 1, 2, 1.0])
    sm = D.dasu_smooth(c)
    assert abs(sm.sum() - 1.0) < 1e-12
    assert np.allclose(sm, (c + 0.5) / (c.sum() + 2.0))
    assert D.kl_divergence(sm, sm) == 0.0


def test_psi_and_ks():
    r = np.array([50, 30, 20.0])
    assert D.psi(r, r) == 0.0
    t = np.array([20, 30, 50.0])
    assert D.psi(r, t) > 0.1
    assert D.ks_statistic(r, r) == 0.0
    # KS of fully shifted mass
    assert abs(D.ks_statistic(np.array([1.0, 0]), np.array([0, 1.0])) - 1.0) < 1e-12


def test_emd_1d():
    r = np.array([50, 30, 20.0])
    assert D.emd_1d(r, r, 0.0, 3.0) == 0.0
    # point mass moved k bins = k * binwidth, exactly
    a = np.zeros(10); a[0] = 1.0
    b = np.zeros(10); b[7] = 1.0
    assert abs(D.emd_1d(a, b, 0.0, 10.0) - 7.0) < 1e-12
    # scale-free in counts, linear in the value range
    assert abs(D.emd_1d(5 * a, 3 * b, 0.0, 20.0) - 14.0) < 1e-12
    # empty histograms and degenerate ranges are quiet zeros
    assert D.emd_1d(np.zeros(4), b[:4], 0.0, 1.0) == 0.0
    assert D.emd_1d(a, b, 2.0, 2.0) == 0.0
    # EMD accumulates what KS's max understates: two half-masses each
    # shifted one bin give KS 0.5 but EMD a full binwidth
    p = np.array([1.0, 0, 1.0, 0])
    q = np.array([0, 1.0, 0, 1.0])
    assert abs(D.ks_statistic(p, q) - 0.5) < 1e-12
    assert abs(D.emd_1d(p, q, 0.0, 4.0) - 1.0) < 1e-12


def test_cvm_statistic():
    r = np.array([50, 30, 20.0])
    assert D.cvm_statistic(r, r) == 0.0
    # disjoint point masses: gap is 1 on the first bin, 0 on the last,
    # pooled weights 1/2 each -> 1/2 * 1 + 1/2 * 0 = 0.5
    p = np.array([1.0, 0.0])
    q = np.array([0.0, 1.0])
    assert abs(D.cvm_statistic(p, q) - 0.5) < 1e-12
    # bounded in [0, 1] and symmetric
    a = np.array([3.0, 1.0, 0.0, 4.0])
    b = np.array([0.0, 2.0, 5.0, 1.0])
    s = D.cvm_statistic(a, b)
    assert 0.0 < s <= 1.0
    assert abs(s - D.cvm_statistic(b, a)) < 1e-15
    # scale-free in counts
    assert abs(D.cvm_statistic(10 * a, 10 * b) - s) < 1e-12
    # empty side is a quiet zero
    assert D.cvm_statistic(np.zeros(4), b) == 0.0
    # body shift vs tail blip: CvM (pooled-weighted) ranks the body
    # shift above a far-tail sliver that EMD weights by distance
    base = np.array([0, 100, 100, 0, 0, 0, 0, 0.0])
    body = np.array([0, 0, 100, 100, 0, 0, 0, 0.0])   # whole body moved 1 bin
    tail = np.array([0, 100, 99, 0, 0, 0, 0, 1.0])    # 1 count flung 5 bins
    assert D.cvm_statistic(base, body) > D.cvm_statistic(base, tail)


def test_shannon_entropy():
    # uniform over k categories = ln(k); collapse = 0; zeros ignored
    assert abs(D.shannon_entropy(np.array([5.0, 5, 5, 5])) - math.log(4)) < 1e-12
    assert D.shannon_entropy(np.array([42.0, 0, 0])) == 0.0
    assert D.shannon_entropy(np.zeros(3)) == 0.0
    # scale-free in counts, maximal at uniform
    a = np.array([10.0, 30, 60])
    assert abs(D.shannon_entropy(a) - D.shannon_entropy(7 * a)) < 1e-12
    assert D.shannon_entropy(a) < math.log(3)


def test_chi2_homogeneity():
    # symmetric 2x2: pooled p = 1/2, all expected counts 15,
    # stat = 4 * (5^2 / 15) = 20/3, dof = 1
    r = np.array([10.0, 20.0])
    t = np.array([20.0, 10.0])
    stat, dof = D.chi2_homogeneity(r, t)
    assert abs(stat - 20.0 / 3.0) < 1e-12 and dof == 1
    # identical distributions: zero statistic
    stat, dof = D.chi2_homogeneity(r, 3 * r)
    assert stat < 1e-12 and dof == 1
    # categories absent from BOTH sides are dropped from dof
    stat, dof = D.chi2_homogeneity(np.array([5.0, 0, 5.0]),
                                   np.array([4.0, 0, 6.0]))
    assert dof == 1
    # empty side / single category: quiet zero
    assert D.chi2_homogeneity(np.zeros(3), t[:3] if t.size >= 3 else t) == (0.0, 0)
    assert D.chi2_homogeneity(np.array([7.0]), np.array([3.0])) == (0.0, 0)


def test_chi2_critical():
    from menelaus_spark.functions import stats as S
    # published chi-squared table values
    for df, alpha, want in [(1, 0.05, 3.8415), (4, 0.05, 9.4877),
                            (9, 0.01, 21.666), (2, 0.10, 4.6052),
                            (30, 0.05, 43.773)]:
        assert abs(S.chi2_critical(df, alpha) - want) < 5e-4, (df, alpha)
    assert abs(S.chi2_cdf(3.8415, 1) - 0.95) < 1e-4
    assert S.chi2_cdf(0.0, 5) == 0.0


def test_intersection():
    p = np.array([1.0, 0.0])
    q = np.array([0.0, 1.0])
    assert D.intersection_divergence(p, p) == 0.0
    assert abs(D.intersection_divergence(p, q) - 1.0) < 1e-12
