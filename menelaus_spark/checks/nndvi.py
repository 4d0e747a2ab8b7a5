"""NN-DVI: Nearest-Neighbor Density Variation Identification
(Liu et al. 2018) + its NNSP partitioner.

Semantics per /root/reference/menelaus/data_drift/nndvi.py:9-132 and
/root/reference/menelaus/partitioners/NNSpacePartitioner.py:5-105:
union + dedup of reference/test samples, kNN adjacency (self included),
LCM row normalization, NNPS distance d = sum(|v1M - v2M| / (v1M + v2M))
/ |D|, drift threshold from a Gaussian fit to ``sampling_times``
permutations of the membership vector at significance alpha.

Spark-first notes: the adjacency matrix is O(n^2), so the detector
operates on bounded SEEDED samples of each batch (the reference is
handed equally bounded numpy batches by its callers); sklearn
NearestNeighbors is replaced by an exact numpy brute-force kNN
(distance ties broken by index, matching sklearn's stable ordering for
exact search), scipy.stats.norm.fit/ppf by the mean/std MLE fit +
Acklam inverse CDF. At 10^12 scale the candidate path is an LSH
``approxSimilarityJoin`` feeding the same NNPS math (SURVEY.md §2.4);
the permutation threshold is seeded per draw for byte-identical resume.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from menelaus_spark.functions.stats import norm_ppf


class NNSpacePartitioner:
    """Numpy NNSP (NNSpacePartitioner.py:5-105)."""

    def __init__(self, k: int):
        self.k = k
        self.D = None
        self.v1 = None
        self.v2 = None
        self.adjacency_matrix = None
        self.nnps_matrix = None

    def build(self, sample1: np.ndarray, sample2: np.ndarray) -> None:
        data = np.vstack((sample1, sample2))
        D, inverted = np.unique(data, axis=0, return_inverse=True)
        self.D = D
        v1_idx, v2_idx = np.array_split(inverted, 2)
        v1 = np.zeros(D.shape[0])
        v2 = np.zeros(D.shape[0])
        v1[v1_idx] = 1.0
        v2[v2_idx] = 1.0
        self.v1, self.v2 = v1, v2
        # exact kNN incl. self: stable argsort on squared distances
        sq = ((D[:, None, :] - D[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(sq, axis=1, kind="stable")[:, : self.k]
        M = np.zeros((D.shape[0], D.shape[0]))
        rows = np.repeat(np.arange(D.shape[0]), self.k)
        M[rows, order.ravel()] = 1.0
        self.adjacency_matrix = M
        weights = M.sum(axis=1).astype(np.int64)
        Q = np.lcm.reduce(weights)
        m = (Q / weights) * np.identity(len(weights))
        self.nnps_matrix = m @ M

    @staticmethod
    def compute_nnps_distance(nnps_matrix, v1, v2) -> float:
        m1 = v1 @ nnps_matrix
        m2 = v2 @ nnps_matrix
        return float(np.sum(np.abs(m1 - m2) / (m1 + m2)) / len(v1))


class NNDVI:
    """Batch NN-DVI over Spark DataFrames (nndvi.py:9-132 protocol:
    drift => test batch becomes the reference)."""

    def __init__(self, k_nn: int = 30, sampling_times: int = 500,
                 alpha: float = 0.01, batch_sample_cap: int = 500, seed: int = 42):
        self.k_nn = k_nn
        self.sampling_times = sampling_times
        self.alpha = alpha
        self.batch_sample_cap = batch_sample_cap
        self.seed = seed
        self.total_batches = 0
        self.batches_since_reset = 0
        self.drift_state: str | None = None
        self._input_cols: list[str] | None = None
        self.reference_batch: np.ndarray | None = None
        self.d_act: float | None = None
        self.threshold: float | None = None

    def _collect(self, df: DataFrame) -> np.ndarray:
        cols = list(df.columns)
        if self._input_cols is None:
            self._input_cols = cols
        elif cols != self._input_cols:
            raise ValueError("Columns of new data must match with columns of prior data.")
        n = df.count()
        if n > self.batch_sample_cap:
            df = df.sample(False, min(1.0, 1.05 * self.batch_sample_cap / n),
                           seed=self.seed).limit(self.batch_sample_cap)
        ary = df.toPandas().to_numpy(dtype=np.float64)
        if ary.shape[0] <= 1:
            raise ValueError("Input for batch detectors should contain more than one observation.")
        return ary

    def set_reference(self, df: DataFrame) -> None:
        self.reference_batch = self._collect(df)

    def _permutation_threshold(self, M, v_ref) -> float:
        dists = np.empty(self.sampling_times)
        for i in range(self.sampling_times):
            rng = np.random.default_rng([self.seed, self.total_batches, i])
            v1 = rng.permutation(v_ref)
            v2 = 1 - v1
            dists[i] = NNSpacePartitioner.compute_nnps_distance(M, v1, v2)
        mu, std = float(np.mean(dists)), float(np.std(dists))
        return mu + norm_ppf(1 - self.alpha) * std

    def update(self, df: DataFrame) -> str | None:
        if self.drift_state == "drift":
            self.batches_since_reset = 0
            self.drift_state = None
        test = self._collect(df)
        self.total_batches += 1
        self.batches_since_reset += 1
        nnsp = NNSpacePartitioner(self.k_nn)
        nnsp.build(self.reference_batch, test)
        self.d_act = NNSpacePartitioner.compute_nnps_distance(
            nnsp.nnps_matrix, nnsp.v1, nnsp.v2
        )
        self.threshold = self._permutation_threshold(nnsp.nnps_matrix, nnsp.v1)
        if self.d_act > self.threshold:
            self.drift_state = "drift"
            self.reference_batch = test
        return self.drift_state
