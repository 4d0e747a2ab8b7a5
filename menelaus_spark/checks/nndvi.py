"""NN-DVI: Nearest-Neighbor Density Variation Identification
(Liu et al. 2018) + its NNSP partitioner.

Semantics per /root/reference/menelaus/data_drift/nndvi.py:9-132 and
/root/reference/menelaus/partitioners/NNSpacePartitioner.py:5-105:
union + dedup of reference/test samples, kNN adjacency (self included),
LCM row normalization, NNPS distance d = sum(|v1M - v2M| / (v1M + v2M))
/ |D|, drift threshold from a Gaussian fit to ``sampling_times``
permutations of the membership vector at significance alpha.

Spark-first notes: the exact path's adjacency matrix is O(n^2), so it
operates on bounded SEEDED samples of each batch (the reference is
handed equally bounded numpy batches by its callers); sklearn
NearestNeighbors is replaced by an exact numpy brute-force kNN
(distance ties broken by index, matching sklearn's stable ordering for
exact search), scipy.stats.norm.fit/ppf by the mean/std MLE fit +
Acklam inverse CDF.

The SCALE path (``distributed=True``) builds the kNN adjacency as one
distributed pass: dedup-with-membership (groupBy over the feature
columns), BucketedRandomProjectionLSH self-join for candidates, exact
per-source top-k ranking (window), and collects only the sparse
O(k*|D|) edge list — never a dense matrix, never raw batches via
toPandas. The NNPS normalization uses the algebraic identity that the
reference's integer LCM factor Q cancels inside |m1-m2|/(m1+m2), so
per-source weights are 1/out_degree floats (no LCM overflow when LSH
returns uneven neighbor counts). The permutation threshold is seeded
per draw for byte-identical resume; point ids are content hashes
(xxhash64 over the feature tuple) sorted driver-side, so the
permutation stream is deterministic without any global sort.
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
                 alpha: float = 0.01, batch_sample_cap: int = 500, seed: int = 42,
                 distributed: bool = False, lsh_bucket_length: float = 2.0,
                 lsh_num_tables: int = 3):
        self.k_nn = k_nn
        self.sampling_times = sampling_times
        self.alpha = alpha
        self.batch_sample_cap = batch_sample_cap
        self.seed = seed
        self.distributed = distributed
        self.lsh_bucket_length = lsh_bucket_length
        self.lsh_num_tables = lsh_num_tables
        self.total_batches = 0
        self.batches_since_reset = 0
        self.drift_state: str | None = None
        self._input_cols: list[str] | None = None
        self.reference_batch: np.ndarray | None = None
        self.reference_df: DataFrame | None = None
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
        if self.distributed:
            self._check_schema(df)
            self.reference_df = df
        else:
            self.reference_batch = self._collect(df)

    def _check_schema(self, df: DataFrame) -> None:
        cols = list(df.columns)
        if self._input_cols is None:
            self._input_cols = cols
        elif cols != self._input_cols:
            raise ValueError("Columns of new data must match with columns of prior data.")

    # -- distributed (LSH-kNN) path --

    def _distributed_edges(self, ref: DataFrame, test: DataFrame):
        """One distributed candidate pass: dedup ref∪test with
        membership flags, LSH self-join, exact top-k per source.
        Returns driver arrays (ids sorted, v1, v2, src_idx, dst_idx)."""
        from pyspark.ml.feature import BucketedRandomProjectionLSH
        from pyspark.ml.functions import array_to_vector
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        cols = self._input_cols
        tagged = ref.select(*cols, F.lit(1).alias("__r"), F.lit(0).alias("__t")).unionByName(
            test.select(*cols, F.lit(0).alias("__r"), F.lit(1).alias("__t"))
        )
        # dedup across batches, keeping per-point membership (numpy
        # path's np.unique + v1/v2 indicator semantics)
        D = tagged.groupBy(*cols).agg(
            F.max("__r").alias("v1"), F.max("__t").alias("v2")
        ).withColumn("__id", F.xxhash64(*cols)).withColumn(
            "__vec", array_to_vector(F.array(*[F.col(c).cast("double") for c in cols]))
        )
        lsh = BucketedRandomProjectionLSH(
            inputCol="__vec", outputCol="__hashes",
            bucketLength=self.lsh_bucket_length,
            numHashTables=self.lsh_num_tables, seed=self.seed,
        )
        D = D.persist()
        model = lsh.fit(D)
        pairs = model.approxSimilarityJoin(D, D, float(1e18), distCol="__dist").select(
            F.col("datasetA.__id").alias("src"),
            F.col("datasetB.__id").alias("dst"),
            "__dist",
        )
        w = Window.partitionBy("src").orderBy("__dist", "dst")
        edges = (
            pairs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= self.k_nn)
            .select("src", "dst")
        )
        epdf = edges.toPandas()
        dpdf = D.select("__id", "v1", "v2").toPandas().sort_values("__id")
        D.unpersist()
        ids = dpdf["__id"].to_numpy()
        pos = {int(i): p for p, i in enumerate(ids)}
        src = np.fromiter((pos[int(s)] for s in epdf["src"]), dtype=np.int64,
                          count=len(epdf))
        dst = np.fromiter((pos[int(d)] for d in epdf["dst"]), dtype=np.int64,
                          count=len(epdf))
        return (
            dpdf["v1"].to_numpy(dtype=np.float64),
            dpdf["v2"].to_numpy(dtype=np.float64),
            src,
            dst,
        )

    @staticmethod
    def _sparse_nnps_distance(va, vb, n_points, src, dst, inv_w) -> float:
        """d = mean_j |m1-m2|/(m1+m2) with m(z)[j] = sum_{i in in(j)}
        z_i / w_i — the reference's LCM factor Q cancels in the ratio."""
        m1 = np.zeros(n_points)
        m2 = np.zeros(n_points)
        np.add.at(m1, dst, va[src] * inv_w[src])
        np.add.at(m2, dst, vb[src] * inv_w[src])
        denom = m1 + m2
        mask = denom > 0
        return float(np.sum(np.abs(m1 - m2)[mask] / denom[mask]) / n_points)

    def _update_distributed(self, df: DataFrame) -> str | None:
        v1, v2, src, dst = self._distributed_edges(self.reference_df, df)
        n = len(v1)
        deg = np.zeros(n)
        np.add.at(deg, src, 1.0)
        inv_w = np.divide(1.0, deg, out=np.zeros(n), where=deg > 0)
        # v1/v2 can overlap (a point present in both batches), exactly
        # as in the numpy path; permutations relabel with v2 = 1 - v1
        # as the reference's permutation scheme does
        self.d_act = self._sparse_nnps_distance(v1, v2, n, src, dst, inv_w)
        dists = np.empty(self.sampling_times)
        for i in range(self.sampling_times):
            rng = np.random.default_rng([self.seed, self.total_batches, i])
            z = rng.permutation(v1)
            dists[i] = self._sparse_nnps_distance(z, 1.0 - z, n, src, dst, inv_w)
        mu, std = float(np.mean(dists)), float(np.std(dists))
        self.threshold = mu + norm_ppf(1 - self.alpha) * std
        if self.d_act > self.threshold:
            self.drift_state = "drift"
            self.reference_df = df
        return self.drift_state

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
        if self.distributed:
            self._check_schema(df)
            self.total_batches += 1
            self.batches_since_reset += 1
            return self._update_distributed(df)
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
