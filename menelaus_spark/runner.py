"""ValidationSuite: orchestrates constraint + drift checks over an
Iceberg-style partitioned audio table, in partition-key order (the
batch sequence, SURVEY.md §1.1), with checkpoint/resume.

Per partition (one "batch" in reference terms):

- constraint checks: schema conformance, per-column profile stats,
  null-rate bounds, value ranges, accepted values, within-partition
  uniqueness, referential clip<->transcript anti-join, decode
  integrity (NaN feature rows);
- drift checks: HDDDM over (dur_ms, sr_hz), KS on dur_ms/sr_hz
  cumulative histograms, PSI on codec frequencies, kdq-tree over
  decoded-PCM feature vectors — the north_star detector set. The first
  partition initializes every reference; later partitions update the
  sequential state machines.

All heavy passes are distributed; only O(bins + leaves + categories)
summaries reach the driver. Completed partitions are recorded in the
CheckpointManifest (lineage fingerprint, metrics, serialized state,
verdict rows); a resumed run replays those verdicts byte-identically
and continues from the first unvisited partition.
"""

from __future__ import annotations

import time

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from menelaus_spark import audio
from menelaus_spark.checks.hdm import HDDDM
from menelaus_spark.checks.kdqtree import KdqTreeBatch
from menelaus_spark.functions import distances as dist
from menelaus_spark.operators import constraints as C
from menelaus_spark.operators import histograms as H
from menelaus_spark.state import CheckpointManifest
from menelaus_spark.verdicts import (
    DRIFT,
    FAIL,
    PASS,
    VERDICT_SCHEMA,
    VIOLATION_SCHEMA,
    Verdict,
)

KS_BINS = 1024


def ks_critical(n: int, m: int, alpha: float = 0.05) -> float:
    """Two-sample KS critical value: c(alpha) * sqrt((n+m)/(n*m))."""
    c = float(np.sqrt(-np.log(alpha / 2.0) / 2.0))
    return c * float(np.sqrt((n + m) / (n * m))) if n and m else float("inf")


class ValidationSuite:
    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str,
        partition_col: str = "part",
        key_col: str = "clip_id",
        expected_schema: T.StructType | None = None,
        null_rate_max: dict[str, float] | None = None,
        ranges: dict[str, tuple] | None = None,
        accepted_values: dict[str, list] | None = None,
        hdm_cols: tuple[str, ...] = ("dur_ms", "sr_hz"),
        ks_cols: tuple[str, ...] = ("dur_ms", "sr_hz"),
        psi_col: str | None = "codec",
        psi_threshold: float = 0.2,
        kdq_features: bool = True,
        referential: DataFrame | None = None,
        seed: int = 42,
        ks_alpha: float = 0.05,
        kdq_params: dict | None = None,
        hdm_params: dict | None = None,
    ):
        self.spark = spark
        self.manifest = CheckpointManifest(checkpoint_dir)
        self.partition_col = partition_col
        self.key_col = key_col
        self.expected_schema = expected_schema
        self.null_rate_max = null_rate_max or {}
        self.ranges = ranges or {}
        self.accepted_values = accepted_values or {}
        self.hdm_cols = list(hdm_cols)
        self.ks_cols = list(ks_cols)
        self.psi_col = psi_col
        self.psi_threshold = psi_threshold
        self.kdq_features = kdq_features
        self.referential = referential
        self.seed = seed
        self.ks_alpha = ks_alpha
        self.hdm = (
            HDDDM(detect_batch=2, order_col=None, seed=seed, **(hdm_params or {}))
            if self.hdm_cols
            else None
        )
        self.kdq = (
            KdqTreeBatch(seed=seed, **(kdq_params or {"count_ubound": 50, "bootstrap_samples": 200}))
            if kdq_features
            else None
        )
        # KS / PSI reference summaries (set on first partition)
        self._ks_ref: dict | None = None  # col -> {"lo","hi","counts","n"}
        self._psi_ref: dict | None = None  # {"freqs": {cat: n}, "n": int}

    # ------------------------------------------------------------- util

    def _fingerprint(self, part_df: DataFrame) -> dict:
        row = part_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(f"bit_xor(xxhash64({self.key_col}))").alias("h"),
        ).collect()[0]
        return {"n": int(row["n"]), "key_hash": int(row["h"] or 0)}

    # ---------------------------------------------------- check runners

    def _constraint_verdicts(self, pk: str, part_df: DataFrame, n_rows: int):
        verdicts, violations = [], []

        if self.expected_schema is not None:
            ok, problems = C.schema_check(part_df, self.expected_schema)
            verdicts.append(Verdict(pk, "schema", PASS if ok else FAIL, n_rows=n_rows,
                                    details=problems))

        # one aggregation pass: null counts + ranges are expression-only
        null_aggs = [
            F.avg(F.col(c).isNull().cast("double")).alias(f"null_{c}")
            for c in self.null_rate_max
        ]
        if null_aggs:
            row = part_df.agg(*null_aggs).collect()[0]
            for c, mx in self.null_rate_max.items():
                rate = float(row[f"null_{c}"] or 0.0)
                verdicts.append(Verdict(pk, f"null_rate:{c}", PASS if rate <= mx else FAIL,
                                        statistic=rate, threshold=mx, n_rows=n_rows))

        for c, (lo, hi) in self.ranges.items():
            bad = C.range_violations(part_df, c, lo, hi, key=self.key_col)
            n_bad = bad.count()
            verdicts.append(Verdict(pk, f"range:{c}", PASS if n_bad == 0 else FAIL,
                                    statistic=float(n_bad), threshold=0.0, n_rows=n_rows))
            if n_bad:
                violations.append(bad.withColumn("reason", F.lit(f"range:{c}")))

        for c, allowed in self.accepted_values.items():
            bad = C.accepted_values_violations(part_df, c, allowed, key=self.key_col)
            n_bad = bad.count()
            verdicts.append(Verdict(pk, f"accepted:{c}", PASS if n_bad == 0 else FAIL,
                                    statistic=float(n_bad), threshold=0.0, n_rows=n_rows))
            if n_bad:
                violations.append(bad.withColumn("reason", F.lit(f"accepted:{c}")))

        dups = C.uniqueness_violations(part_df, self.key_col)
        n_dup = dups.count()
        verdicts.append(Verdict(pk, f"unique:{self.key_col}", PASS if n_dup == 0 else FAIL,
                                statistic=float(n_dup), threshold=0.0, n_rows=n_rows))
        if n_dup:
            violations.append(
                dups.select("row_key", F.col("n_dup").cast("string").alias("value"))
                .withColumn("reason", F.lit(f"unique:{self.key_col}"))
            )

        if self.referential is not None:
            orphans = C.referential_orphans(
                part_df.select(self.key_col), self.referential.select(self.key_col),
                self.key_col,
            )
            n_orphan = orphans.count()
            verdicts.append(Verdict(pk, "referential:transcript", PASS if n_orphan == 0 else FAIL,
                                    statistic=float(n_orphan), threshold=0.0, n_rows=n_rows))
            if n_orphan:
                violations.append(
                    orphans.withColumn("value", F.lit(None).cast("string"))
                    .withColumn("reason", F.lit("referential:transcript"))
                )
        return verdicts, violations

    def _ks_psi_verdicts(self, pk: str, part_df: DataFrame, n_rows: int, is_ref: bool):
        verdicts = []
        if self.ks_cols:
            if is_ref:
                ranges = H.joint_minmax(part_df, self.ks_cols)
                hist = H.multi_feature_histogram(
                    part_df, {c: ranges[c] for c in self.ks_cols}, KS_BINS
                )
                mat = H.collect_histogram_matrix(hist, self.ks_cols, KS_BINS)
                self._ks_ref = {
                    c: {"lo": float(ranges[c][0]), "hi": float(ranges[c][1]),
                        "counts": mat[i].tolist(), "n": int(mat[i].sum())}
                    for i, c in enumerate(self.ks_cols)
                }
                for c in self.ks_cols:
                    verdicts.append(Verdict(pk, f"ks:{c}", PASS, statistic=0.0,
                                            threshold=None, n_rows=n_rows,
                                            details={"role": "reference"}))
            else:
                # clamp test values into the reference bin range so the
                # cumulative comparison stays aligned (mass outside the
                # reference range piles into the edge bins -> max CDF gap
                # still registers)
                ranges = {c: (self._ks_ref[c]["lo"], self._ks_ref[c]["hi"]) for c in self.ks_cols}
                clamped = part_df.select(
                    *[
                        F.least(F.greatest(F.col(c).cast("double"), F.lit(ranges[c][0])),
                                F.lit(ranges[c][1])).alias(c)
                        for c in self.ks_cols
                    ]
                )
                hist = H.multi_feature_histogram(clamped, ranges, KS_BINS)
                mat = H.collect_histogram_matrix(hist, self.ks_cols, KS_BINS)
                for i, c in enumerate(self.ks_cols):
                    ref = self._ks_ref[c]
                    stat = dist.ks_statistic(np.array(ref["counts"]), mat[i])
                    thr = ks_critical(ref["n"], int(mat[i].sum()), self.ks_alpha)
                    verdicts.append(Verdict(pk, f"ks:{c}", DRIFT if stat > thr else PASS,
                                            statistic=stat, threshold=thr, n_rows=n_rows))
        if self.psi_col:
            freqs = H.collect_frequencies(H.category_frequencies(part_df, self.psi_col))
            freqs = {str(k): v for k, v in freqs.items()}
            if is_ref:
                self._psi_ref = {"freqs": freqs, "n": n_rows}
                verdicts.append(Verdict(pk, f"psi:{self.psi_col}", PASS, statistic=0.0,
                                        threshold=self.psi_threshold, n_rows=n_rows,
                                        details={"role": "reference"}))
            else:
                r, t, _ = H.align_frequencies(self._psi_ref["freqs"], freqs)
                stat = dist.psi(r, t)
                verdicts.append(Verdict(pk, f"psi:{self.psi_col}",
                                        DRIFT if stat > self.psi_threshold else PASS,
                                        statistic=stat, threshold=self.psi_threshold,
                                        n_rows=n_rows))
        return verdicts

    def _drift_verdicts(self, pk: str, part_df: DataFrame, n_rows: int, is_ref: bool):
        verdicts, violations = [], []

        if self.hdm is not None:
            hdm_df = part_df.select(*[F.col(c).cast("double").alias(c) for c in self.hdm_cols])
            if is_ref:
                self.hdm.set_reference(hdm_df, batch_id=pk)
                verdicts.append(Verdict(pk, "hdddm", PASS, n_rows=n_rows,
                                        details={"role": "reference"}))
            else:
                state = self.hdm.update(hdm_df, batch_id=pk)
                det = {}
                if state == DRIFT and self.hdm.feature_info:
                    det["max_drift_feature"] = self.hdm.feature_info["max_drift_feature"]
                verdicts.append(Verdict(
                    pk, "hdddm", DRIFT if state == DRIFT else PASS,
                    statistic=self.hdm.epsilon[-1] if self.hdm.epsilon else None,
                    threshold=self.hdm.beta, n_rows=n_rows, details=det,
                ))

        if self.kdq is not None:
            feats = audio.features_df(part_df, key_col=self.key_col).persist()
            nan_rows = feats.filter(F.isnan("f0"))
            n_nan = nan_rows.count()
            verdicts.append(Verdict(pk, "decode_integrity", PASS if n_nan == 0 else FAIL,
                                    statistic=float(n_nan), threshold=0.0, n_rows=n_rows))
            if n_nan:
                violations.append(
                    nan_rows.select(F.col(self.key_col).alias("row_key"))
                    .withColumn("value", F.lit(None).cast("string"))
                    .withColumn("reason", F.lit("decode_integrity"))
                )
            clean = feats.filter(~F.isnan("f0")).drop(self.key_col)
            if is_ref:
                self.kdq.set_reference(clean)
                verdicts.append(Verdict(pk, "kdq_tree", PASS, n_rows=n_rows,
                                        details={"role": "reference"}))
            else:
                state = self.kdq.update(clean)
                verdicts.append(Verdict(pk, "kdq_tree", DRIFT if state == DRIFT else PASS,
                                        statistic=self.kdq.test_dist,
                                        threshold=self.kdq._critical_dist, n_rows=n_rows))

        verdicts.extend(self._ks_psi_verdicts(pk, part_df, n_rows, is_ref))
        return verdicts, violations

    # ------------------------------------------------------ state (re)store

    def _check_states(self) -> dict:
        states: dict = {}
        if self.hdm is not None:
            states["hdddm"] = self.hdm.get_state()
        if self.kdq is not None:
            states["kdq_tree"] = self.kdq.get_state()
            states["kdq_ref_pk"] = getattr(self, "_kdq_ref_pk", None)
        states["ks_ref"] = self._ks_ref
        states["psi_ref"] = self._psi_ref
        return states

    def _restore(self, df: DataFrame, states: dict) -> None:
        if self.hdm is not None and "hdddm" in states:
            ref_ids = states["hdddm"]["reference_batch_ids"]
            ref = [
                (pk, df.filter(F.col(self.partition_col) == self._pk_value(df, pk)).select(
                    *[F.col(c).cast("double").alias(c) for c in self.hdm_cols]))
                for pk in ref_ids
            ]
            self.hdm.set_state(states["hdddm"], ref)
        if self.kdq is not None and "kdq_tree" in states:
            ref_pk = states.get("kdq_ref_pk")
            ref_df = None
            if ref_pk is not None:
                part = df.filter(F.col(self.partition_col) == self._pk_value(df, ref_pk))
                ref_df = audio.features_df(part, key_col=self.key_col).filter(
                    ~F.isnan("f0")
                ).drop(self.key_col)
            self.kdq.set_state(states["kdq_tree"], ref_data=ref_df)
            self._kdq_ref_pk = ref_pk
        self._ks_ref = states.get("ks_ref")
        self._psi_ref = states.get("psi_ref")

    def _pk_value(self, df: DataFrame, pk: str):
        dtype = dict(df.dtypes).get(self.partition_col, "string")
        return int(pk) if dtype in ("int", "bigint", "smallint") else pk

    # -------------------------------------------------------------- run

    def run(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Validate every partition not yet in the manifest; return
        (verdicts, violations) DataFrames covering ALL partitions
        (replayed + newly computed)."""
        part_keys = [
            str(r[0])
            for r in df.select(self.partition_col).distinct().orderBy(self.partition_col).collect()
        ]
        done = set(self.manifest.completed_keys())
        todo = [pk for pk in part_keys if pk not in done]
        if done:
            self._restore(df, self.manifest.last_states())

        for seq, pk in enumerate(todo):
            t0 = time.time()
            part_df = df.filter(
                F.col(self.partition_col) == self._pk_value(df, pk)
            ).persist()
            fingerprint = self._fingerprint(part_df)
            n_rows = fingerprint["n"]
            is_ref = not self.manifest.records  # first partition ever = reference
            verdicts, violations = self._constraint_verdicts(pk, part_df, n_rows)
            d_verdicts, d_violations = self._drift_verdicts(pk, part_df, n_rows, is_ref)
            if is_ref and self.kdq is not None:
                self._kdq_ref_pk = pk
            elif self.kdq is not None and self.kdq.drift_state == DRIFT:
                self._kdq_ref_pk = pk
            verdicts.extend(d_verdicts)
            violations.extend(d_violations)

            n_viol = 0
            if violations:
                all_v = violations[0]
                for v in violations[1:]:
                    all_v = all_v.unionByName(v)
                all_v = all_v.select(
                    F.lit(pk).alias("partition_key"),
                    F.col("reason").alias("check_name"),
                    F.col("row_key"),
                    F.col("reason"),
                    F.create_map(F.lit("value"), F.coalesce(F.col("value"), F.lit(""))).alias("details"),
                )
                n_viol = all_v.count()
                all_v.write.mode("overwrite").parquet(self.manifest.violations_dir(pk))

            self.manifest.append(
                {
                    "partition_key": pk,
                    "seq": len(self.manifest.records),
                    "n_rows": n_rows,
                    "fingerprint": fingerprint,
                    "verdicts": [v.as_row() for v in verdicts],
                    "n_violations": n_viol,
                    "check_states": self._check_states(),
                    "elapsed_s": round(time.time() - t0, 3),
                }
            )
            part_df.unpersist()

        verdict_rows = self.manifest.replayed_verdicts()
        verdicts_df = self.spark.createDataFrame(verdict_rows, schema=VERDICT_SCHEMA)
        import os

        viol_root = os.path.join(self.manifest.dir, "violations")
        if os.path.isdir(viol_root) and any(os.scandir(viol_root)):
            violations_df = self.spark.read.parquet(
                *[os.path.join(viol_root, d) for d in sorted(os.listdir(viol_root))]
            )
        else:
            violations_df = self.spark.createDataFrame([], schema=VIOLATION_SCHEMA)
        return verdicts_df, violations_df
