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
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from menelaus_spark import audio
from menelaus_spark.checks.hdm import HDDDM
from menelaus_spark.checks.kdqtree import KdqTreeBatch
from menelaus_spark.functions import distances as dist
from menelaus_spark.functions import stats as S
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
# Total clean-row cap for the kdq small-table fast path (one Arrow
# collect of the feature matrix replaces every per-drift-event
# sample-collect + leaf-count job). Sized so the driver work it
# serializes (collect + tree builds + bincounts, ~10 MB / well under a
# second at the cap) stays far below the per-job scheduling latency it
# removes — and BELOW the scaling-witness table sizes (800k clips),
# where the distributed counts must keep scaling with cores and do:
# above the cap the distributed chain runs byte-for-byte unchanged.
KDQ_DRIVER_ROW_CAP = 100_000
# Same economics for the KS/PSI/HDM summary pass: one bounded Arrow
# collect + numpy-twin binning under the cap, exploded salted
# aggregation above it.
SUMMARY_DRIVER_ROW_CAP = 100_000


def _f0_clean():
    """Row decodes successfully. Decode failures arrive as NULL
    through the Arrow boundary (pandas NaN -> null), so every filter
    must be null-robust, not isnan-only."""
    return F.col("f0").isNotNull() & ~F.isnan("f0")


def _f0_bad():
    return F.col("f0").isNull() | F.isnan("f0")


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
        chisq_alpha: float | None = None,
        entropy_min: float | None = None,
        hot_key_max_frac: dict | None = None,
        emd_cols: tuple[str, ...] = (),
        emd_threshold: float | dict | None = None,
        cvm_cols: tuple[str, ...] = (),
        cvm_threshold: float | dict | None = None,
        kdq_features: bool = True,
        referential: DataFrame | None = None,
        seed: int = 42,
        ks_alpha: float = 0.05,
        kdq_params: dict | None = None,
        hdm_params: dict | None = None,
        hdm_input_partitions: int = 8,
        global_uniqueness: bool = True,
        uniqueness_mode: str = "exact",
        uniqueness_sketch_p: int = 12,
        neardup_rate_max: float | None = None,
        cps_bounds: tuple | None = None,
        payload_tol: float | None = None,
        payload_codecs: tuple | None = None,
        payload_bps: dict | None = None,
        codec_col: str = "codec",
        quality_rules: dict | None = None,
        meta_rules: dict | None = None,
        transcript_col: str = "transcript",
        dur_col: str = "dur_ms",
        sr_col: str = "sr_hz",
        bytes_col: str = "bytes",
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
        # chi-squared homogeneity test on the SAME collected category
        # frequencies PSI uses (zero extra passes): the hypothesis-test
        # sibling of PSI — drift when stat > chi2_critical(k-1, alpha),
        # a principled alpha-level threshold instead of PSI's
        # rule-of-thumb bands.
        if chisq_alpha is not None:
            if psi_col is None:
                raise ValueError(
                    "chisq_alpha requires psi_col (the chi-squared test "
                    "rides the PSI frequency pass)")
            if not 0.0 < chisq_alpha < 1.0:
                raise ValueError("chisq_alpha must be in (0, 1)")
        self.chisq_alpha = chisq_alpha
        # Shannon-entropy floor on the psi_col category distribution
        # (deequ-style profile constraint): a partition whose
        # distribution COLLAPSES (one codec swallows everything) fails
        # even when no new category appears. Same collected
        # frequencies, zero extra passes; checked on EVERY partition
        # including the reference (no baseline needed).
        if entropy_min is not None and psi_col is None:
            raise ValueError(
                "entropy_min requires psi_col (the entropy floor rides "
                "the PSI frequency pass)")
        self.entropy_min = entropy_min
        # heavy-hitter ceiling: {column: max mode share}. A partition
        # where one value of a HIGH-CARDINALITY column (e.g.
        # transcript) swallows more than the ceiling fails — the
        # boilerplate-flood check ("thank you for watching" x 10^6)
        # that frequency-family checks can't see because the column
        # has too many categories to collect. See _hotkey_verdicts.
        self.hot_key_max_frac = hot_key_max_frac or None
        # Earth Mover's (1-Wasserstein) drift vs the reference
        # partition, computed from the SAME collected KS histograms —
        # zero extra passes, so emd_cols must be a subset of ks_cols.
        # Thresholds are in the column's own units (a dict per column,
        # or one float for all); EMD integrates the whole CDF gap, so
        # it accumulates mean shifts that KS's single max understates.
        self.emd_cols = list(emd_cols)
        missing = set(self.emd_cols) - set(self.ks_cols)
        if missing:
            raise ValueError(
                f"emd_cols must be a subset of ks_cols (EMD rides the KS "
                f"histogram pass); not in ks_cols: {sorted(missing)}")
        if self.emd_cols and emd_threshold is None:
            raise ValueError("emd_cols requires emd_threshold")
        self.emd_threshold = emd_threshold
        # Cramer-von Mises: pooled-weighted squared CDF gap, same
        # collected KS histograms, same subset rule as EMD. Scale-free
        # in [0, 1] (thresholds need no column units, unlike EMD's).
        self.cvm_cols = list(cvm_cols)
        missing = set(self.cvm_cols) - set(self.ks_cols)
        if missing:
            raise ValueError(
                f"cvm_cols must be a subset of ks_cols (CvM rides the KS "
                f"histogram pass); not in ks_cols: {sorted(missing)}")
        if self.cvm_cols and cvm_threshold is None:
            raise ValueError("cvm_cols requires cvm_threshold")
        self.cvm_threshold = cvm_threshold
        self.kdq_features = kdq_features
        self.referential = referential
        self.seed = seed
        self.ks_alpha = ks_alpha
        # the HDM inputs are tiny 2-column numeric projections that get
        # cached and re-unioned every batch; coalescing them keeps the
        # per-update task count O(hdm_input_partitions x batches) instead
        # of O(input_splits x batches). Size to ~rows/10M at real scale.
        self.hdm_input_partitions = hdm_input_partitions
        hdm_kwargs = {"detect_batch": 2, "order_col": None, "seed": seed}
        hdm_kwargs.update(hdm_params or {})  # callers may override defaults
        self.hdm = HDDDM(**hdm_kwargs) if self.hdm_cols else None
        self.kdq = (
            KdqTreeBatch(seed=seed, **(kdq_params or {"count_ubound": 50, "bootstrap_samples": 200}))
            if kdq_features
            else None
        )
        self.global_uniqueness = global_uniqueness
        # "exact": count vs countDistinct (a full key shuffle at
        # 10^12 rows). "sketch": HyperLogLog screen first (one scan,
        # a 2^p-row register shuffle, NO key shuffle); the exact pass
        # runs only when the estimate can't rule duplicates out within
        # 3-sigma sketch noise — the scale-path default.
        if uniqueness_mode not in ("exact", "sketch"):
            raise ValueError(f"uniqueness_mode must be exact|sketch, got {uniqueness_mode!r}")
        self.uniqueness_mode = uniqueness_mode
        self.uniqueness_sketch_p = uniqueness_sketch_p
        # payload near-duplicate rate (spectral-fingerprint shingle
        # path, operators/audio_dedup.py): fraction of clips that are a
        # member of at least one near-dup pair. Global like uniqueness
        # (pairs cross partitions); the most expensive global family
        # (one extra decode pass over the table per run) — off by
        # default, enable for corpus-hygiene validation runs.
        self.neardup_rate_max = neardup_rate_max
        # audio-depth checks (north_star: audio clip + transcript pairs).
        # cps_bounds / payload_tol are pure-JVM row predicates that ride
        # the fused constraint aggregation; quality_rules are per-clip
        # thresholds over decode-pass metrics (audio.QUALITY_COLS):
        #   {"clip_rate_max": .., "silence_ratio_max": ..}
        self.cps_bounds = cps_bounds
        self.payload_tol = payload_tol
        # payload_expected_and_tol models the mono PCM16 44-byte-header
        # WAV layout; on tables whose payloads are genuinely compressed
        # (opus/mp3/...), restrict the check to container codecs via
        # payload_codecs=("pcm","wav") so every compressed row isn't
        # flagged. None (default) checks all rows — correct whenever
        # the physical container is WAV regardless of the codec label.
        self.payload_codecs = tuple(payload_codecs) if payload_codecs else None
        # codec -> bytes/sample for codec-aware payload modeling (e.g.
        # {"ulaw": 1.0} for G.711 mu-law WAVs); unmapped codecs keep the
        # PCM16 default of 2 bytes/sample
        self.payload_bps = dict(payload_bps) if payload_bps else None
        self.codec_col = codec_col
        self.quality_rules = quality_rules or None
        # metadata-consistency: compare the CLAIMED (sr_hz, dur_ms,
        # codec) columns against the container header's own facts
        # (audio.wav_header_facts, riding the decode pass as the
        # q_hdr_* columns — zero extra reads of the binary column).
        # Catches the lies the O(length) payload model cannot: rate
        # doubled + duration halved (byte count unchanged), or a codec
        # label swapped between equal-rate codecs (mu-law <-> A-law).
        # Keys: "sr" (bool, default True — claimed rate must equal the
        # header rate), "dur_tol_ms" (float|None — |header duration -
        # claimed| bound), "codec_tags" ({label: fmt_tag} — labels in
        # the map must sit over a container with that format tag;
        # unmapped labels are skipped, so corpora whose labels are
        # known-logical (e.g. "flac" over PCM16 test fixtures) aren't
        # mass-flagged).
        self.meta_rules = dict(meta_rules) if meta_rules else None
        self.transcript_col = transcript_col
        self.dur_col = dur_col
        self.sr_col = sr_col
        self.bytes_col = bytes_col
        # KS / PSI reference summaries (set on first partition)
        self._ks_ref: dict | None = None  # col -> {"lo","hi","counts","n"}
        self._psi_ref: dict | None = None  # {"freqs": {cat: n}, "n": int}
        self._feats_cache = None

    # ---------------------------------------------------- check runners

    def _payload_in_decode(self) -> bool:
        """The payload-size check needs length(bytes). When a decode
        pass runs anyway (kdq features / quality rules), the length
        rides that pass's quality columns so the huge binary column is
        read EXACTLY ONCE per suite run; only a suite with no decode
        pass at all falls back to length(bytes) inside the fused
        constraint aggregation."""
        return self.payload_tol is not None and (
            self.kdq is not None or self.quality_rules is not None
            or self.meta_rules is not None
        )

    def _quality_active(self) -> bool:
        return (self.quality_rules is not None or self._payload_in_decode()
                or self.meta_rules is not None)

    def _feats_carry_cols(self, with_part: bool) -> tuple:
        carry = (self.partition_col,) if with_part else ()
        if self._payload_in_decode():
            carry += (self.sr_col, self.dur_col)
            if self.payload_codecs is not None or self.payload_bps is not None:
                carry += (self.codec_col,)
        if self.meta_rules is not None:
            extra = (self.sr_col, self.dur_col)
            if self.meta_rules.get("codec_tags"):
                extra += (self.codec_col,)
            carry += tuple(c for c in extra if c not in carry)
        return carry

    def _payload_codec_gate(self):
        """Row predicate limiting the payload-size check to rows whose
        codec names a PCM/WAV container (no-op when ungated)."""
        if self.payload_codecs is None:
            return F.lit(True)
        return F.col(self.codec_col).isin(list(self.payload_codecs))

    def _quality_conds(self) -> list:
        """(check_name, row predicate over the feats frame, value expr)
        in fixed emission order — shared by both execution paths so
        verdict tables stay byte-identical. Memoized per instance: the
        list depends only on the (immutable) suite config, and building
        these Column trees costs ~0.1 s of py4j round-trips per call —
        the old per-partition rebuild was ~1 s of pure driver chatter
        per 10-partition run (cProfile)."""
        cached = getattr(self, "_quality_conds_cache", None)
        if cached is not None:
            return cached
        out = []
        clean = _f0_clean()
        rules = self.quality_rules or {}
        if "clip_rate_max" in rules:
            out.append(("audio_clipping",
                        clean & (F.col("q_clip_rate") > F.lit(rules["clip_rate_max"])),
                        F.round(F.col("q_clip_rate"), 4).cast("string")))
        if "silence_ratio_max" in rules:
            out.append(("audio_silence",
                        clean & (F.col("q_silence_ratio") > F.lit(rules["silence_ratio_max"])),
                        F.round(F.col("q_silence_ratio"), 4).cast("string")))
        if "dc_offset_max" in rules:
            out.append(("audio_dc_offset",
                        clean & (F.abs(F.col("q_dc_offset"))
                                 > F.lit(rules["dc_offset_max"])),
                        F.round(F.col("q_dc_offset"), 4).cast("string")))
        if "crest_min_db" in rules:
            # over-compression / hard-limiting detection: crest factor
            # (peak/RMS, dB) collapses toward 0 under saturation. The
            # silence guard keeps all-silent clips (crest reported 0)
            # with the audio_silence check where they belong.
            out.append(("audio_crest",
                        clean & (F.col("q_silence_ratio") < F.lit(1.0))
                        & (F.col("q_crest_db") < F.lit(rules["crest_min_db"])),
                        F.round(F.col("q_crest_db"), 4).cast("string")))
        if "min_band_ratio" in rules:
            # upsampling / bandwidth-mismatch detection from the
            # ALREADY-COMPUTED spectral bands: a clip whose upper-half
            # spectrum carries almost no energy was upsampled from a
            # lower rate than its sr_hz claims. Zero extra decode cost
            # — a JVM expression over the cached feature columns
            # (bands f4..f11 are log1p(mean power) over 8 equal slices
            # of 0..nyquist; expm1 undoes the compression).
            hi = sum(F.expm1(F.col(f"f{i}")) for i in range(8, audio.N_FEATURES))
            tot = sum(F.expm1(F.col(f"f{i}")) for i in range(4, audio.N_FEATURES))
            out.append(("audio_bandwidth",
                        clean & (tot > F.lit(0.0))
                        & ((hi / tot) < F.lit(rules["min_band_ratio"])),
                        F.round(hi / tot, 6).cast("string")))
        if self._payload_in_decode():
            expected, tol = C.payload_expected_and_tol(
                self.sr_col, self.dur_col, self.payload_tol,
                self.codec_col, self.payload_bps,
            )
            # explicit NULL/NaN guard: q_byte_len is missing for NULL
            # payloads (mirroring the fallback path's isNotNull), and
            # Spark sorts NaN ABOVE every double, so a bare > would
            # flag such rows
            out.append(("payload_size",
                        F.col("q_byte_len").isNotNull()
                        & ~F.isnan("q_byte_len")
                        & self._payload_codec_gate()
                        & (F.abs(F.col("q_byte_len") - expected) > tol),
                        F.col("q_byte_len").cast("long").cast("string")))
        if self.meta_rules is not None:
            m = self.meta_rules
            lies = F.lit(False)
            if m.get("sr", True):
                lies = lies | (F.col("q_hdr_sr")
                               != F.col(self.sr_col).cast("double"))
            if m.get("dur_tol_ms") is not None:
                lies = lies | (
                    F.abs(F.col("q_hdr_ms") - F.col(self.dur_col).cast("double"))
                    > F.lit(float(m["dur_tol_ms"])))
            tags = m.get("codec_tags")
            if tags:
                want = F.create_map(
                    *[F.lit(x) for k, v in sorted(tags.items())
                      for x in (k, float(v))])
                exp_tag = want[F.col(self.codec_col)]
                lies = lies | (exp_tag.isNotNull()
                               & (F.col("q_hdr_tag") != exp_tag))
            # rows whose header never parsed belong to decode_integrity,
            # not here — same division of labor as the quality checks
            out.append(("metadata_consistency",
                        F.col("q_hdr_sr").isNotNull()
                        & ~F.isnan("q_hdr_sr") & lies,
                        F.concat_ws(
                            ":",
                            F.col("q_hdr_sr").cast("long").cast("string"),
                            F.round(F.col("q_hdr_ms"), 1).cast("string"),
                            F.col("q_hdr_tag").cast("long").cast("string"))))
        self._quality_conds_cache = out
        return out

    def _quality_counts_by_part(self, feats: DataFrame, pks: list[str]) -> dict:
        """Violation counts for EVERY quality check x partition in ONE
        aggregation over the cached feats frame (keeps the vectorized
        path's job count O(1) in the partition count)."""
        conds = self._quality_conds()
        if not conds:
            return {}
        rows = feats.groupBy(self.partition_col).agg(*[
            F.sum(cond.cast("long")).alias(f"__q{i}")
            for i, (_, cond, _) in enumerate(conds)
        ]).collect()
        out = {str(r[self.partition_col]): [int(r[f"__q{i}"] or 0)
                                            for i in range(len(conds))]
               for r in rows}
        return {pk: out.get(pk, [0] * len(conds)) for pk in pks}

    def _quality_verdicts(self, pk: str, feats_pk: DataFrame, n_rows: int,
                          precounts: list[int] | None = None):
        """Per-clip audio-quality + payload-size verdicts from the
        decode-pass metrics: ONE tiny aggregation over the cached
        (key, f*, q*) frame (or the precollected grouped counts);
        violation rows only materialized on failure."""
        conds = self._quality_conds()
        if not conds:
            return [], []
        if precounts is None:
            row = feats_pk.agg(*[
                F.sum(cond.cast("long")).alias(f"__q{i}")
                for i, (_, cond, _) in enumerate(conds)
            ]).collect()[0]
            precounts = [int(row[f"__q{i}"] or 0) for i in range(len(conds))]
        verdicts, violations = [], []
        for i, (name, cond, value) in enumerate(conds):
            n_bad = precounts[i]
            verdicts.append(Verdict(pk, name, PASS if n_bad == 0 else FAIL,
                                    statistic=float(n_bad), threshold=0.0, n_rows=n_rows))
            if n_bad:
                violations.append(
                    feats_pk.filter(cond)
                    .select(F.col(self.key_col).alias("row_key"),
                            value.alias("value"))
                    .withColumn("reason", F.lit(name))
                )
        return verdicts, violations

    def _constraint_aggs(self) -> list:
        """All scalar constraint statistics + the lineage fingerprint
        as ONE aggregation expression list: count, key-hash, exact
        distinct keys, null rates, out-of-range counts, bad-category
        counts. One distributed pass per partition instead of one pass
        per rule — the job-count reduction that keeps fixed overhead
        from dominating at high parallelism."""
        aggs = [
            F.count(F.lit(1)).alias("__n"),
            F.expr(f"bit_xor(xxhash64({self.key_col}))").alias("__key_hash"),
            F.countDistinct(self.key_col).alias("__n_distinct"),
        ]
        for c in self.null_rate_max:
            aggs.append(F.avg(F.col(c).isNull().cast("double")).alias(f"__null_{c}"))
        for c, (lo, hi) in self.ranges.items():
            bad = (F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))
            aggs.append(F.sum(bad.cast("long")).alias(f"__range_{c}"))
        for c, allowed in self.accepted_values.items():
            bad = ~F.col(c).isin(allowed) | F.col(c).isNull()
            aggs.append(F.sum(bad.cast("long")).alias(f"__acc_{c}"))
        if self.cps_bounds is not None:
            lo, hi = self.cps_bounds
            aggs.append(F.sum(
                C.transcript_rate_cond(self.transcript_col, self.dur_col, lo, hi)
                .cast("long")).alias("__cps_bad"))
        if self.payload_tol is not None and not self._payload_in_decode():
            aggs.append(F.sum(
                (C.payload_size_cond(self.bytes_col, self.sr_col, self.dur_col,
                                     self.payload_tol, self.codec_col,
                                     self.payload_bps)
                 & self._payload_codec_gate())
                .cast("long")).alias("__paysize_bad"))
        # test-side min/max for the HDM + KS drift checks ride along in
        # the same pass (HDM consumes them via `precomputed`), plus
        # mean + approx-quantile sketches for the manifest metrics
        for c in sorted(set(self.hdm_cols) | set(self.ks_cols)):
            col = F.col(c).cast("double")
            aggs += [
                F.min(col).alias(f"__mm_lo_{c}"),
                F.max(col).alias(f"__mm_hi_{c}"),
                F.avg(col).alias(f"__mean_{c}"),
                F.percentile_approx(col, 0.5, 1000).alias(f"__p50_{c}"),
                F.percentile_approx(col, 0.95, 1000).alias(f"__p95_{c}"),
            ]
        return aggs

    def _constraint_verdicts(self, pk: str, part_df: DataFrame, stats: dict):
        verdicts, violations = [], []
        n_rows = int(stats["__n"])

        if self.expected_schema is not None:
            ok, problems = C.schema_check(part_df, self.expected_schema)
            verdicts.append(Verdict(pk, "schema", PASS if ok else FAIL, n_rows=n_rows,
                                    details=problems))

        for c, mx in self.null_rate_max.items():
            rate = float(stats[f"__null_{c}"] or 0.0)
            verdicts.append(Verdict(pk, f"null_rate:{c}", PASS if rate <= mx else FAIL,
                                    statistic=rate, threshold=mx, n_rows=n_rows))

        for c, (lo, hi) in self.ranges.items():
            n_bad = int(stats[f"__range_{c}"] or 0)
            verdicts.append(Verdict(pk, f"range:{c}", PASS if n_bad == 0 else FAIL,
                                    statistic=float(n_bad), threshold=0.0, n_rows=n_rows))
            if n_bad:  # violation rows only materialized on failure
                violations.append(
                    C.range_violations(part_df, c, lo, hi, key=self.key_col)
                    .withColumn("reason", F.lit(f"range:{c}"))
                )

        for c, allowed in self.accepted_values.items():
            n_bad = int(stats[f"__acc_{c}"] or 0)
            verdicts.append(Verdict(pk, f"accepted:{c}", PASS if n_bad == 0 else FAIL,
                                    statistic=float(n_bad), threshold=0.0, n_rows=n_rows))
            if n_bad:
                violations.append(
                    C.accepted_values_violations(part_df, c, allowed, key=self.key_col)
                    .withColumn("reason", F.lit(f"accepted:{c}"))
                )

        if self.cps_bounds is not None:
            lo, hi = self.cps_bounds
            n_bad = int(stats["__cps_bad"] or 0)
            verdicts.append(Verdict(pk, "transcript_rate", PASS if n_bad == 0 else FAIL,
                                    statistic=float(n_bad), threshold=0.0, n_rows=n_rows))
            if n_bad:
                violations.append(
                    C.transcript_rate_violations(
                        part_df, self.transcript_col, self.dur_col, lo, hi,
                        key=self.key_col)
                    .withColumn("reason", F.lit("transcript_rate"))
                )

        if self.payload_tol is not None and not self._payload_in_decode():
            n_bad = int(stats["__paysize_bad"] or 0)
            verdicts.append(Verdict(pk, "payload_size", PASS if n_bad == 0 else FAIL,
                                    statistic=float(n_bad), threshold=0.0, n_rows=n_rows))
            if n_bad:
                violations.append(
                    C.payload_size_violations(
                        part_df.filter(self._payload_codec_gate()),
                        self.bytes_col, self.sr_col, self.dur_col,
                        self.payload_tol, key=self.key_col)
                    .withColumn("reason", F.lit("payload_size"))
                )

        n_dup_rows = n_rows - int(stats["__n_distinct"])
        verdicts.append(Verdict(pk, f"unique:{self.key_col}",
                                PASS if n_dup_rows == 0 else FAIL,
                                statistic=float(n_dup_rows), threshold=0.0, n_rows=n_rows))
        if n_dup_rows:
            dups = C.uniqueness_violations(part_df, self.key_col)
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

    def _ks_psi_ranges(self, ref_stats: dict) -> dict:
        """Bin ranges for the KS histograms: the stored reference
        ranges, or (fresh run) the first partition's min/max from the
        constraint pass."""
        if not self.ks_cols:
            return {}
        if self._ks_ref:
            return {c: (self._ks_ref[c]["lo"], self._ks_ref[c]["hi"]) for c in self.ks_cols}
        return {c: (ref_stats[f"__mm_lo_{c}"], ref_stats[f"__mm_hi_{c}"]) for c in self.ks_cols}

    def _ks_psi_collect(self, df: DataFrame, ranges: dict, by_part: bool = False) -> dict:
        """KS histograms (all columns) + PSI category frequencies in
        ONE exploded salted aggregation pass — optionally grouped by
        partition key, so a single pass covers EVERY partition
        (vectorized-over-partitions plan). Returns
        {pk (or None): (mat {col: counts}, freqs {cat: n})}."""
        structs = []
        for c in self.ks_cols:
            # clamp test values into the reference bin range so the
            # cumulative comparison stays aligned (mass outside the
            # range piles into the edge bins -> CDF gap registers)
            col = F.least(
                F.greatest(F.col(c).cast("double"), F.lit(float(ranges[c][0]))),
                F.lit(float(ranges[c][1])),
            )
            structs.append(F.struct(
                F.lit(f"ks:{c}").alias("kind"),
                H.bin_index_col(col, ranges[c][0], ranges[c][1], KS_BINS)
                .cast("string").alias("key"),
            ))
        if self.psi_col:
            structs.append(F.struct(
                F.lit("psi").alias("kind"),
                F.col(self.psi_col).cast("string").alias("key"),
            ))
        keys = ["kind", "key"]
        sel = [F.explode(F.array(*structs)).alias("kk")]
        if by_part:
            sel.insert(0, F.col(self.partition_col).cast("string").alias("__pk"))
            keys = ["__pk", "kind", "key"]
        exploded = (
            df.select(*sel)
            .select(*(["__pk"] if by_part else []), "kk.kind", "kk.key")
            .filter(F.col("key").isNotNull())
        )
        rows = H.salted_count(exploded, keys).collect()
        out: dict = {}
        for r in rows:
            pk = r["__pk"] if by_part else None
            mat, freqs = out.setdefault(pk, ({c: np.zeros(KS_BINS) for c in self.ks_cols}, {}))
            if r["kind"] == "psi":
                freqs[str(r["key"])] = int(r["count"])
            else:
                mat[r["kind"][3:]][int(r["key"])] = float(r["count"])
        return out

    @staticmethod
    def _bin_blame(ref_counts, test_counts, lo: float, hi: float,
                   squared_pooled: bool = False) -> dict:
        """Drift localization for the CDF-gap family: the bin that
        contributes most to the statistic (|gap| for KS/EMD,
        pooled-weighted squared gap for CvM), reported as its value
        interval — so a drifted verdict says WHERE the distribution
        moved, not just that it did. Driver-side numpy over the
        already-collected histograms; attached to DRIFT verdicts only.
        np.argmax's lowest-index tie rule keeps it deterministic."""
        r = np.asarray(ref_counts, dtype=np.float64)
        t = np.asarray(test_counts, dtype=np.float64)
        rs, ts = r.sum(), t.sum()
        if rs == 0 or ts == 0:
            return {}
        gap = np.cumsum(r) / rs - np.cumsum(t) / ts
        contrib = ((r + t) / (rs + ts)) * gap * gap if squared_pooled else np.abs(gap)
        i = int(np.argmax(contrib))
        bw = (float(hi) - float(lo)) / r.size
        return {"top_bin": i,
                "bin_lo": round(float(lo) + i * bw, 6),
                "bin_hi": round(float(lo) + (i + 1) * bw, 6),
                "cdf_gap": round(float(gap[i]), 6)}

    @staticmethod
    def _cat_blame(cats, contrib) -> dict:
        """Top-contributing category for the frequency family (PSI /
        chi-squared), attached to DRIFT verdicts only."""
        i = int(np.argmax(contrib))
        return {"top_category": str(cats[i]),
                "contribution": round(float(contrib[i]), 6)}

    def _ks_psi_decide(self, pk: str, n_rows: int, is_ref: bool, ranges: dict,
                       mat: dict, freqs: dict):
        verdicts = []
        if self.ks_cols:
            if is_ref:
                self._ks_ref = {
                    c: {"lo": float(ranges[c][0]), "hi": float(ranges[c][1]),
                        "counts": mat[c].tolist(), "n": int(mat[c].sum())}
                    for c in self.ks_cols
                }
                for c in self.ks_cols:
                    verdicts.append(Verdict(pk, f"ks:{c}", PASS, statistic=0.0,
                                            threshold=None, n_rows=n_rows,
                                            details={"role": "reference"}))
            else:
                for c in self.ks_cols:
                    ref = self._ks_ref[c]
                    stat = dist.ks_statistic(np.array(ref["counts"]), mat[c])
                    thr = ks_critical(ref["n"], int(mat[c].sum()), self.ks_alpha)
                    drifted = stat > thr
                    blame = (self._bin_blame(ref["counts"], mat[c],
                                             ref["lo"], ref["hi"])
                             if drifted else {})
                    verdicts.append(Verdict(pk, f"ks:{c}", DRIFT if drifted else PASS,
                                            statistic=stat, threshold=thr,
                                            n_rows=n_rows, details=blame))
        for c in self.emd_cols:
            if is_ref:
                verdicts.append(Verdict(pk, f"emd:{c}", PASS, statistic=0.0,
                                        threshold=None, n_rows=n_rows,
                                        details={"role": "reference"}))
            else:
                thr = (self.emd_threshold[c]
                       if isinstance(self.emd_threshold, dict)
                       else float(self.emd_threshold))
                ref = self._ks_ref[c]  # emd_cols <= ks_cols: always set
                stat = dist.emd_1d(np.array(ref["counts"]), mat[c],
                                   ref["lo"], ref["hi"])
                drifted = stat > thr
                blame = (self._bin_blame(ref["counts"], mat[c],
                                         ref["lo"], ref["hi"])
                         if drifted else {})
                verdicts.append(Verdict(pk, f"emd:{c}", DRIFT if drifted else PASS,
                                        statistic=stat, threshold=thr,
                                        n_rows=n_rows, details=blame))
        for c in self.cvm_cols:
            if is_ref:
                verdicts.append(Verdict(pk, f"cvm:{c}", PASS, statistic=0.0,
                                        threshold=None, n_rows=n_rows,
                                        details={"role": "reference"}))
            else:
                thr = (self.cvm_threshold[c]
                       if isinstance(self.cvm_threshold, dict)
                       else float(self.cvm_threshold))
                ref = self._ks_ref[c]  # cvm_cols <= ks_cols: always set
                stat = dist.cvm_statistic(np.array(ref["counts"]), mat[c])
                drifted = stat > thr
                blame = (self._bin_blame(ref["counts"], mat[c],
                                         ref["lo"], ref["hi"],
                                         squared_pooled=True)
                         if drifted else {})
                verdicts.append(Verdict(pk, f"cvm:{c}", DRIFT if drifted else PASS,
                                        statistic=stat, threshold=thr,
                                        n_rows=n_rows, details=blame))
        if self.psi_col:
            if is_ref:
                self._psi_ref = {"freqs": freqs, "n": n_rows}
                verdicts.append(Verdict(pk, f"psi:{self.psi_col}", PASS, statistic=0.0,
                                        threshold=self.psi_threshold, n_rows=n_rows,
                                        details={"role": "reference"}))
                if self.chisq_alpha is not None:
                    verdicts.append(Verdict(pk, f"chisq:{self.psi_col}", PASS,
                                            statistic=0.0, threshold=None,
                                            n_rows=n_rows,
                                            details={"role": "reference"}))
            else:
                r, t, cats = H.align_frequencies(self._psi_ref["freqs"], freqs)
                stat = dist.psi(r, t)
                drifted = stat > self.psi_threshold
                blame = {}
                if drifted and r.sum() > 0 and t.sum() > 0:
                    eps = 1e-4
                    p = np.maximum(r / r.sum(), eps)
                    q = np.maximum(t / t.sum(), eps)
                    blame = self._cat_blame(cats, (q - p) * np.log(q / p))
                verdicts.append(Verdict(pk, f"psi:{self.psi_col}",
                                        DRIFT if drifted else PASS,
                                        statistic=stat, threshold=self.psi_threshold,
                                        n_rows=n_rows, details=blame))
                if self.chisq_alpha is not None:
                    stat, dof = dist.chi2_homogeneity(r, t)
                    thr = (S.chi2_critical(dof, self.chisq_alpha)
                           if dof > 0 else float("inf"))
                    details = {"dof": dof, "alpha": self.chisq_alpha}
                    if stat > thr:
                        # per-category (O-E)^2/E summed over both samples
                        pooled = r + t
                        mask = pooled > 0
                        p = pooled[mask] / (r.sum() + t.sum())
                        er, et = r.sum() * p, t.sum() * p
                        contrib = ((r[mask] - er) ** 2 / er
                                   + (t[mask] - et) ** 2 / et)
                        details.update(self._cat_blame(
                            [c for c, m in zip(cats, mask) if m], contrib))
                    verdicts.append(Verdict(
                        pk, f"chisq:{self.psi_col}",
                        DRIFT if stat > thr else PASS,
                        statistic=stat, threshold=thr, n_rows=n_rows,
                        details=details))
            if self.entropy_min is not None:
                cnts = np.array(list(freqs.values()), dtype=np.float64)
                ent = dist.shannon_entropy(cnts)
                verdicts.append(Verdict(
                    pk, f"entropy:{self.psi_col}",
                    FAIL if ent < self.entropy_min else PASS,
                    statistic=ent, threshold=self.entropy_min,
                    n_rows=n_rows,
                    details={"n_categories": int((cnts > 0).sum())}))
        return verdicts

    def _drift_verdicts(self, pk: str, part_df: DataFrame, n_rows: int,
                        is_ref: bool, stats: dict):
        verdicts, violations = [], []

        if self.hdm is not None:
            hdm_df = part_df.select(
                *[F.col(c).cast("double").alias(c) for c in self.hdm_cols]
            ).coalesce(self.hdm_input_partitions)
            if is_ref:
                self.hdm.set_reference(hdm_df, batch_id=pk)
                verdicts.append(Verdict(pk, "hdddm", PASS, n_rows=n_rows,
                                        details={"role": "reference"}))
            else:
                mm = {c: (stats[f"__mm_lo_{c}"], stats[f"__mm_hi_{c}"]) for c in self.hdm_cols}
                state = self.hdm.update(hdm_df, batch_id=pk, precomputed=(n_rows, mm))
                det = {}
                if state == DRIFT and self.hdm.feature_info:
                    det["max_drift_feature"] = self.hdm.feature_info["max_drift_feature"]
                verdicts.append(Verdict(
                    pk, "hdddm", DRIFT if state == DRIFT else PASS,
                    statistic=self.hdm.epsilon[-1] if self.hdm.epsilon else None,
                    threshold=self.hdm.beta, n_rows=n_rows, details=det,
                ))

        feats = None
        if self.kdq is not None or self._quality_active():
            feats = audio.features_df(
                part_df, key_col=self.key_col,
                carry_cols=self._feats_carry_cols(with_part=False),
                quality=self.quality_rules is not None,
                byte_len=self._payload_in_decode(),
                header=self.meta_rules is not None,
            ).persist()
            self._feats_cache = feats
        if self.kdq is not None:
            clean = feats.filter(_f0_clean()).select(
                *[f"f{i}" for i in range(audio.N_FEATURES)]
            )
            if is_ref:
                self.kdq.set_reference(clean)
                n_clean = int(self.kdq._ref_counts.sum())
                verdicts.append(Verdict(pk, "kdq_tree", PASS, n_rows=n_rows,
                                        details={"role": "reference"}))
            else:
                state = self.kdq.update(clean)
                n_clean = int(self.kdq._test_counts.sum())
                verdicts.append(Verdict(pk, "kdq_tree", DRIFT if state == DRIFT else PASS,
                                        statistic=self.kdq.test_dist,
                                        threshold=self.kdq._critical_dist, n_rows=n_rows))
            # decode integrity comes free from the leaf-count totals:
            # undecodable clips produce NaN feature rows, filtered out
            # of `clean`, so n_nan = n_rows - sum(leaf counts). The
            # violation rows (clip ids) are only materialized on failure.
            n_nan = n_rows - n_clean
            verdicts.append(Verdict(pk, "decode_integrity", PASS if n_nan == 0 else FAIL,
                                    statistic=float(n_nan), threshold=0.0, n_rows=n_rows))
            if n_nan:
                violations.append(
                    feats.filter(_f0_bad())
                    .select(F.col(self.key_col).alias("row_key"))
                    .withColumn("value", F.lit(None).cast("string"))
                    .withColumn("reason", F.lit("decode_integrity"))
                )
        elif feats is not None:
            # quality rules without kdq: the decode pass ran anyway, so
            # undecodable clips (excluded from every quality condition
            # by _f0_clean) must still get their own verdict — derived
            # from a direct count of bad rows, no leaf totals needed
            n_nan = int(feats.filter(_f0_bad()).count())
            verdicts.append(Verdict(pk, "decode_integrity", PASS if n_nan == 0 else FAIL,
                                    statistic=float(n_nan), threshold=0.0, n_rows=n_rows))
            if n_nan:
                violations.append(
                    feats.filter(_f0_bad())
                    .select(F.col(self.key_col).alias("row_key"))
                    .withColumn("value", F.lit(None).cast("string"))
                    .withColumn("reason", F.lit("decode_integrity"))
                )

        if self._quality_active():
            qv, qviol = self._quality_verdicts(pk, feats, n_rows)
            verdicts.extend(qv)
            violations.extend(qviol)

        if self.ks_cols or self.psi_col:
            ranges = self._ks_psi_ranges(stats)
            collected = self._ks_psi_collect(part_df, ranges, by_part=False)
            mat, freqs = collected.get(None, ({c: np.zeros(KS_BINS) for c in self.ks_cols}, {}))
            verdicts.extend(self._ks_psi_decide(pk, n_rows, is_ref, ranges, mat, freqs))
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
                    *[F.col(c).cast("double").alias(c) for c in self.hdm_cols])
                 .coalesce(self.hdm_input_partitions))
                for pk in ref_ids
            ]
            self.hdm.set_state(states["hdddm"], ref)
        if self.kdq is not None and "kdq_tree" in states:
            ref_pk = states.get("kdq_ref_pk")
            ref_df = None
            if ref_pk is not None:
                part = df.filter(F.col(self.partition_col) == self._pk_value(df, ref_pk))
                ref_df = audio.features_df(part, key_col=self.key_col).filter(
                    _f0_clean()
                ).drop(self.key_col)
            self.kdq.set_state(states["kdq_tree"], ref_data=ref_df)
            self._kdq_ref_pk = ref_pk
        self._ks_ref = states.get("ks_ref")
        self._psi_ref = states.get("psi_ref")

    def _pk_value(self, df: DataFrame, pk: str):
        dtype = dict(df.dtypes).get(self.partition_col, "string")
        return int(pk) if dtype in ("int", "bigint", "smallint") else pk

    # -------------------------------------------------------------- run

    @staticmethod
    def _metrics_from_stats(stats: dict) -> dict:
        """Per-partition column metrics recorded in the manifest
        (north rule: lineage + METRICS per partition)."""
        out = {}
        for k, v in stats.items():
            if k.startswith("__") and not k.startswith("__key_hash"):
                val = None if v is None else float(v)
                out[k.strip("_")] = val
        return out

    def _finish_partition(self, pk: str, n_rows: int, fingerprint: dict,
                          verdicts: list, violations: list, t0: float,
                          metrics: dict | None = None) -> None:
        n_viol = 0
        if violations:
            from pyspark.sql import Observation

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
            # count rides along with the write (Observation) — one job,
            # not a separate count pass over the recomputed violations
            obs = Observation()
            all_v = all_v.observe(obs, F.count(F.lit(1)).alias("n"))
            all_v.write.mode("overwrite").parquet(self.manifest.violations_dir(pk))
            n_viol = int(obs.get["n"])
        self.manifest.append(
            {
                "partition_key": pk,
                "seq": len(self.manifest.records),
                "n_rows": n_rows,
                "fingerprint": fingerprint,
                "metrics": metrics or {},
                "verdicts": [v.as_row() for v in verdicts],
                "n_violations": n_viol,
                "check_states": self._check_states(),
                "elapsed_s": round(time.time() - t0, 3),
            }
        )

    def _global_uniqueness_verdict(self, df: DataFrame, part_keys: list[str] | None = None):
        """Cross-partition key uniqueness: within-partition dup checks
        cannot see a clip_id repeated in two partitions, so one global
        pass covers the whole table.

        uniqueness_mode="exact": count vs countDistinct — correct but
        a full key shuffle. uniqueness_mode="sketch": HyperLogLog
        screen (operators/sketches.py) — one scan whose shuffle is at
        most 2^p register rows; only when the estimate sits below the
        row count by more than 3-sigma sketch noise does the exact
        pass run (and its verdict is then identical to exact mode).

        CONTRACT of a sketch-mode PASS (ADVICE r05): the screen can
        only rule out LARGE duplication, not certify uniqueness — a
        sketch PASS means dup_frac <= 3 * 1.04 / sqrt(2^p) (~4.9%
        relative at the default p=12), NOT dup_frac == 0. The verdict
        row makes the weaker guarantee machine-readable: statistic =
        the estimated dup fraction, threshold = the exact bound it was
        compared against, details.mode = "sketch". Consumers needing
        the zero-duplicates guarantee must use exact mode (or treat
        details.mode == "sketch" as advisory).
        NULL keys ride the same register pass (reg -1) and always
        escalate — exact mode counts them as duplicates. Both modes
        are deterministic, so recomputing per run keeps resumed and
        one-shot verdict tables identical; in sketch mode the screen's
        per-partition registers additionally persist as checkpoint
        sidecars, so a RESUMED run scans only unvisited partitions."""
        if part_keys is None:
            part_keys = [
                str(r[0]) for r in df.select(self.partition_col)
                .distinct().orderBy(self.partition_col).collect()
            ]
        if self.uniqueness_mode == "sketch":
            verdict = self._uniqueness_sketch_screen(df, part_keys)
            if verdict is not None:
                return verdict
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(self.key_col).alias("d"),
        ).collect()[0]
        n_dup = int(row["n"]) - int(row["d"])
        details = {}
        if self.uniqueness_mode == "sketch":
            details["mode"] = "sketch+exact"
        return Verdict(
            "__global__", f"unique:{self.key_col}",
            PASS if n_dup == 0 else FAIL,
            statistic=float(n_dup), threshold=0.0, n_rows=int(row["n"]),
            details=details,
        ).as_row()

    def _sketch_path(self, pk: str) -> str:
        import os

        return os.path.join(self.manifest.dir, "uniq_sketch",
                            f"partition_key={pk}.json")

    def _uniqueness_sketch_screen(self, df: DataFrame, part_keys: list[str]):
        """The HLL screen, RESUMABLE: per-partition register sketches
        persist as sidecar files under the checkpoint dir, so a
        resumed run scans ONLY partitions whose sketch is missing and
        max-merges the rest from disk — the uniqueness twin of the
        manifest's replay contract (a one-shot run and a resumed run
        merge the identical registers, so the verdict is byte-equal).

        Returns a PASS verdict row when the merged sketch rules
        duplicates out within 3-sigma noise, else None (caller
        escalates to the exact pass). One grouped job over the missing
        partitions only; NULL keys are counted in a sentinel register
        so they force escalation without a second scan. Sketches
        written at a different ``p`` are recomputed, not merged."""
        import json as _json
        import math as _math
        import os as _os
        import tempfile as _tempfile

        from menelaus_spark.operators import sketches as SK

        p = self.uniqueness_sketch_p
        m = 1 << p
        kmax = SK._HASH_BITS - p + 1

        # sidecars are keyed by (partition, p) AND pinned to the
        # partition fingerprint recorded in the manifest (n, key_hash)
        # — a resumed run whose partition was rewritten underneath the
        # checkpoint recomputes that partition's sketch instead of
        # silently merging stale registers (ADVICE r05), mirroring the
        # lineage contract. Pre-fingerprint sidecars (no "fp" field)
        # and partitions without a manifest record are treated stale.
        manifest_fp = {r["partition_key"]: r.get("fingerprint")
                       for r in self.manifest.records}
        loaded: dict[str, dict] = {}
        missing: list[str] = []
        for pk in part_keys:
            path = self._sketch_path(pk)
            rec = None
            if _os.path.exists(path):
                with open(path) as f:
                    rec = _json.load(f)
                if rec.get("p") != p:
                    rec = None  # stale sketch at another precision
                elif rec is not None:
                    want = manifest_fp.get(pk)
                    if want is None or rec.get("fp") != want:
                        rec = None  # partition changed (or unknown) since sketching
            if rec is None:
                missing.append(pk)
            else:
                loaded[pk] = rec

        if missing:
            key = F.col(self.key_col)
            h = SK._hash60(key, "hll")
            rows = (
                df.filter(F.col(self.partition_col).cast("string").isin(missing))
                .select(
                    F.col(self.partition_col).cast("string").alias("__pk"),
                    F.when(key.isNull(), F.lit(-1))
                    .otherwise(F.shiftright(h, SK._HASH_BITS - p).cast("int")).alias("reg"),
                    F.when(key.isNull(), F.lit(0))
                    .otherwise(SK._rho_expr(h, p)).alias("rho"),
                )
                .groupBy("__pk", "reg")
                .agg(F.max("rho").alias("rho"), F.count(F.lit(1)).alias("c"))
                .collect()
            )
            fresh = {pk: {"n": 0, "n_null": 0, "regs": bytearray(m)} for pk in missing}
            for r in rows:
                d = fresh[r["__pk"]]
                d["n"] += int(r["c"])
                if r["reg"] == -1:
                    d["n_null"] += int(r["c"])
                elif int(r["rho"]) > d["regs"][r["reg"]]:
                    d["regs"][r["reg"]] = int(r["rho"])
            for pk, d in fresh.items():
                rec = {"partition_key": pk, "p": p, "n": d["n"],
                       "n_null": d["n_null"], "regs_hex": bytes(d["regs"]).hex(),
                       "fp": manifest_fp.get(pk)}
                sdir = _os.path.dirname(self._sketch_path(pk))
                _os.makedirs(sdir, exist_ok=True)
                fd, tmp = _tempfile.mkstemp(dir=sdir, suffix=".sketch.tmp")
                try:
                    with _os.fdopen(fd, "w") as f:
                        _json.dump(rec, f, sort_keys=True)
                    _os.replace(tmp, self._sketch_path(pk))
                finally:
                    if _os.path.exists(tmp):
                        _os.unlink(tmp)
                loaded[pk] = rec

        n_total = sum(rec["n"] for rec in loaded.values())
        if sum(rec["n_null"] for rec in loaded.values()) > 0:
            return None  # exact mode treats null keys as dups
        regs = bytearray(m)
        for rec in loaded.values():
            b = bytes.fromhex(rec["regs_hex"])
            for i in range(m):
                if b[i] > regs[i]:
                    regs[i] = b[i]
        v_zero = sum(1 for x in regs if x == 0)
        s_int = sum(1 << (kmax - x) for x in regs if x) + v_zero * (1 << kmax)
        est = SK._estimate_from(v_zero, s_int, p) if n_total else 0.0
        noise = 3.0 * 1.04 / _math.sqrt(m)
        dup_frac_est = 0.0 if n_total == 0 else max(0.0, (n_total - est) / n_total)
        if dup_frac_est > noise:
            return None
        return Verdict(
            "__global__", f"unique:{self.key_col}", PASS,
            statistic=dup_frac_est, threshold=noise, n_rows=n_total,
            details={"mode": "sketch", "est_distinct": f"{est:.2f}", "p": str(p),
                     "partitions_scanned": str(len(missing))},
        ).as_row()

    def _hotkey_verdicts(self, df: DataFrame) -> list[dict]:
        """Per-partition heavy-hitter (mode share) verdicts for each
        configured high-cardinality column: `hotkey:<col>` fails where
        one value's share exceeds the ceiling. One groupBy(partition,
        col) per column — no salting needed: Spark's partial (map-side)
        hash aggregation collapses a hot value to one row per task
        before the shuffle, so a boilerplate flood costs nothing extra.
        The top-1 reduction collects O(partitions) rows. Deterministic
        (ties broken by the larger value string via the struct max), so
        recomputing per run keeps resumed and one-shot verdict tables
        identical — the same contract as the global uniqueness check.
        NULLs are excluded from both the mode and the denominator (they
        belong to the null-rate constraint)."""
        out = []
        for col, frac_max in (self.hot_key_max_frac or {}).items():
            counts = (
                df.filter(F.col(col).isNotNull())
                .groupBy(self.partition_col, col)
                .agg(F.count(F.lit(1)).alias("c"))
            )
            top = (
                counts.groupBy(self.partition_col)
                .agg(
                    F.max(F.struct(F.col("c"),
                                   F.col(col).cast("string").alias("k"))).alias("top"),
                    F.sum("c").alias("total"),
                )
                .collect()
            )
            for r in sorted(top, key=lambda r: str(r[0])):
                share = float(r["top"]["c"]) / float(r["total"])
                out.append(Verdict(
                    str(r[0]), f"hotkey:{col}",
                    FAIL if share > float(frac_max) else PASS,
                    statistic=share, threshold=float(frac_max),
                    n_rows=int(r["total"]),
                    details={"top_key": r["top"]["k"],
                             "top_n": int(r["top"]["c"])},
                ).as_row())
        return out

    def _neardup_verdicts(self, df: DataFrame) -> list[dict]:
        """Global payload near-dup verdicts via the fingerprint-shingle
        MinHash/LSH path. Deterministic (seeded md5 hash family,
        partition-independent fingerprints, deterministic star
        contraction), so recomputing per run keeps resumed and one-shot
        verdict tables identical — the same contract as the global
        uniqueness check. Two rows:

        neardup:payload  — fraction of clips in >= 1 near-dup pair
        neardup:clusters — fraction REMOVABLE by keep-one-per-cluster
                           resolution (members - components) / n, the
                           actionable dedup number; its details carry
                           n_clusters and max_cluster_size
        """
        from menelaus_spark.operators.audio_dedup import (
            audio_neardup_pairs,
            audio_shingles,
        )
        from menelaus_spark.operators.clusters import connected_components

        sh = audio_shingles(
            df, key_col=self.key_col, bytes_col=self.bytes_col,
            codec_col=self.codec_col,
        ).persist()
        try:
            pairs = audio_neardup_pairs(df, key_col=self.key_col, fp=sh)
            cc = connected_components(pairs.select("id_a", "id_b"))
            row = cc.agg(
                F.count(F.lit(1)).alias("m"),
                F.countDistinct("cluster_id").alias("k"),
            ).collect()[0]
            top = (
                cc.groupBy("cluster_id").count().agg(F.max("count")).collect()[0][0]
            )
        finally:
            sh.unpersist()
        members, k = int(row["m"] or 0), int(row["k"] or 0)
        n = df.count()
        rate = members / n if n else 0.0
        removable = (members - k) / n if n else 0.0
        return [
            Verdict(
                "__global__", "neardup:payload",
                PASS if rate <= self.neardup_rate_max else FAIL,
                statistic=float(rate), threshold=float(self.neardup_rate_max),
                n_rows=int(n),
            ).as_row(),
            Verdict(
                "__global__", "neardup:clusters",
                PASS if removable <= self.neardup_rate_max else FAIL,
                statistic=float(removable),
                threshold=float(self.neardup_rate_max),
                n_rows=int(n),
                details={"n_clusters": k, "max_cluster_size": int(top or 0)},
            ).as_row(),
        ]

    def _lineage_verdicts(self, df: DataFrame, scope: set[str]) -> list[dict]:
        """Re-fingerprint every COMPLETED partition (one metadata-only
        aggregation over the key column — pruned scan, no payload read)
        and compare against the manifest's recorded lineage. A replayed
        partition whose data silently changed since it was validated —
        rows added/removed, keys rewritten, the whole partition gone —
        gets a `lineage` FAIL row alongside its (now stale) replayed
        verdicts. Deliberately NOT auto-revalidated: the sequential
        drift chain (HDM reference growth, kdq reference, KS baseline)
        already consumed the original data, so recomputing one
        mid-chain partition out of order would corrupt the sequence
        semantics; the remedy is a fresh checkpoint. Verdict fields:
        statistic = found row count, threshold = recorded row count,
        details carry both fingerprints on mismatch."""
        recs = {r["partition_key"]: r["fingerprint"]
                for r in self.manifest.records
                if r["partition_key"] in scope}
        pv = [self._pk_value(df, pk) for pk in recs]
        rows = (
            df.filter(F.col(self.partition_col).isin(pv))
            .groupBy(self.partition_col)
            .agg(F.count(F.lit(1)).alias("__n"),
                 F.expr(f"bit_xor(xxhash64({self.key_col}))").alias("__h"))
            .collect()
        )
        found = {str(r[self.partition_col]): (int(r["__n"]), int(r["__h"] or 0))
                 for r in rows}
        out = []
        for pk in sorted(recs):
            fp = recs[pk]
            got = found.get(pk, (0, 0))
            ok = got == (int(fp["n"]), int(fp["key_hash"]))
            det = {} if ok else {
                "expected_n": str(fp["n"]), "found_n": str(got[0]),
                "expected_key_hash": str(fp["key_hash"]),
                "found_key_hash": str(got[1]),
            }
            out.append(Verdict(pk, "lineage", PASS if ok else FAIL,
                               statistic=float(got[0]),
                               threshold=float(fp["n"]),
                               n_rows=got[0], details=det).as_row())
        return out

    def run(self, df: DataFrame, vectorized: bool = True,
            verify_lineage: bool = False) -> tuple[DataFrame, DataFrame]:
        """Validate every partition not yet in the manifest; return
        (verdicts, violations) DataFrames covering ALL partitions
        (replayed + newly computed).

        ``verify_lineage=True`` additionally re-fingerprints every
        already-completed partition and emits a `lineage` pass/fail
        verdict row per replayed partition (see _lineage_verdicts) —
        the guard against trusting replayed verdicts over data that
        changed underneath the checkpoint.

        ``vectorized=True`` (default, the scale plan): per-partition
        statistics for ALL unvisited partitions come from a constant
        number of global passes — one groupBy(partition) constraint
        aggregation, ONE fused (partition, kind, key) pass carrying the
        KS histograms, PSI frequencies AND HDM distinct-value
        summaries, and ONE decode+leaf-assign pandas pass — then the
        sequential drift decisions run driver-side on the collected
        summaries. Job count is O(1) in the partition count (plus one
        kdq recount pass per drift event). ``vectorized=False`` runs
        the same checks partition-by-partition; both paths produce
        byte-identical verdict tables.
        """
        # sort driver-side: an orderBy here would add a range-partition
        # exchange plus its sampling job to collect O(partitions) rows.
        # Python's sort on the raw values matches Spark's orderBy for
        # every partition-key type we accept (int/str/date).
        part_keys = [
            str(v)
            for v in sorted(
                (r[0] for r in df.select(self.partition_col).distinct().collect()),
                key=lambda v: (v is not None, v),  # NULLS FIRST, like orderBy
            )
        ]
        done = set(self.manifest.completed_keys())
        todo = [pk for pk in part_keys if pk not in done]
        if done:
            self._restore(df, self.manifest.last_states())

        if todo:
            if vectorized:
                self._run_vectorized(df, todo)
            else:
                self._run_sequential(df, todo)

        verdict_rows = self.manifest.replayed_verdicts()
        if verify_lineage and done:
            # only partitions REPLAYED from a prior run need the check —
            # ones validated just now fingerprinted their own data
            verdict_rows = verdict_rows + self._lineage_verdicts(df, done)
        if self.global_uniqueness:
            verdict_rows = verdict_rows + [self._global_uniqueness_verdict(df, part_keys)]
        if self.neardup_rate_max is not None:
            verdict_rows = verdict_rows + self._neardup_verdicts(df)
        if self.hot_key_max_frac is not None:
            verdict_rows = verdict_rows + self._hotkey_verdicts(df)
        verdicts_df = self.spark.createDataFrame(verdict_rows, schema=VERDICT_SCHEMA)
        import os

        viol_root = os.path.join(self.manifest.dir, "violations")
        if os.path.isdir(viol_root) and any(os.scandir(viol_root)):
            # schema is known by construction (every violation write
            # uses the VIOLATION_SCHEMA shape) — passing it skips the
            # footer-sampling schema-inference pass over the sink dirs
            violations_df = self.spark.read.schema(VIOLATION_SCHEMA).parquet(
                *[os.path.join(viol_root, d) for d in sorted(os.listdir(viol_root))]
            )
        else:
            violations_df = self.spark.createDataFrame([], schema=VIOLATION_SCHEMA)
        return verdicts_df, violations_df

    def _run_sequential(self, df: DataFrame, todo: list[str]) -> None:
        for pk in todo:
            t0 = time.time()
            # NO persist of the raw partition: the bytes column makes
            # cached rows expensive to re-serialize, and at 10^12 rows
            # caching raw partitions is impossible anyway. Each check
            # re-scans parquet with column + partition pruning — only
            # the feature pass ever reads the binary column, and its
            # small (clip_id, f0..f11) output IS cached.
            part_df = df.filter(F.col(self.partition_col) == self._pk_value(df, pk))
            stats = part_df.agg(*self._constraint_aggs()).collect()[0].asDict()
            n_rows = int(stats["__n"])
            fingerprint = {"n": n_rows, "key_hash": int(stats["__key_hash"] or 0)}
            is_ref = not self.manifest.records  # first partition ever = reference
            verdicts, violations = self._constraint_verdicts(pk, part_df, stats)
            d_verdicts, d_violations = self._drift_verdicts(pk, part_df, n_rows, is_ref, stats)
            if self.kdq is not None and (is_ref or self.kdq.drift_state == DRIFT):
                self._kdq_ref_pk = pk
            verdicts.extend(d_verdicts)
            violations.extend(d_violations)
            self._finish_partition(pk, n_rows, fingerprint, verdicts, violations, t0,
                                   metrics=self._metrics_from_stats(stats))
            if self._feats_cache is not None:
                self._feats_cache.unpersist()
                self._feats_cache = None

    # ---------------------------------------- vectorized-over-partitions

    def _kdq_counts_by_part(self, clean_feats: DataFrame, tree, pks: list[str]) -> dict:
        """Distributed leaf counts for MANY partitions in one pass:
        assign leaves in the (already cached) feature frame via the
        compiled JVM tree expression (pandas-UDF fallback above the
        node cap), salted groupBy (partition, leaf)."""
        from menelaus_spark.checks.kdqtree import _leaf_col_or_udf

        fcols = [f"f{i}" for i in range(audio.N_FEATURES)]
        leaves = clean_feats.select(
            F.col(self.partition_col).cast("string").alias("__pk"),
            _leaf_col_or_udf(clean_feats, fcols, tree).alias("leaf"),
        )
        rows = H.salted_count(leaves, ["__pk", "leaf"]).collect()
        out = {pk: np.zeros(tree.n_leaves, dtype=np.int64) for pk in pks}
        for r in rows:
            out[r["__pk"]][int(r["leaf"])] = int(r["count"])
        return out

    def _global_summary_pass(
        self, scoped: DataFrame, todo: list[str], ranges: dict
    ) -> tuple[dict, dict]:
        """KS histograms + PSI frequencies + HDM distinct-value
        summaries for EVERY partition in ONE exploded salted
        aggregation — one scan of the (numeric, codec) projection
        where rounds 1-2 used two. HDM values ride as their Java
        shortest-round-trip string (exact double round-trip), and the
        driver cap still guards the HDM side: past it, HDM falls back
        to its own per-batch summary jobs.

        Returns (kspsi_by, hdm_sum_by)."""
        hdm_cols = self.hdm_cols if self.hdm is not None else []
        # Driver fast path: under the row cap (probed by the LIMIT
        # itself), ONE bounded Arrow collect of the raw projection
        # replaces the explode + salted aggregation, with the binning /
        # counting done by the proven numpy twins
        # (histograms.bin_weighted_driver replicates bin_index_col's
        # IEEE arithmetic bit-for-bit). Gates, each preserving exact
        # equivalence with the exploded pass:
        # - psi column must be string-typed (cast-to-string is then
        #   the identity; Java double->string formatting is not
        #   replicated driver-side);
        # - no NaN in the collected KS columns (a null clamps to the
        #   range floor while NaN clamps to the ceiling in the JVM
        #   expression, and pandas cannot tell them apart).
        # Over the cap or on a gate miss, the exploded pass runs
        # unchanged — the 100-TB path.
        psi_ok = (not self.psi_col) or isinstance(
            scoped.schema[self.psi_col].dataType, T.StringType
        )
        if psi_ok:
            sel = [F.col(self.partition_col).cast("string").alias("__pk")]
            sel += [F.col(c).cast("double").alias(f"__ks_{c}")
                    for c in self.ks_cols]
            if self.psi_col:
                sel.append(F.col(self.psi_col).alias("__psi"))
            sel += [F.col(c).cast("double").alias(f"__hdm_{c}")
                    for c in hdm_cols]
            pdf = scoped.select(*sel).limit(
                SUMMARY_DRIVER_ROW_CAP + 1).toPandas()
            ks_ok = len(pdf) <= SUMMARY_DRIVER_ROW_CAP and not any(
                np.isnan(pdf[f"__ks_{c}"].to_numpy(np.float64)).any()
                for c in self.ks_cols
            )
            if ks_ok:
                kspsi_by: dict = {}
                hdm_data: dict = {}
                n_hdm_entries = 0
                for pk, g in pdf.groupby("__pk"):
                    mat = {c: np.zeros(KS_BINS) for c in self.ks_cols}
                    freqs: dict = {}
                    for c in self.ks_cols:
                        lo, hi = float(ranges[c][0]), float(ranges[c][1])
                        v = np.minimum(
                            np.maximum(g[f"__ks_{c}"].to_numpy(np.float64), lo),
                            hi,
                        )
                        mat[c] = H.bin_weighted_driver(
                            v, np.ones(v.size), lo, hi, KS_BINS)
                    if self.psi_col:
                        vc = g["__psi"].value_counts(dropna=True)
                        freqs = {str(k): int(n) for k, n in vc.items()}
                    if self.ks_cols or self.psi_col:
                        kspsi_by[str(pk)] = (mat, freqs)
                    if hdm_cols:
                        d = {}
                        for c in hdm_cols:
                            a = g[f"__hdm_{c}"].to_numpy(np.float64)
                            vals, cnts = np.unique(
                                a[~np.isnan(a)], return_counts=True)
                            d[c] = (vals.astype(np.float64),
                                    cnts.astype(np.float64))
                            n_hdm_entries += vals.size
                        hdm_data[str(pk)] = d
                hdm_sum_by: dict = {}
                if hdm_cols and n_hdm_entries <= self.hdm.driver_value_cap:
                    hdm_sum_by = {
                        pk: hdm_data.get(
                            pk, {c: (np.array([]), np.array([]))
                                 for c in hdm_cols})
                        for pk in todo
                    }
                return kspsi_by, hdm_sum_by
        structs = []
        for c in self.ks_cols:
            col = F.least(
                F.greatest(F.col(c).cast("double"), F.lit(float(ranges[c][0]))),
                F.lit(float(ranges[c][1])),
            )
            structs.append(F.struct(
                F.lit(f"ks:{c}").alias("kind"),
                H.bin_index_col(col, ranges[c][0], ranges[c][1], KS_BINS)
                .cast("string").alias("key"),
            ))
        if self.psi_col:
            structs.append(F.struct(
                F.lit("psi").alias("kind"),
                F.col(self.psi_col).cast("string").alias("key"),
            ))
        hdm_cols = self.hdm_cols if self.hdm is not None else []
        for c in hdm_cols:
            v = F.col(c).cast("double")
            structs.append(F.struct(
                F.lit(f"hdm:{c}").alias("kind"),
                F.when(~F.isnan(v), v).cast("string").alias("key"),
            ))
        exploded = (
            scoped.select(
                F.col(self.partition_col).cast("string").alias("__pk"),
                F.explode(F.array(*structs)).alias("kk"),
            )
            .select("__pk", "kk.kind", "kk.key")
            .filter(F.col("key").isNotNull())
        )
        agg = H.salted_count(exploded, ["__pk", "kind", "key"])
        if hdm_cols:
            # ONE action enforces the HDM driver cap inline (the old
            # shape paid a separate count() job first): non-HDM rows
            # ride unlimited, HDM rows pass through LIMIT cap+1 — if
            # cap+1 survive, the cap is blown and the HDM side falls
            # back to its own per-batch jobs. persist() so the single
            # union action materializes the aggregation once for both
            # branches; the extra driver transfer is bounded by cap.
            cap = int(self.hdm.driver_value_cap)
            agg = agg.persist()
            try:
                is_hdm = F.col("kind").startswith("hdm:")
                rows = (
                    agg.filter(~is_hdm)
                    .unionByName(agg.filter(is_hdm).limit(cap + 1))
                    .toPandas()
                )
            finally:
                agg.unpersist()
            hdm_rows = rows["kind"].str.startswith("hdm:")
            hdm_ok = int(hdm_rows.sum()) <= cap
            if not hdm_ok:
                rows = rows[~hdm_rows]
        else:
            hdm_ok = True
            rows = agg.toPandas()

        kspsi_by: dict = {}
        hdm_sum_by: dict = {
            pk: {c: ([], []) for c in hdm_cols} for pk in todo
        } if (hdm_cols and hdm_ok) else {}
        for pk, kind, key, count in zip(
            rows["__pk"], rows["kind"], rows["key"], rows["count"]
        ):
            if kind.startswith("hdm:"):
                if pk in hdm_sum_by:
                    vs, cs = hdm_sum_by[pk][kind[4:]]
                    vs.append(float(key))
                    cs.append(float(count))
                continue
            if not (self.ks_cols or self.psi_col):
                continue
            mat, freqs = kspsi_by.setdefault(
                pk, ({c: np.zeros(KS_BINS) for c in self.ks_cols}, {})
            )
            if kind == "psi":
                freqs[str(key)] = int(count)
            else:
                mat[kind[3:]][int(key)] = float(count)
        hdm_sum_by = {
            pk: {
                c: (np.asarray(vs, dtype=np.float64), np.asarray(cs, dtype=np.float64))
                for c, (vs, cs) in d.items()
            }
            for pk, d in hdm_sum_by.items()
        }
        return kspsi_by, hdm_sum_by

    def _kdq_clean_feats_for(self, df: DataFrame, feats: DataFrame | None,
                             pk: str, todo: list[str]) -> DataFrame:
        """Clean feature vectors of one partition: from the cached
        global feature frame when the partition is in scope, else
        recomputed from the source table (resume case: the kdq
        reference partition may already be completed)."""
        fcols = [f"f{i}" for i in range(audio.N_FEATURES)]
        if feats is not None and pk in todo:
            return feats.filter(
                F.col(self.partition_col).cast("string") == pk
            ).filter(_f0_clean()).select(*fcols)
        part = df.filter(F.col(self.partition_col) == self._pk_value(df, pk))
        return audio.features_df(part, key_col=self.key_col).filter(
            _f0_clean()
        ).select(*fcols)

    def _kdq_build_tree(self, clean_part_feats: DataFrame):
        """Driver-side tree build from a bounded sample of one
        partition's feature vectors."""
        ary, _ = self.kdq._collect_build_sample(clean_part_feats)
        return self.kdq.build_tree_from_sample(ary)

    def _run_vectorized(self, df: DataFrame, todo: list[str]) -> None:
        t0 = time.time()
        pv = [self._pk_value(df, pk) for pk in todo]
        scoped = df.filter(F.col(self.partition_col).isin(pv))

        # The decode pass (pass 3) is independent of passes 1-2, and it
        # is the wall-clock floor of the suite (the only pass that reads
        # the binary column). Kick its materialization off on a driver
        # thread so the constraint aggregation and the summary pass run
        # WHILE the decode occupies the executors — Spark schedules
        # concurrent jobs FIFO and back-fills idle slots, so the two
        # metadata scans hide under the decode instead of following it
        # (spark_optimization_guide §2.6). Same jobs, same results; only
        # the submission order changes.
        from concurrent.futures import ThreadPoolExecutor

        # Pass 2 needs ONLY the KS bin ranges from pass 1 (fresh runs:
        # the reference partition's min/max), so those come from a tiny
        # dedicated min/max job run FIRST — before the decode job is
        # submitted, since a FIFO scheduler would otherwise queue its
        # tasks behind the whole decode and stall pass 2 by seconds.
        run_summary = bool(self.ks_cols or self.psi_col or self.hdm is not None)
        ranges: dict = {}
        if run_summary and self.ks_cols and not self._ks_ref:
            mm = scoped.filter(
                F.col(self.partition_col) == self._pk_value(df, todo[0])
            ).agg(*[
                a for c in self.ks_cols for a in (
                    F.min(F.col(c).cast("double")).alias(f"__mm_lo_{c}"),
                    F.max(F.col(c).cast("double")).alias(f"__mm_hi_{c}"),
                )
            ]).collect()[0].asDict()
            ranges = {c: (mm[f"__mm_lo_{c}"], mm[f"__mm_hi_{c}"])
                      for c in self.ks_cols}
        elif run_summary and (self.ks_cols or self.psi_col):
            ranges = self._ks_psi_ranges({})

        feats = None
        feats_future = None
        pool = ThreadPoolExecutor(max_workers=2)
        if self.kdq is not None or self._quality_active():
            feats = audio.features_df(
                scoped, key_col=self.key_col,
                carry_cols=self._feats_carry_cols(with_part=True),
                quality=self.quality_rules is not None,
                byte_len=self._payload_in_decode(),
                header=self.meta_rules is not None,
            ).persist()
            self._feats_cache = feats
            feats_future = pool.submit(feats.count)

        # global pass 1: all constraint stats + min/max, one shuffle —
        # submitted on a driver thread so it runs CONCURRENTLY with
        # pass 2 (guide §2.6), both hiding under the decode pass,
        # instead of strictly sequentially.
        stat_future = pool.submit(
            scoped.groupBy(self.partition_col).agg(*self._constraint_aggs()).collect
        )

        # global pass 2: KS histograms + PSI frequencies + HDM
        # distinct-value summaries for every partition, all in ONE
        # exploded salted aggregation (one scan of the numeric/codec
        # projection). The sequential HDM updates then run driver-side
        # on the collected summaries — zero Spark jobs per partition,
        # keeping the suite's job count O(1) in the partition count
        kspsi_by: dict = {}
        hdm_sum_by: dict = {}
        if run_summary:
            kspsi_by, hdm_sum_by = self._global_summary_pass(scoped, todo, ranges)
        stat_rows = stat_future.result()
        stats_by = {str(r[self.partition_col]): r.asDict() for r in stat_rows}

        # global pass 3 (the only pandas stage): decode + features +
        # quality metrics for ALL partitions, already running on the
        # background thread — join it before any feats-dependent action
        # so the cache is never materialized twice concurrently
        counts_by: dict = {}
        qcounts_by: dict = {}
        if feats_future is not None:
            feats_future.result()
        # the quality-count aggregation depends only on the (now
        # materialized) feats cache — run it on the driver thread pool
        # WHILE the kdq build-sample collect + leaf-count job run, so
        # the two independent jobs back-fill each other's idle slots
        qcounts_future = None
        if self._quality_active():
            qcounts_future = pool.submit(self._quality_counts_by_part, feats, todo)
        self._kdq_groups = None
        if self.kdq is not None:
            clean = feats.filter(_f0_clean())
            if self.kdq._tree is None:
                # small-table fast path: when EVERY partition fits
                # under the build-sample cap (so the sequential path's
                # "sample" is the full clean partition — no seeded
                # sampling whose row set depends on physical
                # partitioning) and the total is driver-collectable,
                # ONE Arrow collect of the clean feature matrix
                # replaces the per-drift-event sample-collect +
                # leaf-count JOBS: tree builds are row-order
                # independent and the leaf assignment is the same
                # numpy kernel the distributed fill broadcasts, so
                # every tree, count vector and drift decision is
                # bit-identical (asserted in tests). Above the caps —
                # the 100-TB regime — the distributed chain below runs
                # unchanged; same pattern as connected_components'
                # driver_cap.
                cap_ok = all(
                    int(stats_by[pk]["__n"]) <= self.kdq.build_sample_cap
                    for pk in todo
                ) and sum(
                    int(stats_by[pk]["__n"]) for pk in todo
                ) <= KDQ_DRIVER_ROW_CAP
                if cap_ok:
                    fcols = [f"f{i}" for i in range(audio.N_FEATURES)]
                    pdf = clean.select(
                        F.col(self.partition_col).cast("string").alias("__pk"),
                        *fcols,
                    ).toPandas()
                    groups = {
                        str(g): sub[fcols].to_numpy(dtype=np.float64)
                        for g, sub in pdf.groupby("__pk")
                    }
                    if all(groups.get(pk) is not None and len(groups[pk])
                           for pk in todo):
                        self._kdq_groups = groups
                if self._kdq_groups is not None:
                    tree = self.kdq.build_tree_from_sample(
                        self._kdq_groups[todo[0]])
                    counts_by = {
                        pk: tree.fill_counts(self._kdq_groups[pk])
                        for pk in todo
                    }
                else:
                    tree = self._kdq_build_tree(
                        self._kdq_clean_feats_for(df, feats, todo[0], todo)
                    )
                    counts_by = self._kdq_counts_by_part(clean, tree, todo)
                self.kdq.install_reference(tree, counts_by[todo[0]])
                self.kdq._input_cols = [f"f{i}" for i in range(audio.N_FEATURES)]
                self._kdq_ref_pk = todo[0]
                self._kdq_fresh_ref = True
            else:
                counts_by = self._kdq_counts_by_part(clean, self.kdq._tree, todo)
                self._kdq_fresh_ref = False
        if qcounts_future is not None:
            qcounts_by = qcounts_future.result()
        pool.shutdown(wait=False)
        nan_by: dict = {}
        if feats is not None and self.kdq is None:
            # no kdq leaf totals to derive decode failures from — one
            # grouped count of bad rows covers every partition
            bad_rows = feats.groupBy(self.partition_col).agg(
                F.sum(_f0_bad().cast("long")).alias("__bad")).collect()
            got = {str(r[self.partition_col]): int(r["__bad"] or 0) for r in bad_rows}
            nan_by = {pk: got.get(pk, 0) for pk in todo}

        # sequential decision loop over collected summaries
        for i, pk in enumerate(todo):
            t_pk = time.time() if i else t0  # first record absorbs global passes
            stats = stats_by[pk]
            n_rows = int(stats["__n"])
            fingerprint = {"n": n_rows, "key_hash": int(stats["__key_hash"] or 0)}
            is_ref = not self.manifest.records
            part_df = df.filter(F.col(self.partition_col) == self._pk_value(df, pk))
            verdicts, violations = self._constraint_verdicts(pk, part_df, stats)

            # HDM: test-side agg AND distinct-value summary both come
            # precomputed from the global passes, so the exact
            # re-binning semantics run driver-side with no per-batch job
            if self.hdm is not None:
                hdm_df = part_df.select(
                    *[F.col(c).cast("double").alias(c) for c in self.hdm_cols]
                ).coalesce(self.hdm_input_partitions)
                if is_ref:
                    self.hdm.set_reference(hdm_df, batch_id=pk,
                                           summary_values=hdm_sum_by.get(pk))
                    verdicts.append(Verdict(pk, "hdddm", PASS, n_rows=n_rows,
                                            details={"role": "reference"}))
                else:
                    mm = {c: (stats[f"__mm_lo_{c}"], stats[f"__mm_hi_{c}"])
                          for c in self.hdm_cols}
                    state = self.hdm.update(hdm_df, batch_id=pk, precomputed=(n_rows, mm),
                                            summary_values=hdm_sum_by.get(pk))
                    det = {}
                    if state == DRIFT and self.hdm.feature_info:
                        det["max_drift_feature"] = self.hdm.feature_info["max_drift_feature"]
                    verdicts.append(Verdict(
                        pk, "hdddm", DRIFT if state == DRIFT else PASS,
                        statistic=self.hdm.epsilon[-1] if self.hdm.epsilon else None,
                        threshold=self.hdm.beta, n_rows=n_rows, details=det,
                    ))

            # kdq: decisions on collected counts; rebuild + one recount
            # pass only on a drift event
            if self.kdq is not None:
                if self.kdq.drift_state == DRIFT:
                    ref_pk = self._kdq_ref_pk
                    scope = ([ref_pk] if ref_pk in todo else []) + todo[i:]
                    if self._kdq_groups is not None and ref_pk in self._kdq_groups:
                        # small-table fast path: rebuild + recount from
                        # the already-collected clean feature matrix —
                        # zero Spark jobs per drift event (same trees,
                        # same exact counts as the distributed chain)
                        tree = self.kdq.build_tree_from_sample(
                            self._kdq_groups[ref_pk])
                        recount = {
                            p: tree.fill_counts(self._kdq_groups[p])
                            for p in scope
                        }
                    else:
                        ref_feats = self._kdq_clean_feats_for(df, feats, ref_pk, todo)
                        tree = self._kdq_build_tree(ref_feats)
                        # one recount pass for the drifted reference + all
                        # not-yet-decided partitions under the new tree
                        clean = feats.filter(_f0_clean())
                        recount = self._kdq_counts_by_part(
                            clean.filter(F.col(self.partition_col).cast("string").isin(scope)),
                            tree, scope,
                        )
                    counts_by.update(recount)
                    if ref_pk in recount:
                        ref_counts = recount[ref_pk]
                    else:  # reference partition completed in a prior run
                        from menelaus_spark.checks.kdqtree import distributed_leaf_counts

                        ref_counts = distributed_leaf_counts(
                            ref_feats, [f"f{i}" for i in range(audio.N_FEATURES)], tree
                        )
                    self.kdq.install_reference(tree, ref_counts)
                if is_ref and self._kdq_fresh_ref and pk == self._kdq_ref_pk:
                    n_clean = int(counts_by[pk].sum())
                    verdicts.append(Verdict(pk, "kdq_tree", PASS, n_rows=n_rows,
                                            details={"role": "reference"}))
                else:
                    state = self.kdq.observe_counts(counts_by[pk])
                    n_clean = int(counts_by[pk].sum())
                    if state == DRIFT:
                        self._kdq_ref_pk = pk
                    verdicts.append(Verdict(pk, "kdq_tree", DRIFT if state == DRIFT else PASS,
                                            statistic=self.kdq.test_dist,
                                            threshold=self.kdq._critical_dist, n_rows=n_rows))
                n_nan = n_rows - n_clean
                verdicts.append(Verdict(pk, "decode_integrity", PASS if n_nan == 0 else FAIL,
                                        statistic=float(n_nan), threshold=0.0, n_rows=n_rows))
                if n_nan:
                    violations.append(
                        feats.filter(
                            (F.col(self.partition_col).cast("string") == pk)
                            & _f0_bad()
                        )
                        .select(F.col(self.key_col).alias("row_key"))
                        .withColumn("value", F.lit(None).cast("string"))
                        .withColumn("reason", F.lit("decode_integrity"))
                    )
            elif feats is not None:
                n_nan = nan_by[pk]
                verdicts.append(Verdict(pk, "decode_integrity", PASS if n_nan == 0 else FAIL,
                                        statistic=float(n_nan), threshold=0.0, n_rows=n_rows))
                if n_nan:
                    violations.append(
                        feats.filter(
                            (F.col(self.partition_col).cast("string") == pk)
                            & _f0_bad()
                        )
                        .select(F.col(self.key_col).alias("row_key"))
                        .withColumn("value", F.lit(None).cast("string"))
                        .withColumn("reason", F.lit("decode_integrity"))
                    )

            if self._quality_active():
                qv, qviol = self._quality_verdicts(
                    pk,
                    feats.filter(F.col(self.partition_col).cast("string") == pk),
                    n_rows,
                    precounts=qcounts_by.get(pk),
                )
                verdicts.extend(qv)
                violations.extend(qviol)

            if self.ks_cols or self.psi_col:
                mat, freqs = kspsi_by.get(
                    pk, ({c: np.zeros(KS_BINS) for c in self.ks_cols}, {})
                )
                verdicts.extend(self._ks_psi_decide(pk, n_rows, is_ref, ranges, mat, freqs))

            self._finish_partition(pk, n_rows, fingerprint, verdicts, violations, t_pk,
                                   metrics=self._metrics_from_stats(stats))

        if self._feats_cache is not None:
            self._feats_cache.unpersist()
            self._feats_cache = None
