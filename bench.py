"""Benchmark harness. Prints ONE JSON line:
    {"metric": ..., "value": <sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Headline = wall seconds for the full audio validation suite (constraint
+ drift checks over a deterministically synthesized clip table scaled
by sf) — the north-star workload; `clips_per_sec` is reported alongside.
Per-query timings cover the operator surface from __spark_entry__.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from menelaus_spark import tables
from menelaus_spark.runner import ValidationSuite
from menelaus_spark.session import get_spark

BENCH_QUERIES = [
    "pricing_summary",
    "topk_orders_per_customer",
    "hist_extendedprice",
    "hellinger_returnflag",
    "psi_event_type_halves",
    "ks_value_click_vs_error",
    "minhash_documents",
    "ngram_jaccard_documents",
    "embedding_neardup",
    "ann_cosine_topk",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "pq_ann_topk",
    "ivfpq_ann_topk",
    "token_stats",
    "text_quality",
    "lang_id",
    "doc_fingerprints",
    "simhash_documents",
    "hdddm_lineitem",
    "kdq_lineitem",
    "streaming_traces",
    "hll_distinct_events",
    "stratified_sample_events",
    "sessions_events",
]

CLIPS_PER_SF = 160_000  # sf0.1 -> 16k clips

# Pure-JVM whole-stage-codegen range sum: zero I/O, zero Python, fixed
# work. Its wall time moves ONLY with host CPU contention, so it turns
# "the host was noisy" from a narrative into a number — divide any
# query's round-over-round delta by the calibration delta before
# attributing it to code (VERDICT r04 task 3).
CALIBRATION_ROWS = 20_000_000_000


def run_noop(df):
    df.write.format("noop").mode("overwrite").save()


def calibration_sec(spark, cpus: int) -> float:
    t0 = time.time()
    # bit_xor, not sum: ANSI mode overflows a long sum at 2e10 ids
    spark.range(0, CALIBRATION_ROWS, 1, cpus).selectExpr("bit_xor(id)").collect()
    return round(time.time() - t0, 3)


def _min_of_trials() -> None:
    """Run the bench in N fresh subprocesses (fresh JVM each — shuffle
    reuse inside one session would fake the second trial) and print the
    per-query MINIMUM. This VM shows 20-45% host noise between
    identical runs (BENCH/BASELINE.md); the min of a deterministic job
    is the least-polluted sample."""
    import subprocess
    import sys

    trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "2"))
    env = dict(os.environ, SPARK_GRAFT_BENCH_CHILD="1")
    results = []
    for _ in range(trials):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, env=env,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))
    best = dict(results[0])
    best["queries"] = {
        name: min(r["queries"][name] for r in results)
        for name in results[0]["queries"]
    }
    best["value"] = round(sum(best["queries"].values()), 3)
    best["clips_per_sec"] = round(
        best["audio_clips"] / best["queries"]["audio_suite"], 1
    )
    best["trials"] = trials
    # per-trial host-noise evidence: the fixed-work JVM calibration row
    # and each trial's total, so a reader can separate host drift from
    # code drift mechanically
    best["calibration_sec"] = min(r["calibration_sec"] for r in results)
    best["calibration_per_trial"] = [r["calibration_sec"] for r in results]
    best["value_per_trial"] = [
        round(sum(r["queries"].values()), 3) for r in results
    ]
    print(json.dumps(best))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if (
        os.environ.get("SPARK_GRAFT_BENCH_CHILD") != "1"
        and int(os.environ.get("SPARK_GRAFT_TRIALS", "2")) > 1
    ):
        _min_of_trials()
        return
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    spark = get_spark(cores=cpus, shuffle_partitions=cpus, app_name=f"bench_c{cpus}")
    calib = calibration_sec(spark, cpus)

    timings: dict[str, float] = {}
    qs = entrymod.queries()
    for name in BENCH_QUERIES:
        t0 = time.time()
        run_noop(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    # headline: full validation suite over the synthetic audio table
    n_clips = max(2000, int(CLIPS_PER_SF * sf))
    work = f"/tmp/menelaus_bench_{sf}_{cpus}"
    shutil.rmtree(work, ignore_errors=True)
    audio_path = os.path.join(work, "audio")
    tables.write_audio_table(
        tables.audio_table(spark, n_rows=n_clips, n_parts=10), audio_path
    )
    df = spark.read.parquet(audio_path)
    t0 = time.time()
    suite = ValidationSuite(
        spark,
        os.path.join(work, "ckpt"),
        expected_schema=tables.AUDIO_SCHEMA,
        null_rate_max={"transcript": 0.2},
        ranges={"dur_ms": (200, 3000)},
        accepted_values={"codec": ["pcm", "opus", "mp3", "aac", "flac"]},
        kdq_params={"count_ubound": 200, "bootstrap_samples": 200},
        # audio-depth checks ride the existing passes (transcript rate +
        # payload size in the fused constraint agg / decode pass; clip +
        # silence metrics from the same decoded buffers)
        cps_bounds=(1.0, 60.0),
        payload_tol=0.02,
        quality_rules={"clip_rate_max": 0.05, "silence_ratio_max": 0.9,
                       "min_band_ratio": 0.01},
    )
    suite.run(df)
    audio_suite_s = round(time.time() - t0, 3)
    timings["audio_suite"] = audio_suite_s

    # the same suite over the THREE-physical-codec table (mu-law /
    # A-law / IMA ADPCM containers): measures the real decode cost a
    # compressed 100-TB corpus pays — ADPCM's block expansion is the
    # heaviest numpy kernel in the whole engine
    from menelaus_spark.audio import ADPCM_PAYLOAD_MODEL

    codecs_path = os.path.join(work, "audio_codecs")
    tables.write_audio_table(
        tables.audio_table(spark, n_rows=n_clips, n_parts=10,
                           real_codecs="full"),
        codecs_path,
    )
    df_codecs = spark.read.parquet(codecs_path)
    t0 = time.time()
    suite_codecs = ValidationSuite(
        spark,
        os.path.join(work, "ckpt_codecs"),
        expected_schema=tables.AUDIO_SCHEMA,
        null_rate_max={"transcript": 0.2},
        ranges={"dur_ms": (200, 3000)},
        accepted_values={"codec": ["pcm", "ulaw", "alaw", "adpcm", "flac"]},
        kdq_params={"count_ubound": 200, "bootstrap_samples": 200},
        cps_bounds=(1.0, 60.0),
        payload_tol=0.02,
        payload_bps={"ulaw": 1.0, "alaw": 1.0, "adpcm": ADPCM_PAYLOAD_MODEL},
        quality_rules={"clip_rate_max": 0.05, "silence_ratio_max": 0.9,
                       "min_band_ratio": 0.01},
    )
    suite_codecs.run(df_codecs)
    timings["audio_suite_codecs"] = round(time.time() - t0, 3)

    # audio near-dup: all three fingerprint matching paths over the
    # SAME sf-scaled table (shingle MinHash/LSH + transcript-blocked
    # masked-BER + speed-ratio peak rescaling), sharing ONE decode
    # pass via the persisted fingerprint frame
    from menelaus_spark.operators.audio_dedup import (
        audio_dedup_resolution,
        audio_fingerprints,
        audio_neardup_pairs,
        speed_blocked_neardup,
        transcript_blocked_neardup,
    )

    t0 = time.time()
    fp = audio_fingerprints(df).persist()
    run_noop(audio_neardup_pairs(df, fp=fp))
    run_noop(transcript_blocked_neardup(df, fp=fp))
    run_noop(speed_blocked_neardup(df, fp=fp))
    timings["audio_neardup"] = round(time.time() - t0, 3)

    # end-to-end resolution over the same persisted fingerprint frame:
    # pair union + alternating-star connected components + audit frame
    t0 = time.time()
    run_noop(audio_dedup_resolution(df, fp=fp))
    fp.unpersist()
    timings["audio_dedup_resolution"] = round(time.time() - t0, 3)

    # audio processing ops (resample / frame-sample / VAD / loudness):
    # four Arrow-batched passes over the codec-mixed table — the
    # per-clip transform cost of a training-data prep pipeline
    from menelaus_spark import audio as audio_mod

    t0 = time.time()
    run_noop(audio_mod.resample_clips(df_codecs, 8000))
    run_noop(audio_mod.frame_sample(df_codecs, n_frames=4, frame_ms=100))
    run_noop(audio_mod.vad_segments(df_codecs))
    run_noop(audio_mod.normalize_loudness(df_codecs))
    timings["audio_processing"] = round(time.time() - t0, 3)

    # multimodal image/video at sf scale: decode + features + near-dup
    # (generation excluded — tables written to parquet first, like the
    # audio fixtures above)
    from menelaus_spark.operators import media

    n_images = max(600, int(20_000 * sf / 0.1))
    n_videos = max(120, int(4_000 * sf / 0.1))
    ipath, vpath = os.path.join(work, "images"), os.path.join(work, "videos")
    media.image_neardup_table(spark, n_images=n_images, n_parts=cpus,
                              texture="random").write.mode("overwrite").parquet(ipath)
    media.video_neardup_table(spark, n_videos=n_videos,
                              n_parts=cpus).write.mode("overwrite").parquet(vpath)
    imgs, vids = spark.read.parquet(ipath), spark.read.parquet(vpath)
    t0 = time.time()
    run_noop(media.image_features(imgs))
    run_noop(media.image_neardup_pairs(imgs))
    timings["image_ops"] = round(time.time() - t0, 3)
    t0 = time.time()
    run_noop(media.video_frame_stats(vids, stride=3))
    run_noop(media.video_neardup_pairs(vids))
    timings["video_ops"] = round(time.time() - t0, 3)
    shutil.rmtree(work, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "full operator-suite wall time (headline: audio validation suite)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "audio_clips": n_clips,
                "clips_per_sec": round(n_clips / audio_suite_s, 1),
                "calibration_sec": calib,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
