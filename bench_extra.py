"""Extra benchmarks for optimization work (bench.py is frozen for
measurement; this file exists for guide §1.4-style isolation runs).

Usage:
    python bench_extra.py [name ...]          # time listed queries (noop sink)
    python bench_extra.py --suite             # audio suite phase profile
    python bench_extra.py --neardup           # audio near-dup/resolution profile
    python bench_extra.py --media             # image/video ops profile
    python bench_extra.py --explain name ...  # dump .explain('formatted')

Each timed block runs under its own job group so the per-query Spark
job count is reported next to the wall seconds — plan-shape drift
(extra jobs from collects) shows up immediately.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_EVENTLOG=1 to keep an
     event log under /tmp/sparklogs for stage-level analysis.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from menelaus_spark.session import get_spark


def run_noop(df):
    df.write.format("noop").mode("overwrite").save()


def _spark(cpus):
    extra = {}
    if os.environ.get("SPARK_GRAFT_EVENTLOG") == "1":
        os.makedirs("/tmp/sparklogs", exist_ok=True)
        extra = {"spark.eventLog.enabled": "true",
                 "spark.eventLog.dir": "/tmp/sparklogs"}
    return get_spark(cores=cpus, shuffle_partitions=cpus,
                     app_name=f"bench_extra_c{cpus}", extra_conf=extra)


def timed(spark, name, fn):
    sc = spark.sparkContext
    gid = f"bx_{name}_{time.time():.0f}"
    sc.setJobGroup(gid, name)
    t0 = time.time()
    fn()
    dt = time.time() - t0
    jobs = len(sc.statusTracker().getJobIdsForGroup(gid))
    sc.setJobGroup(None, None)
    print(f"{name:38s} {dt:8.3f}s  jobs={jobs}")
    return dt


def profile_suite(spark, sf_dir, codecs=False):
    """Phase-level timing of the ValidationSuite over the bench's
    synthetic audio table (mirrors bench.py's construction)."""
    import shutil

    from menelaus_spark import tables
    from menelaus_spark.audio import ADPCM_PAYLOAD_MODEL
    from menelaus_spark.runner import ValidationSuite

    sf = 0.1
    n_clips = max(2000, int(160_000 * sf))
    work = "/tmp/menelaus_bx_suite"
    shutil.rmtree(work, ignore_errors=True)
    audio_path = os.path.join(work, "audio")
    kw = {}
    accepted = ["pcm", "opus", "mp3", "aac", "flac"]
    if codecs:
        kw = {"real_codecs": "full"}
        accepted = ["pcm", "ulaw", "alaw", "adpcm", "flac"]
    tables.write_audio_table(
        tables.audio_table(spark, n_rows=n_clips, n_parts=10, **kw), audio_path
    )
    df = spark.read.parquet(audio_path)
    suite_kw = dict(
        expected_schema=tables.AUDIO_SCHEMA,
        null_rate_max={"transcript": 0.2},
        ranges={"dur_ms": (200, 3000)},
        accepted_values={"codec": accepted},
        kdq_params={"count_ubound": 200, "bootstrap_samples": 200},
        cps_bounds=(1.0, 60.0),
        payload_tol=0.02,
        quality_rules={"clip_rate_max": 0.05, "silence_ratio_max": 0.9,
                       "min_band_ratio": 0.01},
    )
    if codecs:
        suite_kw["payload_bps"] = {"ulaw": 1.0, "alaw": 1.0,
                                   "adpcm": ADPCM_PAYLOAD_MODEL}
    suite = ValidationSuite(spark, os.path.join(work, "ckpt"), **suite_kw)
    t0 = time.time()
    suite.run(df)
    print(f"suite total: {time.time() - t0:.3f}s")
    shutil.rmtree(work, ignore_errors=True)


def profile_neardup(spark, sf_dir):
    import shutil

    from menelaus_spark import tables
    from menelaus_spark.operators.audio_dedup import (
        audio_dedup_resolution,
        audio_fingerprints,
        audio_neardup_pairs,
        speed_blocked_neardup,
        transcript_blocked_neardup,
    )

    sf = 0.1
    n_clips = max(2000, int(160_000 * sf))
    work = "/tmp/menelaus_bx_nd"
    shutil.rmtree(work, ignore_errors=True)
    audio_path = os.path.join(work, "audio")
    tables.write_audio_table(
        tables.audio_table(spark, n_rows=n_clips, n_parts=10), audio_path
    )
    df = spark.read.parquet(audio_path)
    fp = audio_fingerprints(df).persist()
    timed(spark, "fp_materialize", lambda: fp.count())
    timed(spark, "neardup_pairs", lambda: run_noop(audio_neardup_pairs(df, fp=fp)))
    timed(spark, "transcript_blocked",
          lambda: run_noop(transcript_blocked_neardup(df, fp=fp)))
    timed(spark, "speed_blocked",
          lambda: run_noop(speed_blocked_neardup(df, fp=fp)))
    timed(spark, "dedup_resolution",
          lambda: run_noop(audio_dedup_resolution(df, fp=fp)))
    fp.unpersist()
    shutil.rmtree(work, ignore_errors=True)


def profile_media(spark, sf_dir):
    import shutil

    from menelaus_spark.operators import media

    sf, cpus = 0.1, int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_images = max(600, int(20_000 * sf / 0.1))
    n_videos = max(120, int(4_000 * sf / 0.1))
    work = "/tmp/menelaus_bx_media"
    shutil.rmtree(work, ignore_errors=True)
    ipath, vpath = os.path.join(work, "images"), os.path.join(work, "videos")
    media.image_neardup_table(spark, n_images=n_images, n_parts=cpus,
                              texture="random").write.mode("overwrite").parquet(ipath)
    media.video_neardup_table(spark, n_videos=n_videos,
                              n_parts=cpus).write.mode("overwrite").parquet(vpath)
    imgs, vids = spark.read.parquet(ipath), spark.read.parquet(vpath)
    timed(spark, "image_features", lambda: run_noop(media.image_features(imgs)))
    timed(spark, "image_neardup_pairs",
          lambda: run_noop(media.image_neardup_pairs(imgs)))
    timed(spark, "video_frame_stats",
          lambda: run_noop(media.video_frame_stats(vids, stride=3)))
    timed(spark, "video_neardup_pairs",
          lambda: run_noop(media.video_neardup_pairs(vids)))
    shutil.rmtree(work, ignore_errors=True)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = sys.argv[1:]
    spark = _spark(cpus)
    qs = entrymod.queries()

    if args and args[0] == "--explain":
        os.makedirs("plans/r06", exist_ok=True)
        for name in args[1:]:
            plan = qs[name](spark, sf_dir)._sc is None  # placeholder
        return
    if args and args[0] == "--suite":
        profile_suite(spark, sf_dir, codecs=("codecs" in args))
    elif args and args[0] == "--neardup":
        profile_neardup(spark, sf_dir)
    elif args and args[0] == "--media":
        profile_media(spark, sf_dir)
    else:
        names = args or [
            "pricing_summary", "topk_orders_per_customer", "hist_extendedprice",
            "hellinger_returnflag", "psi_event_type_halves",
            "ks_value_click_vs_error", "minhash_documents",
            "ngram_jaccard_documents", "embedding_neardup", "ann_cosine_topk",
            "lsh_ann_topk", "ivf_ann_topk", "pq_ann_topk", "ivfpq_ann_topk",
            "token_stats", "text_quality", "lang_id", "doc_fingerprints",
            "simhash_documents", "hdddm_lineitem", "kdq_lineitem",
            "streaming_traces", "hll_distinct_events",
            "stratified_sample_events", "sessions_events",
        ]
        total = 0.0
        for name in names:
            total += timed(spark, name, lambda n=name: run_noop(qs[n](spark, sf_dir)))
        print(f"{'TOTAL':38s} {total:8.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
