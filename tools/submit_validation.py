"""spark-submit entry point for the validation suite (north rule:
"the job launches with spark-submit --py-files on multi-executor
clusters").

Usage:
    python tools/submit_validation.py package   # build the --py-files zip
    spark-submit --py-files /tmp/menelaus_spark.zip \
        tools/submit_validation.py run \
        --input /path/to/audio_table --checkpoint /path/to/ckpt

On a cluster, --master/--num-executors etc. come from spark-submit;
this script only builds the session from the active context.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import zipfile


def build_zip(out_path: str = "/tmp/menelaus_spark.zip") -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "menelaus_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, repo))
    return out_path


def _parse_bps(spec: str) -> dict:
    """"ulaw=1,alaw=1,adpcm=60:256:505" -> payload_bps map: floats for
    linear bytes/sample, colon triples for block-quantized codecs
    (header:block:samples_per_block — see
    constraints.payload_expected_and_tol)."""
    out = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        codec, _, val = part.partition("=")
        if ":" in val:
            h, b, spb = val.split(":")
            out[codec.strip()] = (float(h), float(b), float(spb))
        else:
            out[codec.strip()] = float(val)
    return out


def run(args) -> None:
    # Under spark-submit the package arrives via --py-files; fall back
    # to the repo path for local runs.
    try:
        import menelaus_spark  # noqa: F401
    except ImportError:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from pyspark.sql import SparkSession

    from menelaus_spark import tables
    from menelaus_spark.runner import ValidationSuite

    spark = SparkSession.builder.appName("menelaus_spark_validation").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    df = spark.read.parquet(args.input)
    t0 = time.time()
    suite = ValidationSuite(
        spark,
        args.checkpoint,
        expected_schema=tables.AUDIO_SCHEMA if args.audio_schema else None,
        null_rate_max={"transcript": args.null_rate_max} if args.audio_schema else {},
        kdq_params={"count_ubound": args.kdq_count_ubound,
                    "bootstrap_samples": args.kdq_bootstrap},
        cps_bounds=(args.cps_lo, args.cps_hi) if args.audio_depth else None,
        payload_tol=args.payload_tol if args.audio_depth else None,
        payload_codecs=(
            tuple(c.strip() for c in args.payload_codecs.split(",") if c.strip())
            if (args.audio_depth and args.payload_codecs) else None
        ),
        payload_bps=(_parse_bps(args.payload_bps)
                     if (args.audio_depth and args.payload_bps) else None),
        quality_rules={"clip_rate_max": 0.05, "silence_ratio_max": 0.9,
                       "min_band_ratio": 0.01} if args.audio_depth else None,
    )
    verdicts, violations = suite.run(df)
    n_rows = sum(r["n_rows"] for r in suite.manifest.records)
    dt = time.time() - t0
    summary = {
        "partitions": len(suite.manifest.records),
        "clips": n_rows,
        "seconds": round(dt, 2),
        "clips_per_sec": round(n_rows / dt, 1) if dt > 0 else None,
        "verdicts": verdicts.count(),
        "violations": violations.count(),
        "drift": verdicts.filter("state = 'drift'").count(),
        "fail": verdicts.filter("state = 'fail'").count(),
    }
    print(json.dumps(summary))
    if args.output:
        verdicts.write.mode("overwrite").parquet(os.path.join(args.output, "verdicts"))
        violations.write.mode("overwrite").parquet(os.path.join(args.output, "violations"))
    spark.stop()


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("package")
    r = sub.add_parser("run")
    r.add_argument("--input", required=True)
    r.add_argument("--checkpoint", required=True)
    r.add_argument("--output", default=None)
    r.add_argument("--audio-schema", action=argparse.BooleanOptionalAction, default=True)
    r.add_argument("--null-rate-max", type=float, default=0.2)
    r.add_argument("--kdq-count-ubound", type=int, default=200)
    r.add_argument("--kdq-bootstrap", type=int, default=200)
    r.add_argument("--audio-depth", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="clipping/silence/bandwidth/transcript-rate/payload "
                        "checks (disable with --no-audio-depth). The "
                        "payload-size check assumes a mono PCM16 WAV "
                        "container (44-byte header + 2 bytes/sample); rows "
                        "with other codec values are skipped per "
                        "--payload-codecs")
    r.add_argument("--payload-codecs", default="pcm,wav",
                   help="comma-separated codec values whose payloads use "
                        "the WAV container layout; only these rows get the "
                        "payload-size check (empty string = check all rows)")
    r.add_argument("--payload-bps", default="",
                   help="codec-aware payload model, e.g. "
                        "'ulaw=1,alaw=1,adpcm=60:256:505' (floats = "
                        "bytes/sample, colon triples = block-quantized "
                        "header:block:samples_per_block). Codecs named "
                        "here are modeled, not skipped — combine with "
                        "--payload-codecs to widen the checked set")
    r.add_argument("--cps-lo", type=float, default=1.0)
    r.add_argument("--cps-hi", type=float, default=60.0)
    r.add_argument("--payload-tol", type=float, default=0.02)
    args = p.parse_args()
    if args.cmd == "package":
        print(build_zip())
    else:
        run(args)


if __name__ == "__main__":
    main()
