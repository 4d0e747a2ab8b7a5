"""N-vs-4N scaling witness for the image/video media ops: BMP decode +
features + phash near-dup, y4m frame-sampled stats + frame-code
near-dup, over pre-generated parquet tables.

Same protocol as the other witnesses (generate once at 32 cores, fresh
JVM per trial per cell, min-of-trials, per-cell fixed-work calibration
row). PRINTS results; BENCH/BASELINE.md is hand-consolidated.

Usage: python tools/scaling_bench_media.py [n_images] [n_videos] [lo] [hi] [trials]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN_SNIPPET = """
import sys, time; sys.path.insert(0, {repo!r})
from menelaus_spark.session import get_spark
from menelaus_spark.operators import media
spark = get_spark(cores=32, shuffle_partitions=32, app_name="mediagen")
t0 = time.time()
media.image_neardup_table(spark, n_images={n_images}, n_parts=64,
                          texture="random").write.mode(
    "overwrite").parquet({ipath!r})
media.video_neardup_table(spark, n_videos={n_videos}, n_parts=64,
                          texture="random").write.mode(
    "overwrite").parquet({vpath!r})
print("GEN_SECONDS", round(time.time() - t0, 1))
spark.stop()
"""

RUN_SNIPPET = """
import sys, time, json; sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from menelaus_spark.session import get_spark
from menelaus_spark.operators import media
spark = get_spark(cores={cores}, shuffle_partitions=4 * {cores}, app_name="media{cores}")
imgs = spark.read.parquet({ipath!r})
vids = spark.read.parquet({vpath!r})
spark.range(0, 1_000_000, 1, {cores}).count()  # JVM/codegen warmup
steps = {{}}
t0 = time.time(); t = t0
n_feat = media.image_features(imgs).filter("ok").count()
steps["img_features"] = round(time.time() - t, 2); t = time.time()
n_ipairs = media.image_neardup_pairs(imgs).count()
steps["img_neardup"] = round(time.time() - t, 2); t = time.time()
n_fstats = media.video_frame_stats(vids, stride=3).count()
steps["vid_stats"] = round(time.time() - t, 2); t = time.time()
n_vpairs = media.video_neardup_pairs(vids).count()
steps["vid_neardup"] = round(time.time() - t, 2)
dt = time.time() - t0
n_rows = imgs.count() + vids.count()
t = time.time()
# 32G rows: big enough that codegen-compile + job-submit fixed cost
# is noise at BOTH parallelism levels (8G reads ~0.3 s of fixed cost
# into the 4N wall and understates the ceiling)
spark.range(0, 32_000_000_000, 1, {cores}).selectExpr("bit_xor(id)").collect()
cal = round(time.time() - t, 2)
print("RESULT " + json.dumps({{
    "cores": {cores}, "sec": round(dt, 2),
    "rows_per_sec": round(n_rows / dt, 1), "steps": steps, "cal_sec": cal,
    "n_feat": n_feat, "n_ipairs": n_ipairs,
    "n_fstats": n_fstats, "n_vpairs": n_vpairs}}))
spark.stop()
"""


def run_cell(ipath: str, vpath: str, cores: int) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, ipath=ipath, vpath=vpath, cores=cores)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_videos = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    trials = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    ipath = f"/tmp/media_scale_img_{n_images}"
    vpath = f"/tmp/media_scale_vid_{n_videos}"
    if not (os.path.isdir(ipath) and os.path.isdir(vpath)):
        code = GEN_SNIPPET.format(repo=REPO, n_images=n_images, n_videos=n_videos,
                                  ipath=ipath, vpath=vpath)
        print(subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True).stdout.strip())
    cells = {}
    for cores in (lo, hi):
        runs = []
        for t in range(trials):
            r = run_cell(ipath, vpath, cores)
            runs.append(r)
            print(f"cores={cores} trial={t}: {r['sec']} s "
                  f"({r['rows_per_sec']} rows/s, cal {r['cal_sec']} s) "
                  f"{json.dumps(r['steps'])}")
        best = min(runs, key=lambda r: r["sec"])
        cells[cores] = best
        for k in ("n_feat", "n_ipairs", "n_fstats", "n_vpairs"):
            assert len({r[k] for r in runs}) == 1, k
    tl, th = cells[lo]["rows_per_sec"], cells[hi]["rows_per_sec"]
    eff = th / (tl * hi / lo)
    cal_ceiling = (cells[lo]["cal_sec"] / cells[hi]["cal_sec"]) / (hi / lo)
    print(f"\nmin-of-{trials}: local[{lo}] {cells[lo]['sec']} s vs "
          f"local[{hi}] {cells[hi]['sec']} s")
    print(f"scaling efficiency {lo}->{hi}: {eff:.3f}")
    print(f"calibration ceiling (pure-JVM fixed work) {lo}->{hi}: {cal_ceiling:.3f}")
    print("outputs:", {k: cells[hi][k] for k in
                       ("n_feat", "n_ipairs", "n_fstats", "n_vpairs")})


if __name__ == "__main__":
    main()
