"""N-vs-4N scaling-efficiency benchmark for the AUDIO NEAR-DUP
pipeline (third scaling witness, alongside the validation suite and
the dedup/text half): one shared fingerprint decode pass feeding the
fingerprint-shingle MinHash/LSH path, the transcript-blocked
masked-BER path, the speed-ratio peak-rescaling path, and the
connected-components RESOLUTION step (late-r04: the full pipeline).

Generates a deterministic audio table once (counter-based per-clip RNG,
12.5% injected mechanical near-duplicates in the MIXED taxonomy —
every copy class — so every matching path does real work), then runs
the full dedup suite in a fresh subprocess per core count.

Usage: python tools/scaling_bench_audio_dedup.py [n_clips] [n_parts] [lo] [hi] [mode]
Appends a manual section to BENCH/BASELINE.md with throughput at both
levels + efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN_SNIPPET = """
import sys, time; sys.path.insert(0, {repo!r})
from menelaus_spark import tables
from menelaus_spark.session import get_spark

spark = get_spark(cores=32, shuffle_partitions=32, app_name="audiodedupgen")
t0 = time.time()
df = tables.audio_table(spark, n_rows={n_clips}, n_parts={n_parts},
                        drift={{}}, neardup_frac=0.125, null_frac=0.0,
                        neardup_modes={modes!r})
tables.write_audio_table(df, {path!r})
print("GEN_SECONDS", round(time.time() - t0, 1))
spark.stop()
"""

RUN_SNIPPET = """
import sys, time, json; sys.path.insert(0, {repo!r})
from menelaus_spark.operators.audio_dedup import audio_dedup_resolution
from menelaus_spark.session import get_spark

spark = get_spark(cores={cores}, shuffle_partitions={cores},
                  app_name="audiodedupscale{cores}")
def noop(df):
    df.write.format("noop").mode("overwrite").save()

t0 = time.time()
df = spark.read.parquet({path!r})
# the resolution op runs all three matching paths off one persisted
# decode pass, then the alternating-star component loop
noop(audio_dedup_resolution(df))
dt = time.time() - t0
n = df.count()
print(json.dumps({{"RESULT": True, "cores": {cores}, "seconds": round(dt, 2),
                  "clips": n, "clips_per_sec": round(n / dt, 1)}}))
spark.stop()
"""


def run_py(code: str) -> str:
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    if out.returncode != 0:
        print(out.stdout[-3000:])
        print(out.stderr[-3000:])
        raise SystemExit("child failed")
    return out.stdout


def main():
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 48_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    mode = sys.argv[5] if len(sys.argv) > 5 else "mixed"
    modes = (mode,) if mode != "default" else ("gain", "resample")
    work = f"/tmp/menelaus_audiodedupscale_{n_clips}_{n_parts}_{mode}"
    if not os.path.exists(os.path.join(work, "_SUCCESS")):
        print(f"generating {n_clips} clips ...", flush=True)
        print(run_py(GEN_SNIPPET.format(repo=REPO, n_clips=n_clips,
                                        n_parts=n_parts, path=work,
                                        modes=modes)
                     ).strip().splitlines()[-1])
    n_trials = int(os.environ.get("SCALE_TRIALS", "2"))
    results = {}
    trials_log: dict[int, list] = {}
    for cores in (lo, hi):
        best = None
        trials_log[cores] = []
        for trial in range(n_trials):
            out = run_py(RUN_SNIPPET.format(repo=REPO, cores=cores, path=work))
            line = [ln for ln in out.splitlines() if '"RESULT"' in ln][-1]
            r = json.loads(line)
            print(f"trial {trial}:", r, flush=True)
            trials_log[cores].append(r["seconds"])
            if best is None or r["seconds"] < best["seconds"]:
                best = r
        results[cores] = best

    t_lo, t_hi = results[lo]["seconds"], results[hi]["seconds"]
    eff = t_lo / ((hi / lo) * t_hi)
    print(f"\nefficiency local[{lo}]->local[{hi}]: {eff:.3f} (target >= 0.8)")

    stamp = time.strftime("%Y-%m-%d")
    md = f"""
## Audio near-dup pipeline scaling (measured {stamp})

Third scaling witness, covering the FULL audio near-duplicate
pipeline: ONE shared fingerprint decode pass feeding all three
matching paths (shingle MinHash/LSH + containment, transcript-blocked
masked-BER, speed-ratio peak rescaling) plus the alternating-star
connected-components resolution, over a deterministic
{n_clips:,}-clip table with 12.5% injected mechanical copies
(mode={mode}), generated once and shared by both levels.

| config | wall s (min) | all trials (s) | clips/sec |
|---|---|---|---|
| local[{lo}] (N) | {t_lo} | {trials_log[lo]} | {results[lo]['clips_per_sec']} |
| local[{hi}] (4N) | {t_hi} | {trials_log[hi]} | {results[hi]['clips_per_sec']} |

**Throughput scaling efficiency N -> 4N = T(N) / (4 x T(4N)) =
{eff:.3f}** (target >= 0.8); min of SCALE_TRIALS={n_trials} fresh-JVM
trials per level (same host-noise protocol as the other witnesses),
per-trial walls listed for spread audit.
Reproduce: `python tools/scaling_bench_audio_dedup.py {n_clips} {n_parts} {lo} {hi} {mode}`
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out_path, "a") as f:
        f.write(md)
    print("appended to BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
