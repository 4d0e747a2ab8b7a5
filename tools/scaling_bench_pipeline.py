"""N-vs-4N scaling witness for the r05 pipeline-op family:
sessionization + stratified sample + budget mix + HLL distinct +
count-min grid, all over ONE pre-generated wide events table.

Same protocol as the other witnesses: generate once, then run the
whole op chain in a fresh subprocess per core count (fresh JVM),
3 trials per cell, report min-of-trials throughput and the N->4N
efficiency. PRINTS results; BENCH/BASELINE.md is hand-consolidated.

Usage: python tools/scaling_bench_pipeline.py [n_rows] [n_parts] [lo] [hi] [trials]
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
from pyspark.sql import functions as F
from menelaus_spark.session import get_spark
spark = get_spark(cores=32, shuffle_partitions=32, app_name="pipegen")
t0 = time.time()
n = {n_rows}
df = (spark.range(0, n, 1, {n_parts})
      .select(
          F.col("id").alias("event_id"),
          # ~40k users, bursty arrivals: base per-user lane + jitter
          (F.col("id") % 200000).alias("user_id"),
          F.timestamp_millis(
              F.lit(1767225600000)
              + (F.col("id") % 200000) * 12000
              + F.floor(F.col("id") / 200000).cast("long") * 240000
              + F.pmod(F.xxhash64("id"), F.lit(600000))).alias("ts"),
          F.concat(F.lit("t"), (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(64)))
                   .cast("string")).alias("event_type"),
          (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(5000)) + 20).alias("n_chars"),
      ))
df.write.mode("overwrite").parquet({path!r})
print("GEN_SECONDS", round(time.time() - t0, 1))
spark.stop()
"""

RUN_SNIPPET = """
import sys, time, json; sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from menelaus_spark.session import get_spark
from menelaus_spark.operators import sampling as SA, sketches as SK
from menelaus_spark.operators.relational import session_stats, sessionize
# 4x shuffle partitions: keyed sorts run over smaller, cache-friendlier
# chunks and stragglers overlap (measured: total 185 -> 167 s at
# local[2], 94 -> 66 s at local[8] on the 24M-row table)
spark = get_spark(cores={cores}, shuffle_partitions=4 * {cores}, app_name="pipe{cores}")
df = spark.read.parquet({path!r})
steps = {{}}
t0 = time.time()
t = time.time()
# 1. sessionize + per-session stats (keyed sort, window chain)
st = session_stats(
    sessionize(df, "user_id", "ts", gap_ms=1_800_000, order_cols=["event_id"]),
    "user_id", "ts")
n_sessions = st.count()
steps["sessions"] = round(time.time() - t, 2); t = time.time()
# 2. stratified sample (WindowGroupLimit partial top-k)
n_strat = SA.stratified_sample(df, "event_type", "event_id", 100).count()
steps["strat"] = round(time.time() - t, 2); t = time.time()
# 3. budget mix (running-sum cut)
budgets = {{f"t{{i}}": 400_000 for i in range(64)}}
n_budget = SA.budget_mix_sample(df, "event_type", "event_id", "n_chars", budgets).count()
steps["budget"] = round(time.time() - t, 2); t = time.time()
# 4. HLL distinct on user_id (register-only shuffle)
est, v_zero, s_int = SK.hll_estimate(SK.hll_registers(df, "user_id", p=12), p=12)
steps["hll"] = round(time.time() - t, 2); t = time.time()
# 5. count-min grid on event_type
n_cms = SK.cms_counters(df, "event_type", d=4, w=64).count()
steps["cms"] = round(time.time() - t, 2)
dt = time.time() - t0
# fixed-work pure-JVM calibration (same rows at every core count):
# its 2-vs-8 ratio is the HOST's parallel-speedup ceiling this window
t = time.time()
spark.range(0, 8_000_000_000, 1, {cores}).selectExpr("bit_xor(id)").collect()
cal = round(time.time() - t, 2)
print("RESULT " + json.dumps({{
    "cores": {cores}, "sec": round(dt, 2),
    "rows_per_sec": round(df.count() / dt, 1), "steps": steps, "cal_sec": cal,
    "n_sessions": n_sessions, "n_strat": n_strat, "n_budget": n_budget,
    "hll_est": round(est, 1), "n_cms": n_cms}}))
spark.stop()
"""


def run_cell(path: str, cores: int) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, path=path, cores=cores)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    trials = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    path = f"/tmp/pipe_scale_{n_rows}"
    if not os.path.isdir(path):
        code = GEN_SNIPPET.format(repo=REPO, n_rows=n_rows, n_parts=n_parts, path=path)
        print(subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True).stdout.strip())
    cells = {}
    for cores in (lo, hi):
        runs = []
        for t in range(trials):
            r = run_cell(path, cores)
            runs.append(r)
            print(f"cores={cores} trial={t}: {r['sec']} s "
                  f"({r['rows_per_sec']} rows/s, cal {r['cal_sec']} s) "
                  f"{json.dumps(r['steps'])}")
        best = min(runs, key=lambda r: r["sec"])
        cells[cores] = best
        # sanity: all trials agree on every count/estimate
        for k in ("n_sessions", "n_strat", "n_budget", "hll_est", "n_cms"):
            assert len({r[k] for r in runs}) == 1, k
    tl, th = cells[lo]["rows_per_sec"], cells[hi]["rows_per_sec"]
    eff = th / (tl * hi / lo)
    cal_ceiling = (cells[lo]["cal_sec"] / cells[hi]["cal_sec"]) / (hi / lo)
    print(f"\nmin-of-{trials}: local[{lo}] {cells[lo]['sec']} s "
          f"({tl} rows/s) vs local[{hi}] {cells[hi]['sec']} s ({th} rows/s)")
    print(f"scaling efficiency {lo}->{hi}: {eff:.3f}")
    print(f"calibration ceiling (pure-JVM fixed work) {lo}->{hi}: {cal_ceiling:.3f}")
    print("outputs:", {k: cells[hi][k] for k in
                       ("n_sessions", "n_strat", "n_budget", "hll_est", "n_cms")})


if __name__ == "__main__":
    main()
