"""N-vs-4N scaling-efficiency benchmark for the DEDUP/TEXT pipeline
half of the engine (r03 VERDICT item 6: the audio suite's scaling
number needs a second witness on the minhash + ngram + embedding
path).

Generates a deterministic synthetic document corpus + embedding table
once (per-id counter-based RNG — partitioning-invariant, ~5% injected
near-duplicates so the dedup stages do real work), then runs the full
dedup/text pipeline in a fresh subprocess per core count:

    exact dedup -> MinHash+LSH near-dup -> blocked n-gram Jaccard ->
    SimHash64 -> Karp-Rabin fingerprints -> token/quality/lang-id ->
    k-means blocks -> embedding-cosine near-dup

Usage: python tools/scaling_bench_text.py [n_docs] [n_vecs] [lo] [hi]
Appends a manual section to BENCH/BASELINE.md (below the preserved
marker) with throughput at both levels + efficiency.
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
import numpy as np, pandas as pd
from menelaus_spark.session import get_spark

spark = get_spark(cores=32, shuffle_partitions=32, app_name="textgen")
WORDS = np.array(["w%03d" % i for i in range(1000)])
WP = (1.0 / np.arange(1, 1001)) ** 1.1
WP /= WP.sum()
LANGS = np.array(["en", "de", "fr", "es"])

def gen_docs(batches):
    for pdf in batches:
        rows = []
        for i in pdf["id"].to_numpy():
            i = int(i)
            rng = np.random.default_rng([7, i])
            n_tok = 20 + int(rng.integers(0, 80))
            toks = rng.choice(WORDS, size=n_tok, p=WP)
            if i % 20 == 19:  # near-duplicate of the previous doc
                rng2 = np.random.default_rng([7, i - 1])
                n2 = 20 + int(rng2.integers(0, 80))
                toks = rng2.choice(WORDS, size=n2, p=WP)
                j = int(rng.integers(0, len(toks)))
                toks = toks.copy(); toks[j] = "x" + toks[j]
            text = " ".join(toks)
            rows.append((i, text, str(rng.choice(LANGS)), len(text)))
        yield pd.DataFrame(rows, columns=["doc_id", "text", "lang", "n_chars"])

def gen_vecs(batches):
    for pdf in batches:
        rows = []
        for i in pdf["id"].to_numpy():
            i = int(i)
            rng = np.random.default_rng([11, i])
            v = rng.standard_normal(64)
            if i % 30 == 29:  # near-duplicate direction of previous vec
                rng2 = np.random.default_rng([11, i - 1])
                v = rng2.standard_normal(64) + 0.01 * rng.standard_normal(64)
            v /= np.linalg.norm(v)
            rows.append((i, v.astype(float).tolist(), int(i % 7)))
        yield pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])

t0 = time.time()
spark.range({n_docs}).mapInPandas(gen_docs,
    "doc_id long, text string, lang string, n_chars long").write.mode(
    "overwrite").parquet({path!r} + "/documents")
spark.range({n_vecs}).mapInPandas(gen_vecs,
    "vec_id long, embedding array<double>, label int").write.mode(
    "overwrite").parquet({path!r} + "/embeddings")
print("GEN_SECONDS", round(time.time() - t0, 1))
spark.stop()
"""

RUN_SNIPPET = """
import sys, time, json; sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from menelaus_spark.operators import dedup
from menelaus_spark.operators import text as T
from menelaus_spark.session import get_spark

spark = get_spark(cores={cores}, shuffle_partitions={cores}, app_name="textscale{cores}")
def noop(df):
    df.write.format("noop").mode("overwrite").save()

# the small test corpus arrives as 1-2 parquet splits (~30 MB); a real
# 10^12-row table has thousands. Spread to the session's parallelism
# so both levels measure the ENGINE, not a single-split input artifact
# (same spread idiom as __spark_entry__._t; the shuffle is timed).
t0 = time.time()
docs = spark.read.parquet({path!r} + "/documents").repartition({cores})
emb = spark.read.parquet({path!r} + "/embeddings").repartition({cores})
noop(dedup.exact_duplicates(docs, "doc_id"))
noop(dedup.minhash_lsh_dedup(docs, "doc_id", "text", n=3, k=8, bands=4,
                             rows=2, threshold=0.5))
blocked_docs = docs.withColumn(
    "__blk", F.concat_ws("|", F.col("lang"), F.floor(F.col("n_chars") / 64)))
noop(dedup.ngram_jaccard_pairs(blocked_docs, "doc_id", "text", n=2,
                               threshold=0.5, block_col="__blk"))
noop(dedup.simhash64(docs, "doc_id"))
noop(T.doc_fingerprint(docs, "doc_id"))
noop(T.quality_features(docs))
noop(T.lang_id(docs))
blocks = dedup.kmeans_blocks(emb, "vec_id", "embedding", n_blocks=16,
                             n_iters=20, seed=42)
noop(dedup.embedding_neardup_pairs(blocks, "vec_id", "embedding",
                                   threshold=0.9, block_col="block"))
blocks.unpersist()
dt = time.time() - t0
n = docs.count() + emb.count()
print(json.dumps({{"RESULT": True, "cores": {cores}, "seconds": round(dt, 2),
                  "rows": n, "rows_per_sec": round(n / dt, 1)}}))
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    work = f"/tmp/menelaus_textscale_{n_docs}_{n_vecs}"
    if not os.path.exists(os.path.join(work, "documents", "_SUCCESS")):
        print(f"generating {n_docs} docs + {n_vecs} vectors ...", flush=True)
        print(run_py(GEN_SNIPPET.format(repo=REPO, n_docs=n_docs, n_vecs=n_vecs,
                                        path=work)).strip().splitlines()[-1])
    n_trials = int(os.environ.get("SCALE_TRIALS", "2"))
    results = {}
    for cores in (lo, hi):
        best = None
        for trial in range(n_trials):
            out = run_py(RUN_SNIPPET.format(repo=REPO, cores=cores, path=work))
            line = [ln for ln in out.splitlines() if '"RESULT"' in ln][-1]
            r = json.loads(line)
            print(f"trial {trial}:", r, flush=True)
            if best is None or r["seconds"] < best["seconds"]:
                best = r
        results[cores] = best

    t_lo, t_hi = results[lo]["seconds"], results[hi]["seconds"]
    eff = t_lo / ((hi / lo) * t_hi)
    print(f"\nefficiency local[{lo}]->local[{hi}]: {eff:.3f} (target >= 0.8)")

    stamp = time.strftime("%Y-%m-%d")
    md = f"""
## Dedup/text pipeline scaling (measured {stamp})

Second scaling witness (r03 VERDICT item 6), covering the
minhash/ngram/embedding half of the engine. Workload per run: exact
dedup, MinHash+LSH near-dup (k=8, 4x2 bands), blocked n-gram Jaccard
(lang x length-bucket prefix-filtered AllPairs), SimHash64, Karp-Rabin
fingerprints, quality features, lang-id, seeded k-means blocks +
blocked embedding-cosine near-dup — over a deterministic synthetic
corpus of {results[lo]['rows']:,} rows ({n_docs:,} docs with ~5%
injected near-duplicates + {n_vecs:,} unit 64-d embeddings with ~3%
near-duplicate directions), generated once and shared by both levels.

| config | wall s | rows/sec |
|---|---|---|
| local[{lo}] (N) | {t_lo} | {results[lo]['rows_per_sec']} |
| local[{hi}] (4N) | {t_hi} | {results[hi]['rows_per_sec']} |

**Throughput scaling efficiency N -> 4N = T(N) / (4 x T(4N)) =
{eff:.3f}** (target >= 0.8); min of SCALE_TRIALS={n_trials} fresh-JVM
trials per level (same host-noise protocol as the audio measurement).
Reproduce: `python tools/scaling_bench_text.py {n_docs} {n_vecs} {lo} {hi}`
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out_path, "a") as f:
        f.write(md)
    print("appended to BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
