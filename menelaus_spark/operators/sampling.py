"""Deterministic sampling for training-data curation: stratified
hash-rank sampling and weighted corpus mixing.

Random sampling at 10^12 rows must be (a) reproducible run-to-run —
a resumed job has to pick the SAME rows — and (b) free of driver-side
shuffling.  Both operators rank rows inside each stratum by a
deterministic md5 of the row key (the repo-wide shared hash family)
and keep the k smallest: a uniform-without-replacement sample that
any engine can replay bit-for-bit, expressed as a ranking window so
Spark compiles it to WindowGroupLimit — per-map-task partial top-k
BEFORE the stratum shuffle, so the shuffle carries O(k) rows per
stratum per task, not the corpus (same plan shape as
topk_orders_per_customer, PLANS.md).

``mix_sample`` is the data-mixing step of an LLM pipeline: given
target weights per source/language, allocate an exact total budget by
largest-remainder apportionment and draw each stratum's quota with
the same hash rank.

No reference counterpart (mitre/menelaus has no sampling); north-star
additions for the training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hash_rank", "stratified_sample", "largest_remainder", "mix_sample",
           "budget_mix_sample"]


def hash_rank(df: DataFrame, strata_col: str, id_col: str, seed: str = "samp"):
    """row_number within stratum, ordered by (md5(seed|id), id) — the
    id tiebreak makes the rank total even on md5 collisions."""
    h = F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return F.row_number().over(w)


def stratified_sample(df: DataFrame, strata_col: str, id_col: str, k: int,
                      seed: str = "samp") -> DataFrame:
    """Up to ``k`` rows per stratum, uniform without replacement,
    deterministic in (seed, id). Adds ``rk`` (1-based draw order)."""
    return (
        df.withColumn("rk", hash_rank(df, strata_col, id_col, seed))
        .filter(F.col("rk") <= k)
    )


def largest_remainder(weights: dict[str, float], total: int) -> dict[str, int]:
    """Exact integer apportionment of ``total`` by weight (Hamilton /
    largest-remainder): quotas floor(w_i/W * total), leftovers to the
    largest fractional remainders, key-ordered tiebreak.  Driver-side
    O(strata) arithmetic."""
    wsum = float(sum(weights.values()))
    exact = {s: weights[s] * total / wsum for s in weights}
    alloc = {s: int(exact[s]) for s in weights}
    left = total - sum(alloc.values())
    by_rem = sorted(weights, key=lambda s: (-(exact[s] - alloc[s]), s))
    for s in by_rem[:left]:
        alloc[s] += 1
    return alloc


def mix_sample(df: DataFrame, strata_col: str, id_col: str,
               weights: dict[str, float], total: int,
               seed: str = "samp") -> DataFrame:
    """Weighted corpus mix: draw ``alloc[s]`` rows from each stratum
    ``s`` (largest-remainder allocation of ``total``), hash-ranked.
    Strata absent from ``weights`` are dropped; a stratum smaller than
    its quota contributes everything it has (the shortfall is visible
    to the caller by counting).  Single window pass + literal CASE on
    the quota — no per-stratum jobs."""
    alloc = largest_remainder(weights, total)
    quota = F.lit(0)
    for s, n in alloc.items():
        quota = F.when(F.col(strata_col) == s, F.lit(n)).otherwise(quota)
    return (
        df.filter(F.col(strata_col).isin(list(alloc)))
        .withColumn("rk", hash_rank(df, strata_col, id_col, seed))
        .filter(F.col("rk") <= quota)
    )


def budget_mix_sample(df: DataFrame, strata_col: str, id_col: str, size_col: str,
                      budgets: dict[str, int], seed: str = "samp") -> DataFrame:
    """Budget-based corpus mix: draw rows from each stratum in hash-rank
    order until the stratum's cumulative ``size_col`` (tokens, chars,
    bytes) fills its budget — the mixing contract trainers actually
    specify ("3B tokens of code, 1B of math"), where document-COUNT
    quotas misallocate whenever size distributions differ by stratum.

    A row is kept while the cumulative size BEFORE it is under the
    budget, so each stratum either reaches its budget (overshoot
    bounded by one document) or is exhausted.  Adds ``rk`` (draw
    order) and ``cum_size`` (cumulative size through the row).  One
    keyed sort; rank and running sum share it.  Unlike the count-quota
    path this filter can't be a WindowGroupLimit (the cut depends on
    the running sum, not the rank) — when a per-document size floor is
    known, pre-filter with ``stratified_sample(k=budget//floor + 1)``
    to cap the shuffle before the budget pass."""
    strata = sorted(budgets)
    h = F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    budget = F.lit(0)
    for s in strata:
        budget = F.when(F.col(strata_col) == s, F.lit(int(budgets[s]))).otherwise(budget)
    cum = F.sum(F.col(size_col)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        df.filter(F.col(strata_col).isin(strata))
        .withColumn("rk", F.row_number().over(w))
        .withColumn("cum_size", cum)
        .filter((F.col("cum_size") - F.col(size_col)) < budget)
    )
