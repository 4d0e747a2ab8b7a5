"""Tests for the mergeable sketches (HLL, count-min), deterministic
sampling, and sessionization operators."""

import datetime

import pytest
from pyspark.sql import functions as F

from menelaus_spark.operators import sampling, sketches
from menelaus_spark.operators.relational import session_stats, sessionize


@pytest.fixture(scope="module")
def ids(spark):
    # 5000 rows over 1000 distinct keys, deterministic
    return spark.range(5000).select((F.col("id") % 1000).alias("k")).persist()


# ----------------------------------------------------------------- HLL

def test_hll_estimate_accuracy(spark, ids):
    est, v_zero, s_int = sketches.hll_estimate(sketches.hll_registers(ids, "k", p=8), p=8)
    # p=8 -> standard error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(est - 1000) / 1000 < 0.20
    assert s_int > 0 and 0 <= v_zero <= 256


def test_hll_estimate_small_range_correction(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    est, v_zero, _ = sketches.hll_estimate(sketches.hll_registers(df, "k", p=8), p=8)
    # linear counting regime: near-exact for tiny cardinalities
    assert v_zero >= 246
    assert abs(est - 10) < 2


def test_hll_merge_is_exact(spark, ids):
    full = sketches.hll_registers(ids, "k", p=8)
    parts = ids.withColumn("g", (F.col("k") % 3).cast("int"))
    by = sketches.hll_registers_by(parts, "g", "k", p=8)
    merged = sketches.hll_merge(
        *[by.filter(F.col("g") == i).select("reg", "rho") for i in range(3)]
    )
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0
    # merged estimate == global estimate, bit for bit
    assert sketches.hll_estimate(merged, p=8) == sketches.hll_estimate(full, p=8)


def test_hll_estimate_df_matches_scalar(spark, ids):
    reg = sketches.hll_registers(ids, "k", p=8)
    row = sketches.hll_estimate_df(reg, p=8).collect()[0]
    est, v_zero, s_int = sketches.hll_estimate(reg, p=8)
    assert row["v_zero"] == v_zero and row["s_int"] == s_int
    assert row["est_distinct"] == round(est, 4)


def test_hll_ignores_nulls_and_is_deterministic(spark):
    a = spark.createDataFrame([(1,), (2,), (None,), (2,)], "k int")
    r1 = sorted(map(tuple, sketches.hll_registers(a, "k", p=6).collect()))
    r2 = sorted(map(tuple, sketches.hll_registers(a, "k", p=6).collect()))
    assert r1 == r2
    assert len(r1) <= 2  # only two distinct non-null keys


# ----------------------------------------------------------- count-min

def test_cms_overestimates_never_under(spark, ids):
    grid = sketches.cms_counters(ids, "k", d=4, w=64)
    probes = ids.distinct().limit(50)
    est = sketches.cms_lookup(grid, probes, "k", d=4, w=64)
    truth = ids.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    j = est.join(truth, "k").collect()
    assert len(j) == 50
    assert all(r["est_count"] >= r["n"] for r in j)


def test_cms_absent_key_reads_zero_or_collision(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "k int")
    grid = sketches.cms_counters(df, "k", d=4, w=4096)
    probes = spark.createDataFrame([(999,)], "k int")
    [r] = sketches.cms_lookup(grid, probes, "k", d=4, w=4096).collect()
    # w >> n: overwhelmingly likely every lane has an untouched bucket
    assert r["est_count"] == 0


def test_cms_merges_by_sum(spark, ids):
    full = sketches.cms_counters(ids, "k", d=2, w=32)
    halves = spark.range(5000).select((F.col("id") % 1000).alias("k"),
                                      (F.col("id") < 2500).alias("h"))
    g1 = sketches.cms_counters(halves.filter("h"), "k", d=2, w=32)
    g2 = sketches.cms_counters(halves.filter("not h"), "k", d=2, w=32)
    merged = (
        g1.unionByName(g2)
        .groupBy("lane", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


# ------------------------------------------------------------ sampling

def test_stratified_sample_k_per_stratum(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    s = sampling.stratified_sample(ev, "event_type", "event_id", 7)
    cnt = {r["event_type"]: r["n"] for r in
           s.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    strata = {r["event_type"]: r["n"] for r in
              ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    for t, n in strata.items():
        assert cnt[t] == min(7, n)
    # deterministic: same rows both runs
    s2 = sampling.stratified_sample(ev, "event_type", "event_id", 7)
    assert s.select("event_id").exceptAll(s2.select("event_id")).count() == 0
    # different seed -> (almost surely) different draw
    s3 = sampling.stratified_sample(ev, "event_type", "event_id", 7, seed="other")
    assert s.select("event_id").exceptAll(s3.select("event_id")).count() > 0


def test_largest_remainder_allocates_exact_total():
    alloc = sampling.largest_remainder({"a": 1.0, "b": 1.0, "c": 1.0}, 10)
    assert sum(alloc.values()) == 10 and sorted(alloc.values()) == [3, 3, 4]
    alloc = sampling.largest_remainder({"en": 0.5, "es": 0.25, "de": 0.15, "fr": 0.1}, 40)
    assert alloc == {"en": 20, "es": 10, "de": 6, "fr": 4}


def test_mix_sample_quota_and_shortfall(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    weights = {"en": 0.6, "de": 0.4}
    m = sampling.mix_sample(docs, "lang", "doc_id", weights, 20)
    got = {r["lang"]: r["n"] for r in
           m.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    avail = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    alloc = sampling.largest_remainder(weights, 20)
    for lang, q in alloc.items():
        assert got.get(lang, 0) == min(q, avail.get(lang, 0))
    # other languages dropped entirely
    assert set(got) <= set(weights)


# --------------------------------------------------------- sessionize

def _ts(minute):
    return datetime.datetime(2026, 1, 1, 0, minute)


def test_sessionize_known_boundaries(spark):
    rows = [
        (1, _ts(0), 10), (1, _ts(5), 11), (1, _ts(40), 12),  # gap 35 min -> new
        (2, _ts(0), 20),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    out = sessionize(df, "user_id", "ts", gap_ms=30 * 60_000, order_cols=["event_id"])
    seqs = {(r["user_id"], r["event_id"]): r["session_seq"] for r in out.collect()}
    assert seqs == {(1, 10): 1, (1, 11): 1, (1, 12): 2, (2, 20): 1}
    stats = {(r["user_id"], r["session_seq"]): (r["n_events"], r["duration_ms"])
             for r in session_stats(out, "user_id", "ts").collect()}
    assert stats[(1, 1)] == (2, 5 * 60_000)
    assert stats[(1, 2)] == (1, 0)
    assert stats[(2, 1)] == (1, 0)


def test_sessionize_gap_boundary_is_inclusive(spark):
    # gap exactly == threshold stays in the same session (<= contract)
    rows = [(1, _ts(0), 1), (1, _ts(30), 2), (1, _ts(31), 3)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    out = sessionize(df, "user_id", "ts", gap_ms=30 * 60_000, order_cols=["event_id"])
    seqs = [r["session_seq"] for r in out.orderBy("event_id").collect()]
    assert seqs == [1, 1, 1]
    out2 = sessionize(df, "user_id", "ts", gap_ms=30 * 60_000 - 1, order_cols=["event_id"])
    assert [r["session_seq"] for r in out2.orderBy("event_id").collect()] == [1, 2, 2]


def test_sessionize_tie_ordering_deterministic(spark):
    rows = [(1, _ts(0), 2), (1, _ts(0), 1), (1, _ts(50), 3)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    out = sessionize(df, "user_id", "ts", gap_ms=60_000, order_cols=["event_id"])
    got = {r["event_id"]: (r["session_seq"], r["session_id"]) for r in out.collect()}
    assert got[1] == (1, "1#1") and got[2] == (1, "1#1") and got[3] == (2, "1#2")


def test_budget_mix_sample_fills_budget(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budgets = {"en": 3000, "de": 1200}
    m = sampling.budget_mix_sample(docs, "lang", "doc_id", "n_chars", budgets)
    rows = m.select("lang", "doc_id", "n_chars", "rk", "cum_size").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    avail = {r["lang"]: (r["n"], r["tot"]) for r in
             docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"),
                                      F.sum("n_chars").alias("tot")).collect()}
    assert set(by_lang) <= set(budgets)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["rk"])
        total = sum(r["n_chars"] for r in rs)
        # budget reached (overshoot < last doc) or stratum exhausted
        if len(rs) < avail[lang][0]:
            assert total >= budgets[lang]
            assert total - rs[-1]["n_chars"] < budgets[lang]
        else:
            assert total == avail[lang][1]
        # cum_size is the running sum in draw order
        c = 0
        for r in rs:
            c += r["n_chars"]
            assert r["cum_size"] == c


def test_budget_mix_sample_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sampling.budget_mix_sample(docs, "lang", "doc_id", "n_chars", {"en": 2000})
    b = sampling.budget_mix_sample(docs, "lang", "doc_id", "n_chars", {"en": 2000})
    assert a.select("doc_id").exceptAll(b.select("doc_id")).count() == 0


def test_hll_estimate_by_groups(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    reg = sketches.hll_registers_by(ev, "event_type", "user_id", p=10)
    est = {r["event_type"]: r["est_distinct"]
           for r in sketches.hll_estimate_by_df(reg, "event_type", p=10).collect()}
    truth = {r["event_type"]: r["d"] for r in
             ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("d")).collect()}
    assert set(est) == set(truth)
    for t, d in truth.items():
        assert abs(est[t] - d) / max(d, 1) < 0.15  # p=10 -> sigma ~3.3%
