"""kdq-tree parity tests against the reference's own expectations
(/root/reference/tests/menelaus/partitioners/test_kdqtree_partitioner.py
and /root/reference/tests/menelaus/data_drift/test_kdq_tree.py)."""

import numpy as np
import pandas as pd
import pytest

from menelaus_spark.checks.kdqtree import (
    KdqTreeBatch,
    KDQTreePartitioner,
    bootstrap_critical_kld,
    distributed_leaf_counts,
)
from menelaus_spark.functions.distances import dasu_smooth, kl_divergence

SIMPLE = np.array([[1, 2], [2, 3], [3, 4], [4, 5], [5, 6], [6, 7]], dtype=float)


def test_build_simple_leaf_counts():
    # test_kdqtree_partitioner.py:40-51: expected [2, 1, 2, 1]
    kp = KDQTreePartitioner(count_ubound=2, cutpoint_proportion_lbound=0.1)
    kp.build(SIMPLE)
    assert kp.leaf_counts_build().tolist() == [2, 1, 2, 1]
    root_count = kp.build_counts[0]
    assert root_count == 6


def test_build_complex_leaf_counts():
    # test_kdqtree_partitioner.py:55-62: expected [3, 3, 1]
    imbalanced = np.array(
        [[1, 2, 3], [1, 2, 3], [1, 2, 3], [4, 5, 6], [4, 5, 6], [4, 5, 6], [7, 8, 9]],
        dtype=float,
    )
    kp = KDQTreePartitioner(count_ubound=2, cutpoint_proportion_lbound=0.2)
    kp.build(imbalanced)
    assert kp.leaf_counts_build().tolist() == [3, 3, 1]


def test_single_leaf_when_small():
    kp = KDQTreePartitioner(count_ubound=200)
    kp.build(SIMPLE)
    assert kp.n_leaves == 1
    assert kp.leaf_counts_build().tolist() == [6]


def test_fill_matches_build():
    kp = KDQTreePartitioner(count_ubound=2, cutpoint_proportion_lbound=0.1)
    kp.build(SIMPLE)
    # filling the build data back reproduces the build counts
    assert kp.fill_counts(SIMPLE).tolist() == [2, 1, 2, 1]
    # filling a subset routes by the same predicates
    assert kp.fill_counts(SIMPLE[:2]).sum() == 2


def test_kl_distance_formula():
    # test_kdqtree_partitioner.py:133-159 re-derives the smoothed KL
    kp = KDQTreePartitioner(count_ubound=2, cutpoint_proportion_lbound=0.1)
    kp.build(SIMPLE)
    c1 = kp.leaf_counts_build()
    c2 = np.array([1, 1, 2, 2])
    expected = kl_divergence(dasu_smooth(c1), dasu_smooth(c2))
    assert kp.kl_distance(c1, c2) == expected
    assert kp.kl_distance(c1, c1) == 0.0


def test_distributed_fill_matches_local(spark):
    np.random.seed(123)
    data = np.random.sample((400, 3))
    kp = KDQTreePartitioner(count_ubound=20, cutpoint_proportion_lbound=2e-10)
    kp.build(data)
    local = kp.fill_counts(data)
    df = spark.createDataFrame(pd.DataFrame(data, columns=["f0", "f1", "f2"])).repartition(4)
    distributed = distributed_leaf_counts(df, ["f0", "f1", "f2"], kp)
    assert distributed.tolist() == local.tolist()
    assert local.sum() == 400


def test_bootstrap_critical_deterministic():
    counts = np.array([50, 30, 15, 5])
    a = bootstrap_critical_kld(counts, 100, 0.01, 50, seed=7)
    b = bootstrap_critical_kld(counts, 100, 0.01, 50, seed=7)
    assert a == b
    c = bootstrap_critical_kld(counts, 100, 0.01, 50, seed=8)
    assert a != c  # different seed, different draws
    assert a > 0


def test_kdq_batch_drift_cycle(spark):
    # test_kdq_tree.py:39-53 fixture: 10x3 sample, count_ubound=1,
    # bootstrap=10; identical batch -> no drift; 50x data -> drift;
    # next update resets using the drifted batch as reference.
    np.random.seed(123)
    in_np = np.random.sample((10, 3))
    cols = ["f0", "f1", "f2"]
    in_df = spark.createDataFrame(pd.DataFrame(in_np, columns=cols))
    drift_df = spark.createDataFrame(pd.DataFrame(50 * in_np, columns=cols))

    det = KdqTreeBatch(count_ubound=1, bootstrap_samples=10)
    det.set_reference(in_df)
    assert det.update(in_df) is None
    assert det.update(drift_df) == "drift"
    assert det.total_batches == 2
    # reset-on-next-update: drifted batch becomes reference
    assert det.update(drift_df) is None
    assert det.batches_since_reset == 1

    frame = det.tree_frame()
    assert {"name", "idx", "parent_idx", "cell_count", "depth", "count_diff", "kss"} <= set(
        frame.columns
    )
    assert frame.iloc[0]["cell_count"] == 10  # root holds full reference


def test_kdq_batch_first_update_builds_reference(spark):
    np.random.seed(123)
    in_np = np.random.sample((10, 3))
    cols = ["f0", "f1", "f2"]
    df = spark.createDataFrame(pd.DataFrame(in_np, columns=cols))
    det = KdqTreeBatch(count_ubound=1, bootstrap_samples=10)
    assert det.update(df) is None
    assert det.total_batches == 1
    assert det._tree is not None


def test_kdq_schema_freeze(spark):
    np.random.seed(123)
    pdf = pd.DataFrame(np.random.sample((10, 3)), columns=["f0", "f1", "f2"])
    det = KdqTreeBatch(count_ubound=1, bootstrap_samples=10)
    det.set_reference(spark.createDataFrame(pdf))
    with pytest.raises(ValueError):
        det.update(spark.createDataFrame(pdf.rename(columns={"f2": "zz"})))


def test_kdq_state_roundtrip(spark):
    np.random.seed(123)
    in_np = np.random.sample((10, 3))
    cols = ["f0", "f1", "f2"]
    in_df = spark.createDataFrame(pd.DataFrame(in_np, columns=cols))
    drift_df = spark.createDataFrame(pd.DataFrame(50 * in_np, columns=cols))
    det = KdqTreeBatch(count_ubound=1, bootstrap_samples=10)
    det.set_reference(in_df)
    det.update(in_df)
    state = det.get_state()
    det2 = KdqTreeBatch(count_ubound=1, bootstrap_samples=10)
    det2.set_state(state, ref_data=in_df)
    assert det2.update(drift_df) == "drift"
    assert det2.test_dist == pytest.approx(det.update(drift_df) and det.test_dist)


def test_leaf_expr_matches_numpy_kernel(spark):
    """The compiled JVM CASE expression (leaf_assign_col) is
    bit-identical to the numpy descent, including NaN rows (numpy's
    `> mid` is False for NaN -> left; Spark orders NaN above every
    double, guarded by ~isnan) and NULL rows (left on both paths)."""
    from pyspark.sql import functions as F

    from menelaus_spark.checks.kdqtree import (
        LEAF_EXPR_MAX_NODES,
        distributed_leaf_counts_by_group,
        leaf_assign_col,
    )

    np.random.seed(7)
    data = np.random.sample((500, 3)) * 10 - 5
    data[::97, 1] = np.nan
    kp = KDQTreePartitioner(count_ubound=10, cutpoint_proportion_lbound=2e-10)
    kp.build(np.random.sample((400, 3)))
    assert len(kp.axis_arr) <= LEAF_EXPR_MAX_NODES
    local = kp.assign_leaves(data)
    pdf = pd.DataFrame(data, columns=["f0", "f1", "f2"])
    df = spark.createDataFrame(pdf).repartition(3)
    got = (
        df.select(leaf_assign_col(kp, ["f0", "f1", "f2"]).alias("leaf"),
                  *[F.col(c) for c in ("f0", "f1", "f2")])
        .toPandas().sort_values(["f0", "f1", "f2"]).reset_index(drop=True)
    )
    order = pdf.sort_values(["f0", "f1", "f2"]).index
    assert got["leaf"].to_numpy().tolist() == local[order].tolist()
    # grouped counts: expression path vs forced pandas-UDF path agree
    gdf = df.withColumn("g", (F.col("f0") > 0).cast("int"))
    expr_counts = distributed_leaf_counts_by_group(gdf, "g", ["f0", "f1", "f2"], kp, [0, 1])
    import menelaus_spark.checks.kdqtree as kmod
    cap = kmod.LEAF_EXPR_MAX_NODES
    kmod.LEAF_EXPR_MAX_NODES = 0  # force the UDF fallback
    try:
        udf_counts = distributed_leaf_counts_by_group(gdf, "g", ["f0", "f1", "f2"], kp, [0, 1])
    finally:
        kmod.LEAF_EXPR_MAX_NODES = cap
    for g in (0, 1):
        assert expr_counts[g].tolist() == udf_counts[g].tolist()
