"""Connected-components cluster resolution vs a pure-Python
union-find twin, plus the shapes that break naive approaches:
chains (diameter), merged stars, and singleton preservation."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from menelaus_spark.operators.clusters import (
    cluster_members,
    connected_components,
    resolve_representatives,
)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for x in list(parent):
        r = find(x)
        out[x] = min(out.get(x, r), r)
    # canonical label = min id in component
    comp = {}
    for x, r in out.items():
        comp.setdefault(r, []).append(x)
    labels = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            labels[x] = m
    return labels


def _cc_spark(spark, pairs):
    df = spark.createDataFrame(
        [(a, b) for a, b in pairs] or [("x", "x")], "id_a string, id_b string"
    )
    if not pairs:
        df = df.filter("id_a <> id_a")
    return {
        r.id: r.cluster_id for r in connected_components(df).collect()
    }


def test_chain_transitivity(spark):
    # a 20-node path: diameter 19, so min-label propagation would need
    # 19 rounds; the alternating algorithm's round budget must not bind
    pairs = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(19)]
    got = _cc_spark(spark, pairs)
    assert got == {f"n{i:02d}": "n00" for i in range(20)}


def test_two_components_and_merge(spark):
    pairs = [("a", "b"), ("c", "d"), ("b", "c"), ("x", "y")]
    got = _cc_spark(spark, pairs)
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_empty_pairs(spark):
    assert _cc_spark(spark, []) == {}


def test_deterministic(spark):
    pairs = [("a", "b"), ("b", "c"), ("p", "q"), ("q", "a")]
    assert _cc_spark(spark, pairs) == _cc_spark(spark, pairs)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)).map(
            lambda t: (f"v{t[0]:02d}", f"v{t[1]:02d}")
        ),
        max_size=40,
    )
)
def test_matches_union_find_property(pairs):
    # session-scoped fixture not available inside @given; reuse the
    # cached session (tests run after the fixture created it)
    from menelaus_spark.session import get_spark

    spark = get_spark(cores=4, shuffle_partitions=4)
    real = [(a, b) for a, b in pairs if a != b]
    assert _cc_spark(spark, real) == _union_find(real)


def test_cluster_members_and_resolution(spark):
    pairs = [("a", "b"), ("b", "c"), ("x", "y")]
    df = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("x",), ("y",), ("solo",)], "doc_id string"
    )
    cc = connected_components(
        spark.createDataFrame(pairs, "id_a string, id_b string")
    )
    members = {r.id: r for r in cluster_members(cc).collect()}
    assert members["a"].cluster_size == 3 and members["a"].is_representative
    assert members["c"].cluster_id == "a" and not members["c"].is_representative
    assert members["x"].cluster_size == 2

    kept = {r.doc_id for r in resolve_representatives(df, cc, "doc_id").collect()}
    assert kept == {"a", "x", "solo"}


def test_max_rounds_guard(spark):
    df = spark.createDataFrame([("a", "b"), ("b", "c")], "id_a string, id_b string")
    # driver_cap=0 forces the distributed star loop even on a tiny graph
    with pytest.raises(RuntimeError):
        connected_components(df, max_rounds=0, driver_cap=0)


def test_driver_fast_path_matches_distributed(spark):
    """The under-cap union-find fast path and the distributed star loop
    must return the identical (id, cluster_id) set — chains, merged
    stars, string and long ids."""
    cases = [
        ([("a", "b"), ("b", "c"), ("x", "y")], "id_a string, id_b string"),
        ([(5, 4), (4, 3), (3, 2), (10, 11), (11, 2)], "id_a long, id_b long"),
    ]
    for pairs, schema in cases:
        df = spark.createDataFrame(pairs, schema)
        fast = sorted(map(tuple, connected_components(df).collect()))
        slow = sorted(map(tuple, connected_components(df, driver_cap=0).collect()))
        assert fast == slow
