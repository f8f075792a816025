"""KMV / count-min sketch operators: estimator accuracy, exact-branch,
overlap, and property-based invariants over random multisets.

Cross-engine bit-parity is covered by the contract rows
(events_kmv_* / events_cms_user_counts) in the oracle sweep; here we
check the estimates are actually *good* against ground truth.
"""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from orientdb_neo4j_importer_plugin_spark.operators import sketches


def _ids(spark, group_rows):
    """group_rows: dict group -> iterable of int ids (with duplicates)."""
    data = [(g, i) for g, ids in group_rows.items() for i in ids]
    return spark.createDataFrame(data, "g string, v long")


def test_exact_below_k(spark):
    df = _ids(spark, {"a": list(range(10)) * 3})
    out = sketches.kmv_distinct_by(
        df, "g", F.col("v").cast("string"), k=64
    ).collect()
    assert len(out) == 1
    assert out[0]["distinct_est"] == 10  # sketch unsaturated -> exact
    assert out[0]["n_kept"] == 10


def test_estimator_accuracy(spark):
    true_n = 5000
    df = _ids(spark, {"a": list(range(true_n)), "b": list(range(200))})
    out = {
        r["g"]: r["distinct_est"]
        for r in sketches.kmv_distinct_by(
            df, "g", F.col("v").cast("string"), k=256
        ).collect()
    }
    # k=256 -> relative std ~1/sqrt(254) ~ 6.3%; assert within 4 sigma
    assert abs(out["a"] - true_n) / true_n < 0.25
    assert out["b"] == 200  # below k -> exact


def test_overlap_estimates(spark):
    # |A|=2000, |B|=2000, |A∩B|=1000 -> union 3000, jaccard 1/3
    a = list(range(0, 2000))
    b = list(range(1000, 3000))
    df = _ids(spark, {"a": a, "b": b})
    row = sketches.kmv_overlap(
        df, "g", F.col("v").cast("string"), "a", "b", k=256
    ).collect()[0]
    assert abs(row["union_est"] - 3000) / 3000 < 0.25
    assert abs(row["jaccard_bp"] - 3333) < 1200
    assert abs(row["inter_est"] - 1000) / 1000 < 0.45
    # disjoint sets -> zero intersection, exactly
    df2 = _ids(spark, {"a": list(range(100)), "b": list(range(1000, 1100))})
    row2 = sketches.kmv_overlap(
        df2, "g", F.col("v").cast("string"), "a", "b", k=64
    ).collect()[0]
    assert row2["inter_est"] == 0
    assert row2["jaccard_bp"] == 0


def test_cms_overestimates_within_bound(spark):
    # heavy key 'hot' x1000, 200 light keys x10 -> N=3000
    df = _ids(spark, {"g": [0] * 1000 + list(range(1, 201)) * 10})
    probes = spark.createDataFrame([(0,), (1,), (9999,)], "v long")
    out = {
        r["v"]: r["cms_est"]
        for r in sketches.cms_estimate(
            df,
            F.col("v").cast("string"),
            probes,
            F.col("v").cast("string"),
        ).collect()
    }
    n_total = 3000
    assert out[0] >= 1000  # CMS never undercounts
    assert out[0] - 1000 <= n_total // 8  # min over 4 rows stays tight
    assert out[1] >= 10 and out[1] - 10 <= n_total // 8
    assert out[9999] <= n_total // 8  # absent key: collision noise only


def test_cms_cells_are_mergeable(spark):
    """Partial sketches add cellwise — the property that makes the build a
    partial aggregate and lets independent feeds merge their sketches."""
    d1 = _ids(spark, {"g": list(range(100)) * 3})
    d2 = _ids(spark, {"g": list(range(50, 150)) * 2})
    both = d1.unionByName(d2)
    v = F.col("v").cast("string")

    def cells(df):
        return {
            (r["r"], r["c"]): r["cnt"]
            for r in sketches.cms_build(df, v).collect()
        }

    c1, c2, cb = cells(d1), cells(d2), cells(both)
    merged = {k: c1.get(k, 0) + c2.get(k, 0) for k in set(c1) | set(c2)}
    assert merged == cb


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=120
    )
)
def test_cms_never_undercounts_property(spark, values):
    """For EVERY value in a random multiset, the CMS estimate is >= its
    true frequency (the structural guarantee), and the estimate of any
    single value never exceeds the multiset size."""
    truth = Counter(values)
    df = _ids(spark, {"g": values})
    probes = spark.createDataFrame([(v,) for v in sorted(truth)], "v long")
    out = {
        r["v"]: r["cms_est"]
        for r in sketches.cms_estimate(
            df,
            F.col("v").cast("string"),
            probes,
            F.col("v").cast("string"),
            depth=4,
            width=16,
        ).collect()
    }
    for v, n in truth.items():
        assert out[v] >= n, f"undercounted {v}: {out[v]} < {n}"
        assert out[v] <= len(values)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.integers(min_value=0, max_value=200), min_size=1, max_size=100
    )
)
def test_kmv_exact_below_k_property(spark, values):
    """Whenever the true distinct count is below k, KMV is EXACT — the
    sketch is the whole set, no estimation involved."""
    df = _ids(spark, {"g": values})
    row = sketches.kmv_distinct_by(
        df, "g", F.col("v").cast("string"), k=256
    ).collect()[0]
    assert row["distinct_est"] == len(set(values))


def test_sketch_is_merge_invariant(spark):
    """The sketch of a union equals the sketch computed over pre-unioned
    data — KMV is mergeable, so partial sketches compose (the property that
    makes it a partial-aggregate shape at scale)."""
    df1 = _ids(spark, {"a": list(range(0, 800))})
    df2 = _ids(spark, {"a": list(range(400, 1200))})
    both = df1.unionByName(df2)
    direct = sketches.kmv_distinct_by(
        both, "g", F.col("v").cast("string"), k=64
    ).collect()[0]
    # merge = k smallest of the two sketches' union
    s1 = sketches._sketch(df1, "g", F.col("v").cast("string"), 64)
    s2 = sketches._sketch(df2, "g", F.col("v").cast("string"), 64)
    merged = (
        s1.select("g", "h")
        .unionByName(s2.select("g", "h"))
        .distinct()
        .orderBy("h")
        .limit(64)
    )
    agg = merged.agg(F.count("*").alias("n"), F.max("h").alias("hk")).collect()[0]
    assert agg["n"] == direct["n_kept"]
    assert agg["hk"] == direct["kth_hash"]
