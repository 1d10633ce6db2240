"""Interval (range) join and salted skew join semantics.

Both operators' contract queries (interval_band_join, salted_join) are
hash-verified against DuckDB; these tests pin the semantics the
contract can't show: left-mode null extension, overlap multiplicity,
boundary inclusivity, equality with the plain join, determinism, and
the plan property that the bucketed join is a hash join (not
BroadcastNestedLoopJoin).
"""

import pyspark.sql.functions as F
import pytest

from centimators_spark.operators import interval_join, salted_join


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(
        [(1, 0.0), (2, 4.9), (3, 5.0), (4, 12.0), (5, 99.0)],
        "id long, x double",
    )


@pytest.fixture(scope="module")
def intervals(spark):
    # [0,5) and [4,10) overlap on [4,5); [10,13) isolated
    return spark.createDataFrame(
        [(0.0, 5.0, "a"), (4.0, 10.0, "b"), (10.0, 13.0, "c")],
        "lo double, hi double, tag string",
    )


def test_interval_join_inner_overlaps_and_bounds(points, intervals):
    out = interval_join(
        points, intervals, point_col="x", lo_col="lo", hi_col="hi",
        bucket_width=5.0,
    )
    got = {(r.id, r.tag) for r in out.collect()}
    # x=0.0: in [0,5) only. x=4.9: in BOTH [0,5) and [4,10).
    # x=5.0: hi-exclusive for 'a', in 'b'. x=12.0: 'c'. x=99: none.
    assert got == {(1, "a"), (2, "a"), (2, "b"), (3, "b"), (4, "c")}


def test_interval_join_left_keeps_unmatched(points, intervals):
    out = interval_join(
        points, intervals, point_col="x", lo_col="lo", hi_col="hi",
        bucket_width=5.0, how="left",
    )
    rows = out.collect()
    # 5 matches + 1 null-extended unmatched point
    assert len(rows) == 6
    unmatched = [r for r in rows if r.tag is None]
    assert [r.id for r in unmatched] == [5]


def test_interval_join_keys_and_validation(spark, points, intervals):
    with pytest.raises(ValueError):
        interval_join(points, intervals, point_col="x", lo_col="lo",
                      hi_col="hi", bucket_width=0.0)
    with pytest.raises(ValueError):
        interval_join(points, intervals, point_col="x", lo_col="lo",
                      hi_col="hi", bucket_width=1.0, how="full")
    # equi key: same interval table per key, matches respect the key
    p = spark.createDataFrame(
        [(1, "k1", 4.5), (2, "k2", 4.5)], "id long, k string, x double"
    )
    iv = spark.createDataFrame(
        [("k1", 0.0, 5.0, "a")], "k string, lo double, hi double, tag string"
    )
    out = interval_join(
        p, iv, point_col="x", lo_col="lo", hi_col="hi",
        bucket_width=5.0, keys=["k"],
    )
    assert {(r.id, r.tag) for r in out.collect()} == {(1, "a")}


def test_interval_join_is_hash_join_not_bnlj(points, intervals):
    out = interval_join(
        points, intervals, point_col="x", lo_col="lo", hi_col="hi",
        bucket_width=5.0, broadcast_intervals=True,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_salted_join_matches_plain_join(spark):
    left = spark.range(0, 2000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("payload")
    )
    right = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "k long, v string"
    )
    plain = left.join(right, "k").orderBy("payload").collect()
    salted = salted_join(left, right, "k", n_salts=5).orderBy("payload").collect()
    assert [tuple(r) for r in salted] == [tuple(r) for r in plain]
    # left mode keeps unmatched keys (7..9 never occur in left — all
    # left keys match here, so make one miss)
    left2 = left.withColumn("k", F.col("k") + 100)
    lj = salted_join(left2, right, "k", n_salts=3, how="left").collect()
    assert len(lj) == 2000 and all(r.v is None for r in lj)


def test_salted_join_deterministic_across_partitionings(spark):
    left = spark.range(0, 500).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("payload")
    )
    right = spark.createDataFrame([(0, "a"), (1, "b")], "k long, v string")
    a = sorted(tuple(r) for r in salted_join(left, right, "k").collect())
    b = sorted(
        tuple(r)
        for r in salted_join(left.repartition(13), right, "k").collect()
    )
    assert a == b


def test_scd2_join_picks_valid_version(spark):
    """Each fact row gets the dimension version whose validity interval
    contains its timestamp; facts outside every version get nulls."""
    from centimators_spark.operators.rangejoin import scd2_join

    facts = spark.createDataFrame(
        [(1, "u1", 5.0), (2, "u1", 15.0), (3, "u2", 5.0), (4, "u1", 99.0)],
        "fid long, k string, t double",
    )
    dim = spark.createDataFrame(
        [("u1", 0.0, 10.0, "v1"), ("u1", 10.0, 20.0, "v2"),
         ("u2", 0.0, 50.0, "w1")],
        "k string, valid_from double, valid_to double, ver string",
    )
    out = {r.fid: r.ver for r in scd2_join(
        facts, dim, key="k", ts_col="t", bucket_width=10.0
    ).collect()}
    assert out == {1: "v1", 2: "v2", 3: "w1", 4: None}


def test_interval_join_null_bound_raises_and_scd2_open_end(spark):
    """A NULL interval bound must fail loudly (silent drop is the SCD2
    current-version trap); scd2_join's open_end coalesces it instead."""
    from centimators_spark.operators.rangejoin import scd2_join

    facts = spark.createDataFrame(
        [(1, "u1", 25.0)], "fid long, k string, t double"
    )
    dim = spark.createDataFrame(
        [("u1", 0.0, 10.0, "v1"), ("u1", 10.0, None, "v2")],
        "k string, valid_from double, valid_to double, ver string",
    )
    with pytest.raises(Exception, match="open-ended"):
        scd2_join(facts, dim, key="k", ts_col="t", bucket_width=10.0).collect()
    out = scd2_join(
        facts, dim, key="k", ts_col="t", bucket_width=10.0, open_end=100.0
    ).collect()
    assert out[0].ver == "v2"


def test_salted_join_null_keys_match_plain_join(spark):
    """NULL join keys never match in a plain equi join; the salted
    variant must agree (and the content-derived salt must not error on
    null columns)."""
    left = spark.createDataFrame(
        [(1, 10.0), (None, 20.0), (2, None)], "k long, v double"
    )
    right = spark.createDataFrame([(1, "a"), (None, "x")], "k long, r string")
    plain = sorted(
        (tuple(r) for r in left.join(right, "k").collect())
    )
    salted = sorted(
        (tuple(r) for r in salted_join(left, right, "k", n_salts=4).collect())
    )
    assert salted == plain
    lj = salted_join(left, right, "k", n_salts=4, how="left").collect()
    assert len(lj) == 3  # null-keyed left rows survive with null right


def test_interval_join_validate_bounds_off(points, intervals):
    """validate_bounds=False builds lazily (no eager probe) and still
    produces the same matches on clean data."""
    out = interval_join(
        points, intervals, point_col="x", lo_col="lo", hi_col="hi",
        bucket_width=5.0, validate_bounds=False,
    )
    got = {(r.id, r.tag) for r in out.collect()}
    assert got == {(1, "a"), (2, "a"), (2, "b"), (3, "b"), (4, "c")}


def test_asof_forward_and_nearest_match_pandas(spark):
    """Directional as-of joins vs pandas merge_asof on a randomized
    panel (the reference differential for all three directions)."""
    import numpy as np
    import pandas as pd

    from centimators_spark.operators.asof import (
        asof_join,
        asof_join_forward,
        asof_join_nearest,
    )

    rng = np.random.RandomState(31)
    left = pd.DataFrame(
        {
            "k": rng.choice(["a", "b"], 60),
            "ts": rng.choice(np.arange(0, 1000, 7), 60).astype("int64"),
            "lv": np.arange(60).astype("float64"),
        }
    ).drop_duplicates(["k", "ts"])
    right = pd.DataFrame(
        {
            "k": rng.choice(["a", "b"], 40),
            "ts": rng.choice(np.arange(0, 1000, 11), 40).astype("int64"),
            "rv": np.arange(40).astype("float64") * 10,
        }
    ).drop_duplicates(["k", "ts"])
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)

    for direction, fn in [
        ("backward", asof_join),
        ("forward", asof_join_forward),
        ("nearest", asof_join_nearest),
    ]:
        got = (
            fn(sl, sr, on="ts", by="k", value_cols=["rv"])
            .toPandas()
            .sort_values(["k", "ts"])
            .reset_index(drop=True)
        )
        exp = pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("ts"),
            on="ts",
            by="k",
            direction=direction,
        ).sort_values(["k", "ts"]).reset_index(drop=True)
        for g, e in zip(got.rv_asof, exp.rv):
            assert (pd.isna(g) and pd.isna(e)) or g == e, (direction, g, e)


def test_bloom_semi_join_identical_to_plain_and_prunes(spark):
    """The blocked Bloom has no false negatives (semi-join result
    identical to the plain one); the prune alone passes every true key
    plus only a small false-positive tail."""
    from centimators_spark.operators.bloomjoin import (
        bloom_build,
        bloom_prune,
        bloom_semi_join,
    )

    # fact keys 0..1999; dim keys = multiples of 20 (5% selectivity)
    fact = spark.range(0, 2000).withColumnRenamed("id", "k")
    dim = spark.range(0, 2000, 20).withColumnRenamed("id", "k")

    got = sorted(r.k for r in bloom_semi_join(fact, dim, "k").collect())
    exp = sorted(r.k for r in fact.join(dim, "k", "leftsemi").collect())
    assert got == exp

    words, n_words = bloom_build(dim, "k")
    pruned = {r.k for r in bloom_prune(fact, words, n_words, "k").collect()}
    true_keys = set(range(0, 2000, 20))
    assert true_keys <= pruned  # no false negatives
    # fpp at 10 bits/key, k=4 blocked is a few percent — far under 20%
    fp = len(pruned - true_keys) / (2000 - len(true_keys))
    assert fp < 0.2, fp


def test_bloom_semi_join_string_keys_and_dim_key_rename(spark):
    from centimators_spark.operators.bloomjoin import bloom_semi_join

    fact = spark.createDataFrame(
        [(f"u{i}",) for i in range(300)], "uid string"
    )
    dim = spark.createDataFrame(
        [(f"u{i}",) for i in range(0, 300, 7)], "user_id string"
    )
    got = sorted(
        r.uid
        for r in bloom_semi_join(
            fact, dim, "uid", dim_key="user_id"
        ).collect()
    )
    assert got == sorted(f"u{i}" for i in range(0, 300, 7))


def test_bloom_semi_join_mixed_integral_key_types(spark):
    """ADVICE r5 (high): xxhash64 hashes IntegerType and LongType
    values differently, so an int fact key probing a long-built filter
    matched NOTHING. Keys now normalize to a canonical hash type; a
    genuinely incompatible pairing fails loudly."""
    import pytest

    from centimators_spark.operators.bloomjoin import bloom_semi_join

    fact = spark.createDataFrame([(i,) for i in range(100)], "k int")
    dim = spark.createDataFrame([(i,) for i in range(0, 100, 10)], "k long")
    got = sorted(r.k for r in bloom_semi_join(fact, dim, "k").collect())
    assert got == list(range(0, 100, 10))
    # reversed direction too (long fact, int dim)
    got2 = sorted(r.k for r in bloom_semi_join(dim, fact, "k").collect())
    assert got2 == list(range(0, 100, 10))
    # float/double also normalize together
    ffact = spark.createDataFrame([(float(i),) for i in range(50)], "k float")
    fdim = spark.createDataFrame(
        [(float(i),) for i in range(0, 50, 5)], "k double"
    )
    got3 = sorted(r.k for r in bloom_semi_join(ffact, fdim, "k").collect())
    assert got3 == [float(i) for i in range(0, 50, 5)]
    # string vs int cannot be silently reconciled
    sdim = spark.createDataFrame([("1",)], "k string")
    with pytest.raises(TypeError, match="type mismatch"):
        bloom_semi_join(fact, sdim, "k")


# ------------------------------------------------------------ plan_join

def test_plan_join_decision_branches(spark):
    """The advisor (planner.plan_join, r12 verdict item 4) must pick
    each strategy from the measured numbers: broadcast for a small
    dim, salted for a hot fact key, plain otherwise — and every
    strategy must return the identical join multiset."""
    from centimators_spark.planner import plan_join, plan_join_decision

    fact_uniform = spark.createDataFrame(
        [(i % 10, i) for i in range(200)], "k long, payload long"
    )
    fact_skewed = spark.createDataFrame(
        [(1 if i % 4 else i % 10, i) for i in range(200)],
        "k long, payload long",
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(10)], "k long, attr string"
    )

    # small dim -> broadcast, regardless of skew
    d = plan_join_decision(fact_skewed, dim, "k")
    assert d["strategy"] == "broadcast" and d["dim_rows"] == 10

    # broadcast unavailable + uniform key -> plain
    d = plan_join_decision(fact_uniform, dim, "k", broadcast_row_limit=0)
    assert d["strategy"] == "plain"
    assert d["top1_share_milli"] < 200

    # broadcast unavailable + hot key -> salted (key 1 owns ~77.5%)
    d = plan_join_decision(fact_skewed, dim, "k", broadcast_row_limit=0)
    assert d["strategy"] == "salted"
    assert d["top1_share_milli"] >= 700 and d["top_key"] == "1"

    # all three strategies return the identical multiset
    expected = sorted(
        tuple(r)
        for r in fact_skewed.join(dim, "k").select(
            "k", "payload", "attr"
        ).collect()
    )
    for kwargs in (
        {},  # broadcast
        {"broadcast_row_limit": 0, "skew_share_milli": 2000},  # plain
        {"broadcast_row_limit": 0},  # salted
    ):
        out, dec = plan_join(fact_skewed, dim, "k", **kwargs)
        got = sorted(
            tuple(r)
            for r in out.select("k", "payload", "attr").collect()
        )
        assert got == expected, dec["strategy"]

    # the salt replication fires ONLY under the salted strategy
    out_salted, _ = plan_join(fact_skewed, dim, "k",
                              broadcast_row_limit=0)
    out_plain, _ = plan_join(fact_uniform, dim, "k",
                             broadcast_row_limit=0)
    p_salted = out_salted._jdf.queryExecution().executedPlan().toString()
    p_plain = out_plain._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in p_salted or "explode" in p_salted
    assert "explode" not in p_plain

    # estimate_size attaches the AMS pair with est >= exact
    d = plan_join_decision(
        fact_uniform, dim, "k", estimate_size=True
    )
    assert d["est_pairs"] >= d["exact_pairs"] == 200


def test_plan_join_all_null_fact_key(spark):
    """An all-NULL fact key has no audit row — the advisor must fall
    back to plain (nothing matches anyway), not crash."""
    from centimators_spark.planner import plan_join

    fact = spark.createDataFrame(
        [(None, 1), (None, 2)], "k string, payload long"
    )
    dim = spark.createDataFrame([("a", "x")], "k string, attr string")
    out, dec = plan_join(fact, dim, "k", broadcast_row_limit=0)
    assert dec["strategy"] == "plain" and out.count() == 0


def test_plan_join_rejects_unsupported_how_up_front(spark):
    """An unsupported join type must fail immediately, not
    data-dependently when the skew measurement happens to pick the
    salted branch (review finding, round 13)."""
    from centimators_spark.planner import plan_join

    fact = spark.createDataFrame([(1, 1)], "k long, p long")
    dim = spark.createDataFrame([(1, "a")], "k long, attr string")
    with pytest.raises(ValueError, match="inner"):
        plan_join(fact, dim, "k", how="outer")
