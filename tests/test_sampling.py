"""Deterministic sampling / splitting / packing properties."""

import pytest
from pyspark.sql import functions as F

from centimators_spark.sampling import (
    deterministic_sample,
    hash_split,
    pack_sequences,
)


@pytest.fixture(scope="module")
def keyed(spark):
    return spark.createDataFrame(
        [(i, f"u{i % 97}") for i in range(5000)], "rid long, user string"
    )


def test_sample_reproducible_and_partition_invariant(spark, keyed):
    a = {r.rid for r in deterministic_sample(keyed, 0.3, "rid").collect()}
    b = {
        r.rid
        for r in deterministic_sample(keyed.repartition(17), 0.3, "rid").collect()
    }
    assert a == b  # layout cannot change the sample
    assert 0.25 < len(a) / 5000 < 0.35  # rate honored
    # different salt -> independent draw
    c = {r.rid for r in deterministic_sample(keyed, 0.3, "rid", salt="x").collect()}
    assert c != a


def test_sample_rate_bounds(keyed):
    with pytest.raises(ValueError, match="rate"):
        deterministic_sample(keyed, 1.5, "rid")


def test_hash_split_proportions_and_consistency(spark, keyed):
    out = hash_split(keyed, "user", {"train": 0.8, "val": 0.1, "test": 0.1})
    frac = {
        r.split: r.n / 5000
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert 0.7 < frac["train"] < 0.9
    # every key maps to exactly one split (no user straddles splits)
    assert (
        out.groupBy("user")
        .agg(F.count_distinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
        == 0
    )
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(keyed, "user", {"a": 0.5, "b": 0.4})


def test_pack_sequences_budget(spark):
    df = spark.createDataFrame(
        [(i, "s", 100) for i in range(20)], "rid long, src string, toks long"
    )
    out = (
        pack_sequences(df, "toks", 512, order_cols=["rid"], by="src")
        .orderBy("rid")
        .collect()
    )
    # exclusive cumsum: rids 0-5 have prior 0..500 -> batch 0; 6-10 -> 1 ...
    assert [r.batch_id for r in out[:7]] == [0, 0, 0, 0, 0, 0, 1]
    # every batch total stays within budget + one document
    totals = {}
    for r in out:
        totals[r.batch_id] = totals.get(r.batch_id, 0) + r.toks
    assert all(t <= 512 + 100 for t in totals.values())


def test_stratified_sample_exact_k_and_invariant(spark):
    from centimators_spark.sampling import stratified_sample

    df = spark.createDataFrame(
        [(f"u{i}", "big" if i < 80 else "small") for i in range(90)],
        "user string, grp string",
    )
    out = stratified_sample(df, "grp", 10, key_col="user").collect()
    by = {}
    for r in out:
        by.setdefault(r.grp, set()).add(r.user)
    assert len(by["big"]) == 10          # exactly k from the large stratum
    assert len(by["small"]) == 10        # the whole small stratum (== k)

    # deterministic under a different partitioning
    out2 = stratified_sample(df.repartition(7), "grp", 10, key_col="user").collect()
    by2 = {}
    for r in out2:
        by2.setdefault(r.grp, set()).add(r.user)
    assert by == by2

    # a different salt draws a different (but still size-k) sample
    out3 = stratified_sample(df, "grp", 10, key_col="user", salt="x").collect()
    big3 = {r.user for r in out3 if r.grp == "big"}
    assert len(big3) == 10 and big3 != by["big"]

    with pytest.raises(ValueError, match="n_per_stratum"):
        stratified_sample(df, "grp", 0, key_col="user")


def test_mixture_sample_semantics(spark):
    """Largest-achievable-total mixture: the binding domain keeps every
    row; proportions approach target parts; selection is deterministic
    and partition-invariant; unlisted domains drop."""
    from centimators_spark.sampling import mixture_sample

    rows = [(i, "a" if i < 600 else ("b" if i < 700 else "junk")) for i in range(800)]
    df = spark.createDataFrame(rows, ["k", "dom"])
    out = mixture_sample(df, "dom", {"a": 2, "b": 1}, key_col="k").toPandas()
    by = out.groupby("dom").size().to_dict()
    # N = min(600*3//2, 100*3//1) = 300; targets a=200, b=100
    assert by.get("b") == 100  # binding domain: threshold = DENOM keeps all
    assert abs(by.get("a") - 200) < 30  # hash-rate sampling is approximate
    assert "junk" not in by
    # partition invariance: identical selection at any layout
    out2 = mixture_sample(
        df.repartition(13), "dom", {"a": 2, "b": 1}, key_col="k"
    ).toPandas()
    assert sorted(out.k) == sorted(out2.k)
    with pytest.raises(ValueError, match="positive"):
        mixture_sample(df, "dom", {"a": 0}, key_col="k")


def test_pack_sequences_budget_validation(spark):
    from centimators_spark.sampling import pack_sequences

    df = spark.createDataFrame([(1, 10)], ["doc_id", "n"])
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "n", 0, order_cols=["doc_id"])


def test_temperature_mixture_flattens(spark):
    """tau=0.5: smallest domain kept 100%; keep RATES decrease with
    domain size; result is partition-invariant."""
    from pyspark.sql import functions as F

    from centimators_spark.sampling import temperature_mixture_sample

    rows = (
        [(i, "big") for i in range(900)]
        + [(i + 1000, "mid") for i in range(400)]
        + [(i + 2000, "small") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "doc_id long, dom string")
    out = temperature_mixture_sample(df, "dom", key_col="doc_id", salt="t")
    kept = out.groupBy("dom").count().collect()
    n = {r.dom: r["count"] for r in kept}
    assert n["small"] == 100  # smallest domain fully kept
    rate = {d: n[d] / tot for d, tot in (("big", 900), ("mid", 400), ("small", 100))}
    assert rate["small"] > rate["mid"] > rate["big"]
    # expected keep rate for big ~ sqrt(100)/sqrt(900) = 1/3
    assert abs(rate["big"] - 1 / 3) < 0.08
    out2 = temperature_mixture_sample(
        df.repartition(7), "dom", key_col="doc_id", salt="t"
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in out2.collect()
    )


def test_temperature_mixture_drops_null_domains(spark):
    from centimators_spark.sampling import temperature_mixture_sample

    rows = [(i, "a") for i in range(50)] + [(100 + i, None) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, dom string")
    out = temperature_mixture_sample(df, "dom", key_col="doc_id").collect()
    assert all(r.dom == "a" for r in out)
    assert len(out) == 50  # single non-null domain keeps everything


def test_weighted_sample_deterministic_and_proportional(spark):
    import duckdb

    from centimators_spark.sampling import sql_weighted_sample, weighted_sample

    rows = [(i, 50.0 if i == 7 else (0.01 if i == 13 else 1.0)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, w double")

    # determinism + DuckDB mirror picks the identical set
    got = sorted(r.id for r in weighted_sample(df, 10, "w", "id", "s1").collect())
    got2 = sorted(r.id for r in weighted_sample(df, 10, "w", "id", "s1").collect())
    assert got == got2
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {w})" for i, w in rows)
        + ") v(id, w)"
    )
    exp = sorted(
        r[0]
        for r in con.execute(
            sql_weighted_sample("t", 10, "w", "id", "s1", select_sql="id")
        ).fetchall()
    )
    assert got == exp

    # inclusion frequency tracks weight across independent salts
    heavy = light = 0
    for s in range(25):
        ids = {r.id for r in weighted_sample(df, 10, "w", "id", f"x{s}").collect()}
        heavy += 7 in ids
        light += 13 in ids
    assert heavy >= 20      # w=50 vs w=1: ~always included
    assert light <= heavy - 10  # w=0.01: rarely

    # zero/null weights excluded; k > n returns all positive-weight rows
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, None), (3, 2.0)], "id long, w double"
    )
    assert [r.id for r in weighted_sample(df2, 10, "w", "id").collect()] == [3]
    import pytest as _pt

    with _pt.raises(ValueError):
        weighted_sample(df, 0, "w", "id")
