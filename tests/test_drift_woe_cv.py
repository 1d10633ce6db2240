"""Round-4 operator additions: PSI drift, WOE encoding, row-level CV
fold assignment, PMI co-occurrence."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_psi_identical_distributions_near_zero(spark):
    """Same distribution on both sides → PSI ≈ 0 (smoothing keeps it
    finite but tiny)."""
    from centimators_spark.operators.drift import psi_drift

    rng = np.random.RandomState(5)
    vals = rng.normal(100, 10, 2000)
    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i long, x double")
    [r] = psi_drift(df, ["x"], F.col("i") % 2 == 0, n_bins=10).collect()
    assert r.feature == "x"
    assert r.n_ref + r.n_cur == 2000
    assert abs(r.psi) < 0.05


def test_psi_shifted_distribution_large(spark):
    """A full location shift lands far above the 0.25 action level."""
    from centimators_spark.operators.drift import psi_drift

    rng = np.random.RandomState(6)
    ref = rng.normal(0, 1, 1000)
    cur = rng.normal(3, 1, 1000)
    rows = [(0, float(v)) for v in ref] + [(1, float(v)) for v in cur]
    df = spark.createDataFrame(rows, "side int, x double")
    [r] = psi_drift(df, ["x"], F.col("side") == 0, n_bins=10).collect()
    assert r.psi > 1.0


def test_psi_nulls_excluded_and_sketch_near_exact(spark):
    """NULL feature values are excluded from bins AND totals (they are
    not drift evidence); the default sketch mode stays within the
    contract band of the exact mode."""
    from centimators_spark.operators.drift import psi_drift

    rng = np.random.RandomState(7)
    vals = rng.normal(0, 1, 1000)
    rows = [(i, float(v)) for i, v in enumerate(vals)]
    # 200 NULLs on the current side would all land in bin 0 without the
    # guard, inflating n_cur and faking a low-tail shift
    rows += [(1000 + i, None) for i in range(200)]
    df = spark.createDataFrame(rows, "i long, x double")
    [r] = psi_drift(df, ["x"], F.col("i") % 2 == 0, exact=True).collect()
    assert r.n_ref + r.n_cur == 1000  # NULLs out of the totals
    assert abs(r.psi) < 0.05
    [rs] = psi_drift(df, ["x"], F.col("i") % 2 == 0, exact=False).collect()
    assert (rs.n_ref, rs.n_cur) == (r.n_ref, r.n_cur)
    assert abs(rs.psi - r.psi) <= 0.01  # the psi_sketch_contract band


def test_woe_known_values(spark):
    """Hand-checked WOE on a 2-category frame."""
    from centimators_spark.operators.encoding import woe_encode

    # cat a: 3 pos, 1 neg; cat b: 1 pos, 3 neg; total 4 pos, 4 neg
    rows = [("a", 1)] * 3 + [("a", 0)] + [("b", 1)] + [("b", 0)] * 3
    df = spark.createDataFrame(rows, "cat string, y int")
    out = {
        r.cat: r.woe
        for r in woe_encode(df, "cat", "y", smoothing=0.5)
        .select("cat", "cat_woe")
        .withColumnRenamed("cat_woe", "woe")
        .distinct()
        .collect()
    }
    s = 0.5
    expect_a = math.log(((3 + s) / (4 + 2 * s)) / ((1 + s) / (4 + 2 * s)))
    expect_b = math.log(((1 + s) / (4 + 2 * s)) / ((3 + s) / (4 + 2 * s)))
    assert out["a"] == pytest.approx(expect_a, abs=1e-6)
    assert out["b"] == pytest.approx(expect_b, abs=1e-6)
    # symmetry of the mirrored counts
    assert out["a"] == pytest.approx(-out["b"], abs=1e-6)


def test_assign_folds_consistent_with_splits(spark):
    """Row-level fold labels partition the rows exactly as the
    time_series_splits validation frames do (exact boundaries both)."""
    from centimators_spark.model_selection import assign_folds

    rows = [(i, float(i)) for i in range(120)]
    df = spark.createDataFrame(rows, "rid long, t double")
    out = assign_folds(df, "t", n_splits=3, exact=True).collect()
    by_fold = {}
    for r in out:
        by_fold.setdefault(r.fold, []).append(r.rid)
    # 4 quantile segments: fold -1 (seed train) + folds 0..2
    assert set(by_fold) == {-1, 0, 1, 2}
    sizes = {k: len(v) for k, v in by_fold.items()}
    assert sum(sizes.values()) == 120
    # boundaries are the 1/4, 2/4, 3/4 quantiles → ~30 rows each
    for k, n in sizes.items():
        assert 28 <= n <= 32, (k, n)
    # ordering: every fold-i row precedes every fold-(i+1) row in time
    assert max(by_fold[-1]) < min(by_fold[0])
    assert max(by_fold[0]) < min(by_fold[1])
    assert max(by_fold[1]) < min(by_fold[2])


def test_assign_folds_embargo_flags(spark):
    """Rows inside the embargo gap before the next boundary are
    flagged; the last fold never is."""
    from centimators_spark.model_selection import assign_folds

    rows = [(i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "rid long, t double")
    out = assign_folds(df, "t", n_splits=3, embargo=5.0, exact=True).collect()
    flagged = {r.rid for r in out if r.embargoed}
    last_fold_rows = {r.rid for r in out if r.fold == 2}
    assert flagged, "embargo must flag rows"
    assert not (flagged & last_fold_rows)
    for r in out:
        if r.embargoed:
            assert r.fold < 2


def test_assign_folds_timestamp_column(spark):
    """TIMESTAMP_NTZ time columns route through the LTZ cast (straight
    NTZ→DOUBLE casts throw in Spark)."""
    from centimators_spark.model_selection import assign_folds

    df = spark.sql(
        "SELECT id, timestamp_ntz'2024-01-01' + make_interval(0,0,0,CAST(id AS INT),0,0,0) AS ts "
        "FROM range(40)"
    )
    out = assign_folds(df, "ts", n_splits=2, exact=True).collect()
    assert {r.fold for r in out} == {-1, 0, 1}


def test_trimmed_stats_known_values(spark):
    """10% trim of 10 values drops exactly the min and max."""
    from centimators_spark.operators.stats import trimmed_stats

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 100.0]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "era int, rid int, x double")
    [r] = trimmed_stats(
        df, "x", era_col="era", trim=0.1, order_cols=["rid"]
    ).collect()
    kept = vals[1:-1]
    assert r.n == 10 and r.n_kept == 8
    assert r.trimmed_mean == pytest.approx(sum(kept) / 8, abs=1e-6)
    assert r.trimmed_min == 2.0 and r.trimmed_max == 9.0


def test_page_hinkley_detects_shift(spark):
    """A mean shift mid-series raises PH past the σ-derived threshold;
    a flat series never flags."""
    from centimators_spark.operators.anomaly import page_hinkley

    rng = np.random.RandomState(3)
    flat = rng.normal(10, 0.5, 200)
    shifted = np.concatenate([rng.normal(10, 0.5, 100), rng.normal(20, 0.5, 100)])
    rows = [("flat", t, float(v)) for t, v in enumerate(flat)] + [
        ("shift", t, float(v)) for t, v in enumerate(shifted)
    ]
    df = spark.createDataFrame(rows, "g string, t int, x double")
    # δ = half the smallest shift of interest (the standard PH tuning:
    # with δ=0 any random walk's cumsum bridge eventually flags)
    out = page_hinkley(
        df, "x", ticker_col="g", order_cols=["t"], delta=2.0,
        lambda_sigmas=5.0,
    ).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r)
    assert not any(r.changepoint for r in by_g["flat"])
    flags = [r.t for r in by_g["shift"] if r.changepoint]
    assert flags and min(flags) >= 100  # fires after the true change
    # ph is nonnegative and ph_int is its exact integer carrier
    for r in out:
        assert r.ph >= 0 and r.ph_int >= 0


def test_page_hinkley_matches_sequential_reference(spark):
    """The window formulation must equal the textbook sequential
    Page–Hinkley recurrence computed row-by-row in pandas."""
    from centimators_spark.operators.anomaly import page_hinkley

    rng = np.random.RandomState(17)
    x = np.round(rng.normal(50, 5, 300), 2)
    rows = [("g", t, float(v)) for t, v in enumerate(x)]
    df = spark.createDataFrame(rows, "g string, t int, x double")
    delta = 1.0
    out = sorted(
        page_hinkley(
            df, "x", ticker_col="g", order_cols=["t"], delta=delta,
            lambda_sigmas=5.0,
        ).collect(),
        key=lambda r: r.t,
    )
    # sequential reference: m_t = sum(x - mu - delta); PH = m - min(m)
    mu = x.mean()
    m = np.cumsum(x - mu - delta)
    ph_ref = m - np.minimum.accumulate(m)
    for r, expect in zip(out, ph_ref):
        assert r.ph == pytest.approx(max(expect, 0.0), abs=2e-5), r.t


def test_trimmed_stats_matches_numpy_reference(spark):
    """Trimmed mean equals the sorted-slice mean for random eras."""
    from centimators_spark.operators.stats import trimmed_stats

    rng = np.random.RandomState(23)
    rows = []
    data = {}
    for era in range(4):
        vals = np.round(rng.uniform(0, 1000, 37 + era * 13), 2)
        data[era] = vals
        rows += [(era, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "era int, rid int, x double")
    out = {
        r.era: r
        for r in trimmed_stats(
            df, "x", era_col="era", trim=0.2, order_cols=["rid"]
        ).collect()
    }
    for era, vals in data.items():
        s = np.sort(vals)
        k = int(np.floor(len(s) * 0.2))
        kept = s[k : len(s) - k]
        assert out[era].n_kept == len(kept)
        assert out[era].trimmed_mean == pytest.approx(kept.mean(), abs=1e-6)
        assert out[era].trimmed_min == pytest.approx(kept.min(), abs=1e-9)
        assert out[era].trimmed_max == pytest.approx(kept.max(), abs=1e-9)


def test_rolling_rank_matches_pandas(spark):
    """Trailing-window rank equals the pandas rolling strict-less
    count + 1."""
    from centimators_spark.operators.time_series import (
        RollingRankTransformer,
    )

    rng = np.random.RandomState(29)
    vals = rng.randint(0, 50, 80).astype(float)
    rows = [("g", t, float(v)) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t int, x double")
    t = RollingRankTransformer(
        windows=[7], feature_names=["x"], ticker_col="g",
        order_cols=["t"], output_mode="append",
    )
    out = {r.t: r.x_rollrank7 for r in t.transform(df).collect()}
    for i in range(len(vals)):
        if i < 6:
            assert out[i] is None
        else:
            w = vals[i - 6 : i + 1]
            assert out[i] == int((w < vals[i]).sum()) + 1, i


def test_calendar_features_known_dates(spark):
    from centimators_spark.functions.calendar import calendar_features

    rows = [
        (1, "2024-02-29"),  # leap Thursday, month end
        (2, "1970-01-01"),  # epoch Thursday
        (3, "2023-12-31"),  # Sunday, month+year end
    ]
    df = spark.createDataFrame(rows, "id int, d string").select(
        "id", F.to_date("d").alias("d")
    )
    out = {r.id: r for r in calendar_features(df, "d", prefix="c_").collect()}
    assert (out[1].c_year, out[1].c_month, out[1].c_day) == (2024, 2, 29)
    assert out[1].c_dow == 4 and out[1].c_is_month_end == 1  # Thursday
    assert out[2].c_dow == 4 and out[2].c_is_weekend == 0
    assert out[3].c_dow == 0 and out[3].c_is_weekend == 1
    assert out[3].c_is_month_end == 1 and out[3].c_quarter == 4


def test_psi_categorical_shift(spark):
    """Identical category mixes → ~0; a shifted mix → large; NULL is a
    category."""
    from centimators_spark.operators.drift import psi_drift_categorical

    rows = [(0, "a")] * 50 + [(0, "b")] * 50 + [(1, "a")] * 90 + [(1, None)] * 10
    df = spark.createDataFrame(rows, "side int, cat string")
    [r] = psi_drift_categorical(df, ["cat"], F.col("side") == 0).collect()
    assert r.n_ref == 100 and r.n_cur == 100 and r.n_categories == 3
    assert r.psi > 0.5  # b vanished, nulls appeared
    same = spark.createDataFrame(
        [(i % 2, c) for i in range(200) for c in ("x", "y")],
        "side int, cat string",
    )
    [r2] = psi_drift_categorical(same, ["cat"], F.col("side") == 0).collect()
    assert abs(r2.psi) < 1e-6


def test_doc_sentences_segmentation(spark):
    from centimators_spark.text.chunking import doc_sentences

    docs = [
        (1, "First one. Second!  Third? trailing bit"),
        (2, "no terminators at all"),
        (3, "..."),  # terminator-only: no sentence CONTENT → no rows
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {}
    for r in doc_sentences(df).collect():
        out.setdefault(r.doc_id, []).append((r.sentence_no, r.sentence))
    assert [s for _, s in sorted(out[1])] == [
        "First one.", "Second!", "Third?", "trailing bit",
    ]
    assert out[2] == [(0, "no terminators at all")]
    assert 3 not in out


def test_quantile_normalize_identity_and_shift(spark):
    """Normalizing a column onto its own distribution reproduces it
    (within interpolation error); a shifted current slice maps back
    onto the reference's range."""
    from centimators_spark.operators.stats import quantile_normalize

    rng = np.random.RandomState(8)
    ref = rng.normal(0, 1, 500)
    cur = rng.normal(5, 1, 500)  # drifted slice
    rows = [(0, i, float(v)) for i, v in enumerate(ref)] + [
        (1, i + 500, float(v)) for i, v in enumerate(cur)
    ]
    df = spark.createDataFrame(rows, "side int, rid long, x double")
    # identity: whole frame onto itself
    out = quantile_normalize(
        df.where(F.col("side") == 0), "x", n_points=200,
        order_cols=["rid"], exact=True,
    ).collect()
    errs = sorted(abs(r.x_qnorm - r.x) for r in out)
    assert errs[len(errs) // 2] < 0.01      # median: essentially exact
    assert errs[-1] < 0.3                   # tails: interpolation error
    # drift correction: map everything onto the side-0 reference —
    # the drifted slice's values land inside the reference range
    out2 = quantile_normalize(
        df, "x", ref_cond=F.col("side") == 0, n_points=100,
        order_cols=["rid"], exact=True,
    )
    cur_mapped = [r.x_qnorm for r in out2.where(F.col("side") == 1).collect()]
    assert max(cur_mapped) <= ref.max() + 1e-9
    assert np.mean(cur_mapped) > 0  # drifted-high slice maps to upper half


def test_quantile_normalize_null_values(spark):
    """NULL values get NULL output and don't shift non-null ranks —
    both engines pin NULLS LAST (their defaults disagree)."""
    import duckdb

    from centimators_spark.operators.stats import (
        quantile_normalize,
        quantile_normalize_oracle_sql,
    )

    rows = [(i, float(i)) for i in range(20)] + [(100 + i, None) for i in range(5)]
    df = spark.createDataFrame(rows, "rid long, x double")
    out = {r.rid: r.x_qnorm for r in quantile_normalize(
        df, "x", n_points=10, order_cols=["rid"], exact=True
    ).collect()}
    assert all(out[100 + i] is None for i in range(5))
    # identity mapping for the non-null values (own distribution)
    assert abs(out[10] - 10.0) < 1.0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW t AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({rid}, {v!r}::DOUBLE)" if v is not None else f"({rid}, NULL::DOUBLE)"
            for rid, v in rows
        )
        + ") AS v(rid, x)"
    )
    oracle = con.execute(
        quantile_normalize_oracle_sql(
            "t", "x", n_points=10, order_sql="rid",
            select_sql="rid", out_name="x_qnorm",
        )
    ).fetchdf()
    odict = {int(r.rid): (None if np.isnan(r.x_qnorm) else r.x_qnorm)
             for r in oracle.itertuples()}
    for rid, v in out.items():
        ov = odict[rid]
        if v is None:
            assert ov is None
        else:
            assert abs(v - ov) < 1e-9, rid


def test_forward_returns_known_values(spark):
    """fwd_k = x_{t+k}/x_t − 1 within ticker; trailing rows null."""
    from centimators_spark.operators.time_series import (
        ForwardReturnTransformer,
    )

    rows = [("a", t, float(100 + 10 * t)) for t in range(5)]
    df = spark.createDataFrame(rows, "g string, t int, x double")
    t = ForwardReturnTransformer(
        horizons=[1, 2], feature_names=["x"], ticker_col="g",
        order_cols=["t"], output_mode="append",
    )
    out = {r.t: r for r in t.transform(df).collect()}
    assert out[0].x_fwd1 == pytest.approx(110 / 100 - 1, abs=1e-6)
    assert out[0].x_fwd2 == pytest.approx(120 / 100 - 1, abs=1e-6)
    assert out[4].x_fwd1 is None and out[3].x_fwd2 is None
    assert t.get_feature_names_out() == ["x_fwd1", "x_fwd2"]
    # log mode
    tl = ForwardReturnTransformer(
        horizons=[1], feature_names=["x"], log=True, ticker_col="g",
        order_cols=["t"], output_mode="append",
    )
    [r0] = [r for r in tl.transform(df).collect() if r.t == 0]
    assert r0.x_fwd1 == pytest.approx(math.log(110 / 100), abs=1e-6)


def test_era_balanced_weights(spark):
    """Each era's total weight equals N/E; mean weight is 1."""
    from centimators_spark.sampling import era_balanced_weights

    rows = [(1, i) for i in range(10)] + [(2, i) for i in range(40)]
    df = spark.createDataFrame(rows, "era int, rid int")
    out = era_balanced_weights(df, "era").collect()
    w_by_era = {}
    for r in out:
        w_by_era.setdefault(r.era, []).append(r.weight)
    assert sum(w_by_era[1]) == pytest.approx(25.0, abs=1e-3)
    assert sum(w_by_era[2]) == pytest.approx(25.0, abs=1e-3)
    assert sum(len(v) for v in w_by_era.values()) == 50
    # NULL era is a first-class era (null-safe join): rows kept, Σw = N
    rows_n = rows + [(None, 100 + i) for i in range(25)]
    dfn = spark.createDataFrame(rows_n, "era int, rid int")
    outn = era_balanced_weights(dfn, "era").collect()
    assert len(outn) == 75
    null_w = [r.weight for r in outn if r.era is None]
    assert sum(null_w) == pytest.approx(25.0, abs=1e-3)  # N/E = 75/3
    assert sum(r.weight for r in outn) == pytest.approx(75.0, abs=1e-2)


def test_fuzzy_self_join_substitution_pairs(spark):
    """Pigeonhole blocking finds every equal-length pair within
    max_dist substitutions, never an over-distance pair; indels are
    out of scope by design (length rides in the key)."""
    from centimators_spark.dedup.fuzzy import fuzzy_self_join

    rows = [
        (1, "alpha"), (2, "alphx"),   # dist 1
        (3, "alpxx"),                 # dist 2 from 1, 1 from 2
        (4, "betas"),                 # unrelated, same length
        (5, "alphaa"),                # longer: indel from 1 — excluded
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    out = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_self_join(df, "name", "id", max_dist=2).collect()
    }
    assert out[(1, 2)] == 1 and out[(2, 3)] == 1 and out[(1, 3)] == 2
    assert (1, 5) not in out           # indel
    assert all(k for k in out if (4,) not in (k,))  # betas pairs nothing
    assert not any(4 in k for k in out)


def test_fuzzy_self_join_matches_bruteforce(spark):
    """Property: over random low-alphabet strings, the blocked join
    returns EXACTLY the brute-force set of equal-length pairs within
    max_dist substitutions."""
    from centimators_spark.dedup.fuzzy import fuzzy_self_join

    rng = np.random.RandomState(31)
    alphabet = list("abc")
    strs = [
        "".join(rng.choice(alphabet, rng.randint(3, 7)))
        for _ in range(60)
    ]
    rows = [(i, s) for i, s in enumerate(strs)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_self_join(df, "name", "id", max_dist=2).collect()
    }

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    expect = {
        (i, j, ham(strs[i], strs[j]))
        for i in range(len(strs))
        for j in range(i + 1, len(strs))
        if len(strs[i]) == len(strs[j]) and ham(strs[i], strs[j]) <= 2
    }
    assert got == expect


def test_calendar_dow_cross_engine_fuzz(spark):
    """The shared epoch-day dow formula agrees with DuckDB over random
    dates 1950-2100 (incl. pre-epoch negatives and leap days)."""
    import duckdb

    from centimators_spark.functions.calendar import (
        calendar_features,
        calendar_features_oracle_sql,
    )

    rng = np.random.RandomState(37)
    days = rng.randint(-7305, 47482, 300)  # 1950-01-02 .. 2100-ish
    df = spark.createDataFrame(
        [(int(d),) for d in days], "ed int"
    ).select("ed", F.date_add(F.lit("1970-01-01").cast("date"), F.col("ed")).alias("d"))
    got = {
        r.ed: (r.c_dow, r.c_is_weekend, r.c_is_month_end, r.c_week)
        for r in calendar_features(df, "d", prefix="c_").collect()
    }
    con = duckdb.connect()
    lst = ", ".join(str(int(d)) for d in sorted(set(int(d) for d in days)))
    con.execute(
        f"CREATE VIEW t AS SELECT ed, DATE '1970-01-01' + ed AS d FROM "
        f"(SELECT unnest([{lst}]) AS ed)"
    )
    oracle = calendar_features_oracle_sql(
        "t", "d", prefix="c_", select_sql="ed"
    )
    for row in con.execute(oracle).fetchall():
        ed, yr, q, mo, day, wk, dow, wkend, mend = row
        g = got[ed]
        assert g == (dow, wkend, mend, wk), (ed, g, row)


def test_pmi_pairs_ranking(spark):
    """PMI ranks the always-together pair above an independent pair."""
    from centimators_spark.text.cooccur import pmi_pairs

    docs = []
    for i in range(20):
        # "alpha beta" always co-occur; "gamma" appears everywhere
        text = "alpha beta gamma" if i < 10 else "gamma delta"
        docs.append((i, text))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pmi_pairs(
        df, vocab_size=10, min_pair_count=2, top_k=10
    ).collect()
    pairs = {(r.token_a, r.token_b): r for r in out}
    ab = pairs[("alpha", "beta")]
    assert ab.n_pair == 10 and ab.n_a == 10 and ab.n_b == 10
    # pmi(alpha,beta) = ln(10·20/(10·10)) = ln 2
    assert ab.pmi == pytest.approx(math.log(2), abs=1e-6)
    # perfectly-coupled pair outranks the gamma pairs
    assert out[0].token_a == "alpha" and out[0].token_b == "beta"
