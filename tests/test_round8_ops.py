"""Hand-computed semantics for the round-8 staged operators: linear
panel interpolation, 2-D skyline, one-pass correlation matrix."""

import math

import pyspark.sql.functions as F

from centimators_spark.operators.resample import resample_panel
from centimators_spark.operators.skyline import skyline_2d
from centimators_spark.operators.stats import corr_matrix


def _interp(spark, rows, **kw):
    df = spark.createDataFrame(rows, "tkr string, d date, v double")
    out = resample_panel(
        df, ticker_col="tkr", date_col="d", value_cols=["v"],
        fill="linear", **kw
    )
    return {
        (r.tkr, str(r.d)): (r.v, r.is_observed) for r in out.collect()
    }


def test_linear_interp_hand_path(spark):
    import datetime as dt

    d = dt.date
    rows = [
        ("a", d(2024, 1, 1), 10.0),
        ("a", d(2024, 1, 4), 4.0),   # gap days 2,3: 10 + (-6)*t/3
        ("a", d(2024, 1, 5), 7.0),
    ]
    got = _interp(spark, rows)
    assert got[("a", "2024-01-01")] == (10.0, 1)
    assert got[("a", "2024-01-02")] == (8.0, 0)
    assert got[("a", "2024-01-03")] == (6.0, 0)
    assert got[("a", "2024-01-04")] == (4.0, 1)
    assert got[("a", "2024-01-05")] == (7.0, 1)
    assert len(got) == 5


def test_linear_interp_observed_rows_untouched_exactly(spark):
    import datetime as dt

    d = dt.date
    # irrational-ish value: observed rows must pass through bitwise,
    # not survive a 0/0 or a multiply-divide round trip
    rows = [("a", d(2024, 1, 1), math.pi), ("a", d(2024, 1, 2), -math.e)]
    got = _interp(spark, rows)
    assert got[("a", "2024-01-01")] == (math.pi, 1)
    assert got[("a", "2024-01-02")] == (-math.e, 1)


def test_linear_interp_leading_trailing_gaps_null(spark):
    import datetime as dt

    d = dt.date
    # null observations at the edges -> spine rows before the first /
    # after the last OBSERVED value have no bracket -> stay null
    df = spark.createDataFrame(
        [
            ("a", d(2024, 1, 1), None),
            ("a", d(2024, 1, 2), 2.0),
            ("a", d(2024, 1, 4), 6.0),
            ("a", d(2024, 1, 5), None),
        ],
        "tkr string, d date, v double",
    )
    out = resample_panel(
        df, ticker_col="tkr", date_col="d", value_cols=["v"], fill="linear"
    )
    got = {str(r.d): r.v for r in out.collect()}
    assert got["2024-01-01"] is None
    assert got["2024-01-02"] == 2.0
    assert got["2024-01-03"] == 4.0
    assert got["2024-01-04"] == 6.0
    assert got["2024-01-05"] is None


def test_linear_interp_null_date_rows_inert(spark):
    """NULL-date observations are fully inert (r13 in-place gap-run
    rewrite + sweep fix): they must neither appear in the output nor
    feed the running brackets of other rows — the exact semantics of
    the old spine-join form, where a NULL date never matched the spine
    and never entered min/max."""
    import datetime as dt

    d = dt.date
    rows = [
        ("a", None, 99.0),  # must not become anyone's bracket
        ("a", d(2024, 1, 1), 10.0),
        ("a", d(2024, 1, 3), 4.0),
    ]
    got = _interp(spark, rows)
    assert got == {
        ("a", "2024-01-01"): (10.0, 1),
        ("a", "2024-01-02"): (7.0, 0),  # (10+4)/2 — 99.0 never leaks
        ("a", "2024-01-03"): (4.0, 1),
    }


def test_skyline_hand_points(spark):
    # group g: (1,5) front; (2,3) front; (2,4) dominated by (2,3);
    # (3,3) dominated by (2,3) [tie y, strict x]; (4,1) front;
    # (4,1) duplicate -> BOTH kept; (5,2) dominated by (4,1)
    rows = [
        ("g", 1, 1, 5), ("g", 2, 2, 3), ("g", 3, 2, 4), ("g", 4, 3, 3),
        ("g", 5, 4, 1), ("g", 6, 4, 1), ("g", 7, 5, 2),
        # second group: everything incomparable stays
        ("h", 8, 1, 9), ("h", 9, 9, 1),
    ]
    df = spark.createDataFrame(rows, "g string, id int, x long, y long")
    got = sorted((r.g, r.id) for r in skyline_2d(df, "g", "x", "y").collect())
    assert got == [("g", 1), ("g", 2), ("g", 5), ("g", 6), ("h", 8), ("h", 9)]


def test_skyline_partition_invariant(spark):
    rows = [("g", i, (i * 7) % 23, (i * 13) % 19) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, id int, x long, y long")
    a = sorted(r.id for r in skyline_2d(df.repartition(11), "g", "x", "y").collect())
    b = sorted(r.id for r in skyline_2d(df.repartition(3), "g", "x", "y").collect())
    assert a == b and len(a) >= 1
    # brute-force oracle
    pts = {i: ((i * 7) % 23, (i * 13) % 19) for i in range(300)}
    front = [
        i
        for i, (x, y) in pts.items()
        if not any(
            (qx <= x and qy <= y and (qx < x or qy < y))
            for qx, qy in pts.values()
        )
    ]
    assert a == sorted(front)


def test_corr_matrix_hand_values(spark):
    # y = 2x exactly -> corr 1; z anti-correlated with x -> corr -1;
    # w constant -> zero variance -> null
    rows = [(x, 2 * x, 10 - x, 7) for x in (1, 2, 3, 4, 5)]
    df = spark.createDataFrame(rows, "x long, y long, z long, w long")
    out = corr_matrix(
        df,
        {
            "x": F.col("x"),
            "y": F.col("y"),
            "z": F.col("z"),
            "w": F.col("w"),
        },
    )
    got = {(r.feat_a, r.feat_b): r.corr for r in out.collect()}
    assert len(got) == 6
    assert got[("x", "y")] == 1.0
    assert got[("x", "z")] == -1.0
    assert got[("y", "z")] == -1.0
    assert got[("x", "w")] is None and got[("y", "w")] is None
    assert all(r.n == 5 for r in out.collect())


def test_corr_matrix_matches_numpy(spark):
    import numpy as np

    rng = [(i, (i * 37) % 101, (i * i) % 89) for i in range(200)]
    df = spark.createDataFrame(rng, "a long, b long, c long")
    out = corr_matrix(
        df, {"a": F.col("a"), "b": F.col("b"), "c": F.col("c")}
    )
    got = {(r.feat_a, r.feat_b): r.corr for r in out.collect()}
    arr = np.array(rng, dtype=float)
    ref = np.corrcoef(arr.T)
    assert abs(got[("a", "b")] - ref[0, 1]) < 1e-12
    assert abs(got[("a", "c")] - ref[0, 2]) < 1e-12
    assert abs(got[("b", "c")] - ref[1, 2]) < 1e-12


def test_seasonal_decompose_hand_values(spark):
    from centimators_spark.operators.decompose import seasonal_decompose

    # window 3, two periods alternating; v = base + bump on odd t:
    # series t=1..6 -> v = [14, 10, 14, 10, 14, 10], period = t % 2
    rows = [("g", t, 10.0 + 4.0 * (t % 2)) for t in range(1, 7)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = seasonal_decompose(
        df,
        group_col="g",
        order_col="t",
        value_col="v",
        period=(F.col("t") % 2),
        window=3,
    ).collect()
    got = {r.t: (r.trend, r.seasonal, r.residual) for r in out}
    # full frames at t=2..5: t2:(14,10,14)=38, t3:(10,14,10)=34,
    # t4:(14,10,14)=38, t5:(10,14,10)=34
    # num = 3v - S: t2: 30-38=-8; t3: 42-34=8; t4: 30-38=-8; t5: 42-34=8
    # period 0 (t even): nums -8,-8 -> seasonal = -16/6; period 1: 8,8 -> 16/6
    assert got[1][0] is None and got[1][2] is None
    assert got[6][0] is None
    assert got[2][0] == 38 / 3 and got[3][0] == 34 / 3
    assert abs(got[2][1] - (-16 / 6)) < 1e-12
    assert abs(got[3][1] - (16 / 6)) < 1e-12
    # residual = num/3 - seasonal: t2: -8/3 + 16/6 = 0
    assert abs(got[2][2]) < 1e-12 and abs(got[3][2]) < 1e-12


def test_seasonal_decompose_matches_statsmodels_shape(spark):
    # no statsmodels in container: check the invariant instead —
    # v == trend + seasonal + residual on full-frame rows (additive
    # identity holds only when the period means absorb the detrended
    # value exactly; with one row per (g, period) it must)
    from centimators_spark.operators.decompose import seasonal_decompose

    rows = [("g", t, float((t * 13) % 29)) for t in range(1, 30)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = seasonal_decompose(
        df,
        group_col="g",
        order_col="t",
        value_col="v",
        period=F.col("t"),  # one row per period -> residual 0
        window=5,
    ).collect()
    for r in out:
        if r.trend is not None:
            assert abs(r.v - (r.trend + r.seasonal + r.residual)) < 1e-9
            assert abs(r.residual) < 1e-12


def test_seasonal_decompose_rejects_even_window(spark):
    import pytest as _pytest

    from centimators_spark.operators.decompose import seasonal_decompose

    df = spark.createDataFrame([("g", 1, 1.0)], "g string, t int, v double")
    with _pytest.raises(ValueError):
        seasonal_decompose(
            df, group_col="g", order_col="t", value_col="v",
            period=F.col("t"), window=12,
        )


def test_xicor_identity_closed_form(spark):
    from centimators_spark.ml.metrics import xicor

    # y = x, no ties: xi = 1 - 3/(n+1) exactly (Chatterjee 2021 eq. 1)
    rows = [("g", i, i, i) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "g string, k int, x long, y long")
    out = xicor(df, "g", F.col("x"), F.col("y"), ["k"]).collect()[0]
    assert out.n == 5 and out.xi == 1 - 3 / 6


def test_xicor_nonmonotone_function_detected(spark):
    from centimators_spark.ml.metrics import xicor

    # y = (x - 10)^2 — Pearson/Spearman ~0, xi must be high
    rows = [("g", i, i, (i - 10) ** 2) for i in range(21)]
    df = spark.createDataFrame(rows, "g string, k int, x long, y long")
    out = xicor(df, "g", F.col("x"), F.col("y"), ["k"]).collect()[0]
    assert out.xi > 0.5


def test_xicor_constant_y_null(spark):
    from centimators_spark.ml.metrics import xicor

    rows = [("g", i, i, 7) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, k int, x long, y long")
    assert xicor(df, "g", F.col("x"), F.col("y"), ["k"]).collect()[0].xi is None


def test_xicor_matches_direct_counting_with_ties(spark):
    from centimators_spark.ml.metrics import xicor

    # deterministic pseudo-random with heavy x AND y ties
    rows = [("g", i, (i * 7) % 5, (i * 11) % 4) for i in range(60)]
    df = spark.createDataFrame(rows, "g string, k int, x long, y long")
    got = xicor(df, "g", F.col("x"), F.col("y"), ["k"]).collect()[0]
    # O(n^2) reference: sort by (x, k); r_i = #{y_j <= y_i}, l_i = #{y_j >= y_i}
    pts = sorted(((x, k, y) for _, k, x, y in rows))
    ys = [y for _, _, y in pts]
    n = len(ys)
    r = [sum(1 for yj in ys if yj <= yi) for yi in ys]
    l = [sum(1 for yj in ys if yj >= yi) for yi in ys]
    num = n * sum(abs(r[i + 1] - r[i]) for i in range(n - 1))
    den = 2 * sum(li * (n - li) for li in l)
    assert abs(got.xi - (1 - num / den)) < 1e-12
    assert got.n == n


def test_xicor_partition_invariant(spark):
    from centimators_spark.ml.metrics import xicor

    rows = [("g", i, (i * 13) % 17, (i * 5) % 23) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, k int, x long, y long")
    a = xicor(df.repartition(7), "g", F.col("x"), F.col("y"), ["k"]).collect()[0]
    b = xicor(df.repartition(2), "g", F.col("x"), F.col("y"), ["k"]).collect()[0]
    assert a.xi == b.xi


# ---------------------------------------------------------------- kcore


def _kcore_map(spark, edges, k, rounds=8):
    from centimators_spark.graphs import kcore

    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.v: r.core_deg for r in kcore(df, k, rounds=rounds).collect()}


def test_kcore_triangle_with_tail(spark):
    # triangle {1,2,3} + tail 3-4-5: k=2 peels 5 then 4 (cascade),
    # keeping the triangle with degree 2 each
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    assert _kcore_map(spark, edges, k=2) == {1: 2, 2: 2, 3: 2}


def test_kcore_chain_peels_to_empty(spark):
    # a path needs MULTIPLE rounds to vanish at k=2: ends peel first,
    # exposing new ends each round
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    assert _kcore_map(spark, edges, k=2) == {}


def test_kcore_complete_graph_thresholds(spark):
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    assert _kcore_map(spark, k4, k=3) == {1: 3, 2: 3, 3: 3, 4: 3}
    assert _kcore_map(spark, k4, k=4) == {}


def test_kcore_converged_rounds_invariant(spark):
    # once the peel converges, extra rounds change nothing
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (6, 4)]
    assert _kcore_map(spark, edges, k=2, rounds=3) == _kcore_map(
        spark, edges, k=2, rounds=8
    )


def test_kcore_early_exit_matches_full_budget(spark):
    """r13 optimization pin: the converged-peel early exit must return
    the exact fixed-budget result; a 50-round budget on a 2-round
    cascade also proves the loop breaks instead of burning 48 no-op
    rounds (it would time out a whole test session otherwise)."""
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    assert _kcore_map(spark, edges, k=2, rounds=50) == _kcore_map(
        spark, edges, k=2, rounds=8
    )


def test_kcore_dedupes_and_canonicalizes(spark):
    # duplicate, reversed, and self-loop edges collapse to one simple
    # undirected edge set before peeling
    edges = [(1, 2), (2, 1), (1, 2), (1, 1), (2, 3), (1, 3)]
    assert _kcore_map(spark, edges, k=2) == {1: 2, 2: 2, 3: 2}


# ----------------------------------------------------------- naive bayes


def test_naive_bayes_hand_model(spark):
    import math

    from centimators_spark.ml.naive_bayes import naive_bayes_classify

    rows = [
        (0, "spam spam ham", "s"),
        (1, "spam spam", "s"),
        (2, "ham ham eggs", "h"),
        (3, "ham eggs", "h"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r.doc_id: (r.pred_label, r.n_tokens, r.score)
        for r in naive_bayes_classify(df, "lang").collect()
    }

    # hand model: vocab {spam, ham, eggs}; V=3, alpha=1
    # class s: n_tok=5, counts spam=4 ham=1; class h: n_tok=5,
    # counts ham=3 eggs=2; priors 2/4 each
    def lp(c, n):
        return round(math.log((c + 1.0) / (n + 1.0 * (3 + 1.0))), 6)

    def score(tokens, counts, n):
        u = round(math.log(2 / 4) * 1e6)
        for t in tokens:
            u += round(lp(counts.get(t, 0), n) * 1e6)
        return round(u / 1e6, 6)

    cs = {"spam": 4, "ham": 1}
    ch = {"ham": 3, "eggs": 2}
    for doc_id, toks in [
        (0, ["spam", "spam", "ham"]),
        (1, ["spam", "spam"]),
        (2, ["ham", "ham", "eggs"]),
        (3, ["ham", "eggs"]),
    ]:
        s_s, s_h = score(toks, cs, 5), score(toks, ch, 5)
        want = ("h", s_h) if s_h > s_s else ("s", s_s)
        if s_h == s_s:  # tie -> label asc
            want = ("h", s_h)
        assert out[doc_id] == (want[0], len(toks), want[1]), doc_id


def test_naive_bayes_empty_doc_gets_prior_argmax(spark):
    from centimators_spark.ml.naive_bayes import naive_bayes_classify

    rows = [
        (0, "x x", "a"),
        (1, "y", "b"),
        (2, "y z", "b"),
        (3, "", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: (r.pred_label, r.n_tokens) for r in
           naive_bayes_classify(df, "lang").collect()}
    # doc 3 has no tokens: argmax prior = 'b' (3 of 4 docs)
    assert out[3] == ("b", 0)
    assert len(out) == 4


# ------------------------------------------------------------- backtest


def _bt(spark, rows, **kw):
    from centimators_spark.ml.backtest import long_short_backtest

    df = spark.createDataFrame(
        rows, "era long, tkr long, sig double, ret_u long"
    )
    out = long_short_backtest(df, "era", "tkr", "sig", "ret_u", **kw)
    return {r.era: r.asDict() for r in out.collect()}


def test_backtest_hand_quintiles(spark):
    # 10 tickers, signal = -ticker so ticker 0 ranks first; returns =
    # ticker micro-units. n_bins=5 -> top bin {0,1}, bottom bin {8,9}
    rows = [(1, t, float(-t), t * 1_000_000) for t in range(10)]
    got = _bt(spark, rows, n_bins=5)
    e = got[1]
    assert e["n"] == 10
    assert e["long_ret"] == 0.5       # mean(0,1)
    assert e["short_ret"] == 8.5      # mean(8,9)
    assert e["spread"] == -8.0
    assert e["cum_spread"] == -8.0


def test_backtest_cumulative_and_tie_break(spark):
    # two eras; era 2 has tied signals -> ticker asc breaks ties, so
    # top bin = lowest tickers
    rows = [(1, t, float(-t), t * 1_000_000) for t in range(5)] + [
        (2, t, 0.0, (5 - t) * 1_000_000) for t in range(5)
    ]
    got = _bt(spark, rows, n_bins=5)
    assert got[1]["spread"] == 0.0 - 4.0
    # era 2: top bin = ticker 0 (ret 5.0), bottom = ticker 4 (ret 1.0)
    assert got[2]["long_ret"] == 5.0
    assert got[2]["short_ret"] == 1.0
    assert got[2]["spread"] == 4.0
    assert got[2]["cum_spread"] == -4.0 + 4.0


def test_backtest_small_era_dropped_and_nulls_excluded(spark):
    from centimators_spark.ml.backtest import long_short_backtest

    df = spark.createDataFrame(
        [(1, t, float(-t), t * 1_000_000) for t in range(5)]
        + [(2, 0, -0.0, 0), (2, 1, -1.0, 1_000_000)]  # era 2: only 2 rows
        + [(1, 99, None, 0), (1, 98, 0.0, None)],     # excluded rows
        "era long, tkr long, sig double, ret_u long",
    )
    got = {
        r.era: r.asDict()
        for r in long_short_backtest(
            df, "era", "tkr", "sig", "ret_u", n_bins=5
        ).collect()
    }
    assert set(got) == {1}          # era 2 dropped (n=2 < 5)
    assert got[1]["n"] == 5          # null rows not counted


def test_backtest_half_up_integer_mean(spark):
    # n=4, n_bins=2: top half = tickers {0,1} with rets (1u, 2u) ->
    # mean 1.5u -> HALF-UP -> 2u = 2e-6 (a pure-integer rounding the
    # float round() would hit boundary-divergence on)
    rows = [(1, 0, 5.0, 1), (1, 1, 4.0, 2),
            (1, 2, 2.0, 7), (1, 3, 1.0, 8)]
    got = _bt(spark, rows, n_bins=2)
    e = got[1]
    assert e["long_ret"] == 2e-06
    assert e["short_ret"] == 8e-06   # mean(7,8)=7.5u -> half-up 8u
    assert e["spread"] == -6e-06


# -------------------------------------------------------- kmeans / knn


def test_kmeans_lloyd_hand_protocol(spark):
    from centimators_spark.similarity.kmeans import kmeans_lloyd_exact

    # two tight groups on a 2-D line; seeds = vectors 0 and 1 (both in
    # group A) -> first update pulls centroid 1 toward group B only if
    # assignment splits; with these points, centroid 0 keeps {0, 2}
    # and centroid 1 wins {1, 3, 4, 5} after round 1
    rows = [
        (0, [0.0, 0.0]),
        (1, [1.0, 1.0]),
        (2, [0.1, 0.0]),
        (3, [1.1, 1.0]),
        (4, [0.9, 1.0]),
        (5, [1.0, 0.9]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.cluster: r.asDict() for r in
           kmeans_lloyd_exact(df, k=2, iters=2).collect()}
    assert set(out) == {0, 1}
    assert out[0]["n"] == 2 and out[1]["n"] == 4
    # cluster 0 centroid = half-up mean of (0,0) and (0.1,0) micro-units
    assert out[0]["c0_u"] == 50000 and out[0]["c1_u"] == 0
    assert out[1]["c0_u"] == 1000000  # mean(1.0,1.1,0.9,1.0)=1.0
    assert out[0]["inertia_u"] > 0 or out[0]["inertia_u"] == 0


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    from centimators_spark.similarity.kmeans import kmeans_lloyd_exact

    # seeds 0 and 1 identical -> every point ties to cluster 0 (lower
    # id wins), cluster 1 goes empty and must keep its seed centroid
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.5, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.cluster: r.asDict() for r in
           kmeans_lloyd_exact(df, k=2, iters=1).collect()}
    assert out[1]["n"] == 0 and out[1]["inertia_u"] == 0
    assert out[1]["c0_u"] == 1000000  # untouched seed
    assert out[0]["n"] == 3

    # ...and because the seed survives, round 2 lets the empty cluster
    # RECAPTURE the points that sit exactly on it (cluster 0's centroid
    # moved to the 3-point mean)
    out2 = {r.cluster: r.asDict() for r in
            kmeans_lloyd_exact(df, k=2, iters=2).collect()}
    assert out2[1]["n"] == 2 and out2[1]["c0_u"] == 1000000
    assert out2[0]["n"] == 1 and out2[0]["c0_u"] == 500000


def test_kmeans_too_few_rows_raises(spark):
    from centimators_spark.similarity.kmeans import kmeans_lloyd_exact
    import pytest as _pytest

    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="at least k=2"):
        kmeans_lloyd_exact(df, k=2, iters=1)
    empty = df.where("vec_id < 0")
    with _pytest.raises(ValueError, match="got 0"):
        kmeans_lloyd_exact(empty, k=2, iters=1)


def test_knn_classify_vote_and_tiebreak(spark):
    from centimators_spark.similarity.knn import knn_classify

    # query 0 at origin-ish; neighbors: two of label 7, two of label 3
    # -> tie at k=4 -> smaller label (3) wins
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.1], 7),
        (2, [0.98, 0.2], 7),
        (3, [0.97, 0.3], 3),
        (4, [0.96, 0.4], 3),
        (5, [-1.0, 0.0], 9),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    q = df.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = knn_classify(df, q, k=4).collect()
    assert len(out) == 1
    assert out[0].pred_label == 3 and out[0].votes == 2

    # k=2: the two closest are both label 7
    out2 = knn_classify(df, q, k=2).collect()
    assert out2[0].pred_label == 7 and out2[0].votes == 2


# ------------------------------------------------------------------ chi2


def test_chi2_independence_hand_table(spark):
    import numpy as np

    from centimators_spark.profile import chi2_independence

    # 2x2 with a known chi2: O = [[10, 20], [20, 10]]
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 20
        + [("b", "x")] * 20 + [("b", "y")] * 10
    )
    df = spark.createDataFrame(rows, "r string, c string")
    out = chi2_independence(df, "r", "c").collect()
    assert len(out) == 1
    o = out[0]
    assert (o.n, o.r_levels, o.c_levels, o.dof) == (60, 2, 2, 1)
    obs = np.array([[10.0, 20.0], [20.0, 10.0]])
    e = obs.sum(1)[:, None] * obs.sum(0)[None, :] / obs.sum()
    want = round(sum(round(v * 1e6) for v in
                     ((obs - e) ** 2 / e).ravel()) / 1e6, 6)
    assert abs(o.chi2 - want) < 1e-9


def test_chi2_zero_cells_and_null_level(spark):
    from centimators_spark.profile import chi2_independence

    # level ('b','y') never observed -> grid must still include it;
    # null r is its own level
    rows = [("a", "x"), ("a", "y"), ("b", "x"), (None, "y"), (None, "y")]
    df = spark.createDataFrame(rows, "r string, c string")
    o = chi2_independence(df, "r", "c").collect()[0]
    assert (o.n, o.r_levels, o.c_levels, o.dof) == (5, 3, 2, 2)
    # independence would need fractional cells; statistic is positive
    assert o.chi2 > 0


# --------------------------------------------------------- golden record


def test_golden_record_hand_rules(spark):
    from centimators_spark.dedup.survivorship import golden_record

    rows = [
        # key, id, name, ts, v
        (1, 10, "a", 100, 5),
        (1, 11, None, 200, None),
        (1, 12, "c", 300, 2),
        (2, 20, None, 50, None),
        (2, 21, None, 60, 9),
    ]
    df = spark.createDataFrame(
        rows, "k long, id long, name string, ts long, v long"
    )
    out = {
        r.k: r.asDict()
        for r in golden_record(
            df,
            "k",
            {
                "last_name": ("last_non_null", "name"),
                "first_v": ("first_non_null", "v"),
                "max_v": ("max", "v"),
                "n": ("count", "id"),
                "null_v": ("any_null", "v"),
            },
            order_col="ts",
            tie_col="id",
        ).collect()
    }
    assert out[1] == {
        "k": 1, "last_name": "c", "first_v": 5, "max_v": 5, "n": 3,
        "null_v": 1,
    }
    # key 2: name never observed -> NULL survives; first v at ts=60
    assert out[2]["last_name"] is None
    assert out[2]["first_v"] == 9 and out[2]["null_v"] == 1


def test_golden_record_tie_column_decides(spark):
    from centimators_spark.dedup.survivorship import golden_record

    # same ts: higher id wins the last_non_null pick
    rows = [(1, 5, "x", 100), (1, 9, "y", 100), (1, 1, "z", 100)]
    df = spark.createDataFrame(rows, "k long, id long, s string, ts long")
    out = golden_record(
        df, "k", {"last_s": ("last_non_null", "s")},
        order_col="ts", tie_col="id",
    ).collect()
    assert out[0].last_s == "y"


def test_kmeans_label_purity_output(spark):
    from centimators_spark.similarity.kmeans import kmeans_lloyd_exact

    rows = [
        (0, [0.0, 0.0], 5),
        (1, [1.0, 1.0], 6),
        (2, [0.1, 0.0], 5),
        (3, [1.1, 1.0], 6),
        (4, [0.9, 1.0], 6),
        (5, [1.0, 0.9], 5),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r.cluster: r.asDict() for r in
           kmeans_lloyd_exact(df, k=2, iters=2, label_col="label").collect()}
    # cluster 0 = {0, 2} both label 5; cluster 1 = {1, 3, 4, 5}:
    # labels 6,6,5 -> majority 6 with 3... (1,3,4 are 6; 5 is 5)
    assert out[0]["top_label"] == 5 and out[0]["label_n"] == 2
    assert out[1]["top_label"] == 6 and out[1]["label_n"] == 3
