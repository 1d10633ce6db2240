"""EmbeddingTransformer + DimReducer tests (reference fixtures F4/F5)."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from centimators_spark.ml.embedders import ord_sum_embedder as mock_embedder
from centimators_spark.operators.dimreduction import DimReducer
from centimators_spark.operators.embedding import EmbeddingTransformer


def test_embedding_basic_and_nulls(spark):
    df = spark.createDataFrame(
        [(0, "hello"), (1, None), (2, "world")], "rid int, text string"
    )
    t = EmbeddingTransformer(
        embedder=mock_embedder, feature_names=["text"], keep_cols=["rid"]
    )
    out = t.fit_transform(df).orderBy("rid").collect()
    assert [r.text_embed_0 for r in out] == [5.0, 0.0, 5.0]
    assert out[0].text_embed_1 == sum(ord(c) for c in "hello") % 100
    assert out[1].text_embed_1 == 0.0  # null -> zero vector
    assert t.get_feature_names_out() == ["text_embed_0", "text_embed_1"]


def test_embedding_categorical_template(spark):
    df = spark.createDataFrame([(0, "tech")], "rid int, sector string")
    t = EmbeddingTransformer(
        embedder=mock_embedder,
        feature_names=["sector"],
        categorical_mapping={"sector": "Company sector: {}"},
        keep_cols=["rid"],
    )
    out = t.fit_transform(df).collect()[0]
    rendered = "Company sector: tech"
    assert out.sector_embed_0 == len(rendered)
    assert out.sector_embed_1 == sum(ord(c) for c in rendered) % 100


def test_embedding_multi_column(spark):
    df = spark.createDataFrame([(0, "ab", "xyz")], "rid int, t1 string, t2 string")
    t = EmbeddingTransformer(
        embedder=mock_embedder, feature_names=["t1", "t2"], keep_cols=["rid"]
    )
    out = t.fit_transform(df)
    assert set(out.columns) == {
        "rid", "t1_embed_0", "t1_embed_1", "t2_embed_0", "t2_embed_1",
    }


def test_embedding_all_null_raises(spark):
    df = spark.createDataFrame([(0, None)], "rid int, text string")
    t = EmbeddingTransformer(embedder=mock_embedder, feature_names=["text"])
    with pytest.raises(ValueError, match="all values are null"):
        t.fit(df)


def test_embedding_requires_fit(spark):
    df = spark.createDataFrame([(0, "x")], "rid int, text string")
    t = EmbeddingTransformer(embedder=mock_embedder, feature_names=["text"])
    with pytest.raises(ValueError, match="not fitted"):
        t.transform(df)


def test_dimreducer_pca_matches_numpy(spark):
    rng = np.random.default_rng(42)
    data = rng.normal(size=(200, 6)) @ rng.normal(size=(6, 6))
    rows = [
        Row(rid=i, **{f"f{j}": float(v) for j, v in enumerate(row)})
        for i, row in enumerate(data)
    ]
    df = spark.createDataFrame(rows)
    t = DimReducer("pca", n_components=2, feature_names=[f"f{j}" for j in range(6)],
                   keep_cols=["rid"])
    out = t.fit_transform(df).orderBy("rid").toPandas()
    assert list(out.columns) == ["rid", "dim_0", "dim_1"]

    # numpy PCA (same centering convention: Spark ML PCA does NOT center?
    # it does compute principal components of the covariance — compare
    # projected variances up to sign)
    centered = data - data.mean(axis=0)
    _, s, vt = np.linalg.svd(centered, full_matrices=False)
    got = out[["dim_0", "dim_1"]].to_numpy()
    # Spark ML PCA projects the UNcentered data onto covariance eigenvectors;
    # component directions match SVD of centered data up to sign
    for k in range(2):
        proj = data @ vt[k]
        corr = abs(np.corrcoef(got[:, k], proj)[0, 1])
        assert corr > 0.999, (k, corr)


def test_dimreducer_expr_matches_sparkml(spark):
    """The one-aggregation expression PCA and the Spark ML vector path
    produce the same projections up to sign."""
    rng = np.random.default_rng(3)
    data = rng.normal(size=(300, 5)) @ rng.normal(size=(5, 5))
    rows = [
        Row(rid=i, **{f"f{j}": float(v) for j, v in enumerate(row)})
        for i, row in enumerate(data)
    ]
    df = spark.createDataFrame(rows)
    feats = [f"f{j}" for j in range(5)]

    t_expr = DimReducer("pca", 3, feats, keep_cols=["rid"])
    a = t_expr.fit_transform(df).orderBy("rid").toPandas()
    assert t_expr._model == "expr"

    t_ml = DimReducer("pca", 3, feats, keep_cols=["rid"])
    t_ml.EXPR_PCA_MAX_FEATURES = 0  # force the Spark ML path
    b = t_ml.fit_transform(df).orderBy("rid").toPandas()

    for k in range(3):
        corr = abs(np.corrcoef(a[f"dim_{k}"], b[f"dim_{k}"])[0, 1])
        assert corr > 0.9999, (k, corr)


def test_dimreducer_pca_matches_expr_twin(spark):
    """The numpy-eigh kernel (DimReducer expr path) must agree with the
    closed-form shared-SQL twin (pca2_project_expr) — the twin is the
    oracle-hash-verified side, so this pins the rows-only kernel to it."""
    from centimators_spark.operators.dimreduction import pca2_project_expr

    rng = np.random.default_rng(7)
    # integer-valued features, as the twin's exact decimal sums require
    data = rng.integers(0, 50, size=(400, 2)).astype(float)
    rows = [Row(rid=i, x=float(r[0]), y=float(r[1])) for i, r in enumerate(data)]
    df = spark.createDataFrame(rows)

    t = DimReducer("pca", 2, ["x", "y"], keep_cols=["rid"])
    a = t.fit_transform(df).orderBy("rid").toPandas()
    assert t._model == "expr"
    b = pca2_project_expr(df, "x", "y", keep_cols=["rid"]).orderBy("rid").toPandas()
    for k in range(2):
        assert np.allclose(a[f"dim_{k}"], b[f"dim_{k}"], atol=1e-6), k


def test_pca2_twin_uncorrelated_branch(spark):
    """cxy == 0 (axis-aligned covariance): the closed form must pick the
    higher-variance axis as component 1 — exercises the CASE branch the
    random-data test never hits."""
    from centimators_spark.operators.dimreduction import pca2_project_expr

    # y has variance 9x that of x, zero covariance by symmetry
    rows = [
        Row(rid=0, x=1.0, y=3.0),
        Row(rid=1, x=2.0, y=9.0),
        Row(rid=2, x=1.0, y=9.0),
        Row(rid=3, x=2.0, y=3.0),
    ]
    df = spark.createDataFrame(rows)
    out = pca2_project_expr(df, "x", "y", keep_cols=["rid"]).orderBy("rid").toPandas()
    # component 1 = (0, 1) → dim_0 == y; component 2 = (1, 0) → dim_1 == x
    assert (out["dim_0"] == [3.0, 9.0, 9.0, 3.0]).all()
    assert (out["dim_1"] == [1.0, 2.0, 1.0, 2.0]).all()


def test_ivf_topk_empty_queries(spark):
    from centimators_spark.similarity.ann import ivf_topk

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    q = emb.where(F.lit(False)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert ivf_topk(emb, q, k=3, n_lists=2, n_probe=1).count() == 0


def test_dimreducer_tsne_gated(spark):
    df = spark.createDataFrame([(0, 1.0, 2.0)], "rid int, a double, b double")
    t = DimReducer("tsne", 2, ["a", "b"])
    with pytest.raises(ImportError, match="scikit-learn"):
        t.fit(df).transform(df)


def test_dimreducer_umap_gated(spark):
    df = spark.createDataFrame([(0, 1.0, 2.0)], "rid int, a double, b double")
    with pytest.raises(ImportError, match="umap-learn"):
        DimReducer("umap", 2, ["a", "b"]).fit(df)


def _make_linear_reducer():
    """Deterministic stand-in with the sklearn/umap estimator shape:
    fit records column means, transform projects onto the first
    n_components centered columns. Defined inside a function so
    cloudpickle ships the class by value to executors (the test module
    itself is not importable there)."""

    class LinearReducer:
        def __init__(self, n_components=2, **kwargs):
            self.n_components = n_components

        def fit(self, X):
            self.mean_ = X.mean(axis=0)
            return self

        def transform(self, X):
            return (X - self.mean_)[:, : self.n_components]

        def fit_transform(self, X):
            return self.fit(X).transform(X)

    return LinearReducer


def test_dimreducer_umap_plumbing_with_fake_module(spark, monkeypatch):
    """Exercise the real fit-then-distributed-transform path by
    injecting a stand-in umap module: fit on the driver sample, score
    via mapInPandas on executors."""
    import sys
    import types

    fake = types.ModuleType("umap")
    fake.UMAP = _make_linear_reducer()
    monkeypatch.setitem(sys.modules, "umap", fake)

    rows = [(i, float(i), float(2 * i), float(i % 3)) for i in range(50)]
    df = spark.createDataFrame(rows, "rid int, a double, b double, c double")
    t = DimReducer("umap", 2, ["a", "b", "c"], keep_cols=["rid"])
    out = t.fit(df).transform(df).orderBy("rid").toPandas()
    assert list(out.columns) == ["rid", "dim_0", "dim_1"]
    # the stand-in centers by the fitted mean: a=24.5, b=49.0
    np.testing.assert_allclose(out["dim_0"], np.arange(50) - 24.5)
    np.testing.assert_allclose(out["dim_1"], 2 * np.arange(50) - 49.0)
    # unfitted transform raises like the reference
    with pytest.raises(ValueError, match="fit"):
        DimReducer("umap", 2, ["a"]).transform(df)


def test_dimreducer_tsne_plumbing_with_fake_module(spark, monkeypatch):
    """t-SNE path: refits per transform on a driver-capped sample
    (reference semantics), no fit required first."""
    import sys
    import types

    fake_manifold = types.ModuleType("sklearn.manifold")
    fake_manifold.TSNE = _make_linear_reducer()
    fake_sklearn = types.ModuleType("sklearn")
    fake_sklearn.manifold = fake_manifold
    monkeypatch.setitem(sys.modules, "sklearn", fake_sklearn)
    monkeypatch.setitem(sys.modules, "sklearn.manifold", fake_manifold)

    rows = [(i, float(i), float(-i)) for i in range(30)]
    df = spark.createDataFrame(rows, "rid int, a double, b double")
    t = DimReducer("tsne", 1, ["a", "b"], keep_cols=["rid"], driver_row_cap=20)
    out = t.fit(df).transform(df).orderBy("rid").toPandas()
    assert list(out.columns) == ["rid", "dim_0"]
    assert len(out) == 20  # row cap applied


def test_dimreducer_validates_method():
    with pytest.raises(ValueError):
        DimReducer("pcaa")


def test_embedding_array_mode(spark):
    df = spark.createDataFrame([(0, "abc")], "rid int, text string")
    t = EmbeddingTransformer(
        embedder=mock_embedder, feature_names=["text"], keep_cols=["rid"],
        expand=False,
    )
    out = t.fit_transform(df).collect()[0]
    assert list(out["text__embed"]) == [3.0, float(sum(ord(c) for c in "abc") % 100)]


def test_ivf_topk_zero_norm_vector(spark):
    """An all-zero embedding (padding row) must not NULL-poison the
    KMeans features or fail the job."""
    from centimators_spark.similarity.ann import ivf_topk

    rows = [(i, [float(i + 1), 1.0]) for i in range(10)] + [(99, [0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(emb, q, k=3, n_lists=2, n_probe=2).collect()
    assert len(out) == 3


def test_frequent_itemsets_known_counts_and_threshold(spark):
    """Hand-computed baskets: exact freqs, the mllib ceil threshold
    boundary, and deterministic sorted item keys."""
    from centimators_spark.ml.itemsets import (
        frequent_itemsets,
        make_baskets,
    )

    # 10 baskets: {a,b} x6, {a,c} x3, {c} x1  (item 'a' in 9, 'b' 6,
    # 'c' 4; pair a,b 6; pair a,c 3)
    rows = []
    bid = 0
    for _ in range(6):
        rows += [(bid, "a"), (bid, "b")]; bid += 1
    for _ in range(3):
        rows += [(bid, "a"), (bid, "c")]; bid += 1
    rows += [(bid, "c")]
    df = spark.createDataFrame(rows, "basket long, item string")
    baskets = make_baskets(df, "basket", "item")
    # min_support 0.4 -> min_count = ceil(4.0) = 4: keeps c (4) exactly
    # on the boundary, drops pair a,c (3)
    out = {r.items_key: (r.size, r.freq)
           for r in frequent_itemsets(baskets, min_support=0.4).collect()}
    assert out == {
        "a": (1, 9), "b": (1, 6), "c": (1, 4), "a,b": (2, 6),
    }
    # duplicate items within a basket count once
    dup = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "x")], "basket long, item string"
    )
    out2 = {r.items_key: r.freq for r in frequent_itemsets(
        make_baskets(dup, "basket", "item"), min_support=0.5
    ).collect()}
    assert out2 == {"x": 2}

    # r13 optimization: max_size<=2 takes the exact enumeration path
    # (no FP-Growth run) — must be ROW-IDENTICAL to the FP-Growth
    # path filtered to the same size, including the ceil boundary
    fast = sorted(
        (r.items_key, r.size, r.freq)
        for r in frequent_itemsets(
            baskets, min_support=0.4, max_size=2
        ).collect()
    )
    assert fast == [
        ("a", 1, 9), ("a,b", 2, 6), ("b", 1, 6), ("c", 1, 4),
    ]
    fast1 = sorted(
        (r.items_key, r.size, r.freq)
        for r in frequent_itemsets(
            baskets, min_support=0.4, max_size=1
        ).collect()
    )
    assert fast1 == [("a", 1, 9), ("b", 1, 6), ("c", 1, 4)]


def test_kaplan_meier_hand_computed(spark):
    """Textbook KM: survival drops only at event times, censoring only
    shrinks the risk set, absorbing zero when everyone left fails."""
    from centimators_spark.ml.survival import kaplan_meier

    # cohort A: durations (1,e) (2,censor) (3,e) (4,e)
    #   t=1: n=4 d=1 -> 3/4
    #   t=3: n=2 d=1 -> 3/4 * 1/2 = 3/8
    #   t=4: n=1 d=1 -> 0 (absorbing)
    rows = [
        ("A", 1, 1), ("A", 2, 0), ("A", 3, 1), ("A", 4, 1),
        # cohort B: ties at one time: t=2 n=3 d=2 -> 1/3; censor at 5
        ("B", 2, 1), ("B", 2, 1), ("B", 5, 0),
    ]
    df = spark.createDataFrame(rows, "cohort string, duration int, event int")
    out = {(r.cohort, r.duration): (r.at_risk, r.events, r.survival)
           for r in kaplan_meier(df).collect()}
    assert out[("A", 1)] == (4, 1, 0.75)
    assert out[("A", 3)] == (2, 1, 0.375)
    assert out[("A", 4)] == (1, 1, 0.0)
    assert out[("B", 2)] == (3, 2, pytest.approx(1 / 3, abs=1e-6))
    assert len(out) == 4  # censor-only times emit no row


def test_ab_test_report_hand_computed(spark):
    """Two-proportion pooled z and Welch mean z against scipy-free
    hand arithmetic; degenerate (all-convert) arm yields NULL z."""
    import math

    from centimators_spark.ml.abtest import ab_test_report

    # control: 100 subjects, 20 convert, metric ~ N-ish values
    rows = []
    for i in range(100):
        rows.append(("control", 1 if i < 20 else 0, float(10 + (i % 7))))
    for i in range(80):
        rows.append(("treatment", 1 if i < 28 else 0, float(12 + (i % 5))))
    df = spark.createDataFrame(rows, "variant string, converted int, metric double")
    out = {r.variant: r for r in ab_test_report(df).collect()}
    c, t = out["control"], out["treatment"]
    assert (c.n, c.conversions, c.conv_rate) == (100, 20, 0.2)
    assert (t.n, t.conversions, t.conv_rate) == (80, 28, 0.35)
    assert c.z_conv is None and c.z_mean is None
    p_pool = 48 / 180
    z = (0.35 - 0.2) / math.sqrt(p_pool * (1 - p_pool) * (1 / 80 + 1 / 100))
    assert t.z_conv == pytest.approx(z, abs=1e-6)
    import numpy as np

    cm = np.array([10 + (i % 7) for i in range(100)], dtype=float)
    tm = np.array([12 + (i % 5) for i in range(80)], dtype=float)
    zm = (tm.mean() - cm.mean()) / math.sqrt(
        cm.var(ddof=1) / 100 + tm.var(ddof=1) / 80
    )
    assert t.z_mean == pytest.approx(zm, abs=1e-6)

    # degenerate: every subject converts -> pooled p = 1 -> NULL z_conv
    dg = spark.createDataFrame(
        [("control", 1, 1.0), ("treatment", 1, 2.0)] * 3,
        "variant string, converted int, metric double",
    )
    o2 = {r.variant: r for r in ab_test_report(dg).collect()}
    assert o2["treatment"].z_conv is None


def test_cuped_reduces_variance_preserves_mean(spark):
    """CUPED: adjusted metric has the same mean (to rounding) and
    strictly lower variance when pre/post correlate; theta matches the
    closed form."""
    import numpy as np

    from centimators_spark.ml.abtest import cuped_adjust

    rng = np.random.RandomState(11)
    pre = rng.normal(50, 10, 400)
    post = pre * 0.8 + rng.normal(0, 3, 400)  # strongly correlated
    rows = [(float(a), float(b)) for a, b in zip(pre, post)]
    df = spark.createDataFrame(rows, "pre_metric double, metric double")
    out = cuped_adjust(df).toPandas()
    assert abs(out.metric_cuped.mean() - post.mean()) < 1e-3
    assert out.metric_cuped.var() < 0.2 * post.var()


def test_benford_and_gini_known_values(spark):
    """Benford digits from hand-built values; Gini of a uniform group
    ~ (n-1)/(3n)... no — exact hand cases: all-equal -> 0; extreme
    concentration -> (n-1)/n."""
    from centimators_spark.analytics import gini_by_group
    from centimators_spark.profile import benford_check

    vals = [
        (None if v is None else float(v),)
        for v in (1.0, 12.0, 0.19, 950.0, 2.5, 0.0, None)
    ]
    df = spark.createDataFrame(vals, "x double")
    out = {r.digit: r.n for r in benford_check(df, "x").collect()}
    # leading digits: 1, 1, 1, 9, 2 (0/None excluded)
    assert out == {1: 3, 9: 1, 2: 1}

    rows = [("eq", 5.0)] * 4 + [("conc", 0.0)] * 3 + [("conc", 100.0)]
    gdf = spark.createDataFrame(rows, "grp string, v double")
    g = {r.grp: r.gini for r in gini_by_group(gdf, "v", "grp").collect()}
    assert g["eq"] == 0.0
    assert g["conc"] == 0.75  # (n-1)/n with all mass on one row, n=4


def test_auc_logloss_calibration_known_values(spark):
    """AUC vs sklearn-free hand computation (with ties), logloss vs
    numpy, calibration bin edges."""
    import math

    from centimators_spark.ml.classification_metrics import (
        auc_score,
        calibration_bins,
        log_loss,
    )

    # scores: two ties across classes
    rows = [
        (0.1, 0), (0.2, 0), (0.35, 1), (0.35, 0), (0.8, 1), (0.8, 1),
        (0.9, 1),
    ]
    df = spark.createDataFrame(rows, "p double, y int")
    [r] = auc_score(df, "p", "y").collect()
    # avg ranks: 0.1->1, 0.2->2, 0.35->3.5,3.5, 0.8->5.5,5.5, 0.9->7
    # rsum+ = 3.5 + 5.5 + 5.5 + 7 = 21.5; auc = (21.5 - 10)/ (4*3)
    assert (r.n_pos, r.n_neg) == (4, 3)
    assert r.auc == pytest.approx((21.5 - 10) / 12, abs=1e-6)

    [l] = log_loss(df, "p", "y").collect()
    expect = -sum(
        math.log(p) if y else math.log(1 - p) for p, y in rows
    ) / len(rows)
    assert l.logloss == pytest.approx(expect, abs=1e-6)

    cal = {c.bin: (c.n, c.frac_pos) for c in
           calibration_bins(df, "p", "y", n_bins=10).collect()}
    assert cal[3] == (2, 0.5)   # both 0.35s
    assert cal[8] == (2, 1.0)   # both 0.8s
    # p = 1.0 would land in bin 9 via the least() clamp
    dfe = spark.createDataFrame([(1.0, 1)], "p double, y int")
    [ce] = calibration_bins(dfe, "p", "y", n_bins=10).collect()
    assert ce.bin == 9


def test_ab_test_report_unknown_control_fails_loudly(spark):
    """ADVICE r5 (low): a misspelled control= used to produce an EMPTY
    report (empty control slice crossJoined away every row); it must
    raise instead, naming the observed variants."""
    import pytest

    from centimators_spark.ml.abtest import ab_test_report

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("b", 0, 2.0)],
        "variant string, converted int, metric double",
    )
    with pytest.raises(ValueError, match="not present.*'a'.*'b'"):
        ab_test_report(df, control="controll")
