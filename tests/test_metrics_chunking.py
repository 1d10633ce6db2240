"""Era-scoring report, autocorrelation, one-hot encoding, document
chunking, and char entropy — golden values on hand-built frames plus
numpy/scipy differentials."""

import math

import numpy as np
import pytest

from centimators_spark.ml.metrics import autocorr, era_corr, era_report
from centimators_spark.operators.encoding import one_hot_encode
from centimators_spark.text.chunking import chunk_documents


def test_era_corr_matches_numpy(spark):
    rng = np.random.RandomState(7)
    rows = []
    for era in (1, 2, 3):
        x = rng.randint(0, 100, 40)
        y = x * era + rng.randint(0, 50, 40)  # correlated, era-varying
        rows += [(era, int(a), int(b)) for a, b in zip(x, y)]
    df = spark.createDataFrame(rows, "era int, x long, y long")
    got = {r.era: r.corr for r in era_corr(df, "x", "y", "era").collect()}
    for era in (1, 2, 3):
        xs = np.array([r[1] for r in rows if r[0] == era], dtype=float)
        ys = np.array([r[2] for r in rows if r[0] == era], dtype=float)
        expect = np.corrcoef(xs, ys)[0, 1]
        assert got[era] == pytest.approx(expect, abs=1e-6), era


def test_era_corr_large_carriers_no_overflow(spark):
    """Carriers ≥ ~3.04e9 (a 6dp micro-unit scaling of any value over
    ~3036) overflowed the old LONG products into an ANSI
    ARITHMETIC_OVERFLOW before the DECIMAL cast; operands now cast
    first, so the products are exact DECIMAL(38,0) in both engines."""
    rng = np.random.RandomState(3)
    base = rng.randint(3_000_000_000, 4_000_000_000, 30)
    noise = rng.randint(0, 1_000_000_000, 30)
    rows = [(1, int(a), int(a + b)) for a, b in zip(base, noise)]
    df = spark.createDataFrame(rows, "era int, x long, y long")
    [row] = era_corr(df, "x", "y", "era").collect()
    xs = np.array([r[1] for r in rows], dtype=float)
    ys = np.array([r[2] for r in rows], dtype=float)
    assert row.corr == pytest.approx(np.corrcoef(xs, ys)[0, 1], abs=1e-6)
    # the autocorr sums shared the same overflow class
    adf = spark.createDataFrame(
        [("a", t, int(v)) for t, v in enumerate(base)], "g string, t int, v long"
    )
    [arow] = autocorr(adf, "v", group_col="g", order_cols=["t"], lags=(1,)).collect()
    expect = np.corrcoef(base[1:].astype(float), base[:-1].astype(float))[0, 1]
    assert arow.acf1 == pytest.approx(expect, abs=1e-6)


def test_autocorr_null_values_excluded_from_pairs(spark):
    """A row whose CURRENT value is null must not inflate the pair
    count n{k} (it contributes nothing to the moment sums)."""
    vals = [10, 20, None, 40, 50, 30, 70]
    rows = [("a", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t int, v long")
    [row] = autocorr(df, "v", group_col="g", order_cols=["t"], lags=(1,)).collect()
    pairs = [
        (c, p)
        for c, p in zip(vals[1:], vals[:-1])
        if c is not None and p is not None
    ]
    xs = np.array([c for c, _ in pairs], dtype=float)
    ys = np.array([p for _, p in pairs], dtype=float)
    assert row.acf1 == pytest.approx(np.corrcoef(xs, ys)[0, 1], abs=1e-6)


def test_era_corr_constant_series_is_null(spark):
    df = spark.createDataFrame(
        [(1, 5, 1), (1, 5, 2), (1, 5, 3)], "era int, x long, y long"
    )
    [row] = era_corr(df, "x", "y", "era").collect()
    assert row.corr is None


def test_era_report_summary_and_drawdown(spark):
    # construct eras whose corr values are exactly +1 or -1:
    # era corrs: +1, +1, -1, +1, -1, -1  -> cum: 1 2 1 2 1 0, peak-cum max = 2
    signs = [1, 1, -1, 1, -1, -1]
    rows = []
    for era, s in enumerate(signs):
        for i in range(5):
            rows.append((era, i, s * i))
    df = spark.createDataFrame(rows, "era int, x long, y long")
    [r] = era_report(df, "x", "y", "era").collect()
    assert r.n_eras == 6
    assert r.mean_corr == pytest.approx(0.0)
    assert r.std_corr == pytest.approx(math.sqrt(6 / 5), abs=1e-6)
    assert r.sharpe == pytest.approx(0.0)
    assert r.min_corr == -1.0 and r.max_corr == 1.0
    assert r.max_drawdown == pytest.approx(2.0)


def test_autocorr_matches_numpy(spark):
    rng = np.random.RandomState(11)
    series = {"a": rng.randint(0, 1000, 60), "b": rng.randint(0, 1000, 45)}
    rows = [
        (g, int(t), int(v))
        for g, vs in series.items()
        for t, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows, "g string, t int, v long")
    out = {
        r.g: r
        for r in autocorr(
            df, "v", group_col="g", order_cols=["t"], lags=(1, 3)
        ).collect()
    }
    for g, vs in series.items():
        for k, col in ((1, "acf1"), (3, "acf3")):
            expect = np.corrcoef(vs[k:].astype(float), vs[:-k].astype(float))[0, 1]
            assert getattr(out[g], col) == pytest.approx(expect, abs=1e-6), (g, k)
        assert out[g].n == len(vs)


def test_one_hot_pinned_categories(spark):
    df = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "Z"), (4, None)], "id long, cat string"
    )
    out = {r.id: r for r in one_hot_encode(df, "cat", ["A", "B"]).collect()}
    assert (out[1].cat_A, out[1].cat_B, out[1].cat_other) == (1, 0, 0)
    assert (out[2].cat_A, out[2].cat_B, out[2].cat_other) == (0, 1, 0)
    # unseen category and null both land in _other
    assert (out[3].cat_A, out[3].cat_B, out[3].cat_other) == (0, 0, 1)
    assert (out[4].cat_A, out[4].cat_B, out[4].cat_other) == (0, 0, 1)
    # schema is static: columns present even when category absent from data
    assert "cat_A" in out[1].asDict()


def test_chunk_documents_grid_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text), (2, "solo"), (3, ""), (4, None)], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_tokens=4, stride=3)
    rows = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    # doc 1: starts 0,3,6,9 -> 4 chunks; last is partial
    assert sorted(k for k in rows if k[0] == 1) == [(1, i) for i in range(4)]
    assert rows[(1, 0)].chunk_text == "t0 t1 t2 t3"
    assert rows[(1, 1)].chunk_text == "t3 t4 t5 t6"  # overlap of 1 token
    assert rows[(1, 3)].chunk_text == "t9"
    assert rows[(1, 3)].n_chunk_tokens == 1
    assert rows[(1, 1)].start_token == 3
    # single-token and empty/null docs
    assert rows[(2, 0)].chunk_text == "solo"
    assert not any(k[0] in (3, 4) for k in rows)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0, stride=3)


def test_char_entropy_golden(spark):
    from centimators_spark.text.analysis import char_entropy

    df = spark.createDataFrame(
        [
            (1, "aaaa"),          # single symbol -> entropy 0
            (2, "abab"),          # two equiprobable -> ln 2
            (3, "a b! C, d?"),    # 4 distinct letters -> ln 4 (case folded)
            (4, "!!! ???"),       # no [a-z0-9] chars
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in char_entropy(df).collect()}
    assert out[1].entropy == pytest.approx(0.0)
    assert out[2].entropy == pytest.approx(math.log(2), abs=1e-6)
    assert out[3].entropy == pytest.approx(math.log(4), abs=1e-6)
    assert out[3].n_alpha_chars == 4 and out[3].n_distinct_chars == 4
    assert out[4].entropy is None and out[4].n_alpha_chars == 0


def test_chunk_documents_coverage_property(spark):
    """Every token position is covered by at least one chunk; full
    chunks overlap by exactly W-S tokens; stride==W tiles exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        n=st.integers(1, 40),
        w=st.integers(1, 10),
        s=st.integers(1, 10),
    )
    def check(n, w, s):
        text = " ".join(f"t{i}" for i in range(n))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            chunk_documents(df, chunk_tokens=w, stride=s).collect(),
            key=lambda r: r.chunk_idx,
        )
        covered = set()
        for r in rows:
            toks = r.chunk_text.split(" ")
            assert len(toks) == r.n_chunk_tokens
            assert toks == [f"t{i}" for i in range(r.start_token, min(r.start_token + w, n))]
            covered.update(range(r.start_token, r.start_token + r.n_chunk_tokens))
        if w >= s:
            assert covered == set(range(n))  # full coverage when windows meet
        starts = [r.start_token for r in rows]
        assert starts == list(range(0, n, s))

    check()


def test_era_report_partition_invariant(spark):
    """The report is identical under any input row order / partitioning
    (the DECIMAL-sum + integer-carrier design's whole point)."""
    import random

    rng = random.Random(3)
    rows = [
        (era, rng.randrange(100), rng.randrange(1000))
        for era in range(8)
        for _ in range(30)
    ]
    shuffled = rows[:]
    rng.shuffle(shuffled)
    a = spark.createDataFrame(rows, "era int, x long, y long").repartition(1)
    b = spark.createDataFrame(shuffled, "era int, x long, y long").repartition(7)
    ra = era_report(a, "x", "y", "era").collect()[0]
    rb = era_report(b, "x", "y", "era").collect()[0]
    assert ra == rb


def test_era_report_degenerate_inputs(spark):
    """All-identical era corrs -> std 0, sharpe NULL; a single era ->
    std/sharpe NULL (guards mirror the oracle's CASE expressions)."""
    rows = [(e, i, i) for e in range(3) for i in range(4)]  # corr = +1 always
    df = spark.createDataFrame(rows, "era int, x long, y long")
    [r] = era_report(df, "x", "y", "era").collect()
    assert r.std_corr == 0.0 and r.sharpe is None
    assert r.mean_corr == 1.0 and r.max_drawdown == 0.0

    one = spark.createDataFrame(
        [(1, i, 2 * i + (i % 2)) for i in range(5)], "era int, x long, y long"
    )
    [r1] = era_report(one, "x", "y", "era").collect()
    assert r1.n_eras == 1
    assert r1.std_corr is None and r1.sharpe is None


def test_corpus_divergence_properties_and_duckdb(spark):
    """Smoothed KL is 0 for identical sides, positive under shift, and
    the DuckDB mirror matches bitwise; the shift report surfaces the
    driving token."""
    import duckdb
    from pyspark.sql import functions as F

    from centimators_spark.text.divergence import (
        corpus_divergence,
        corpus_divergence_oracle_sql,
        token_shift_report,
    )

    same = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(10)], "doc_id long, text string"
    )
    [r0] = corpus_divergence(same, F.col("doc_id") % 2 == 0).collect()
    assert r0.kl_ab == 0.0 and r0.jeffreys == 0.0
    assert r0.n_tokens_a == r0.n_tokens_b == 15

    rows = [
        (i, "common words here plus drift" if i % 2 == 0 else "common words here")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    [r] = corpus_divergence(df, F.col("doc_id") % 2 == 0).collect()
    assert r.kl_ab > 0 and r.kl_ba > 0 and r.jeffreys > 0

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") v(doc_id, text)"
    )
    exp = con.execute(corpus_divergence_oracle_sql()).fetchdf().iloc[0]
    assert (r.kl_ab, r.kl_ba, r.jeffreys) == (
        exp.kl_ab, exp.kl_ba, exp.jeffreys
    )
    assert (r.n_tokens_a, r.n_tokens_b, r.vocab) == (
        exp.n_tokens_a, exp.n_tokens_b, exp.vocab,
    )

    top = token_shift_report(df, F.col("doc_id") % 2 == 0, top_k=2).collect()
    assert {t.t for t in top} <= {"drift", "plus", "common", "words", "here"}
    assert top[0].t in ("drift", "plus")  # A-only tokens drive the shift
