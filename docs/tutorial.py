"""End-to-end tutorial: panel features -> neutralization -> corpus
cleaning, on the bundled sf0.001 test data.

The runnable counterpart of the reference's tutorial notebooks
(/root/reference/docs/tutorials/dspymator.ipynb, keras-cortex.ipynb):
run it from the repo root —

    python docs/tutorial.py [sf_dir]

It finishes in well under two minutes on a laptop-sized local session
and prints a few rows after each stage. Every API it touches is
driver-verified by the correctness gate (see docs/api.md for the
operator -> gate-query map).
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from centimators_spark.session import get_spark

    spark = get_spark("tutorial", cpus=4, shuffle_partitions=4)

    # ------------------------------------------------------------------
    # 1. Feature engineering on a panel (the reference's core pipeline:
    #    rank -> lag -> moving average, README.md:103-172 shapes)
    # ------------------------------------------------------------------
    from centimators_spark.operators.ranking import RankTransformer
    from centimators_spark.operators.time_series import (
        LagTransformer,
        MovingAverageTransformer,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        "l_linenumber",
        F.date_trunc("month", "l_shipdate").alias("era"),
        F.col("l_suppkey").alias("ticker"),
        "l_shipdate",
        "l_extendedprice",
        "l_quantity",
    )
    ranked = RankTransformer(
        ["l_extendedprice"], group_col="era"
    ).transform(li)
    lagged = LagTransformer(
        [1, 5],
        ["l_extendedprice_rank"],
        ticker_col="ticker",
        order_cols=["l_shipdate", "l_orderkey", "l_linenumber"],
    ).transform(ranked)
    feats = MovingAverageTransformer(
        [5],
        ["l_extendedprice_rank"],
        ticker_col="ticker",
        order_cols=["l_shipdate", "l_orderkey", "l_linenumber"],
    ).transform(lagged)
    print("== panel features (rank -> lag -> ma) ==")
    feats.select(
        "ticker",
        "l_shipdate",
        "l_extendedprice_rank",
        "l_extendedprice_rank_lag1",
        "l_extendedprice_rank_ma5",
    ).orderBy("ticker", "l_shipdate").show(5)

    # ------------------------------------------------------------------
    # 2. Neutralization: remove the per-era linear feature exposure
    #    from a prediction (the reference's FeatureNeutralizer) — here
    #    the deterministic pure-expression form
    # ------------------------------------------------------------------
    from centimators_spark.operators.neutralization import (
        era_ols_neutralize,
    )

    base = li.select(
        "l_orderkey",
        "l_linenumber",
        "era",
        F.col("l_quantity").cast("double").alias("q"),
        F.round(F.col("l_extendedprice") * 100).alias("e100"),
    )
    neut = era_ols_neutralize(
        base,
        "e100",
        ["q"],
        era_col="era",
        proportion=0.5,
        keep_cols=["l_orderkey", "l_linenumber"],
    )
    print("== neutralized prediction (per-era OLS, proportion 0.5) ==")
    neut.orderBy("l_orderkey", "l_linenumber").show(5)

    # ------------------------------------------------------------------
    # 3. Training-corpus cleaning: language/quality/repetition filters,
    #    MinHash-LSH near-dup removal, benchmark decontamination — one
    #    lazy plan (the corpus_clean flagship)
    # ------------------------------------------------------------------
    from centimators_spark.plans.datapipe_queries import q_corpus_clean

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clean = q_corpus_clean(spark, sf_dir)
    n_in, n_out = docs.count(), clean.count()
    print("== corpus clean (lang + quality + repetition + dedup +")
    print(f"   decontamination): {n_in} docs -> {n_out} kept ==")
    clean.orderBy("doc_id").show(5)

    # ------------------------------------------------------------------
    # 4. A taste of the extension surface: image near-dup via pHash
    # ------------------------------------------------------------------
    from centimators_spark.multimodal.phash import image_phash_dedup

    pairs = image_phash_dedup(docs.limit(100))
    print("== image pHash near-dup pairs (synthetic BMP corpus) ==")
    pairs.orderBy("d1", "d2").show(5)

    # ------------------------------------------------------------------
    # 5. Corpus audit with sketches: how much do sources overlap
    #    (theta intersection), how big is each pairwise union (HLL
    #    merge), and where are the exact duplicated token runs?
    # ------------------------------------------------------------------
    from centimators_spark.dedup.substring import duplicated_spans
    from centimators_spark.sketches import theta_sketch_intersections

    theta = theta_sketch_intersections(docs)
    print("== theta sketch: distinct 3-gram intersection per source pair ==")
    theta.orderBy(F.col("est_common").desc()).show(3)

    spans = duplicated_spans(docs)
    print("== exact duplicated-substring profile (top offenders) ==")
    spans.orderBy(F.col("n_dup_tokens").desc()).show(3)

    # ------------------------------------------------------------------
    # 6. Round-11 additions: pick target-like pretraining docs (DSIR),
    #    profile duplication at three run lengths in one scan, and put
    #    mergeable error bars on per-group quantiles.
    # ------------------------------------------------------------------
    from centimators_spark.dedup.substring import duplicated_spans_multi
    from centimators_spark.sketches import bottomk_quantile_sketch
    from centimators_spark.text.dsir import dsir_select

    picked = dsir_select(
        docs, "source IN ('src0', 'src1', 'src2', 'src3')", k=5
    )
    print("== DSIR: 5 most target-like proposal docs ==")
    picked.show(5)

    multi = duplicated_spans_multi(docs.limit(200))
    print("== duplicated spans at L in {8, 16, 32} (one scan) ==")
    multi.orderBy(F.col("n_dup_tokens").desc()).show(3)

    bq = bottomk_quantile_sketch(
        docs.withColumn("n_chars_d", F.col("n_chars").cast("double")),
        "source", "doc_id", "n_chars_d",
    )
    print("== bottom-k quantile sketch vs exact witness (n_chars) ==")
    bq.orderBy("grp").show(3)

    # ------------------------------------------------------------------
    # 7. Round-12 additions: size and de-skew a join BEFORE running it,
    #    and control the false-discovery rate across a fanned-out test.
    # ------------------------------------------------------------------
    from centimators_spark.ml.abtest import benjamini_hochberg
    from centimators_spark.profile import join_skew_audit
    from centimators_spark.sketches import cms_join_size

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    audit = join_skew_audit(orders, ["o_custkey", "o_orderstatus"])
    print("== join-key skew audit (salt? broadcast?) ==")
    audit.orderBy("key_name").show(truncate=False)

    size = cms_join_size(events, "user_id", orders, "o_custkey")
    print("== CMS join-size estimate vs exact (est >= exact always) ==")
    size.show()

    tests = spark.createDataFrame(
        [("seg_a", 5), ("seg_b", 40), ("seg_c", 300), ("seg_d", 900)],
        "grp string, p_milli long",
    )
    print("== Benjamini-Hochberg at q=0.10 over per-segment p-values ==")
    benjamini_hochberg(tests, "grp", "p_milli").orderBy("p_rank").show()

    print("tutorial: OK")


if __name__ == "__main__":
    main(*sys.argv[1:2])
