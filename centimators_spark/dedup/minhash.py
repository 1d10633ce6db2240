"""MinHash + LSH banding near-duplicate detection (the scale path).

Pipeline: shingle → 64-perm MinHash signature → 32 bands × 2 rows →
band-bucket self-join → exact Jaccard verification of candidates.

Why not pyspark.ml.feature.MinHashLSH: its hash coefficients are not
reproducible cross-engine; our permutations are fixed seeded constants
(text/portable.py) shared with the DuckDB oracle, and the final output
is EXACT (candidates are verified with true Jaccard), so LSH recall is
the only approximation. With b=32, r=2 the miss probability for a pair
at Jaccard 0.6 is (1−0.6²)³² ≈ 6e-7 — effectively exact at our
thresholds, while candidate generation stays subquadratic.

Scale: signatures are O(grams × perms) JVM expression work, no shuffle;
the band join shuffles (band_id, band_sig) — 32 small rows per doc
instead of one row per gram; skew only if thousands of docs share a
band signature (true near-dup clusters — exactly the rows we must
join anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centimators_spark.text.portable import LSH_BANDS, LSH_ROWS
from centimators_spark.text.hashing_udf import minhash_signatures_udf as minhash_signatures


def minhash_lsh_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Near-dup pairs (d1, d2, jaccard ≥ threshold) via LSH candidates +
    exact Jaccard verification."""
    # both the banding branch and the exact-verify branch consume the
    # signatures; materialize once instead of running the shingle+hash
    # UDF twice (at scale: persist/write the signature table)
    sigs = minhash_signatures(df, content_col, id_col, n).localCheckpoint(eager=True)
    cand = minhash_band_candidates(sigs)
    # exact verification of the (small) candidate set: same
    # count-based Jaccard as dedup/jaccard.py — bit-exact integer ratio
    g = sigs.select("doc_id", "grams")
    jac = (
        F.size(F.array_intersect("g1", "g2")).cast("double")
        / F.size(F.array_union("g1", "g2"))
    )
    return (
        cand.join(g.select(F.col("doc_id").alias("d1"), F.col("grams").alias("g1")), "d1")
        .join(g.select(F.col("doc_id").alias("d2"), F.col("grams").alias("g2")), "d2")
        .select("d1", "d2", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_band_candidates(sigs: DataFrame) -> DataFrame:
    """The pre-verification LSH candidate pair set (d1 < d2) from a
    signature table (doc_id, sig) — docs sharing ANY of the
    LSH_BANDS band signatures. Factored out of
    :func:`minhash_lsh_pairs` so blocking-quality metrics can measure
    the candidate set itself (reduction ratio / pairs completeness)
    against exact ground truth."""
    band_cols = [
        F.concat_ws(
            "-", *[F.get(F.col("sig"), b * LSH_ROWS + r) for r in range(LSH_ROWS)]
        ).alias(f"band_{b}")
        for b in range(LSH_BANDS)
    ]
    banded = sigs.select("doc_id", *band_cols)
    bands = banded.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"), F.col(f"band_{b}").alias("band_sig")
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_sig")

    return (
        bands.alias("a")
        .join(bands.alias("b"), ["band_id", "band_sig"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
