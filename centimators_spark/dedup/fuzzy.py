"""Fuzzy string join / near-identical entity matching: find pairs of
strings within a small edit distance without the O(n²) cross join —
the entity-resolution step (supplier name reconciliation, user handle
dedup, benchmark-answer matching) the exact/MinHash dedup family
doesn't cover because single-character edits barely move set overlap.

Blocking is the PIGEONHOLE split: a string of length L is cut into
``max_dist + 1`` contiguous segments; any pair within ``max_dist``
SUBSTITUTIONS must agree on at least one aligned segment, so emitting
one (segment_idx, segment_text, length) key per segment and
equi-joining on it finds every substitution-bounded
(length-preserving) pair EXACTLY. The length rides in the key, so
insert/delete matches are deliberately out of scope for this operator
(the full PassJoin shifted-segment scheme trades many more candidate
keys for indel coverage — compose with MinHash-LSH when token-level
edits matter). Verification is the HAMMING distance (positional
mismatch count) as a shared per-character fold — NOT levenshtein,
whose equal-length distance can undercut the mismatch count on
shifted strings ("abc"/"bca" is levenshtein 2 but 3 substitutions),
which would make the result set depend on which shift-pairs happen to
share a segment. With Hamming the output is EXACTLY the set of
equal-length pairs within ``max_dist`` substitutions
(property-tested against brute force), and the DuckDB oracle
(:func:`fuzzy_self_join_oracle_sql`) evaluates the identical fold.

Scale shape: map-side segment-key explode (×(d+1) rows), one
equi-join shuffle on the segment key, distinct candidate pairs, then
the levenshtein filter on candidates only — never all pairs. Segment
keys of low-entropy prefixes (all rows sharing "Customer#…") stay
subquadratic because the LENGTH rides in the key and segments cover
DIFFERENT offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_self_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    max_dist: int = 1,
) -> DataFrame:
    """Pairs (id_a < id_b) of equal-length rows whose ``text_col``
    values are within ``max_dist`` substitutions (exact — see module
    doc; indels out of scope by design). Returns
    (id_a, id_b, text_a, text_b, dist)."""
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    n_seg = max_dist + 1
    base = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("txt")
    ).where(F.col("txt").isNotNull())
    # segment boundaries via SQL substring arithmetic (1-based):
    # seg i of string s with length L: substr(s, floor(i*L/n)+1,
    # floor((i+1)*L/n) - floor(i*L/n))
    segs = []
    for i in range(n_seg):
        start = f"CAST(floor(length(txt) * {i} / {n_seg}) AS INT) + 1"
        stop = f"CAST(floor(length(txt) * {i + 1} / {n_seg}) AS INT)"
        segs.append(
            F.expr(
                f"named_struct('seg_idx', {i}, "
                f"'seg', substring(txt, {start}, ({stop}) - ({start}) + 1))"
            )
        )
    keyed = base.select(
        "id",
        "txt",
        F.length("txt").alias("len"),
        F.explode(F.array(*segs)).alias("sk"),
    ).select(
        "id", "txt", "len",
        F.col("sk.seg_idx").alias("seg_idx"),
        F.col("sk.seg").alias("seg"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.seg_idx") == F.col("b.seg_idx"))
            & (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.len") == F.col("b.len"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.txt").alias("text_a"),
            F.col("b.txt").alias("text_b"),
        )
        .distinct()
    )
    # Hamming via a positional fold (lengths equal by the blocking key)
    dist = F.expr(
        "aggregate(sequence(1, length(text_a)), 0, (acc, i) -> acc + "
        "CASE WHEN substring(text_a, i, 1) <> substring(text_b, i, 1) "
        "THEN 1 ELSE 0 END)"
    ).cast("int")
    return cand.select(
        "id_a", "id_b", "text_a", "text_b", dist.alias("dist")
    ).where(F.col("dist") <= max_dist)


def fuzzy_self_join_oracle_sql(
    table: str,
    text_sql: str,
    id_sql: str,
    *,
    max_dist: int = 1,
) -> str:
    """DuckDB mirror of :func:`fuzzy_self_join` — identical segment
    arithmetic, candidate rule, and Hamming fold."""
    n_seg = max_dist + 1
    seg_rows = []
    for i in range(n_seg):
        start = f"CAST(floor(length(txt) * {i} / {n_seg}) AS INT) + 1"
        stop = f"CAST(floor(length(txt) * {i + 1} / {n_seg}) AS INT)"
        seg_rows.append(
            f"SELECT id, txt, length(txt) AS len, {i} AS seg_idx, "
            f"substring(txt, {start}, ({stop}) - ({start}) + 1) AS seg "
            f"FROM base"
        )
    union = " UNION ALL ".join(seg_rows)
    return f"""
        WITH base AS (
          SELECT {id_sql} AS id, {text_sql} AS txt FROM {table}
          WHERE {text_sql} IS NOT NULL
        ), keyed AS ({union}), cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                 a.txt AS text_a, b.txt AS text_b
          FROM keyed a JOIN keyed b
            ON a.seg_idx = b.seg_idx AND a.seg = b.seg
           AND a.len = b.len AND a.id < b.id
        )
        SELECT id_a, id_b, text_a, text_b,
               CAST(list_reduce(list_transform(
                      range(1, length(text_a) + 1),
                      i -> CASE WHEN substring(text_a, i, 1)
                                  <> substring(text_b, i, 1)
                           THEN 1 ELSE 0 END),
                    (x, y) -> x + y) AS INTEGER) AS dist
        FROM cand
        WHERE list_reduce(list_transform(
                range(1, length(text_a) + 1),
                i -> CASE WHEN substring(text_a, i, 1)
                            <> substring(text_b, i, 1)
                     THEN 1 ELSE 0 END),
              (x, y) -> x + y) <= {max_dist}
    """
