"""Skew-mitigating salted equi-join for large⋈large joins with hot
keys.

A hash join shuffles both sides on the key; one pathological key (the
null user, the default account, the crawler bot) lands its entire
volume on one task and the stage runs at the speed of that straggler.
AQE's skew-join split (``spark.sql.adaptive.skewJoin``) handles this
at runtime for sort-merge joins — prefer it when available. Explicit
salting remains the right tool when AQE can't see the skew (streaming
joins, skew inside a single key-group aggregation, engines with AQE
off) or when the split factor must be deterministic.

The transform: the LEFT (large, skewed) side gets a deterministic salt
in [0, n_salts) derived from sibling-column entropy; the RIGHT side is
replicated n_salts times. Joining on (key, salt) splits each hot key
across n_salts tasks. The result multiset is IDENTICAL to the plain
join — every left row meets exactly the one right replica carrying its
salt. Cost: right side shuffles ×n_salts (keep the replicated side the
smaller of the two).

No reference counterpart — SURVEY.md §2.2 join-taxonomy extension; the
100 TB design notes in ARCHITECTURE.md motivate it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` and ``right`` on ``on`` with the hot-key salt
    split. Output columns = left ∪ (right − keys), like a plain
    ``DataFrame.join(..., on)``; row multiset identical to the plain
    join (deterministic — the salt is a pure function of each left
    row's content, not ``rand()``, so retries and re-runs agree).

    how: 'inner' or 'left' ('right'/'outer' would need the salt on the
    other side; replicate the left instead and swap the arguments).
    """
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    # salt from the WHOLE left row: deterministic, and uniform even
    # when the non-key columns are few (xxhash64 mixes well); a hot key
    # spreads because its rows differ in payload
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l = left.withColumn("__salt", salt)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = l.join(r, keys + ["__salt"], how)
    return out.drop("__salt")
