"""Bloom-pruned semi-join — the runtime-filter technique for
fact ⋈ selective-dim joins when the dim side is too large to broadcast
but its FILTER is not.

Spark's own runtime row-level filtering (bloom_filter_agg /
might_contain) is optimizer-internal and not user-invocable, so the
engine carries an explicit BLOCKED Bloom filter (Putze et al., the
cache-line design Impala/Kudu use) built from pure expressions:

- each key hashes to ONE 64-bit word index and a ``k``-bit pattern
  inside that word (k independent xxhash64 seeds → bit positions);
- BUILD is one grouped aggregation over the dim keys:
  ``groupBy(word).agg(bit_or(pattern))`` — output ≤ min(n_words,
  n_distinct_keys) rows of (word, mask), 16 bytes each;
- PROBE is a broadcast join of the fact side on word index plus two
  bitwise ops: ``mask & pattern == pattern`` — whole-stage codegen,
  no UDF, no shuffle of the fact side.

No false negatives by construction (a present key's bits are all set
in its word), so `bloom_semi_join` composes the bloom prune with an
exact leftsemi join on the SURVIVORS: the result is row-identical to
the plain semi-join, but the exact join's shuffle only ever sees the
bloom survivors (fpp + selectivity of the fact). At 100 TB: a 1e9-key
dim at 10 bits/key is a ~1.2 GB word table — broadcastable where the
dim itself (with payload columns) is not; the fact side is pruned at
scan+filter time before any exchange.

False-positive rate: with one word per key and k bits in 64, fpp is
slightly above the ideal-Bloom rate at the same bits/key (the blocked
trade); at the default 10 bits/key + k=4 it is ≲2% — plenty for a
pre-shuffle prune whose survivors are exact-verified anyway.

No reference counterpart — SURVEY.md §2.2 join-taxonomy extension
beside rangejoin.py and skew.py.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_INTEGRAL = ("tinyint", "smallint", "int", "bigint")


def _norm_type(dtype: str) -> str:
    """Canonical hash-input type for a key dtype: xxhash64 hashes the
    PHYSICAL type, so IntegerType(5) and LongType(5) produce different
    hashes — a silent empty-result bug when fact and dim key types
    differ. Integral types normalize to bigint, floats to double,
    everything else hashes as-is."""
    if dtype in _INTEGRAL:
        return "bigint"
    if dtype in ("float", "double"):
        return "double"
    return dtype


def _norm_key(df: DataFrame, key_col: str) -> Column:
    dtype = dict(df.dtypes)[key_col]
    target = _norm_type(dtype)
    c = F.col(key_col)
    return c.cast(target) if target != dtype else c


def _pattern(key: Column, k: int) -> Column:
    """k-bit within-word pattern: OR of k single-bit longs, positions
    from independent xxhash64 seeds."""
    # F.shiftleft only accepts a literal int shift; call_function takes
    # a Column shift amount
    bits = [
        F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            F.pmod(F.xxhash64(key, F.lit(1000 + i)), F.lit(64)).cast("int"),
        )
        for i in range(k)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def bloom_build(
    dim: DataFrame,
    key_col: str,
    *,
    bits_per_key: int = 10,
    k: int = 4,
    n_keys: int | None = None,
) -> tuple[DataFrame, int]:
    """Build the blocked-Bloom word table over ``dim``'s distinct keys.

    Returns (words_df(word, mask), n_words). ``n_keys`` skips the
    sizing count when the caller already knows the key cardinality."""
    keys = dim.select(_norm_key(dim, key_col).alias("__k")).distinct()
    n = int(n_keys) if n_keys is not None else keys.count()
    n_words = max(1, math.ceil(max(n, 1) * bits_per_key / 64))
    kc = F.col("__k")
    words = keys.groupBy(
        F.pmod(F.xxhash64(kc, F.lit(0)), F.lit(n_words)).alias("word")
    ).agg(F.bit_or(_pattern(kc, k)).alias("mask"))
    return words, n_words


def bloom_prune(
    fact: DataFrame,
    words: DataFrame,
    n_words: int,
    key_col: str,
    *,
    k: int = 4,
) -> DataFrame:
    """Keep only fact rows whose key MIGHT be in the built filter
    (no false negatives; ~fpp false positives). Broadcast join on the
    word index + two bitwise ops — the fact side never shuffles. The
    key is normalized to the same canonical hash type the build side
    used, so an int fact key probes a long-built filter correctly."""
    kc = _norm_key(fact, key_col)
    pat = _pattern(kc, k)
    probed = fact.join(
        F.broadcast(words),
        F.pmod(F.xxhash64(kc, F.lit(0)), F.lit(n_words)) == F.col("word"),
        "left",
    )
    return (
        probed.where(
            F.col("mask").isNotNull()
            & (F.col("mask").bitwiseAND(pat) == pat)
        )
        .drop("word", "mask")
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    bits_per_key: int = 10,
    k: int = 4,
    dim_key: str | None = None,
) -> DataFrame:
    """Semi-join ``fact`` to ``dim``'s keys with a Bloom pre-prune:
    row-identical to ``fact.join(dim_keys, on, 'leftsemi')`` (the bloom
    has no false negatives; the exact leftsemi removes its false
    positives), but the exact join only processes bloom survivors.

    ``dim_key`` names the dim-side column when it differs from the
    fact-side ``on``. Integral/float key types may differ between the
    sides (both normalize to the same canonical hash type); any other
    cross-type pairing fails loudly rather than silently matching
    nothing."""
    dk = dim_key or on
    f_t = _norm_type(dict(fact.dtypes)[on])
    d_t = _norm_type(dict(dim.dtypes)[dk])
    if f_t != d_t:
        raise TypeError(
            f"bloom_semi_join key type mismatch: fact[{on}] normalizes "
            f"to {f_t} but dim[{dk}] to {d_t}; cast one side explicitly"
        )
    # dim keys cast to the fact's key dtype so the exact leftsemi join
    # below compares like types (Spark would coerce anyway; explicit
    # keeps the equality semantics identical to the bloom hash domain)
    keys = dim.select(F.col(dk).cast(f_t).alias(on)).distinct()
    words, n_words = bloom_build(keys, on, bits_per_key=bits_per_key, k=k)
    pruned = bloom_prune(fact, words, n_words, on, k=k)
    return pruned.join(keys, on, "leftsemi")
