"""Vectorized (Arrow/numpy) implementations of the portable hash
primitives for the hot paths.

The expression versions in text/portable.py are the semantic reference
(and what the DuckDB oracle mirrors), but per-element md5 through
interpreted HOF lambdas is ~50x slower than hashing the exploded gram
column once and doing the permutation arithmetic in numpy. Both paths
produce IDENTICAL values: int(md5_hex[:15], 16) == conv(substring(
md5(x),1,15),16,10), and the int64 permutation arithmetic cannot
overflow (a, h < 2^31 → a·h < 2^62).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

import re

from centimators_spark.text.portable import (
    MERSENNE31,
    NUM_PERM,
    PERM_A,
    PERM_B,
)

_A = np.array(PERM_A, dtype=np.int64)[:, None]
_B = np.array(PERM_B, dtype=np.int64)[:, None]

_WS = re.compile(" +")


def _md5_60(g: str) -> int:
    return int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)


def _py_grams(text: str, n: int) -> list[str]:
    """Python mirror of portable.tokens + token_ngrams (ASCII-equivalent
    lower/split semantics; produces the same distinct gram SET)."""
    toks = [t for t in _WS.split(text.lower()) if t]
    if len(toks) < n:
        return []
    return list(dict.fromkeys(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)))


def gram_frame(df: DataFrame, content_col: str, id_col: str, n: int) -> DataFrame:
    """(doc_id, grams) for docs with ≥ 1 distinct token n-gram.

    Tokenization runs in an Arrow-batched Python UDF: the expression
    equivalent re-evaluates the token array at every element_at site
    (and again in pushed-down filters), which is quadratic per doc;
    here each doc is shingled exactly once."""
    schema = StructType(
        [
            StructField("doc_id", df.schema[id_col].dataType),
            StructField("grams", ArrayType(StringType())),
        ]
    )
    narrow = df.select(F.col(id_col).alias("doc_id"), F.col(content_col).alias("__text"))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            grams = [_py_grams(t, n) for t in pdf["__text"]]
            out = pd.DataFrame({"doc_id": pdf["doc_id"], "grams": grams})
            yield out[[len(g) > 0 for g in grams]]

    return narrow.mapInPandas(compute, schema)


def minhash_signatures_udf(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(doc_id, grams, sig: array<long>[NUM_PERM]) via Arrow-batched numpy."""
    grams = gram_frame(df, content_col, id_col, n)
    out_schema = StructType(
        [
            grams.schema["doc_id"],
            StructField("grams", ArrayType(StringType())),
            StructField("sig", ArrayType(LongType())),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}
        for pdf in batches:
            sigs = []
            for gs in pdf["grams"]:
                hs = np.array(
                    [
                        cache.get(g) or cache.setdefault(g, _md5_60(g) % MERSENNE31)
                        for g in gs
                    ],
                    dtype=np.int64,
                )
                sigs.append(((_A * hs[None, :] + _B) % MERSENNE31).min(axis=1))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "grams": pdf["grams"], "sig": sigs}
            )

    return grams.mapInPandas(compute, out_schema)


def gram_hash_extrema_udf(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(doc_id, n_grams, fp_min1, fp_min2): two smallest 60-bit gram
    hashes — vectorized winnowing fingerprint."""
    grams = gram_frame(df, content_col, id_col, n)
    out_schema = StructType(
        [
            grams.schema["doc_id"],
            StructField("n_grams", LongType()),
            StructField("fp_min1", LongType()),
            StructField("fp_min2", LongType()),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}
        for pdf in batches:
            n_grams, m1, m2 = [], [], []
            for gs in pdf["grams"]:
                hs = sorted(
                    cache.get(g) or cache.setdefault(g, _md5_60(g)) for g in gs
                )
                n_grams.append(len(hs))
                m1.append(hs[0])
                m2.append(hs[1] if len(hs) > 1 else None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_grams": n_grams,
                    "fp_min1": m1,
                    "fp_min2": pd.array(m2, dtype="Int64"),
                }
            )

    return grams.mapInPandas(compute, out_schema)
