"""The engine's user-extension surfaces — one working, tested example
of each, with its native-first twin:

- scalar **pandas UDF** (Arrow-vectorized): `norm_ppf_udf` — Φ⁻¹,
  the kernel the reference calls per era (neutralization.py:213),
  scipy-backed when available with the engine's numpy AS241 fallback;
  the hot path uses the AS241 SQL expression
  (`functions/normal.norm_ppf_sql`) instead, and the test pins the
  two within float tolerance.
- grouped-aggregate **pandas UDF** (UDAF): `weighted_mean_udaf` — the
  numpy reduction shape; the native twin is `sum(v*w)/sum(w)`.
- Python **UDTF** (table function): `ParseProps` — explode a JSON
  props string into (key, value) rows with custom per-row logic; the
  native twin is `explode(from_json(..., 'map<string,string>'))`.

Rule of thumb the examples encode: if the native twin exists, USE IT —
it is whole-stage-codegen and shuffle-planner visible; reach for the
UDF surface only for logic Spark expressions cannot express (scipy
special functions, trained-model scoring, imperative parsers). When
you must, these are the right shapes: Arrow-batched, vectorized
inside, never row-at-a-time Python in a hot loop.

Reference scope: the reference's extension point is "any
sklearn-compatible transformer" (SURVEY.md §2.2); these are the Spark
equivalents users plug custom logic into.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def norm_ppf_udf():
    """Scalar pandas UDF: Φ⁻¹ (Arrow-batched, numpy-vectorized AS241 —
    scipy's norm.ppf when scipy is installed on executors). Prefer the
    pure-expression form (`functions.normal.norm_ppf_sql`, codegen) in
    hot paths; this shape exists for kernels that genuinely need a
    Python numeric library."""
    import pandas as pd

    @F.pandas_udf(DoubleType())
    def _ppf(p):
        try:
            from scipy.stats import norm

            vals = norm.ppf(p.to_numpy(dtype="float64"))
        except ImportError:
            from centimators_spark.functions.normal import norm_ppf

            vals = norm_ppf(p.to_numpy(dtype="float64"))
        return pd.Series(vals)

    return _ppf


def weighted_mean_udaf():
    """Grouped-aggregate pandas UDF (UDAF): weighted mean. Native twin
    `sum(v * w) / sum(w)` is partial-aggregatable (map-side combine);
    the UDAF materializes each group's columns in one executor — use
    only when the reduction has no expression form."""
    import pandas as pd

    @F.pandas_udf(DoubleType(), F.PandasUDFType.GROUPED_AGG)
    def _wm(v, w):
        import numpy as np

        wv = w.to_numpy(dtype="float64")
        tot = wv.sum()
        return float(np.dot(v.to_numpy(dtype="float64"), wv) / tot) if tot else float("nan")

    return _wm


def parse_props_udtf():
    """Python UDTF: explode a JSON-ish props string into (key, value)
    rows. Native twin: ``explode(from_json(col, 'map<string,string>'))``
    — always prefer it for plain JSON; the UDTF shape is for parsers
    with real imperative logic (recovery, multi-format sniffing)."""
    import json

    from pyspark.sql.functions import udtf

    @udtf(returnType="key: string, value: string")
    class ParseProps:
        def eval(self, props: str):
            if props is None:
                return
            try:
                obj = json.loads(props)
            except (ValueError, TypeError):
                return
            if isinstance(obj, dict):
                for k, v in obj.items():
                    yield str(k), None if v is None else str(v)

    return ParseProps


def props_kv_native(df: DataFrame, props_col: str = "props") -> DataFrame:
    """The native twin of ParseProps for well-formed JSON objects."""
    m = F.from_json(F.col(props_col), "map<string,string>")
    return df.select(F.explode(m).alias("key", "value"))
