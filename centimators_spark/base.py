"""Base transformer for the engine.

API adaptation from the reference (SURVEY.md §1.1): the reference passes
group/order metadata as out-of-band Series (`date_series=`,
`ticker_series=`) aligned by row position. Spark DataFrames have no row
position, so group/order columns travel *inside* the DataFrame and are
named by constructor params (`group_col`, `order_cols`). This is the one
deliberate API divergence; everything else (naming rules, null/NaN rules,
tie semantics) mirrors the reference exactly
(/root/reference/src/centimators/feature_transformers/base.py:26-68).

Output modes:
- ``replace`` (reference parity, base.py `.select(exprs)` semantics):
  output = passthrough key columns + derived columns only.
- ``append``: input columns + derived columns (idiomatic for pipelines —
  downstream stages still see group/order cols).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.ml import Transformer
from pyspark.sql import Column, DataFrame


class PanelTransformer(Transformer):
    """Common machinery: feature-name inference, output-mode projection.

    Subclasses implement `_derived_columns(df) -> list[Column]` (each
    aliased per the reference naming rules) and
    `get_feature_names_out() -> list[str]`.
    """

    def __init__(
        self,
        feature_names: Sequence[str] | None = None,
        *,
        output_mode: str = "append",
        keep_cols: Sequence[str] | None = None,
    ):
        super().__init__()
        if output_mode not in ("append", "replace"):
            raise ValueError(f"output_mode must be append|replace, got {output_mode}")
        self.feature_names = list(feature_names) if feature_names else None
        self.output_mode = output_mode
        self.keep_cols = list(keep_cols) if keep_cols else []

    # -- reference parity: fit infers feature_names from X columns
    # (/root/reference/src/centimators/feature_transformers/base.py:57-62)
    def _resolve_features(self, df: DataFrame) -> list[str]:
        if self.feature_names:
            return self.feature_names
        excluded = set(self.keep_cols) | set(self._metadata_cols())
        return [c for c in df.columns if c not in excluded]

    def _metadata_cols(self) -> list[str]:
        """Group/order columns a subclass uses; excluded from inference."""
        return []

    def _derived_columns(self, df: DataFrame) -> list[Column]:
        raise NotImplementedError

    def _transform(self, df: DataFrame) -> DataFrame:
        derived = self._derived_columns(df)
        if self.output_mode == "append":
            return df.select("*", *derived)
        # reference parity: `.select(exprs)` drops inputs incl. group cols;
        # only explicitly requested keep_cols ride along
        return df.select(*self.keep_cols, *derived)

    # -- sklearn metadata-routing migration shim -------------------------
    # The reference wires group metadata through sklearn's routing:
    #   t.set_transform_request(ticker_series=True)
    #   pipe.fit_transform(X, ticker_series=df["ticker"])
    # (/root/reference/README.md:131-161). Here the same information is a
    # column NAME param; these shims accept the reference's spellings so
    # ported code runs with a one-word change (pass the column name where
    # the Series went).
    # maps the reference's routed-series kwarg to the attribute holding
    # the column list/name on this engine's transformers
    _SERIES_TO_PARAM = {
        "date_series": "group_cols",
        "ticker_series": "ticker_cols",
        "era_series": "era_col",
    }

    def set_transform_request(self, **kwargs):
        """Accept sklearn-routing declarations (``ticker_series=True``)
        as a no-op: Spark transformers already know their group columns
        by name. Unknown keys raise, mirroring sklearn's strictness."""
        for key in kwargs:
            if key not in self._SERIES_TO_PARAM:
                raise TypeError(
                    f"Unexpected metadata request {key!r}; supported: "
                    f"{sorted(self._SERIES_TO_PARAM)}"
                )
        return self

    set_fit_request = set_transform_request

    def _apply_series_kwargs(self, kwargs: dict) -> None:
        for key, value in kwargs.items():
            param = self._SERIES_TO_PARAM.get(key)
            if param is None:
                raise TypeError(f"Unexpected transform kwarg {key!r}")
            if not isinstance(value, str):
                raise TypeError(
                    f"{key} must be a COLUMN NAME string in the Spark "
                    f"engine (got {type(value).__name__}): group/order "
                    "metadata travels inside the DataFrame, not as a "
                    "positionally-aligned Series (SURVEY.md §1.1)."
                )
            if not hasattr(self, param):
                raise TypeError(
                    f"{type(self).__name__} takes no {key}; it has no "
                    f"{param!r} parameter"
                )
            current = getattr(self, param)
            setattr(self, param, [value] if isinstance(current, list) else value)

    def transform(self, df: DataFrame, params=None, **series_kwargs) -> DataFrame:
        if series_kwargs:
            self._apply_series_kwargs(series_kwargs)
        return super().transform(df, params) if params else super().transform(df)

    # sklearn-style conveniences
    def fit(self, df: DataFrame, **_kwargs):  # stateless: fit is a no-op
        return self

    def fit_transform(self, df: DataFrame, **kwargs) -> DataFrame:
        return self.transform(df, **kwargs)

    def get_feature_names_out(self) -> list[str]:
        raise NotImplementedError


def melt_panel(
    df,
    id_cols,
    value_cols,
    *,
    var_name: str = "feature",
    value_name: str = "value",
):
    """Wide→long reshape (pandas melt / SQL UNPIVOT): one row per
    (id, feature) with the feature NAME as data — the storage/serving
    layout for wide panel frames (a 5000-feature frame becomes a long
    skinny table that partitions and prunes by feature).

    Spark's built-in ``unpivot`` plans this as a single Expand node —
    map-side only, zero shuffle, |value_cols|× row fan-out. Values are
    cast to a common type by unpivot's contract (pass numeric columns
    of one family, or cast first)."""
    return df.unpivot(
        [c for c in ([id_cols] if isinstance(id_cols, str) else list(id_cols))],
        [c for c in ([value_cols] if isinstance(value_cols, str) else list(value_cols))],
        var_name,
        value_name,
    )
