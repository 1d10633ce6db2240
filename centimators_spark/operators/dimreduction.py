"""DimReducer — PCA / t-SNE / UMAP behind one API.

Reference (/root/reference/src/centimators/feature_transformers/
dimreduction.py:11-164): fit-then-transform for PCA/UMAP; t-SNE refits
on every transform; outputs ``dim_0..dim_{k-1}``.

Spark design:
- method='pca': fully distributed via pyspark.ml.feature.PCA
  (VectorAssembler → PCAModel); exact, scales to the full table. The
  covariance/SVD work is driver-side O(d²) but data passes are
  distributed — the correct shape at 100 TB for d up to a few thousand.
- method='tsne'/'umap': inherently non-distributed algorithms; gated on
  their optional packages (not in this container) and executed on
  driver-collected data with an explicit row cap — documented scale
  limit, mirroring the reference's in-memory behavior.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DimReducer:
    def __init__(
        self,
        method: str = "pca",
        n_components: int = 2,
        feature_names: Sequence[str] | None = None,
        *,
        keep_cols: Sequence[str] | None = None,
        driver_row_cap: int = 100_000,
        **kwargs,
    ):
        if method not in ("pca", "tsne", "umap"):
            raise ValueError(f"method must be pca|tsne|umap, got {method}")
        self.method = method
        self.n_components = n_components
        self.feature_names = list(feature_names) if feature_names else None
        self.keep_cols = list(keep_cols) if keep_cols else []
        self.driver_row_cap = driver_row_cap
        self.kwargs = kwargs
        self._model = None

    def get_feature_names_out(self) -> list[str]:
        return [f"dim_{i}" for i in range(self.n_components)]

    def _features(self, df: DataFrame) -> list[str]:
        return self.feature_names or [
            c for c in df.columns if c not in self.keep_cols
        ]

    def fit(self, df: DataFrame, y=None):
        feats = self._features(df)
        self.feature_names = feats
        if self.method == "pca":
            from pyspark.ml.feature import PCA, VectorAssembler

            assembler = VectorAssembler(inputCols=feats, outputCol="__features")
            pca = PCA(
                k=self.n_components, inputCol="__features", outputCol="__pca"
            )
            self._model = pca.fit(assembler.transform(df.select(*feats)))
            self._assembler = assembler
        elif self.method == "tsne":
            pass  # t-SNE refits on every transform (reference :143-147)
        else:  # umap
            self._umap_df = None  # fitted lazily in transform (needs data)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        feats = self._features(df)
        if self.method == "pca":
            if self._model is None:
                raise ValueError("DimReducer not fitted. Call fit() first.")
            from pyspark.ml.functions import vector_to_array
            from pyspark.ml.feature import VectorAssembler

            assembler = VectorAssembler(inputCols=feats, outputCol="__features")
            out = self._model.transform(
                assembler.transform(df.select(*self.keep_cols, *feats))
            )
            arr = vector_to_array(F.col("__pca"))
            return out.select(
                *self.keep_cols,
                *[arr[i].alias(f"dim_{i}") for i in range(self.n_components)],
            )
        return self._driver_side_transform(df, feats)

    def _driver_side_transform(self, df: DataFrame, feats: list[str]) -> DataFrame:
        """t-SNE / UMAP: driver-collected with an explicit cap (these
        algorithms are not distributable; documented scale limit)."""
        if self.method == "tsne":
            try:
                from sklearn.manifold import TSNE  # type: ignore
            except ImportError as e:
                raise ImportError(
                    "DimReducer(method='tsne') requires scikit-learn, which "
                    "is not installed in this environment"
                ) from e
            reducer = TSNE(n_components=self.n_components, **self.kwargs)
        else:
            try:
                import umap  # type: ignore
            except ImportError as e:
                raise ImportError(
                    "DimReducer(method='umap') requires umap-learn, which "
                    "is not installed in this environment"
                ) from e
            reducer = umap.UMAP(n_components=self.n_components, **self.kwargs)

        pdf = df.select(*self.keep_cols, *feats).limit(self.driver_row_cap).toPandas()
        emb = reducer.fit_transform(pdf[feats].to_numpy())
        for i in range(self.n_components):
            pdf[f"dim_{i}"] = emb[:, i]
        spark = df.sparkSession
        return spark.createDataFrame(
            pdf[self.keep_cols + [f"dim_{i}" for i in range(self.n_components)]]
        )

    def fit_transform(self, df: DataFrame, y=None) -> DataFrame:
        return self.fit(df).transform(df)
