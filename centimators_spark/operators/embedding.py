"""EmbeddingTransformer — embed text/categorical columns into dense
vectors, expanded to ``{feature}_embed_{i}`` columns.

Reference semantics (/root/reference/src/centimators/feature_transformers/
embedding.py:20-231):
- values stringified; optional per-column template via
  ``categorical_mapping`` (e.g. {"sector": "Company sector: {}"})
- non-null values embedded in batches (default 200); nulls → zero
  vectors (float32)
- output columns ``{f}_embed_{i}``; dims inferred from the embedder
- all-null column with unknown dim → ValueError

Spark design: the embedder runs INSIDE ``mapInPandas`` workers (lazily
constructed once per worker from a spec, then reused across Arrow
batches; per-worker memo cache ≈ the reference's response caching).
``fit`` probes one non-null value per feature on the driver to learn
embedding dims so the output schema is static. Batch size maps to
chunking within each Arrow batch.

Embedder spec: a picklable ``Callable[[list[str]], ndarray]`` — or a
model-name string, which requires the optional ``dspy`` package on the
workers (import-gated; this container does not ship it).

Scale: pure map-side — zero shuffles; embedding throughput scales with
executors; Arrow moves only the needed columns (the transformer narrows
to keep_cols + features before the UDF).
"""

from __future__ import annotations

from typing import Callable, Iterator, Mapping, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType


def make_dspy_embedder(model: str, batch_size: int, caching: bool):
    """Build a DSPy embedder callable (requires the dspy package)."""
    try:
        import dspy  # type: ignore
    except ImportError as e:  # pragma: no cover - dspy not in container
        raise ImportError(
            "EmbeddingTransformer(model=...) requires the 'dspy' package on "
            "executors; pass a picklable `embedder` callable instead"
        ) from e
    emb = dspy.Embedder(model=model, batch_size=batch_size, caching=caching)
    return lambda texts: np.asarray(emb(texts), dtype=np.float32)


class EmbeddingTransformer:
    def __init__(
        self,
        model: str | None = None,
        feature_names: Sequence[str] | None = None,
        categorical_mapping: Mapping[str, str] | None = None,
        batch_size: int = 200,
        caching: bool = True,
        *,
        embedder: Callable[[list[str]], np.ndarray] | None = None,
        keep_cols: Sequence[str] | None = None,
        expand: bool = True,
    ):
        if model is None and embedder is None:
            raise ValueError("provide either model= (dspy) or embedder= (callable)")
        self.model = model
        self.feature_names = list(feature_names) if feature_names else None
        self.categorical_mapping = dict(categorical_mapping or {})
        self.batch_size = batch_size
        self.caching = caching
        self.embedder = embedder
        self.keep_cols = list(keep_cols) if keep_cols else []
        self.expand = expand
        self._embedding_dims: dict[str, int] = {}

    # -- embedder construction (worker-side, lazy)
    def _make_embedder(self):
        if self.embedder is not None:
            return self.embedder
        return make_dspy_embedder(self.model, self.batch_size, self.caching)

    def _render(self, feature: str, values: pd.Series) -> list[str | None]:
        template = self.categorical_mapping.get(feature)
        out = []
        for v in values:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                out.append(None)
            elif template is not None:
                out.append(template.format(v))
            else:
                out.append(str(v))
        return out

    def fit(self, df: DataFrame, y=None):
        feats = self.feature_names or [
            c for c in df.columns if c not in self.keep_cols
        ]
        self.feature_names = feats
        # probe one non-null value per feature to learn dims (driver-side)
        probes = df.select(
            *[F.first(F.col(c), ignorenulls=True).alias(c) for c in feats]
        ).collect()[0]
        emb = self._make_embedder()
        for c in feats:
            v = probes[c]
            if v is None:
                raise ValueError(
                    f"Cannot determine embedding dimension for '{c}' - "
                    f"all values are null. Ensure at least one non-null value exists."
                )
            rendered = self._render(c, pd.Series([v]))
            self._embedding_dims[c] = int(np.asarray(emb(rendered)).shape[1])
        return self

    def get_feature_names_out(self) -> list[str]:
        if not self._embedding_dims:
            raise ValueError("call fit() first to infer embedding dimensions")
        return [
            f"{c}_embed_{i}"
            for c in self.feature_names
            for i in range(self._embedding_dims[c])
        ]

    def transform(self, df: DataFrame) -> DataFrame:
        if not self._embedding_dims:
            raise ValueError("Transformer not fitted. Call fit() first.")
        feats = self.feature_names
        dims = dict(self._embedding_dims)
        keep = self.keep_cols
        batch_size = self.batch_size
        caching = self.caching
        render = self._render
        make_embedder = self._make_embedder

        narrow = df.select(*keep, *feats)
        fields = [narrow.schema[c] for c in keep]
        fields += [
            StructField(f"{c}__embed", ArrayType(FloatType())) for c in feats
        ]
        schema = StructType(fields)

        def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            emb = make_embedder()  # once per worker task
            cache: dict[str, np.ndarray] = {}
            for pdf in batches:
                out = {c: pdf[c] for c in keep}
                for c in feats:
                    rendered = render(c, pdf[c])
                    vecs = np.zeros((len(rendered), dims[c]), dtype=np.float32)
                    todo = [
                        (i, t)
                        for i, t in enumerate(rendered)
                        if t is not None and (not caching or t not in cache)
                    ]
                    for s in range(0, len(todo), batch_size):
                        chunk = todo[s : s + batch_size]
                        got = np.asarray(emb([t for _, t in chunk]), dtype=np.float32)
                        for (i, t), v in zip(chunk, got):
                            if caching:
                                cache[t] = v
                            vecs[i] = v
                    if caching:
                        for i, t in enumerate(rendered):
                            if t is not None:
                                vecs[i] = cache[t]
                    out[f"{c}__embed"] = list(vecs)
                yield pd.DataFrame(out)

        arrays = narrow.mapInPandas(compute, schema)
        if not self.expand:
            return arrays
        cols = [F.col(c) for c in keep]
        for c in feats:
            cols += [
                F.get(F.col(f"{c}__embed"), i).alias(f"{c}_embed_{i}")
                for i in range(dims[c])
            ]
        return arrays.select(*cols)

    def fit_transform(self, df: DataFrame, y=None) -> DataFrame:
        return self.fit(df).transform(df)
