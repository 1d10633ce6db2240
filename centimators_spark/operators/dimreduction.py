"""DimReducer — PCA / t-SNE / UMAP behind one API.

Reference (/root/reference/src/centimators/feature_transformers/
dimreduction.py:11-164): PCA and UMAP are fit-then-transform
(`:95-123`); t-SNE skips fit and refits on every transform
(`:117-119,143-147`); outputs ``dim_0..dim_{k-1}``.

Spark design, per method:
- **pca**: fully distributed via pyspark.ml.feature.PCA
  (VectorAssembler → PCAModel); exact, scales to the full table. The
  covariance/SVD work is driver-side O(d²) but data passes are
  distributed — the correct shape at 100 TB for d up to a few thousand.
- **umap**: fit on a driver-collected row-capped sample (UMAP training
  is inherently single-machine), then **distributed transform** — the
  fitted reducer is closed over into a ``mapInPandas`` task and applied
  per Arrow batch, so scoring scales with the cluster even though
  fitting does not. Import-gated (umap-learn is not in this container).
- **tsne**: no transform method exists for t-SNE; mirrors the
  reference by running ``fit_transform`` on a driver-collected capped
  sample every call. Documented scale limit; use pca/umap beyond it.
  Import-gated (scikit-learn is not in this container).
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType


def _make_tsne(n_components: int, kwargs: dict):
    try:
        from sklearn.manifold import TSNE  # type: ignore
    except ImportError as e:
        raise ImportError(
            "DimReducer(method='tsne') requires scikit-learn, which is "
            "not installed in this environment"
        ) from e
    return TSNE(n_components=n_components, **kwargs)


def _make_umap(n_components: int, kwargs: dict):
    try:
        import umap  # type: ignore
    except ImportError as e:
        raise ImportError(
            "DimReducer(method='umap') requires umap-learn, which is "
            "not installed in this environment"
        ) from e
    return umap.UMAP(n_components=n_components, **kwargs)


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
        self._reducer = None

    def get_feature_names_out(self) -> list[str]:
        return [f"dim_{i}" for i in range(self.n_components)]

    def _features(self, df: DataFrame) -> list[str]:
        return self.feature_names or [
            c for c in df.columns if c not in self.keep_cols
        ]

    # -- fit --------------------------------------------------------------

    # features at or below this width fit via one plain aggregation
    # (d(d+1)/2 sum expressions) instead of the Spark ML vector path
    EXPR_PCA_MAX_FEATURES = 32

    def fit(self, df: DataFrame, y=None):
        feats = self._features(df)
        self.feature_names = feats
        if self.method == "pca":
            if len(feats) <= self.EXPR_PCA_MAX_FEATURES:
                self._fit_pca_expr(df, feats)
                return self
            from pyspark.ml.feature import PCA, VectorAssembler

            assembler = VectorAssembler(inputCols=feats, outputCol="__features")
            pca = PCA(
                k=self.n_components, inputCol="__features", outputCol="__pca"
            )
            self._model = pca.fit(assembler.transform(df.select(*feats)))
        elif self.method == "umap":
            # UMAP trains single-machine: fit on a capped driver sample,
            # keep the fitted reducer for distributed scoring
            reducer = _make_umap(self.n_components, self.kwargs)
            sample = (
                df.select(*feats).limit(self.driver_row_cap).toPandas()
            )
            reducer.fit(sample[feats].to_numpy())
            self._reducer = reducer
        # tsne: nothing to fit — refits on every transform
        # (reference dimreduction.py:117-119)
        return self

    def _fit_pca_expr(self, df: DataFrame, feats: list[str]) -> None:
        """Covariance PCA from ONE whole-stage-codegen aggregation: n,
        Σfᵢ, Σfᵢfⱼ → covariance (n−1 denominator, matching Spark ML's
        computeCovariance) → driver eigh of a d×d matrix. No vector
        UDFs, no extra passes; the scan aggregates map-side. Projection
        (like Spark ML PCA) applies components to the UNcentered data."""
        import numpy as np

        d = len(feats)
        cols = [F.col(c).cast("double") for c in feats]
        aggs = [F.count(F.lit(1)).alias("n")]
        aggs += [F.sum(cols[i]).alias(f"s_{i}") for i in range(d)]
        aggs += [
            F.sum(cols[i] * cols[j]).alias(f"p_{i}_{j}")
            for i in range(d)
            for j in range(i, d)
        ]
        row = df.agg(*aggs).collect()[0].asDict()
        n = float(row["n"])
        s = np.array([row[f"s_{i}"] for i in range(d)])
        cov = np.zeros((d, d))
        for i in range(d):
            for j in range(i, d):
                cov[i, j] = cov[j, i] = (
                    row[f"p_{i}_{j}"] - s[i] * s[j] / n
                ) / (n - 1.0)
        vals, vecs = np.linalg.eigh(cov)
        order = np.argsort(vals)[::-1][: self.n_components]
        comps = vecs[:, order]  # (d, k)
        # deterministic sign: largest-|loading| element positive
        for k in range(comps.shape[1]):
            if comps[np.abs(comps[:, k]).argmax(), k] < 0:
                comps[:, k] = -comps[:, k]
        self._components = comps
        self._explained_variance = vals[order]
        self._model = "expr"

    # -- transform --------------------------------------------------------

    def transform(self, df: DataFrame) -> DataFrame:
        feats = self._features(df)
        if self.method == "pca":
            if self._model is None:
                raise ValueError("DimReducer not fitted. Call fit() first.")
            if self._model == "expr":
                exprs = []
                for k in range(self.n_components):
                    e = F.lit(0.0)
                    for i, f in enumerate(feats):
                        e = e + F.col(f).cast("double") * F.lit(
                            float(self._components[i, k])
                        )
                    exprs.append(e.alias(f"dim_{k}"))
                return df.select(*self.keep_cols, *exprs)
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
        if self.method == "umap":
            if self._reducer is None:
                raise ValueError("DimReducer not fitted. Call fit() first.")
            return self._distributed_transform(df, feats, self._reducer)
        # t-SNE: driver-side fit_transform per call, capped
        reducer = _make_tsne(self.n_components, self.kwargs)
        pdf = (
            df.select(*self.keep_cols, *feats)
            .limit(self.driver_row_cap)
            .toPandas()
        )
        emb = reducer.fit_transform(pdf[feats].to_numpy())
        for i in range(self.n_components):
            pdf[f"dim_{i}"] = emb[:, i].astype(float)
        return df.sparkSession.createDataFrame(
            pdf[self.keep_cols + self.get_feature_names_out()]
        )

    def _distributed_transform(
        self, df: DataFrame, feats: list[str], reducer
    ) -> DataFrame:
        """Score every row with the fitted reducer, executor-side: the
        reducer ships once per task closure (Spark broadcasts task
        binaries), each Arrow batch is one ``reducer.transform`` call."""
        keep = self.keep_cols
        k = self.n_components
        narrow = df.select(*keep, *feats)
        schema = StructType(
            [narrow.schema[c] for c in keep]
            + [StructField(f"dim_{i}", DoubleType()) for i in range(k)]
        )

        def score(batches: Iterator) -> Iterator:
            for pdf in batches:
                emb = reducer.transform(pdf[feats].to_numpy())
                out = pdf[keep].copy()
                for i in range(k):
                    out[f"dim_{i}"] = emb[:, i].astype(float)
                yield out

        return narrow.mapInPandas(score, schema)

    def fit_transform(self, df: DataFrame, y=None) -> DataFrame:
        return self.fit(df).transform(df)


# -- bit-exact 2-feature PCA twin -----------------------------------------


def pca2_sql_fragments(dp: int = 6) -> dict:
    """Shared SQL text for a bit-exact 2-feature PCA projection — the
    expression twin of DimReducer(method='pca') for d=2 (same pattern as
    the AS241 probit and the era-OLS Cramer fragments: identical text
    evaluated by Spark and DuckDB over exactly-aggregated inputs).

    Inputs are INTEGER-VALUED columns x, y (exact DECIMAL(38,0) sums ⇒
    order-independent); the 2×2 covariance eigen-solve is closed form
    (largest root of the characteristic quadratic, eigenvector
    (b, λ−a)); components are sign-fixed largest-|loading|-positive —
    the same convention as DimReducer._fit_pca_expr. Projection applies
    components to the UNcentered data (Spark ML PCA semantics)."""
    nd = "CAST(n AS DOUBLE)"
    cov = {
        "cxx": f"(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / {nd}) / ({nd} - 1.0)",
        "cxy": f"(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / {nd}) / ({nd} - 1.0)",
        "cyy": f"(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / {nd}) / ({nd} - 1.0)",
    }
    return {
        "sums": [
            "count(*) AS n",
            "sum(CAST(x AS DECIMAL(38,0))) AS sx",
            "sum(CAST(y AS DECIMAL(38,0))) AS sy",
            "sum(CAST(x * x AS DECIMAL(38,0))) AS sxx",
            "sum(CAST(x * y AS DECIMAL(38,0))) AS sxy",
            "sum(CAST(y * y AS DECIMAL(38,0))) AS syy",
        ],
        "cov": cov,
        "l1": "(cxx + cyy) / 2.0 + sqrt((cxx - cyy) * (cxx - cyy) / 4.0 + cxy * cxy)",
        # eigenvector for λ1; cxy = 0 ⇒ axes are already eigenvectors.
        # Strict > on the isotropic tie (cxx == cyy): numpy eigh returns
        # identity vectors with argsort(vals)[::-1] picking index 1 — the
        # y-axis — so the twin must pick y there too to stay convention-
        # identical with DimReducer._fit_pca_expr.
        "vx": "CASE WHEN cxy <> 0.0 THEN cxy WHEN cxx > cyy THEN 1.0 ELSE 0.0 END",
        "vy": "CASE WHEN cxy <> 0.0 THEN l1 - cxx WHEN cxx > cyy THEN 0.0 ELSE 1.0 END",
        "ux0": "vx / sqrt(vx * vx + vy * vy)",
        "uy0": "vy / sqrt(vx * vx + vy * vy)",
        # numpy argmax tie-break: index 0 wins on |ux0| == |uy0|
        "sgn": "CASE WHEN (CASE WHEN abs(ux0) >= abs(uy0) THEN ux0 ELSE uy0 END) < 0.0 THEN -1.0 ELSE 1.0 END",
        "ux": "ux0 * sgn",
        "uy": "uy0 * sgn",
        # second component = orthogonal complement, own sign fix
        "wx0": "0.0 - (uy0 * sgn)",
        "wy0": "ux0 * sgn",
        "sgn2": "CASE WHEN (CASE WHEN abs(wx0) >= abs(wy0) THEN wx0 ELSE wy0 END) < 0.0 THEN -1.0 ELSE 1.0 END",
        "wx": "wx0 * sgn2",
        "wy": "wy0 * sgn2",
        "dim0": f"round(x * ux + y * uy, {dp})",
        "dim1": f"round(x * wx + y * wy, {dp})",
    }


def pca2_project_expr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    keep_cols: Sequence[str] = (),
    dp: int = 6,
) -> DataFrame:
    """Distributed bit-exact 2-feature PCA projection: ONE map-side
    partial aggregation (six exact decimal sums) → a 1-row closed-form
    eigen-solve → broadcast back onto the scan. Zero Python, zero extra
    shuffles — the 100 TB plan for narrow-PCA scoring."""
    fr = pca2_sql_fragments(dp)
    keep = list(keep_cols)
    base = df.select(
        *keep,
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    s = base.agg(
        *[
            F.expr(t.rsplit(" AS ", 1)[0]).alias(t.rsplit(" AS ", 1)[1])
            for t in fr["sums"]
        ]
    )
    c = s.select("*", *[F.expr(e).alias(a) for a, e in fr["cov"].items()])
    c = c.select("*", F.expr(fr["l1"]).alias("l1"))
    c = c.select("*", F.expr(fr["vx"]).alias("vx"), F.expr(fr["vy"]).alias("vy"))
    c = c.select("*", F.expr(fr["ux0"]).alias("ux0"), F.expr(fr["uy0"]).alias("uy0"))
    c = c.select("*", F.expr(fr["sgn"]).alias("sgn"))
    c = c.select("*", F.expr(fr["wx0"]).alias("wx0"), F.expr(fr["wy0"]).alias("wy0"))
    c = c.select("*", F.expr(fr["sgn2"]).alias("sgn2"))
    comp = c.select(
        F.expr(fr["ux"]).alias("ux"),
        F.expr(fr["uy"]).alias("uy"),
        F.expr(fr["wx"]).alias("wx"),
        F.expr(fr["wy"]).alias("wy"),
    )
    return base.crossJoin(F.broadcast(comp)).select(
        *keep,
        F.expr(fr["dim0"]).alias("dim_0"),
        F.expr(fr["dim1"]).alias("dim_1"),
    )


def pca2_project_oracle_sql(
    table_sql: str,
    x_sql: str,
    y_sql: str,
    *,
    key_sqls: Sequence[str],
    dp: int = 6,
) -> str:
    """DuckDB oracle for pca2_project_expr — the SAME fragment text
    staged through CTEs with the same alias names."""
    fr = pca2_sql_fragments(dp)
    keys = ", ".join(key_sqls)
    cov = ",\n               ".join(f"{e} AS {a}" for a, e in fr["cov"].items())
    return f"""
        WITH base AS (
          SELECT {keys}, CAST({x_sql} AS DOUBLE) AS x, CAST({y_sql} AS DOUBLE) AS y
          FROM {table_sql}
        ), s AS (
          SELECT {", ".join(fr["sums"])} FROM base
        ), c0 AS (
          SELECT *, {cov} FROM s
        ), c1 AS (
          SELECT *, {fr["l1"]} AS l1 FROM c0
        ), c2 AS (
          SELECT *, {fr["vx"]} AS vx, {fr["vy"]} AS vy FROM c1
        ), c3 AS (
          SELECT *, {fr["ux0"]} AS ux0, {fr["uy0"]} AS uy0 FROM c2
        ), c4 AS (
          SELECT *, {fr["sgn"]} AS sgn FROM c3
        ), c5 AS (
          SELECT *, {fr["wx0"]} AS wx0, {fr["wy0"]} AS wy0 FROM c4
        ), c6 AS (
          SELECT *, {fr["sgn2"]} AS sgn2 FROM c5
        ), comp AS (
          SELECT {fr["ux"]} AS ux, {fr["uy"]} AS uy,
                 {fr["wx"]} AS wx, {fr["wy"]} AS wy
          FROM c6
        )
        SELECT {keys}, {fr["dim0"]} AS dim_0, {fr["dim1"]} AS dim_1
        FROM base CROSS JOIN comp
    """
