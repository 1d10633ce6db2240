"""Exact-arithmetic Lloyd k-means over embedding columns — the EM
iteration shape (assign → update) as a bit-exact cross-engine
contract, complementing the approximate/driver-trained clustering the
ANN stack already uses (MLlib KMeans trains IVF cells in
`similarity/ann.py`; PQ codebooks in `similarity/pq.py`).

Protocol (deterministic by construction):

- vectors enter as BIGINT micro-units (round(x·1e6) per component);
- seeds C0 = the k vectors with the smallest ids (data-derived, so
  both engines compute them — no RNG);
- per iteration: assign each vector to the centroid minimizing the
  INTEGER squared L2 distance (ties → lower cluster id; min-struct
  argmin), then recompute each centroid component as the HALF-UP
  integer mean floor((2s+n)/(2n)) of its members (the
  ml/backtest.py rounding — no float-round boundary divergence);
  empty clusters keep their previous centroid;
- output after ``iters`` rounds: per cluster, the member count of the
  LAST assignment, the first two components of the post-update
  centroid, and the integer inertia of the last assignment (distance
  to the centroids it assigned against).

Scale: each assignment is ONE codegen scan (k distance expressions
per row — centroids are literals, no join, no shuffle); each update
is one (cluster, position) grouped sum — k·d result rows, collected
to the driver exactly like the PQ codebook training step (bounded by
k·d, never by N). Integer bounds: |component| ≤ 2e6 micro-units ⇒
per-pair distance ≤ d·1.6e13; inertia sums stay well inside BIGINT
for d·N ≲ 1e4·1e5 — use DECIMAL carriers beyond that.

Reference anchor: DimReducer is the reference's only clustering-
adjacent surface (`feature_transformers/dimreduction.py`); this adds
the training-side counterpart a 100 TB pipeline needs (corpus
bucketing for IVF / SemDeDup-style cluster pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_lloyd_exact", "kmeans_lloyd_oracle_sql"]


def _xu(col):
    return F.transform(
        col, lambda v: F.round(v.cast("double") * 1e6).cast("long")
    )


def _dist_to(cent: list[int]):
    """Squared L2 to a literal centroid — the zip_with+aggregate HOF
    fold, deliberately NOT a statically unrolled chain: unrolling
    k·d ≈ 256 integer terms per Lloyd round costs ~4-5 s of janino
    compilation per freshly built plan (measured 3.3 s → 8.0 s per
    bench execution at sf0.1) while the interpreted per-row fold is
    milliseconds at this scan size. Integer addition is associative,
    so the bits are identical either way; at production scale
    (compile once, scan for hours) the unrolled form wins — flip
    there, or use the PQ/IVF index path."""
    arr = F.array(*[F.lit(int(c)).cast("long") for c in cent])
    return F.aggregate(
        F.zip_with(F.col("xu"), arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kmeans_lloyd_exact(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iters: int = 2,
    label_col: str | None = None,
) -> DataFrame:
    """Run ``iters`` exact Lloyd rounds; see module docstring for the
    full protocol. Returns (cluster, n, c0_u, c1_u, inertia_u) — plus
    (top_label, label_n), the cluster's majority label with
    (count desc, label asc) min-struct ties, when ``label_col`` is
    given (the cluster-purity readout a labeling pipeline wants)."""
    cols = [F.col(id_col).alias("vid"), _xu(F.col(vec_col)).alias("xu")]
    if label_col is not None:
        cols.append(F.col(label_col).cast("long").alias("lbl"))
    # x is consumed by iters+2 ACTIONS (seed collect, per-round update
    # collects, final output) — pin it once or every collect re-runs
    # the full upstream lineage (the composed vector_pipeline measured
    # 11s with a re-executed dedup join vs ~5s pinned; at cluster
    # scale write x as a table instead)
    x = df.select(*cols).localCheckpoint(eager=True)
    # C0: the k smallest-id vectors (tiny bounded collect, like the
    # PQ codebook training step)
    seed_rows = x.orderBy("vid").limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(
            f"kmeans_lloyd_exact: need at least k={k} input rows to seed "
            f"centroids, got {len(seed_rows)}"
        )
    cents = [list(r.xu) for r in seed_rows]
    d = len(cents[0])

    assigned = None
    for it in range(iters):
        structs = [
            F.struct(_dist_to(c).alias("dist"), F.lit(j).alias("c"))
            for j, c in enumerate(cents)
        ]
        best = F.least(*structs)
        assigned = x.select(
            "vid",
            "xu",
            *([F.col("lbl")] if label_col is not None else []),
            best["c"].alias("cluster"),
            best["dist"].alias("dist"),
        )
        if it == iters - 1:
            # pin the LAST assignment (r13): the round's update collect
            # AND the output aggregation both consume it — unpinned,
            # each re-runs the interpreted k-way distance fold over x
            assigned = assigned.localCheckpoint(eager=True)
        comp = (
            assigned.select(
                "cluster", F.posexplode("xu").alias("pos", "val")
            )
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cluster: dict[int, dict[int, int]] = {}
        for r in comp:
            by_cluster.setdefault(r.cluster, {})[r.pos] = _half_up(r.s, r.n)
        cents = [
            [by_cluster[j][p] for p in range(d)] if j in by_cluster else cents[j]
            for j in range(k)
        ]

    grid = assigned.sparkSession.createDataFrame(
        [(j, cents[j][0], cents[j][1]) for j in range(k)],
        "cluster int, c0_u long, c1_u long",
    )
    if label_col is None:
        counts = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"), F.sum("dist").alias("inertia_u")
        )
        return grid.join(counts, "cluster", "left").select(
            F.col("cluster").cast("long").alias("cluster"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            "c0_u",
            "c1_u",
            F.coalesce(F.col("inertia_u"), F.lit(0)).cast("long").alias(
                "inertia_u"
            ),
        )
    # counts, inertia AND the per-cluster majority label from ONE
    # corpus-sized aggregation (lbl rides the assignment scan — it is
    # already in the pinned frame, so the old vid self-join and the
    # separate counts pass re-executed the interpreted distance fold
    # twice more for nothing; r13 optimization). The (cluster, lbl)
    # partials are k×|labels| rows; everything after is tiny. The vote
    # is the same (count desc, label asc) min-struct.
    cl = assigned.groupBy("cluster", "lbl").agg(
        F.count(F.lit(1)).alias("ln"), F.sum("dist").alias("li")
    )
    per_cl = cl.groupBy("cluster").agg(
        F.sum("ln").alias("n"),
        F.sum("li").alias("inertia_u"),
        F.min(
            F.struct((-F.col("ln")).alias("nv"), F.col("lbl").alias("l"))
        ).alias("b"),
    )
    return grid.join(per_cl, "cluster", "left").select(
        F.col("cluster").cast("long").alias("cluster"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        "c0_u",
        "c1_u",
        F.coalesce(F.col("inertia_u"), F.lit(0)).cast("long").alias(
            "inertia_u"
        ),
        F.col("b.l").alias("top_label"),
        F.coalesce(-F.col("b.nv"), F.lit(0)).cast("long").alias("label_n"),
    )


def _half_up(s: int, n: int) -> int:
    # floor((2s + n) / (2n)) in exact python ints
    return (2 * int(s) + int(n)) // (2 * int(n))


def kmeans_lloyd_oracle_sql(
    table: str = "embeddings",
    vec_sql: str = "embedding",
    id_sql: str = "vec_id",
    k: int = 4,
    iters: int = 2,
    dim: int = 64,
    label_sql: str | None = None,
) -> str:
    """DuckDB twin of :func:`kmeans_lloyd_exact` — the iterations
    unrolled as MATERIALIZED CTEs (the graphs.kcore_oracle_sql
    discipline) evaluating identical integer arithmetic."""
    dist = (
        "list_reduce(list_transform(range(1, {d} + 1), "
        "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (u, v) -> u + v)"
    )
    lbl_col = (
        f", CAST({label_sql} AS BIGINT) AS lbl" if label_sql else ""
    )
    ctes = [
        f"""x AS MATERIALIZED (
          SELECT {id_sql} AS vid,
                 list_transform({vec_sql},
                   v -> CAST(round(CAST(v AS DOUBLE) * 1e6) AS BIGINT))
                   AS xu{lbl_col}
          FROM {table}
        )""",
        f"""c0 AS MATERIALIZED (
          SELECT CAST(row_number() OVER (ORDER BY vid) - 1 AS INTEGER)
                   AS c, xu AS cu
          FROM (SELECT vid, xu FROM x ORDER BY vid LIMIT {k})
        )""",
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        d_expr = dist.format(a="x.xu", b=f"{prev}.cu", d=dim)
        ctes.append(f"""a{it} AS MATERIALIZED (
          SELECT vid, xu, cluster, dist FROM (
            SELECT x.vid, x.xu, {prev}.c AS cluster,
                   {d_expr} AS dist,
                   row_number() OVER (PARTITION BY x.vid
                     ORDER BY {d_expr} ASC, {prev}.c ASC) AS rn
            FROM x CROSS JOIN {prev}
          ) WHERE rn = 1
        )""")
        ctes.append(f"""m{it} AS MATERIALIZED (
          SELECT cluster, list(mu ORDER BY i) AS cu FROM (
            SELECT cluster, i,
                   CAST(floor(CAST(2 * sum(xu[i]) + count(*) AS DOUBLE)
                     / CAST(2 * count(*) AS DOUBLE)) AS BIGINT) AS mu
            FROM a{it} CROSS JOIN range(1, {dim} + 1) r(i)
            GROUP BY cluster, i
          ) GROUP BY cluster
        )""")
        ctes.append(f"""c{it} AS MATERIALIZED (
          SELECT {prev}.c, coalesce(m{it}.cu, {prev}.cu) AS cu
          FROM {prev} LEFT JOIN m{it} ON m{it}.cluster = {prev}.c
        )""")
        prev = f"c{it}"
    lab_select = ""
    lab_join = ""
    if label_sql:
        lab_select = (
            ", lab.top_label AS top_label,"
            " CAST(coalesce(lab.label_n, 0) AS BIGINT) AS label_n"
        )
        lab_join = f"""
          LEFT JOIN (
            SELECT cluster, lbl AS top_label, ln AS label_n FROM (
              SELECT a.cluster, x.lbl, count(*) AS ln,
                     row_number() OVER (PARTITION BY a.cluster
                       ORDER BY count(*) DESC, x.lbl ASC) AS rn
              FROM a{iters} a JOIN x ON x.vid = a.vid
              GROUP BY a.cluster, x.lbl
            ) WHERE rn = 1
          ) lab ON lab.cluster = {prev}.c"""
    return f"""
        WITH {', '.join(ctes)}
        SELECT CAST({prev}.c AS BIGINT) AS cluster,
               CAST(coalesce(s.n, 0) AS BIGINT) AS n,
               {prev}.cu[1] AS c0_u,
               {prev}.cu[2] AS c1_u,
               CAST(coalesce(s.inertia_u, 0) AS BIGINT) AS inertia_u
               {lab_select}
        FROM {prev} LEFT JOIN (
          SELECT cluster, count(*) AS n, sum(dist) AS inertia_u
          FROM a{iters} GROUP BY cluster
        ) s ON s.cluster = {prev}.c{lab_join}
    """
