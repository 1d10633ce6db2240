"""Deterministic sampling, splitting, and sequence packing for
training-data pipelines.

Why hash-based: ``df.sample``/``rand()`` depend on partition layout and
task retries — two runs (or one run with a lost executor) sample
different rows. Keyed md5-hash sampling is a pure row-wise function of
the data: reproducible across runs, engines, cluster sizes, and
re-partitioning, joinable across tables (sample the same users in every
table by the same key), and exactly mirrored by the DuckDB oracle via
text/portable.py's md5→BIGINT machinery. All operators here are pure
column expressions — whole-stage codegen, zero shuffles except the
packing window.

Reference scope note: the reference has no sampling surface (its test
frames are in-memory); these extend SURVEY.md §2.3's training-data
inventory alongside dedup/similarity/text.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from centimators_spark.text.portable import md5_long, sql_md5_long

# sampling resolution: rates are quantized to 1/DENOM
DENOM = 1_000_000


def _bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, DENOM) from a 60-bit keyed md5."""
    return md5_long(F.concat(F.lit(salt), key.cast("string"))) % DENOM


def _sql_bucket(key_sql: str, salt: str) -> str:
    keyed = f"'{salt}' || CAST({key_sql} AS VARCHAR)"
    return f"{sql_md5_long(keyed)} % {DENOM}"


# full 60-bit uniform u ∈ (0,1) — used where per-row DISTINCTNESS
# matters (A-ES keys), not just a rate threshold
_U_DENOM = float(2**60)


def _unit_uniform(key: Column, salt: str) -> Column:
    return (
        md5_long(F.concat(F.lit(salt), key.cast("string"))) + F.lit(0.5)
    ) / F.lit(_U_DENOM)


def _sql_unit_uniform(key_sql: str, salt: str) -> str:
    keyed = f"'{salt}' || CAST({key_sql} AS VARCHAR)"
    return f"(({sql_md5_long(keyed)}) + 0.5) / {_U_DENOM!r}"


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep rows whose keyed hash bucket falls below ``rate`` —
    reproducible under any partitioning; change ``salt`` to draw an
    independent sample."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(_bucket(F.col(key_col), salt) < int(rate * DENOM))


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Mapping[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label ('train'/'val'/…) by hash bucket,
    with expected proportions ``weights`` (must sum to 1). Same key ⇒
    same split in every table and every run — the property that keeps a
    user's documents out of both train and test."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    b = _bucket(F.col(key_col), salt)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = b < int(acc * DENOM)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


def sql_hash_split(
    key_sql: str, weights: Mapping[str, float], salt: str = ""
) -> str:
    """DuckDB CASE expression mirroring hash_split bit-for-bit."""
    b = _sql_bucket(key_sql, salt)
    items = list(weights.items())
    acc = 0.0
    arms = []
    for name, w in items[:-1]:
        acc += w
        arms.append(f"WHEN {b} < {int(acc * DENOM)} THEN '{name}'")
    return f"CASE {' '.join(arms)} ELSE '{items[-1][0]}' END"


def sql_sample_flag(key_sql: str, rate: float, salt: str = "") -> str:
    """DuckDB boolean mirroring deterministic_sample's predicate."""
    return f"({_sql_bucket(key_sql, salt)} < {int(rate * DENOM)})"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """EXACTLY ``n_per_stratum`` rows per stratum (fewer when a stratum
    is smaller), chosen by keyed-hash order — deterministic under any
    partitioning and cluster size, unlike ``sampleBy`` (rate-based,
    rand()-seeded per partition).

    Plan: one window shuffle on ``strata_col``; rows ranked by
    (hash-bucket, key) — the hash makes the per-stratum pick uniform,
    the key breaks bucket ties deterministically. At 100 TB the window
    sorts each stratum once; for very hot strata pre-filter with
    ``deterministic_sample`` at a few× the target rate first, then rank
    the survivors."""
    from pyspark.sql import Window

    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
    w = Window.partitionBy(strata_col).orderBy(
        _bucket(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    target_parts: Mapping[str, int],
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Downsample a multi-domain corpus toward a target mixture — the
    domain-reweighting step of every LLM data recipe (e.g. "web 6 :
    code 3 : wiki 1"). ``target_parts`` are INTEGER mixture parts, so
    every derived quantity is exact integer arithmetic and the DuckDB
    oracle reproduces the selection bit-for-bit (float rates would
    round differently across engines).

    Semantics: with domain counts c_d and parts p_d (P = Σp), the
    largest achievable total without upsampling is
    N = min_d floor(c_d·P/p_d); each domain keeps ~p_d·N/P rows via the
    keyed-hash bucket predicate (threshold_d =
    floor(DENOM·p_d·N/(P·c_d))). Domains absent from ``target_parts``
    (or with part 0) are dropped; target domains absent from the data
    are ignored when sizing N (their target is unreachable).

    Plan: one tiny groupBy(domain) count → scalar min → per-domain
    thresholds broadcast back onto the scan; the corpus side is a
    map-side filter (no collect, no corpus shuffle)."""
    parts = {d: int(p) for d, p in target_parts.items() if int(p) > 0}
    if not parts:
        raise ValueError("target_parts must contain a positive part")
    P = sum(parts.values())
    part_of = F.coalesce(
        *[F.when(F.col("__dom") == d, F.lit(p)) for d, p in parts.items()],
        F.lit(None).cast("int"),
    )
    counts = (
        df.groupBy(F.col(domain_col).alias("__dom"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .withColumn("__p", part_of)
        .where(F.col("__p").isNotNull())
    )
    nmax = counts.agg(
        F.min(F.expr(f"(__c * {P}) div __p")).alias("__n")
    )
    # DECIMAL(38,0) intermediates: DENOM·p·N overflows BIGINT once a
    # domain holds ~1.5e12/p rows (silent negative thresholds non-ANSI,
    # hard error under ANSI/DuckDB); decimal div is exact and matches
    # the oracle's HUGEINT // bit-for-bit
    thresholds = counts.crossJoin(F.broadcast(nmax)).select(
        "__dom",
        F.expr(
            f"CAST((CAST({DENOM} AS DECIMAL(38,0)) * __p * __n)"
            f" div (CAST({P} AS DECIMAL(38,0)) * __c) AS BIGINT)"
        ).alias("__thr"),
    )
    return (
        df.join(
            F.broadcast(thresholds), df[domain_col] == F.col("__dom"), "inner"
        )
        .where(_bucket(F.col(key_col), salt) < F.col("__thr"))
        .drop("__dom", "__thr")
    )


def sql_mixture_sample(
    table: str,
    domain_sql: str,
    target_parts: Mapping[str, int],
    key_sql: str,
    salt: str = "",
    select_sql: str = "*",
) -> str:
    """DuckDB query mirroring mixture_sample bit-for-bit (same integer
    thresholds, same keyed-hash predicate)."""
    parts = {d: int(p) for d, p in target_parts.items() if int(p) > 0}
    P = sum(parts.values())
    part_case = (
        "CASE "
        + " ".join(f"WHEN dom = '{d}' THEN {p}" for d, p in parts.items())
        + " ELSE NULL END"
    )
    return f"""
      WITH counts AS (
        SELECT dom, c, p FROM (
          SELECT {domain_sql} AS dom, CAST(count(*) AS BIGINT) AS c,
                 {part_case} AS p
          FROM {table} GROUP BY {domain_sql}
        ) WHERE p IS NOT NULL
      ), nmax AS (
        SELECT min((c * {P}) // p) AS n FROM counts
      ), thr AS (
        SELECT dom,
          CAST((CAST({DENOM} AS HUGEINT) * p * n)
               // (CAST({P} AS HUGEINT) * c) AS BIGINT) AS threshold
        FROM counts CROSS JOIN nmax
      )
      SELECT {select_sql} FROM {table} t
      JOIN thr ON {domain_sql} = thr.dom
      WHERE {_sql_bucket(key_sql, salt)} < thr.threshold
    """


def temperature_mixture_sample(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Downsample toward a TEMPERATURE-flattened mixture with τ = 0.5:
    target fraction f_d ∝ c_d^0.5 — the standard recipe for boosting
    low-resource domains/languages without upsampling (the smallest
    domain keeps 100%, larger domains keep ~sqrt-proportionally less).

    τ is fixed at 0.5 deliberately: sqrt is IEEE-exact in every engine,
    whereas pow(c, τ) differs by ULPs across libms and would make the
    keep thresholds engine-dependent. Cross-engine float determinism
    for the remaining arithmetic comes from a FIXED-ORDER fold: the
    domain counts are packed into a domain-sorted array and
    W = Σ sqrt(c_d) folds left-to-right over it — the same association
    order the DuckDB oracle's list_reduce evaluates, so thresholds are
    bit-identical. (With c/f_d = W·sqrt(c_d), the achievable total is
    N* = W·sqrt(min_d c_d).)

    Plan: one tiny domain count, one one-row pack, thresholds broadcast
    back — the corpus side is a map-side filter, same shape as
    ``mixture_sample``."""
    # NULL domains are dropped explicitly (they would fall out of the
    # inner threshold join anyway, but must not enter the sorted fold:
    # sort_array puts NULL structs FIRST while the oracle's ORDER BY
    # puts NULLs LAST — the fold order, hence W, would diverge)
    counts = (
        df.where(F.col(domain_col).isNotNull())
        .groupBy(F.col(domain_col).alias("__dom"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    packed = counts.agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("__dom").alias("d"), F.col("__c").alias("c"))
            )
        ).alias("a")
    )
    scal = packed.select(
        F.expr(
            "aggregate(transform(a, s -> sqrt(CAST(s.c AS DOUBLE))),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        ).alias("W"),
        F.expr(
            "sqrt(CAST(array_min(transform(a, s -> s.c)) AS DOUBLE))"
        ).alias("sm"),
    )
    # ONE shared formula text with the oracle (same association order):
    # thr = round(DENOM * (sqrt(c)/W) * (W*sm) / c)
    thr = counts.crossJoin(F.broadcast(scal)).select(
        "__dom",
        F.expr(
            f"CAST(round({DENOM} * (sqrt(CAST(__c AS DOUBLE)) / W)"
            " * (W * sm) / CAST(__c AS DOUBLE)) AS BIGINT)"
        ).alias("__thr"),
    )
    return (
        df.join(F.broadcast(thr), df[domain_col] == F.col("__dom"))
        .where(_bucket(F.col(key_col), salt) < F.col("__thr"))
        .drop("__dom", "__thr")
    )


def sql_temperature_mixture_sample(
    table: str,
    domain_sql: str,
    key_sql: str,
    salt: str = "",
    select_sql: str = "*",
) -> str:
    """DuckDB mirror of temperature_mixture_sample — identical sorted
    fold, identical threshold formula text."""
    return f"""
      WITH counts AS (
        SELECT {domain_sql} AS dom, CAST(count(*) AS BIGINT) AS c
        FROM {table} WHERE {domain_sql} IS NOT NULL GROUP BY {domain_sql}
      ), packed AS (
        SELECT list(c ORDER BY dom) AS cs FROM counts
      ), scal AS (
        SELECT list_reduce(list_transform(cs, x -> sqrt(CAST(x AS DOUBLE))),
                           (a, b) -> a + b) AS W,
               sqrt(CAST(list_min(cs) AS DOUBLE)) AS sm
        FROM packed
      ), thr AS (
        SELECT dom,
          CAST(round({DENOM} * (sqrt(CAST(c AS DOUBLE)) / W)
               * (W * sm) / CAST(c AS DOUBLE)) AS BIGINT) AS threshold
        FROM counts CROSS JOIN scal
      )
      SELECT {select_sql} FROM {table} t
      JOIN thr ON {domain_sql} = thr.dom
      WHERE {_sql_bucket(key_sql, salt)} < thr.threshold
    """


def sql_stratified_sample(
    table: str,
    strata_sql: str,
    n_per_stratum: int,
    key_sql: str,
    salt: str = "",
    select_sql: str = "*",
) -> str:
    """DuckDB query mirroring stratified_sample bit-for-bit (same keyed
    hash bucket, same (bucket, key) rank order)."""
    b = _sql_bucket(key_sql, salt)
    return f"""
      SELECT {select_sql} FROM (
        SELECT *, row_number() OVER (
          PARTITION BY {strata_sql} ORDER BY {b}, {key_sql}) AS __rn
        FROM {table})
      WHERE __rn <= {n_per_stratum}
    """


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_cols: Sequence[str],
    by: str | None = None,
    batch_col: str = "batch_id",
) -> DataFrame:
    """Streaming sequence packing: walk rows in ``order_cols`` order
    (per ``by`` partition) and start a new batch whenever the running
    token total crosses a multiple of ``budget``:
    ``batch_id = floor(exclusive_cumsum(tokens) / budget)``.

    Semantics (document-preserving, deterministic, one window pass): a
    batch's total lands in [budget − max_doc_tokens, budget +
    max_doc_tokens); documents are never split. This is the
    SQL-expressible streaming formulation — bin-packing variants that
    reorder documents trade determinism and a shuffle for tighter
    packing. One shuffle (the ``by`` partition / global sort).

    SCALE: with ``by=None`` the exclusive cumsum is a single-partition
    window — inherent to a globally-sequential packing order, and the
    one place this engine accepts it over data-sized input. At corpus
    scale ALWAYS pass ``by`` (a shard key: split, domain, hash bucket);
    each shard packs independently and in parallel, which is also what
    a multi-host tokenizer wants to consume."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    w = (
        Window.partitionBy(by) if by else Window.partitionBy()
    ).orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, -1)
    prior = F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0))
    return df.withColumn(
        batch_col, F.floor(prior / F.lit(budget)).cast("long")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (top-k of
    the Efraimidis–Spirakis key): each row gets u ∈ (0,1) from its
    keyed 60-bit hash and survives if ln(u)/w is among the k largest —
    inclusion probability proportional to weight, reproducible under
    any partitioning/cluster size (no rand()).

    Plan: pure map-side key computation + ORDER BY ... LIMIT k, which
    Spark executes as TakeOrderedAndProject — per-partition partial
    top-k then a k-row merge on the driver, NO global sort. Rows with
    null or non-positive weight are excluded.

    Determinism note: the A-ES key divides a log by the weight; both
    engines' ``ln`` agree to ≤1 ulp, so the DuckDB mirror
    (sql_weighted_sample) selects the identical set unless two keys
    collide within float epsilon (hash granularity makes that
    ~2^-50-improbable; exact ties break by key). u rides the FULL
    60-bit hash (not the DENOM-quantized bucket): with only 1e6
    distinct u values, multi-million-row inputs would collide on
    identical A-ES keys and the key-ascending tie-break would bias
    inclusion toward lexicographically small keys."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.col(weight_col).cast("double")
    u = _unit_uniform(F.col(key_col), salt)
    aes = F.log(u) / w
    return (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("__aes", aes)
        .orderBy(F.col("__aes").desc(), F.col(key_col).asc())
        .limit(k)
        .drop("__aes")
    )


def sql_weighted_sample(
    table: str,
    k: int,
    weight_sql: str,
    key_sql: str,
    salt: str = "",
    select_sql: str = "*",
) -> str:
    """DuckDB mirror of :func:`weighted_sample`."""
    u = _sql_unit_uniform(key_sql, salt)
    return f"""
        SELECT {select_sql} FROM {table}
        WHERE {weight_sql} IS NOT NULL AND CAST({weight_sql} AS DOUBLE) > 0
        ORDER BY ln({u}) / CAST({weight_sql} AS DOUBLE) DESC, {key_sql} ASC
        LIMIT {k}
    """


def era_balanced_weights(
    df: DataFrame,
    era_col: str,
    *,
    out_col: str = "weight",
    round_dp: int = 6,
) -> DataFrame:
    """Append per-row sample weights that make every era contribute
    equally to a weighted loss regardless of its row count:

        w = N / (E · n_era)        (mean weight 1, Σw = N)

    — the standard correction when eras are months of very different
    liquidity and the model must not overfit the crowded ones.

    Exact: N, E, n_era are exact integers from ONE grouped count
    (broadcast back; era keys are dimension-sized); the single
    division is rounded to ``round_dp`` identically in the DuckDB
    mirror (:func:`era_balanced_weights_oracle_sql`). A NULL era is a
    first-class era (its rows get weights like any other; the
    broadcast-back join is null-safe so Σw = N holds on frames with
    missing era labels too)."""
    counts = df.groupBy(era_col).agg(F.count(F.lit(1)).alias("__n_era"))
    # tiny second agg over the COUNTS frame (one row per era)
    tot = counts.agg(
        F.sum("__n_era").alias("__N"), F.count(F.lit(1)).alias("__E")
    )
    cn = counts.withColumnRenamed(era_col, "__era_key")
    j = df.join(
        F.broadcast(cn), F.col(era_col).eqNullSafe(F.col("__era_key"))
    ).crossJoin(F.broadcast(tot))
    w = F.col("__N").cast("double") / (
        F.col("__E").cast("double") * F.col("__n_era").cast("double")
    )
    return j.withColumn(out_col, F.round(w, round_dp)).drop(
        "__era_key", "__n_era", "__N", "__E"
    )


def era_balanced_weights_oracle_sql(
    table: str,
    era_sql: str,
    *,
    select_sql: str = "*",
    out_name: str = "weight",
    round_dp: int = 6,
) -> str:
    """DuckDB mirror of :func:`era_balanced_weights` (null-safe era
    join, matching the Spark side's eqNullSafe)."""
    return f"""
        WITH b AS (
          SELECT *, {era_sql} AS __era FROM {table}
        ), c AS (
          SELECT __era, CAST(count(*) AS BIGINT) AS n_era
          FROM b GROUP BY __era
        ), t AS (
          SELECT CAST(sum(n_era) AS BIGINT) AS N,
                 CAST(count(*) AS BIGINT) AS E FROM c
        )
        SELECT {select_sql},
               round(CAST(N AS DOUBLE)
                     / (CAST(E AS DOUBLE) * CAST(n_era AS DOUBLE)),
                     {round_dp}) AS {out_name}
        FROM b JOIN c ON b.__era IS NOT DISTINCT FROM c.__era CROSS JOIN t
    """


def group_kfold(
    df: DataFrame,
    group_col: str,
    k: int,
    *,
    salt: str = "",
    out_col: str = "fold",
) -> DataFrame:
    """Deterministic GROUP k-fold assignment: every row of a group
    lands in the same fold (``md5(group) mod k`` — the leakage guard
    that keeps one entity's rows out of both train and validation),
    reproducible under any partitioning. The categorical sibling of
    the time-based :func:`~centimators_spark.model_selection.assign_folds`.
    Pure map-side expression; mirrored bit-for-bit by
    :func:`sql_group_kfold`."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return df.withColumn(
        out_col,
        (
            md5_long(F.concat(F.lit(salt), F.col(group_col).cast("string")))
            % k
        ).cast("int"),
    )


def sql_group_kfold(group_sql: str, k: int, salt: str = "") -> str:
    """DuckDB expression mirroring :func:`group_kfold`."""
    keyed = f"'{salt}' || CAST({group_sql} AS VARCHAR)"
    return f"CAST({sql_md5_long(keyed)} % {k} AS INTEGER)"


def negative_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = 4,
    n_buckets: "int | str" = "auto",
    salt: str = "neg",
    target_bucket_size: int = 16,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    each anchor id, ``k`` pseudo-random partner ids drawn WITHOUT any
    RNG state — pure keyed-md5 functions of the ids, so the sample is
    reproducible, partition-invariant, and bit-identical cross-engine
    (the md5 discipline of every sampler in this module).

    Construction: every id hashes to a home bucket
    ``H(salt|id) % n_buckets``; the anchor's i-th probe bucket is
    ``H(salt|id|i) % n_buckets``; within the probe bucket the chosen
    negative is the member minimizing the pair hash
    ``H(salt2|anchor|member)`` (member ≠ anchor — a probe landing on a
    bucket whose only member is the anchor yields no row for that i,
    the documented corner). Returns (anchor, neg_rank, negative).

    Scale: the probe→bucket equi-join fans out by the bucket size
    (≈N/n_buckets members per probe) and the per-(anchor, i) argmin is
    one min-struct aggregation — the fan-out must stay constant, so
    ``n_buckets`` MUST scale ∝ N (a fixed bucket count makes candidate
    rows grow as k·N²/B; the 10x sweep measured 52x wall-clock on
    exactly that). The default ``"auto"`` sizes it from one count job:
    ``max(64, ceil(N / target_bucket_size))`` — deterministic, so the
    SQL twin reproduces it with a scalar subquery.
    """
    from centimators_spark.text.portable import md5_long

    if n_buckets == "auto":
        t = int(target_bucket_size)
        nb = max(64, (df.count() + t - 1) // t)  # integer ceil
    else:
        nb = int(n_buckets)
    anchors = df.select(F.col(id_col).cast("long").alias("anchor"))
    members = df.select(F.col(id_col).cast("long").alias("member")).select(
        "member",
        (
            md5_long(F.concat(F.lit(salt), F.col("member").cast("string")))
            % nb
        ).alias("bucket"),
    )
    probes = anchors.select(
        "anchor",
        F.explode(F.array(*[F.lit(i) for i in range(int(k))])).alias(
            "neg_rank"
        ),
    ).select(
        "anchor",
        "neg_rank",
        (
            md5_long(
                F.concat(
                    F.lit(salt),
                    F.col("anchor").cast("string"),
                    F.lit("|"),
                    F.col("neg_rank").cast("string"),
                )
            )
            % nb
        ).alias("bucket"),
    )
    pair_h = md5_long(
        F.concat(
            F.lit(salt + "2"),
            F.col("anchor").cast("string"),
            F.lit("|"),
            F.col("member").cast("string"),
        )
    )
    cand = (
        probes.join(members, "bucket")
        .where(F.col("member") != F.col("anchor"))
        .select(
            "anchor",
            "neg_rank",
            F.struct(pair_h.alias("h"), F.col("member").alias("m")).alias(
                "s"
            ),
        )
    )
    return (
        cand.groupBy("anchor", "neg_rank")
        .agg(F.min("s").alias("s"))
        .select("anchor", "neg_rank", F.col("s.m").alias("negative"))
    )


def negative_sample_oracle_sql(
    table_sql: str,
    id_sql: str = "doc_id",
    k: int = 4,
    n_buckets: "int | str" = "auto",
    salt: str = "neg",
    target_bucket_size: int = 16,
) -> str:
    """DuckDB twin of :func:`negative_sample` — identical md5 bucket,
    probe, and pair-hash expressions. With ``n_buckets="auto"`` the
    modulus is the scalar subquery ``greatest(64, ceil(N / target))``,
    the same value the Spark side derives from its count job."""
    from centimators_spark.text.portable import sql_md5_long

    if n_buckets == "auto":
        t = int(target_bucket_size)
        nb = (
            f"(SELECT greatest(64, (count(*) + {t - 1}) // {t})"
            f" FROM {table_sql})"
        )
    else:
        nb = int(n_buckets)
    home = sql_md5_long(f"'{salt}' || CAST(member AS VARCHAR)")
    probe = sql_md5_long(
        f"'{salt}' || CAST(anchor AS VARCHAR) || '|'"
        f" || CAST(neg_rank AS VARCHAR)"
    )
    pair = sql_md5_long(
        f"'{salt}2' || CAST(anchor AS VARCHAR) || '|'"
        f" || CAST(member AS VARCHAR)"
    )
    return f"""
        WITH members AS (
          SELECT CAST({id_sql} AS BIGINT) AS member FROM {table_sql}
        ), buckets AS (
          SELECT member, {home} % {nb} AS bucket FROM members
        ), probes AS (
          SELECT CAST({id_sql} AS BIGINT) AS anchor, i AS neg_rank
          FROM {table_sql}, unnest(generate_series(0, {int(k) - 1})) t(i)
        ), probed AS (
          SELECT anchor, neg_rank, {probe} % {nb} AS bucket FROM probes
        ), cand AS (
          SELECT anchor, neg_rank,
                 {{'h': {pair}, 'm': member}} AS s
          FROM probed JOIN buckets USING (bucket)
          WHERE member <> anchor
        )
        SELECT anchor, neg_rank, min(s).m AS negative
        FROM cand GROUP BY anchor, neg_rank
    """
