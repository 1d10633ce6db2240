"""Video near-duplicate detection — the third modality of the
multimodal dedup family (images: multimodal/phash.py, audio:
multimodal/audiofp.py).

Pipeline: RAWV clips (the deterministic fixture container of
:func:`multimodal.columns.encode_rawv`) → the REAL frame-sampling
stage (:func:`multimodal.columns.sample_video_frames`, every 4th
frame) → per-sampled-frame fixed-point integer DCT pHash (the image
path's ``Tq`` matrix) → banded candidate join on (frame position,
Hamming block) → per-pair verify requiring EVERY sampled position
within the threshold, reporting the max.

Recall is exact by pigeonhole: a qualifying pair has position 0
within d, so it shares one of the d+1 blocks at position 0 and is
found. All arithmetic is integer — hash-proven like its siblings.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centimators_spark.multimodal.phash import (
    PHASH_BITS,
    _dct8_int,
    _md5_mod,
)

N_FRAMES = 9
EVERY_N = 4  # sampled frame positions: 0, 4, 8
GRAY_MOD = 200
VBUMP = 33  # single-pixel perturbation of one frame in the near-dup


def synth_frame_pixels(doc_id: int, f: int) -> "np.ndarray":  # noqa: F821
    """Deterministic 8×8 grayscale frame f of the clip for a doc id —
    same family structure as the image fixture: groups of 4 share a
    base clip; offset 1 bumps ONE pixel of ONE frame (``g % N_FRAMES``
    — sometimes a sampled position, sometimes not, so both the
    hamming>0 and hamming=0 near-dup cases occur); offsets 2-3 are
    unrelated clips."""
    import numpy as np

    g, o = doc_id // 4, doc_id % 4
    if o <= 1:
        p = np.array(
            [
                _md5_mod(f"vid:{g}:{f}:{i}", GRAY_MOD)
                for i in range(64)
            ],
            dtype=np.int64,
        )
        if o == 1 and f == g % N_FRAMES:
            p[g % 64] += VBUMP
    else:
        p = np.array(
            [
                _md5_mod(f"uvid:{doc_id}:{f}:{i}", GRAY_MOD)
                for i in range(64)
            ],
            dtype=np.int64,
        )
    return p.reshape(8, 8)


def synth_rawv_clips(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture-synthesis stage: (doc_id, content binary) with REAL
    RAWV clip bytes (N_FRAMES grayscale 8×8 frames)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType, StructField, StructType

    from centimators_spark.multimodal.columns import encode_rawv
    from centimators_spark.scanstats import spread_if_underpartitioned

    # the whole synth→decode→pHash chain inherits this partitioning
    # (map-side stages); without the gate it runs as ONE task on
    # single-row-group local parquet (r13 optimization, value-identical
    # per-row work — see spread_if_underpartitioned)
    narrow = spread_if_underpartitioned(
        df.select(F.col(id_col).alias("doc_id")), "doc_id"
    )
    schema = StructType(
        [narrow.schema["doc_id"], StructField("content", BinaryType())]
    )

    def clip(doc_id: int) -> bytes:
        frames = np.stack(
            [
                np.repeat(
                    synth_frame_pixels(doc_id, f)[:, :, None], 3, axis=2
                )
                for f in range(N_FRAMES)
            ]
        )
        return encode_rawv(frames.astype(np.uint8))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base_cache: dict[int, bytes] = {}
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 4 == 0 and d // 4 in base_cache:
                    out.append(base_cache[d // 4])
                    continue
                b = clip(d)
                if d % 4 == 0:
                    base_cache[d // 4] = b
                out.append(b)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": out})

    return narrow.mapInPandas(compute, schema)


def frame_phash(frames: DataFrame) -> DataFrame:
    """(doc_id, frame_index, phash) from sample_video_frames output —
    the image DCT pHash applied per sampled frame (Arrow kernel,
    integer end to end)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    tq = _dct8_int()
    weights = np.int64(1) << np.arange(PHASH_BITS, dtype=np.int64)
    narrow = frames.select(
        F.col("path").cast("long").alias("doc_id"),
        "frame_index",
        "width",
        "height",
        "frame",
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_index", LongType()),
            StructField("phash", LongType()),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, codes = [], [], []
            for doc_id, fi, w, h, px in zip(
                pdf["doc_id"],
                pdf["frame_index"],
                pdf["width"],
                pdf["height"],
                pdf["frame"],
            ):
                if px is None or w != 8 or h != 8:
                    continue
                p = np.rint(
                    np.asarray(px, dtype=np.float64).reshape(8, 8, 3)[
                        :, :, 0
                    ]
                    * 255.0
                ).astype(np.int64)
                coef = tq @ p @ tq.T
                ac = coef.ravel()[1:]
                m = np.sort(ac)[31]
                ids.append(doc_id)
                fidx.append(int(fi))
                codes.append(int(((ac > m) * weights).sum()))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_index": fidx, "phash": codes}
            )

    return narrow.mapInPandas(compute, schema)


def video_phash_dedup(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    max_hamming: int = 6,
    blobs: DataFrame | None = None,
) -> DataFrame:
    """End-to-end video near-dup: synth RAWV corpus → REAL frame
    sampling → per-frame pHash → banded candidate join per frame
    position → verify EVERY sampled position ≤ max_hamming. Returns
    (d1, d2, hamming) with hamming = the max over sampled positions.

    ``blobs``: optionally a prebuilt (doc_id, content) clip table for
    exactly ``df``'s ids (see phash.image_phash_dedup — values
    identical by construction; frame sampling → pHash → band join
    still run in full)."""
    from centimators_spark.multimodal.columns import sample_video_frames

    clips = (
        blobs if blobs is not None else synth_rawv_clips(df, id_col=id_col)
    ).select(F.col("doc_id").cast("string").alias("doc_id"), "content")
    frames = sample_video_frames(
        clips, content_col="content", path_col="doc_id", every_n=EVERY_N
    )
    codes = frame_phash(frames).localCheckpoint(eager=True)
    n_pos = len(range(0, N_FRAMES, EVERY_N))
    n_blocks = max_hamming + 1
    width = (PHASH_BITS + n_blocks - 1) // n_blocks
    blocks = codes.select(
        "doc_id",
        "frame_index",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block_id"),
                        F.shiftrightunsigned(F.col("phash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("block_val"),
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("blk"),
    ).select(
        "doc_id", "frame_index", "blk.block_id", "blk.block_val"
    )
    cand = (
        blocks.alias("a")
        .join(blocks.alias("b"), ["frame_index", "block_id", "block_val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
        )
        .distinct()
    )
    # verify: join every sampled position's codes for both sides —
    # ALL positions must be within the threshold
    ca = codes.select(
        F.col("doc_id").alias("d1"),
        "frame_index",
        F.col("phash").alias("p1"),
    )
    cb = codes.select(
        F.col("doc_id").alias("d2"),
        "frame_index",
        F.col("phash").alias("p2"),
    )
    per_pos = (
        cand.join(ca, "d1")
        .join(cb, ["d2", "frame_index"])
        .select(
            "d1",
            "d2",
            F.bit_count(F.col("p1").bitwiseXOR(F.col("p2")))
            .cast("long")
            .alias("h"),
        )
    )
    return (
        per_pos.groupBy("d1", "d2")
        .agg(
            F.max("h").alias("hamming"),
            F.count(F.lit(1)).alias("__np"),
        )
        .where(
            (F.col("hamming") <= max_hamming) & (F.col("__np") == n_pos)
        )
        .select("d1", "d2", "hamming")
    )


def video_phash_oracle_sql(
    table: str = "documents", *, max_hamming: int = 6
) -> str:
    """DuckDB mirror: sampled-frame pixels from the SAME id formula,
    the image path's two-stage integer DCT, per-position all-pairs
    Hamming with the every-position-within-threshold verify."""
    tq = _dct8_int()
    tq_rows = ", ".join(
        f"({u}, {x}, {int(tq[u, x])})" for u in range(8) for x in range(8)
    )
    positions = ", ".join(
        str(f) for f in range(0, N_FRAMES, EVERY_N)
    )
    n_pos = len(range(0, N_FRAMES, EVERY_N))

    def md5_mod(expr: str, mod: int) -> str:
        return (
            f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"
            f" % {mod}"
        )

    base = md5_mod(
        "'vid:' || (doc_id // 4) || ':' || f || ':' || i", GRAY_MOD
    )
    uniq = md5_mod(
        "'uvid:' || doc_id || ':' || f || ':' || i", GRAY_MOD
    )
    return f"""
        WITH tq(u, x, c) AS (VALUES {tq_rows}),
        ids AS (SELECT doc_id FROM {table}),
        pix AS (
          SELECT doc_id, f, i, i // 8 AS px, i % 8 AS py,
                 CASE WHEN doc_id % 4 <= 1 THEN
                        {base}
                        + CASE WHEN doc_id % 4 = 1
                                AND f = (doc_id // 4) % {N_FRAMES}
                                AND i = (doc_id // 4) % 64
                               THEN {VBUMP} ELSE 0 END
                      ELSE {uniq} END AS p
          FROM ids
          CROSS JOIN (SELECT unnest([{positions}]) AS f)
          CROSS JOIN (SELECT unnest(range(64)) AS i)
        ),
        s1 AS (
          SELECT doc_id, f, tq.u AS u, py, sum(tq.c * p) AS r
          FROM pix JOIN tq ON tq.x = pix.px
          GROUP BY doc_id, f, tq.u, py
        ),
        coef AS (
          SELECT doc_id, f, s1.u * 8 + tq.u AS k, sum(tq.c * r) AS cf
          FROM s1 JOIN tq ON tq.x = s1.py
          GROUP BY doc_id, f, s1.u, tq.u
        ),
        med AS (
          SELECT doc_id, f, cf AS m FROM (
            SELECT doc_id, f, cf, row_number() OVER (
              PARTITION BY doc_id, f ORDER BY cf, k) AS rn
            FROM coef WHERE k > 0)
          WHERE rn = 32
        ),
        code AS (
          SELECT coef.doc_id, coef.f,
                 CAST(sum(CASE WHEN cf > m
                     THEN (CAST(1 AS BIGINT) << (k - 1)) ELSE 0 END)
                   AS BIGINT) AS phash
          FROM coef JOIN med
            ON coef.doc_id = med.doc_id AND coef.f = med.f
          WHERE k > 0
          GROUP BY coef.doc_id, coef.f
        ),
        per_pos AS (
          SELECT a.doc_id AS d1, b.doc_id AS d2,
                 CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS h
          FROM code a
          JOIN code b ON a.doc_id < b.doc_id AND a.f = b.f
        )
        SELECT d1, d2, max(h) AS hamming
        FROM per_pos GROUP BY d1, d2
        HAVING max(h) <= {max_hamming} AND count(*) = {n_pos}
    """
