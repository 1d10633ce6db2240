"""Perceptual-hash (pHash) near-duplicate detection for images — the
multimodal member of the dedup family (reference scope: the engine's
dedup surface, e.g. /root/reference/src/centimators/ — text/embedding
dedup generalized to binary image columns).

Pipeline (the product path, real at every stage):

1. image bytes (binary column) → :func:`multimodal.columns.decode_images`
   (real BMP parse, Arrow batches);
2. fixed-point integer 8×8 DCT pHash per image
   (:func:`image_phash`) — grayscale 8×8 → two-stage integer DCT
   ``Tq @ p @ Tqᵀ`` with ``Tq = rint(DCT_II · 2⁷)`` (the SAME 64
   integer literals both engines use), drop the DC term, threshold the
   63 AC coefficients at their 32nd-smallest value → a 63-bit code;
3. Hamming-band blocking over the codes
   (:func:`hamming_band_pairs`, the pigeonhole block-permutation
   trick shared with dedup/simhash.py) → candidate pairs → exact
   ``bit_count(xor)`` verify.

Exactness discipline: every arithmetic step is INTEGER (pixel values
0..255, integer DCT matrix, order-statistic threshold), so the code —
and therefore the pair set — is hash-provable against the DuckDB
oracle (the cms_heavy_hitters discipline: hash-proven, not
tolerance-banded). The float32 [0,1] pixels from decode_images
round-trip exactly: ``rint(p/255 · 255) == p`` for p in 0..255.

Scale: the per-image hash is a 64-multiply Arrow kernel; the pair
stage is the band join (never all-pairs) — two images within Hamming
distance d must share one of d+1 blocks, so recall is exact by
pigeonhole while the join key keeps the shuffle linear in corpus
size. 63 bits split into 7 blocks of 9 at the default d=6.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PHASH_BITS = 63  # AC coefficients only; fits a signed BIGINT exactly
DCT_SCALE = 128  # 2^7 per stage → 2^14 total fixed-point scale
GRAY_MOD = 200  # synthetic pixel range [0, 200): bump +55 stays < 256
BUMP = 33  # single-pixel perturbation of the near-dup variant: at the
# gate SFs this yields intra-group Hamming distances {0, 2, 4, 6} —
# including pairs exactly AT the max_hamming=6 boundary — so the
# near-dup (not just exact-dup) path is genuinely exercised


def _dct8_int() -> "np.ndarray":  # noqa: F821
    """8-point DCT-II orthonormal matrix, fixed-point:
    ``Tq[u, x] = rint(alpha(u)·cos((2x+1)uπ/16) · 128)`` — int64.
    Deterministic integer literals shared verbatim with the oracle."""
    import numpy as np

    x = np.arange(8)
    t = np.cos((2 * x[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16)
    t[0] *= np.sqrt(1 / 8)
    t[1:] *= np.sqrt(2 / 8)
    return np.rint(t * DCT_SCALE).astype(np.int64)


def _md5_mod(s: str, mod: int) -> int:
    """Python twin of text/portable.md5_long (first 15 md5 hex chars as
    int) reduced mod ``mod`` — identical on both engines."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def synth_pixels(doc_id: int) -> "np.ndarray":  # noqa: F821
    """Deterministic 8×8 grayscale image for a doc id — the fixture
    formula (mirrored literally by the oracle SQL): groups of 4
    consecutive ids share a base image; offset 0 is the canonical
    copy, offset 1 bumps ONE pixel by +3 (a near-duplicate), offsets
    2-3 are unrelated unique images."""
    import numpy as np

    g, o = doc_id // 4, doc_id % 4
    if o <= 1:
        p = np.array(
            [_md5_mod(f"img:{g}:{i}", GRAY_MOD) for i in range(64)],
            dtype=np.int64,
        )
        if o == 1:
            p[g % 64] += BUMP
    else:
        p = np.array(
            [_md5_mod(f"uniq:{doc_id}:{i}", GRAY_MOD) for i in range(64)],
            dtype=np.int64,
        )
    return p.reshape(8, 8)


def encode_bmp_gray(p: "np.ndarray") -> bytes:  # noqa: F821
    """REAL uncompressed 24-bit bottom-up BMP bytes from an h×w integer
    grayscale array (r=g=b) — parseable by columns._parse_bmp and any
    image viewer; includes the 4-byte row padding the parser strips."""
    h, w = p.shape
    stride = (w * 3 + 3) // 4 * 4
    size = 54 + stride * h
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0
    )
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            v = int(p[y, x]) & 0xFF
            row += bytes((v, v, v))  # BGR, gray
        row += b"\x00" * (stride - len(row))
        rows += row
    return bytes(hdr) + bytes(rows)


def synth_bmp_images(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Fixture-synthesis stage: (doc_id, content binary) with REAL BMP
    bytes from :func:`synth_pixels` — the image-corpus analogue of
    multimodal_metadata's text→UTF-8 payload (deterministic, so the
    oracle recomputes pixels from the id formula, never from bytes)."""
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        StructField,
        StructType,
    )

    from centimators_spark.scanstats import spread_if_underpartitioned

    # spread the synth→decode→pHash chain (see videofp; r13)
    narrow = spread_if_underpartitioned(
        df.select(F.col(id_col).alias("doc_id")), "doc_id"
    )
    schema = StructType(
        [narrow.schema["doc_id"], StructField("content", BinaryType())]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base_cache: dict[int, bytes] = {}
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 4 == 0 and d // 4 in base_cache:
                    out.append(base_cache[d // 4])
                    continue
                b = encode_bmp_gray(synth_pixels(d))
                if d % 4 == 0:
                    base_cache[d // 4] = b
                out.append(b)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": out})

    return narrow.mapInPandas(compute, schema)


def image_phash(
    decoded: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, phash) from decode_images output (width/height/pixels):
    per image, integer grayscale → two-stage fixed-point DCT → drop DC
    → 63 AC bits thresholded at their 32nd-smallest value. Pure-numpy
    Arrow kernel; rows that failed to decode (null pixels) or are not
    8×8 are dropped (the decode stage's degradation contract)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    tq = _dct8_int()
    weights = np.int64(1) << np.arange(PHASH_BITS, dtype=np.int64)
    narrow = decoded.select(
        F.col(id_col).alias("doc_id"), "width", "height", "pixels"
    )
    schema = StructType(
        [narrow.schema["doc_id"], StructField("phash", LongType())]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, codes = [], []
            for doc_id, w, h, px in zip(
                pdf["doc_id"], pdf["width"], pdf["height"], pdf["pixels"]
            ):
                if px is None or w != 8 or h != 8:
                    continue
                # RGB float32 [0,1] → integer gray (r=g=b by build;
                # general images would use an integer luma here)
                p = np.rint(
                    np.asarray(px, dtype=np.float64).reshape(8, 8, 3)[
                        :, :, 0
                    ]
                    * 255.0
                ).astype(np.int64)
                coef = tq @ p @ tq.T  # exact int64
                ac = coef.ravel()[1:]
                m = np.sort(ac)[31]  # 32nd smallest — both engines
                codes.append(int(((ac > m) * weights).sum()))
                ids.append(doc_id)
            yield pd.DataFrame({"doc_id": ids, "phash": codes})

    return narrow.mapInPandas(compute, schema)


def hamming_band_pairs(
    codes: DataFrame,
    *,
    id_col: str = "doc_id",
    code_col: str = "phash",
    max_hamming: int = 6,
    bits: int = PHASH_BITS,
) -> DataFrame:
    """(d1, d2, hamming ≤ max_hamming) by block-permutation LSH over
    any integer code column — the generic form of simhash_pairs'
    banding: split ``bits`` into (max_hamming+1) blocks; two codes
    within the threshold must agree on ≥1 block (pigeonhole), so the
    band self-join finds ALL qualifying pairs and exact popcount
    verifies. Never an all-pairs join."""
    fp = codes.select(
        F.col(id_col).alias("doc_id"), F.col(code_col).alias("code")
    )
    n_blocks = max_hamming + 1
    width = (bits + n_blocks - 1) // n_blocks
    blocks = fp.select(
        "doc_id",
        "code",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block_id"),
                        F.shiftrightunsigned(F.col("code"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("block_val"),
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("blk"),
    ).select("doc_id", "code", "blk.block_id", "blk.block_val")
    cand = (
        blocks.alias("a")
        .join(blocks.alias("b"), ["block_id", "block_val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.col("a.code").alias("c1"),
            F.col("b.code").alias("c2"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("c1").bitwiseXOR(F.col("c2")))
    return cand.select(
        "d1", "d2", hamming.cast("long").alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def image_phash_dedup(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    max_hamming: int = 6,
    blobs: DataFrame | None = None,
) -> DataFrame:
    """End-to-end multimodal near-dup: synth BMP corpus → REAL decode
    → integer DCT pHash → Hamming-band pairs (d1, d2, hamming).

    ``blobs``: optionally a prebuilt (doc_id, content) blob table for
    exactly ``df``'s ids (e.g. the session-shared synth artifact —
    a stored image corpus stands in for the per-query synthesis;
    the synth is a pure per-id function, so the values are identical
    by construction). The decode → pHash → band-join contract still
    runs in full either way."""
    from centimators_spark.multimodal.columns import decode_images

    imgs = (
        blobs if blobs is not None else synth_bmp_images(df, id_col=id_col)
    ).select(
        # decode_images' output keys images by a string path column
        F.col("doc_id").cast("string").alias("doc_id"),
        "content",
    )
    decoded = decode_images(imgs, content_col="content", path_col="doc_id")
    codes = image_phash(
        decoded.select(
            F.col("path").cast("long").alias("doc_id"),
            "width",
            "height",
            "pixels",
        )
    )
    # the band stage self-joins the codes: cut the lineage so the
    # synth→decode→hash kernel chain executes ONCE, not once per join
    # side (8 bytes/image — at cluster scale persist/write the code
    # table, exactly how a pHash index ships)
    codes = codes.localCheckpoint(eager=True)
    return hamming_band_pairs(codes, max_hamming=max_hamming)


def image_phash_oracle_sql(
    table: str = "documents", *, max_hamming: int = 6
) -> str:
    """DuckDB mirror: pixels from the SAME id formula (portable md5),
    the SAME 64 integer DCT literals applied as two broadcast-join
    stages, order-statistic threshold, then EXACT all-pairs Hamming
    (sound at gate SF; the engine's band join is recall-exact by
    pigeonhole, so the sets match)."""
    tq = _dct8_int()
    tq_rows = ", ".join(
        f"({u}, {x}, {int(tq[u, x])})" for u in range(8) for x in range(8)
    )

    def md5_mod(expr: str, mod: int) -> str:
        return (
            f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"
            f" % {mod}"
        )

    base = md5_mod("'img:' || (doc_id // 4) || ':' || i", GRAY_MOD)
    uniq = md5_mod("'uniq:' || doc_id || ':' || i", GRAY_MOD)
    return f"""
        WITH tq(u, x, c) AS (VALUES {tq_rows}),
        ids AS (SELECT doc_id FROM {table}),
        pix AS (
          SELECT doc_id, i, i // 8 AS px, i % 8 AS py,
                 CASE WHEN doc_id % 4 <= 1 THEN
                        {base}
                        + CASE WHEN doc_id % 4 = 1
                                AND i = (doc_id // 4) % 64
                               THEN {BUMP} ELSE 0 END
                      ELSE {uniq} END AS p
          FROM ids CROSS JOIN (SELECT unnest(range(64)) AS i)
        ),
        s1 AS (
          SELECT doc_id, tq.u AS u, py, sum(tq.c * p) AS r
          FROM pix JOIN tq ON tq.x = pix.px
          GROUP BY doc_id, tq.u, py
        ),
        coef AS (
          SELECT doc_id, s1.u * 8 + tq.u AS k, sum(tq.c * r) AS cf
          FROM s1 JOIN tq ON tq.x = s1.py
          GROUP BY doc_id, s1.u, tq.u
        ),
        med AS (
          SELECT doc_id, cf AS m FROM (
            SELECT doc_id, cf, row_number() OVER (
              PARTITION BY doc_id ORDER BY cf, k) AS rn
            FROM coef WHERE k > 0)
          WHERE rn = 32
        ),
        code AS (
          SELECT coef.doc_id,
                 sum(CASE WHEN cf > m
                     THEN (CAST(1 AS BIGINT) << (k - 1)) ELSE 0 END)
                   AS phash
          FROM coef JOIN med ON coef.doc_id = med.doc_id
          WHERE k > 0
          GROUP BY coef.doc_id
        )
        SELECT a.doc_id AS d1, b.doc_id AS d2,
               CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT)
                 AS hamming
        FROM code a JOIN code b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.phash, b.phash)) <= {max_hamming}
    """
