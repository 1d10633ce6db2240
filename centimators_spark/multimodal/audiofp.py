"""Acoustic-fingerprint near-duplicate detection for audio — the
audio member of the multimodal dedup family beside images
(multimodal/phash.py).

Fingerprint: the Haitsma & Kalker (2002) sign-of-energy-difference
scheme reduced to its exactly-computable core — split the PCM stream
into 64 fixed windows, per-window energy ``e_w = Σ x²`` (exact int64
on int16 samples), bit k = 1 iff ``e_{k+1} > e_k`` → a 63-bit code.
Pairs come from the SAME pigeonhole Hamming-band join as the image
path (:func:`multimodal.phash.hamming_band_pairs`).

Every step is INTEGER (int16 samples recovered exactly from the real
WAV decode, integer squares/sums, sign comparisons), so the code and
the pair set are hash-provable against the DuckDB oracle — the image
pHash discipline carried to a second modality.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centimators_spark.multimodal.phash import (
    _md5_mod,
    hamming_band_pairs,
)

N_SAMPLES = 256  # per synthetic clip
WIN = 4  # samples per energy window → 64 windows → 63 diff bits
AUDIO_SPAN = 50000  # sample range [-25000, 24999]
AUDIO_BUMP = 7000  # added to one window's samples in the near-dup
# variant; 24999 + 7000 = 31999 < 2^15 so every synthetic sample fits
# int16 EXACTLY (an earlier 60000/12000 choice overflowed the WAV
# encode and silently wrapped — caught by the spark-vs-python
# differential)
SAMPLE_RATE = 8000


def synth_samples(doc_id: int) -> "np.ndarray":  # noqa: F821
    """Deterministic int16 PCM clip for a doc id (mirrored literally by
    the oracle SQL): groups of 4 consecutive ids share a base clip;
    offset 0 is canonical, offset 1 adds a bump to ONE window's
    samples (a near-duplicate), offsets 2-3 are unrelated clips."""
    import numpy as np

    g, o = doc_id // 4, doc_id % 4
    if o <= 1:
        x = np.array(
            [
                _md5_mod(f"aud:{g}:{t}", AUDIO_SPAN) - AUDIO_SPAN // 2
                for t in range(N_SAMPLES)
            ],
            dtype=np.int64,
        )
        if o == 1:
            w = g % (N_SAMPLES // WIN)
            x[w * WIN : (w + 1) * WIN] += AUDIO_BUMP
    else:
        x = np.array(
            [
                _md5_mod(f"uaud:{doc_id}:{t}", AUDIO_SPAN) - AUDIO_SPAN // 2
                for t in range(N_SAMPLES)
            ],
            dtype=np.int64,
        )
    return x


def encode_wav_int16(
    x: "np.ndarray", sample_rate: int = SAMPLE_RATE  # noqa: F821
) -> bytes:
    """REAL mono 16-bit PCM RIFF/WAVE bytes — parseable by
    columns._parse_wav and any audio tool. Out-of-range samples raise
    rather than silently wrapping in the int16 cast."""
    import numpy as np

    if len(x) and (np.min(x) < -32768 or np.max(x) > 32767):
        raise ValueError("encode_wav_int16: samples exceed int16 range")
    data = x.astype("<i2").tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
        )
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def synth_wav_clips(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture-synthesis stage: (doc_id, content binary) with REAL WAV
    bytes from :func:`synth_samples`."""
    import pandas as pd
    from pyspark.sql.types import BinaryType, StructField, StructType

    from centimators_spark.scanstats import spread_if_underpartitioned

    # spread the synth→decode→fingerprint chain (see videofp; r13)
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
                b = encode_wav_int16(synth_samples(d))
                if d % 4 == 0:
                    base_cache[d // 4] = b
                out.append(b)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": out})

    return narrow.mapInPandas(compute, schema)


def audio_fingerprint(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, afp) per decodable WAV clip: real PCM parse
    (columns._parse_wav), exact int16 recovery, 64 window energies,
    63 sign-of-difference bits. Arrow kernel, integer end to end."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from centimators_spark.multimodal.columns import _parse_wav

    n_win = N_SAMPLES // WIN
    weights = np.int64(1) << np.arange(n_win - 1, dtype=np.int64)
    narrow = df.select(
        F.col(id_col).alias("doc_id"), F.col(content_col).alias("c")
    )
    schema = StructType(
        [narrow.schema["doc_id"], StructField("afp", LongType())]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, codes = [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["c"]):
                parsed = (
                    _parse_wav(bytes(content))
                    if content is not None
                    else None
                )
                if parsed is None:
                    continue
                _, _, samples = parsed
                if len(samples) != N_SAMPLES:
                    continue
                # mono int16 decode divides by 32768: recover exactly
                x = np.rint(samples * 32768.0).astype(np.int64)
                e = (x * x).reshape(n_win, WIN).sum(axis=1)
                bits = e[1:] > e[:-1]
                codes.append(int((bits * weights).sum()))
                ids.append(doc_id)
            yield pd.DataFrame({"doc_id": ids, "afp": codes})

    return narrow.mapInPandas(compute, schema)


def audio_fingerprint_dedup(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    max_hamming: int = 6,
    blobs: DataFrame | None = None,
) -> DataFrame:
    """End-to-end audio near-dup: synth WAV corpus → REAL decode →
    energy-difference fingerprint → Hamming-band pairs
    (d1, d2, hamming).

    ``blobs``: optionally a prebuilt (doc_id, content) clip table for
    exactly ``df``'s ids (see phash.image_phash_dedup — values
    identical by construction; decode → fingerprint → band join still
    run in full)."""
    codes = audio_fingerprint(
        blobs if blobs is not None else synth_wav_clips(df, id_col=id_col)
    )
    codes = codes.localCheckpoint(eager=True)  # one kernel pass, not two
    return hamming_band_pairs(
        codes, code_col="afp", max_hamming=max_hamming
    )


def audio_fingerprint_oracle_sql(
    table: str = "documents", *, max_hamming: int = 6
) -> str:
    """DuckDB mirror: samples from the SAME id formula (portable md5),
    identical window energies / sign bits, exact all-pairs Hamming at
    gate SF (the engine's band join is recall-exact by pigeonhole)."""
    half = AUDIO_SPAN // 2
    n_win = N_SAMPLES // WIN

    def md5_mod(expr: str, mod: int) -> str:
        return (
            f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"
            f" % {mod}"
        )

    base = md5_mod("'aud:' || (doc_id // 4) || ':' || t", AUDIO_SPAN)
    uniq = md5_mod("'uaud:' || doc_id || ':' || t", AUDIO_SPAN)
    return f"""
        WITH ids AS (SELECT doc_id FROM {table}),
        samples AS (
          SELECT doc_id, t, t // {WIN} AS w,
                 CASE WHEN doc_id % 4 <= 1 THEN
                        {base} - {half}
                        + CASE WHEN doc_id % 4 = 1
                                AND t // {WIN} =
                                    (doc_id // 4) % {n_win}
                               THEN {AUDIO_BUMP} ELSE 0 END
                      ELSE {uniq} - {half} END AS x
          FROM ids CROSS JOIN (SELECT unnest(range({N_SAMPLES})) AS t)
        ),
        energy AS (
          SELECT doc_id, w, sum(x * x) AS e
          FROM samples GROUP BY doc_id, w
        ),
        bits AS (
          SELECT doc_id, w,
                 CASE WHEN lead(e) OVER (
                        PARTITION BY doc_id ORDER BY w) > e
                      THEN 1 ELSE 0 END AS b
          FROM energy
        ),
        code AS (
          SELECT doc_id,
                 sum(CASE WHEN b = 1
                     THEN (CAST(1 AS BIGINT) << w) ELSE 0 END) AS afp
          FROM bits WHERE w < {n_win - 1}
          GROUP BY doc_id
        )
        SELECT a.doc_id AS d1, b.doc_id AS d2,
               CAST(bit_count(xor(a.afp, b.afp)) AS BIGINT) AS hamming
        FROM code a JOIN code b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.afp, b.afp)) <= {max_hamming}
    """
