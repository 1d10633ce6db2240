"""Round-11 operator tests: multimodal pHash near-dup."""

import numpy as np
import pytest


def test_bmp_encode_decode_round_trip():
    """encode_bmp_gray emits REAL BMP bytes the product parser decodes
    back to the exact integer pixels (incl. row padding, bottom-up)."""
    from centimators_spark.multimodal.columns import _parse_bmp
    from centimators_spark.multimodal.phash import (
        encode_bmp_gray,
        synth_pixels,
    )

    for doc_id in (0, 1, 2, 3, 17, 101):
        p = synth_pixels(doc_id)
        arr = _parse_bmp(encode_bmp_gray(p))
        assert arr is not None and arr.shape == (8, 8, 3)
        rec = np.rint(arr[:, :, 0] * 255).astype(np.int64)
        assert (rec == p).all(), doc_id
        # grayscale: all three channels equal
        assert (arr[:, :, 0] == arr[:, :, 1]).all()


def test_synth_pixels_family_structure():
    """Groups of 4 ids share a base; offset 1 differs by exactly one
    bumped pixel; offsets 2-3 are unrelated."""
    from centimators_spark.multimodal.phash import BUMP, synth_pixels

    base = synth_pixels(8)  # g=2, o=0
    near = synth_pixels(9)  # g=2, o=1
    diff = near - base
    assert (diff != 0).sum() == 1 and diff.max() == BUMP
    assert (synth_pixels(10) != base).sum() > 16  # unrelated image


def test_dct_matrix_orthogonal_fixed_point():
    """Tq/128 is the orthonormal DCT-II to fixed-point precision, so
    the integer two-stage transform preserves image information."""
    from centimators_spark.multimodal.phash import DCT_SCALE, _dct8_int

    t = _dct8_int().astype(np.float64) / DCT_SCALE
    assert np.abs(t @ t.T - np.eye(8)).max() < 0.02


def test_hamming_band_pairs_pigeonhole_exact(spark):
    """Band blocking finds EXACTLY the thresholded pair set (recall 1
    by pigeonhole, precision 1 by the popcount verify) vs brute
    force, on adversarial codes with differing bits packed into one
    block."""
    import itertools

    from centimators_spark.multimodal.phash import hamming_band_pairs

    codes = [
        (1, 0b0),
        (2, 0b111111),            # d(1,2)=6 — all diffs in block 0
        (3, 0b1111111),           # d(1,3)=7 — just over threshold
        (4, (1 << 62) | 0b11),    # spread across first and last block
        (5, (1 << 62)),
    ]
    df = spark.createDataFrame(codes, "doc_id long, phash long")
    got = {
        (r.d1, r.d2, r.hamming)
        for r in hamming_band_pairs(df, max_hamming=6).collect()
    }
    want = set()
    for (i, a), (j, b) in itertools.combinations(codes, 2):
        h = bin(a ^ b).count("1")
        if h <= 6:
            want.add((min(i, j), max(i, j), h))
    assert got == want
    assert (1, 2, 6) in got and not any(
        d1 == 1 and d2 == 3 for d1, d2, _ in got
    )


def test_image_phash_dedup_matches_oracle_small(spark):
    """End-to-end (synth→decode→DCT hash→band pairs) vs the DuckDB
    oracle on a 40-doc corpus — the staged-gate compare in miniature."""
    import duckdb
    import pandas as pd
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_oracle import compare

    from centimators_spark.multimodal.phash import (
        image_phash_dedup,
        image_phash_oracle_sql,
    )

    docs = [(i, f"doc {i}") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sdf = image_phash_dedup(df).toPandas()
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(docs, columns=["doc_id", "text"])
    )
    odf = con.execute(image_phash_oracle_sql("documents")).fetchdf()
    assert len(sdf) >= 10  # one near-dup pair per group of 4
    assert compare("image_phash_dedup_small", sdf, odf)


def test_image_phash_plan_uses_band_join(spark):
    """The pair stage must be a band-key equi-join, never a cartesian
    product over images."""
    from centimators_spark.multimodal.phash import image_phash_dedup

    df = spark.createDataFrame(
        [(i, "x") for i in range(8)], "doc_id long, text string"
    )
    plan = image_phash_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "block_id" in plan or "block_val" in plan


def test_theta_sketch_exact_when_k_exceeds_cardinality(spark):
    """With k larger than every group's distinct-gram count the sketch
    degenerates to the exact set: theta = 2^60, n_common == the true
    intersection, and est_common == n_common (floor(n·2^60/2^60))."""
    from centimators_spark.sketches import (
        THETA_SPACE,
        theta_sketch_intersections,
    )

    docs = [
        (1, "a b c d e f", "s1"),
        (2, "c d e f g h", "s2"),
        (3, "x y z w v u", "s3"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    rows = {
        (r.src_a, r.src_b): r
        for r in theta_sketch_intersections(df, k=1000).collect()
    }
    assert len(rows) == 3
    r12 = rows[("s1", "s2")]
    # shared 3-grams of "a b c d e f" vs "c d e f g h": 'c d e','d e f'
    assert r12.theta == THETA_SPACE
    assert r12.n_common == r12.true_common == r12.est_common == 2
    r13 = rows[("s1", "s3")]
    assert r13.n_common == r13.true_common == r13.est_common == 0


def test_theta_sketch_two_phase_topk_equals_one_phase(spark):
    """The salted two-phase k-smallest selection must pick EXACTLY the
    global k smallest hashes per group (the union of per-salt top-k
    contains the global top-k)."""
    import duckdb
    import pandas as pd
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_oracle import compare

    from centimators_spark.sketches import (
        theta_sketch_intersections,
        theta_sketch_oracle_sql,
    )

    # enough distinct grams that k=16 truly subsamples
    docs = [
        (i, " ".join(f"w{(i * 37 + j) % 211}" for j in range(40)), f"s{i % 3}")
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    sdf = theta_sketch_intersections(df, k=16).toPandas()
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs, columns=["doc_id", "text", "source"]))
    odf = con.execute(theta_sketch_oracle_sql("documents", k=16)).fetchdf()
    assert (sdf["theta"] < (1 << 60)).all()  # real subsampling
    assert compare("theta_two_phase", sdf, odf)


def test_wav_encode_decode_round_trip():
    """encode_wav_int16 emits REAL RIFF/PCM bytes the product parser
    decodes back to the exact int16 samples; out-of-range samples
    raise instead of wrapping (the int16-overflow class caught by the
    spark-vs-python differential during development)."""
    from centimators_spark.multimodal.audiofp import (
        encode_wav_int16,
        synth_samples,
    )
    from centimators_spark.multimodal.columns import _parse_wav

    for doc_id in (0, 1, 2, 5, 9, 42):
        x = synth_samples(doc_id)
        sr, nch, s = _parse_wav(encode_wav_int16(x))
        assert (sr, nch) == (8000, 1)
        assert (np.rint(s * 32768).astype(np.int64) == x).all(), doc_id
    with pytest.raises(ValueError):
        encode_wav_int16(np.array([40000], dtype=np.int64))


def test_audio_fingerprint_matches_python(spark):
    """The Arrow kernel's fingerprint == a pure-python recomputation
    from the synth formula (decode round-trip included)."""
    from centimators_spark.multimodal.audiofp import (
        WIN,
        audio_fingerprint,
        synth_samples,
        synth_wav_clips,
    )

    df = spark.createDataFrame([(i,) for i in range(16)], "doc_id long")
    got = {
        r.doc_id: r.afp
        for r in audio_fingerprint(synth_wav_clips(df)).collect()
    }
    for d in range(16):
        x = synth_samples(d)
        e = (x * x).reshape(64, WIN).sum(axis=1)
        bits = e[1:] > e[:-1]
        want = int((bits * (np.int64(1) << np.arange(63))).sum())
        assert got[d] == want, d


def test_l_diversity_hand_trace(spark):
    """Hand-computed class profile: sizes, distinct sensitive counts,
    and the violates_l flag."""
    from centimators_spark.analytics import l_diversity

    rows = [
        # class (1, 0): 3 rows, segments {A, B} -> diverse
        (1, 0, "A"), (1, 0, "B"), (1, 0, "A"),
        # class (1, 1): 2 rows, segment {A} only -> violates l=2
        (1, 1, "A"), (1, 1, "A"),
        # class (2, 0): 1 row -> violates
        (2, 0, "C"),
    ]
    df = spark.createDataFrame(rows, "nat long, bal long, seg string")
    got = {
        (r.class_size, r.n_sensitive): (r.n_classes, r.n_rows, r.violates_l)
        for r in l_diversity(df, ["nat", "bal"], "seg", l=2).collect()
    }
    assert got == {
        (3, 2): (1, 3, False),
        (2, 1): (1, 2, True),
        (1, 1): (1, 1, True),
    }


def test_video_phash_dedup_matches_oracle_small(spark):
    """End-to-end (synth RAWV -> real frame sampling -> per-frame DCT
    hash -> per-position band join -> all-positions verify) vs the
    DuckDB oracle on a 40-doc corpus."""
    import duckdb
    import pandas as pd
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_oracle import compare

    from centimators_spark.multimodal.videofp import (
        video_phash_dedup,
        video_phash_oracle_sql,
    )

    docs = [(i, f"doc {i}") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sdf = video_phash_dedup(df).toPandas()
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs, columns=["doc_id", "text"]))
    odf = con.execute(video_phash_oracle_sql("documents")).fetchdf()
    assert len(sdf) >= 10
    assert compare("video_phash_small", sdf, odf)


def test_video_frame_sampling_positions(spark):
    """The REAL sample_video_frames stage yields exactly positions
    0, 4, 8 of the 9-frame synthetic clips, 8x8 each."""
    from centimators_spark.multimodal.columns import sample_video_frames
    from centimators_spark.multimodal.videofp import (
        EVERY_N,
        synth_rawv_clips,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    clips = synth_rawv_clips(df).select(
        F.col("doc_id").cast("string").alias("doc_id"), "content"
    )
    frames = sample_video_frames(
        clips, content_col="content", path_col="doc_id", every_n=EVERY_N
    ).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.path, []).append(r.frame_index)
        assert (r.width, r.height) == (8, 8)
    assert all(sorted(v) == [0, 4, 8] for v in by_doc.values())
