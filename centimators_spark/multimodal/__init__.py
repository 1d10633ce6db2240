from centimators_spark.multimodal.columns import (
    read_binary_dir,
    with_media_metadata,
    decode_images,
    decode_audio,
    extract_image_features,
    sample_video_frames,
)
from centimators_spark.multimodal.phash import (
    hamming_band_pairs,
    image_phash,
    image_phash_dedup,
)
from centimators_spark.multimodal.audiofp import (
    audio_fingerprint,
    audio_fingerprint_dedup,
)
from centimators_spark.multimodal.videofp import (
    frame_phash,
    video_phash_dedup,
)

__all__ = [
    "read_binary_dir",
    "with_media_metadata",
    "decode_images",
    "decode_audio",
    "extract_image_features",
    "sample_video_frames",
    "hamming_band_pairs",
    "image_phash",
    "image_phash_dedup",
    "audio_fingerprint",
    "audio_fingerprint_dedup",
    "frame_phash",
    "video_phash_dedup",
]
