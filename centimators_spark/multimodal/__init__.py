from centimators_spark.multimodal.columns import (
    read_binary_dir,
    with_media_metadata,
    decode_images,
    decode_audio,
    extract_image_features,
    sample_video_frames,
)

__all__ = [
    "read_binary_dir",
    "with_media_metadata",
    "decode_images",
    "decode_audio",
    "extract_image_features",
    "sample_video_frames",
]
