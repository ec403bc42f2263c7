from .media import (
    attach_media_payload,
    box_downsample,
    decode_image,
    encode_wav,
    extract_audio_meta,
    extract_media_features,
    parse_wav,
    resize_images,
    sample_frames,
)

__all__ = [
    "attach_media_payload",
    "box_downsample",
    "decode_image",
    "encode_wav",
    "extract_audio_meta",
    "extract_media_features",
    "parse_wav",
    "resize_images",
    "sample_frames",
]
