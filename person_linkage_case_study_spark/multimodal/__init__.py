from .media import (
    attach_media_payload,
    decode_image,
    extract_media_features,
    sample_frames,
)

__all__ = [
    "attach_media_payload",
    "decode_image",
    "extract_media_features",
    "sample_frames",
]
