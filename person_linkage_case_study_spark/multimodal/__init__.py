from .media import (
    attach_media_payload,
    box_downsample,
    decode_image,
    extract_media_features,
    resize_images,
    sample_frames,
)

__all__ = [
    "attach_media_payload",
    "box_downsample",
    "decode_image",
    "extract_media_features",
    "resize_images",
    "sample_frames",
]
