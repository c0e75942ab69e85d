from .media import (  # noqa: F401
    MEDIA_SCHEMA,
    DECODED_IMAGE_SCHEMA,
    FRAME_SCHEMA,
    AUDIO_FEATURES_SCHEMA,
    synthetic_media,
    decode_images,
    resize_images,
    image_features,
    sample_frames,
    audio_features,
)
