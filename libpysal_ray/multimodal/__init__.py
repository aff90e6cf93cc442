from libpysal_ray.multimodal.stages import (  # noqa: F401
    AudioFrameSampler,
    ImageDecoder,
    ImageResizer,
    attach_fake_media,
    decode_images,
    extract_features,
    resize_images,
    sample_audio_frames,
    sample_video_frames,
    VideoFrameSampler,
)
