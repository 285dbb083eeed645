from eagle_tpu.io.video import (
    VideoFrameSource,
    iter_video,
    read_video,
    read_video_array,
    write_video,
)

__all__ = [
    "VideoFrameSource",
    "iter_video",
    "read_video",
    "read_video_array",
    "write_video",
]
