from eagle_tpu.io.video import read_video, read_video_array, write_video

__all__ = ["read_video", "read_video_array", "write_video"]
