"""Reference-shaped import path (`eagle.processor` -> `eagle_tpu.processor`)."""

from eagle_tpu.pipeline.processor import (  # noqa: F401
    KalmanFilter,
    Processor,
    calculate_distance,
    color_ranges,
    interpolate_df,
    smooth_df,
)
