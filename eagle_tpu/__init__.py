"""eagle-tpu: a TPU-native (JAX/XLA/Pallas) broadcast-football tracking
framework with the capabilities of nreHieW/Eagle.

Layers (mirroring SURVEY.md section 1, re-architected for TPU):

- :mod:`eagle_tpu.pitch` -- static pitch geometry (57 landmarks).
- :mod:`eagle_tpu.io` -- host video decode/encode (the only non-XLA stage).
- :mod:`eagle_tpu.models` -- HRNet keypoint model and YOLOv8 detector as
  functional flax modules with torch-weight converters.
- :mod:`eagle_tpu.ops` -- device kernels: preprocessing, NMS, heatmap
  decode, DLT/RANSAC homography, optical flow, Kalman, Hungarian, KMeans.
- :mod:`eagle_tpu.track` -- BoTSORT-style tracker as a scan-compatible
  fixed-shape state machine.
- :mod:`eagle_tpu.pipeline` -- CoordinateModel / Processor public API.
- :mod:`eagle_tpu.parallel` -- mesh + sharding over ICI.
"""

from eagle_tpu.config import DEFAULT_CONFIG, PipelineConfig

__version__ = "0.1.0"

__all__ = ["DEFAULT_CONFIG", "PipelineConfig", "CoordinateModel", "Processor", "__version__"]


def __getattr__(name):
    # lazy top-level API (importing the pipeline pulls in the full op stack)
    if name == "CoordinateModel":
        from eagle_tpu.pipeline.coordinate_model import CoordinateModel

        return CoordinateModel
    if name == "Processor":
        from eagle_tpu.pipeline.processor import Processor

        return Processor
    raise AttributeError(name)
