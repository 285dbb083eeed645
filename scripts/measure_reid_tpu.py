"""Measure the OSNet ReID forward's cost INSIDE the production detector
program on the attached TPU (the throughput half of documented deviation
#10, docs/parity.md).

Compares the full jitted detector program (YOLOv8-l @ 544x960 rect
letterbox + NMS, bf16, the exact ``_det_runner`` bench.py drives) with
appearance OFF vs appearance ON (OSNet-x0.25, 64 reid slots, 256x128
crops, 512-d head) at the production PIECE batch.  The delta is what
flipping ``TrackerConfig.use_appearance=True`` costs per frame.

Timing protocol (CLAUDE.md): tunnel RTT ~25 ms swamps single calls and
block_until_ready returns early, so each program is slope-timed via a
fori_loop of data-dependency-chained executions ending in one tiny real
readback (scripts/profile_detector.py::slope_time).

Run: python scripts/measure_reid_tpu.py   (claims the TPU; one JSON line)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from profile_detector import slope_time

    from eagle_tpu.config import PipelineConfig, TrackerConfig
    from eagle_tpu.pipeline.coordinate_model import PIECE, CoordinateModel

    img_hw = (720, 1280)
    results = {}
    runners = {}
    for label, tracker in (
        ("appearance_off", TrackerConfig(use_appearance=False)),
        ("osnet_64slots", TrackerConfig(use_appearance=True, embedder="osnet")),
    ):
        model = CoordinateModel(
            config=PipelineConfig().replace(tracker=tracker), verbose_init=False
        )
        geom = model._geometry(img_hw)
        assert geom.enabled
        runners[label] = (model, geom)

    rng = np.random.default_rng(0)
    geom = runners["appearance_off"][1]
    x = jax.device_put(
        rng.integers(0, 255, (PIECE, geom.canvas_h, geom.canvas_w, 3), dtype=np.uint8)
    )

    for label, (model, geom) in runners.items():
        det = model._det_runner(geom, img_hw)
        t = slope_time(lambda _p, xc: det(xc), None, x)
        results[label] = t * 1e3 / PIECE  # ms per frame
        print(f"{label}: {results[label]:.4f} ms/frame (PIECE={PIECE})", file=sys.stderr)

    results["osnet_delta_ms_per_frame"] = results["osnet_64slots"] - results["appearance_off"]
    print(json.dumps({k: round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
