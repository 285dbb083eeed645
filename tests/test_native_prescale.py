"""Native (C++) prescale kernel: byte-exact parity with the cv2 ops it
replaces (cvtColor BGR2YUV_I420 and INTER_LINEAR uint8 plane resize), on
every geometry the dispatch gate admits.

The native path is the default host prescale (ops/preprocess.py routes
host_to_i420 / host_letterbox_i420 through it), so these tests pin the
whole 4:2:0 transport contract: any mismatch with cv2 would silently
shift pixels under the models (reference transform chain:
/root/reference/eagle/models/coordinate_model.py:62-64 resize +
the working-resolution prescale of docs/parity.md deviation 3/7).
"""

import numpy as np
import pytest

from eagle_tpu import native
from eagle_tpu.ops.preprocess import (
    _host_letterbox_i420_cv2,
    _host_to_i420_cv2,
    _i420_pad_values,
    compute_work_geometry,
    host_letterbox_i420,
    host_to_i420,
    i420_geometry_ok,
)

pytestmark = pytest.mark.skipif(
    not native.prescale_available(), reason="native prescale did not build"
)


@pytest.mark.parametrize(
    "hw", [(720, 1280), (1080, 1920), (4, 4), (8, 6), (108, 192), (540, 960)]
)
def test_bgr_to_i420_bit_exact(hw):
    rng = np.random.default_rng(hash(hw) % 2**31)
    frames = rng.integers(0, 256, (3, *hw, 3), np.uint8)
    got = native.bgr_to_i420(frames, threads=1)
    assert np.array_equal(got, _host_to_i420_cv2(frames))


def test_bgr_to_i420_threads_match_serial():
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (5, 72, 128, 3), np.uint8)
    assert np.array_equal(
        native.bgr_to_i420(frames, threads=4), native.bgr_to_i420(frames, threads=1)
    )


@pytest.mark.parametrize("hw", [(720, 1280), (1080, 1920), (544, 960), (720, 960)])
def test_letterbox_i420_bit_exact_production_geometries(hw):
    geom = compute_work_geometry(hw, 960)
    assert i420_geometry_ok(geom, hw) and geom.img_w % 32 == 0
    rng = np.random.default_rng(hash(hw) % 2**31)
    frames = rng.integers(0, 256, (2, *hw, 3), np.uint8)
    yp, uvp = _i420_pad_values()
    got = native.letterbox_i420(frames, geom, yp, uvp, threads=1)
    assert np.array_equal(got, _host_letterbox_i420_cv2(frames, geom))


def test_letterbox_i420_bit_exact_fuzzed_geometries():
    """Random downscale geometries inside the dispatch gate (img_w % 32
    == 0, even pads, h % 4 == 0): the native kernel must be byte-identical
    to the cv2 composition on each."""
    from eagle_tpu.config import WorkGeometry

    rng = np.random.default_rng(42)
    tested = 0
    while tested < 12:
        h = int(rng.integers(16, 200)) * 4
        w = int(rng.integers(8, 200)) * 2
        img_w = int(rng.integers(1, max(2, w // 32) + 1)) * 32
        img_h = int(rng.integers(2, max(3, h // 2) + 1)) * 2
        if img_h > h or img_w > w:
            continue
        pad_y = int(rng.integers(0, 3)) * 2
        pad_x = int(rng.integers(0, 3)) * 2
        ch, cw = img_h + pad_y * 2, img_w + pad_x * 2
        if ch % 4 != 0:
            continue
        geom = WorkGeometry(
            enabled=True,
            gain=img_w / w,
            pad_x=pad_x,
            pad_y=pad_y,
            img_h=img_h,
            img_w=img_w,
            canvas_h=ch,
            canvas_w=cw,
            orig_h=h,
            orig_w=w,
        )
        frames = rng.integers(0, 256, (1, h, w, 3), np.uint8)
        yp, uvp = _i420_pad_values()
        got = native.letterbox_i420(frames, geom, yp, uvp, threads=1)
        ref = _host_letterbox_i420_cv2(frames, geom)
        assert np.array_equal(got, ref), (
            f"native letterbox != cv2 at src {h}x{w} img {img_h}x{img_w} "
            f"pad ({pad_y},{pad_x}) canvas {ch}x{cw}"
        )
        tested += 1


def test_dispatch_functions_use_native_and_agree():
    """The public host_to_i420 / host_letterbox_i420 dispatchers produce
    cv2's bytes whichever path the gate picks."""
    hw = (720, 1280)
    geom = compute_work_geometry(hw, 960)
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (2, *hw, 3), np.uint8)
    assert np.array_equal(host_to_i420(frames), _host_to_i420_cv2(frames))
    assert np.array_equal(
        host_letterbox_i420(frames, geom), _host_letterbox_i420_cv2(frames, geom)
    )


def test_gate_rejects_upscale():
    """An upscale geometry must fall back to cv2 (the native vertical
    descale is only pinned for downscales) -- dispatch output still equals
    the cv2 composition by construction."""
    hw = (96, 128)
    from eagle_tpu.config import WorkGeometry

    geom = WorkGeometry(
        enabled=True,
        gain=2.0,
        pad_x=0,
        pad_y=0,
        img_h=192,
        img_w=256,
        canvas_h=192,
        canvas_w=256,
        orig_h=96,
        orig_w=128,
    )
    rng = np.random.default_rng(4)
    frames = rng.integers(0, 256, (1, *hw, 3), np.uint8)
    assert np.array_equal(
        host_letterbox_i420(frames, geom), _host_letterbox_i420_cv2(frames, geom)
    )
