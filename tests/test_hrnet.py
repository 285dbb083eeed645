"""HRNet keypoint model: structural checks, torch parity (gated on the
reference checkout), heatmap decode semantics, and preprocessing parity."""

import os
import sys

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_tpu.models import hrnet
from eagle_tpu.ops.heatmap import decode_heatmaps
from eagle_tpu.ops.preprocess import preprocess_keypoint, resize_bilinear

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def params():
    return hrnet.init_params(jax.random.key(0))


def test_forward_shapes(params):
    x = jnp.zeros((2, 96, 128, 3), jnp.float32)
    y = hrnet.apply(params, x)
    assert y.shape == (2, 24, 32, 57)
    assert y.dtype == jnp.float32
    assert bool(((y >= 0) & (y <= 1)).all())


def test_upsample_align_corners_matches_torch_semantics():
    """Check the interpolation-matmul resize against a direct numpy
    implementation of align_corners=True bilinear."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 5, 7, 3)).astype(np.float32)
    out = np.asarray(hrnet.upsample_align_corners(jnp.asarray(x), (9, 13)))

    def ref_resize(img, ho, wo):
        hi, wi = img.shape[:2]
        ys = np.linspace(0, hi - 1, ho)
        xs = np.linspace(0, wi - 1, wo)
        y0 = np.floor(ys).astype(int)
        x0 = np.floor(xs).astype(int)
        y1 = np.minimum(y0 + 1, hi - 1)
        x1 = np.minimum(x0 + 1, wi - 1)
        fy = (ys - y0)[:, None, None]
        fx = (xs - x0)[None, :, None]
        a = img[y0][:, x0] * (1 - fy) * (1 - fx)
        b = img[y0][:, x1] * (1 - fy) * fx
        c = img[y1][:, x0] * fy * (1 - fx)
        d = img[y1][:, x1] * fy * fx
        return a + b + c + d

    expected = ref_resize(x[0], 9, 13)
    np.testing.assert_allclose(out[0], expected, atol=1e-5)


def test_upsample_bf16_path_within_quantization():
    """The bf16 fast path (native-precision interp matmuls, shipped for
    a measured 8.16 -> 6.79 ms/frame full HRNet forward on the TPU,
    scripts/profile_hrnet.py) must stay within bf16 quantization of the
    f32 Precision.HIGHEST path on the same values."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 17, 30, 48)).astype(np.float32)
    want = np.asarray(hrnet.upsample_align_corners(jnp.asarray(x), (34, 60)))
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    got = np.asarray(hrnet.upsample_align_corners(xb, (34, 60)).astype(jnp.float32))
    # input rounding (2^-8) + weight rounding (2^-9) on |x| ~ N(0,1)
    assert np.abs(got - want).max() <= 0.04
    # identity shortcut keeps the dtype
    same = hrnet.upsample_align_corners(xb, (17, 30))
    assert same.dtype == jnp.bfloat16


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference checkout not available")
def test_parity_with_torch_reference():
    """Random-init the reference torch KeypointModel, convert its weights,
    and require matching outputs (the converter/architecture round-trip)."""
    import importlib.util

    import torch

    # load the module file directly: the reference package __init__ pulls in
    # ultralytics, which is not installed here
    spec = importlib.util.spec_from_file_location(
        "ref_keypoint_hrnet", os.path.join(REFERENCE, "eagle/models/keypoint_hrnet.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    KeypointModel = mod.KeypointModel

    torch.manual_seed(0)
    model = KeypointModel(57)
    # randomize BN stats too so the test exercises them
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
            if isinstance(m, torch.nn.Conv2d):
                m.weight.normal_(0, 0.05)
    model.eval()

    from eagle_tpu.models.convert import hrnet_from_torch

    params = hrnet_from_torch(model.state_dict())

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 96, 128, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(hrnet.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3)


def test_decode_heatmaps_matches_reference_semantics():
    """Compare against a numpy rerun of get_keypoints + the caller's
    threshold/dedup logic (keypoint_hrnet.py:575-595,
    coordinate_model.py:229-248)."""
    rng = np.random.default_rng(2)
    n, h, w, k = 2, 18, 30, 57
    hm = rng.uniform(size=(n, h, w, k)).astype(np.float32) * 0.8
    # plant exact duplicates at one pixel to exercise dedup
    hm[0, 5, 7, 10] = 0.9
    hm[0, 5, 7, 20] = 0.95  # different label, same peak pixel -> 20 wins
    hm[1, :, :, 3] = 0.001  # below floor

    img_h, img_w = 540, 960
    conf = 0.3
    kp, valid = decode_heatmaps(jnp.asarray(hm), conf, (img_h, img_w))
    kp, valid = np.asarray(kp), np.asarray(valid)

    # numpy oracle
    expected = {}
    tmp = {}
    for b in range(n):
        tmp_b = {}
        for i in range(k):
            heat = hm[b, :, :, i]
            y, x = np.unravel_index(np.argmax(heat), heat.shape)
            score = heat[y, x]
            if score <= 0.01 or score < conf:
                continue
            xi = int(x / (w - 1) * img_w)
            yi = int(y / (h - 1) * img_h)
            tmp_b[i] = (xi, yi, score)
        # dedup: per pixel keep max score, ties -> last label
        coords_to_label = {}
        vals = list(tmp_b.values())
        for lab, v in tmp_b.items():
            same = [x for x in vals if x[:2] == v[:2]]
            if len(same) == 1 or v[2] == max(s[2] for s in same):
                coords_to_label[v[:2]] = lab
        expected[b] = {lab: c for c, lab in coords_to_label.items()}

    for b in range(n):
        got = {i: (int(kp[b, i, 0]), int(kp[b, i, 1])) for i in range(k) if valid[b, i]}
        assert got == expected[b]


def test_resize_bilinear_matches_cv2():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(72, 128, 3), dtype=np.uint8)
    ours = np.asarray(resize_bilinear(jnp.asarray(img[None]), (54, 96)))[0]
    ref = cv2.resize(img, (96, 54), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours - ref).max() <= 1.0  # cv2 uses fixed-point arithmetic


def test_preprocess_keypoint_matches_reference_chain():
    rng = np.random.default_rng(4)
    frame = rng.integers(0, 256, size=(72, 128, 3), dtype=np.uint8)  # BGR
    ours = np.asarray(preprocess_keypoint(jnp.asarray(frame[None]), out_hw=(54, 96)))[0]

    rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    resized = cv2.resize(rgb, (96, 54), interpolation=cv2.INTER_LINEAR).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406]) * 255
    std = np.array([0.229, 0.224, 0.225]) * 255
    expected = (resized - mean) / std
    assert np.abs(ours - expected).max() < 0.02  # ~1 uint8 LSB / std
