"""Working-resolution (host prescale) path: geometry math vs the
ultralytics LetterBox(auto=True) contract, host prescale vs cv2, flow
equivalence through the coordinate mapping, and an end-to-end pipeline run
with the geometry enabled."""

import numpy as np
import pytest

from eagle_tpu.config import (
    DetectorConfig,
    KeypointConfig,
    PipelineConfig,
    WorkGeometry,
)
from eagle_tpu.ops.preprocess import compute_work_geometry, host_letterbox


def _ultralytics_letterbox_geometry(shape_hw, new_size, stride=32):
    """Transcription of ultralytics LetterBox.__call__ with auto=True
    (minimum rectangle), scaleup=True -- the reference's .pt predict path."""
    h, w = shape_hw
    r = min(new_size / h, new_size / w)
    new_unpad = int(round(w * r)), int(round(h * r))
    dw, dh = new_size - new_unpad[0], new_size - new_unpad[1]
    dw, dh = dw % stride, dh % stride
    dw /= 2
    dh /= 2
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    return {
        "gain": r,
        "img_w": new_unpad[0],
        "img_h": new_unpad[1],
        "top": top,
        "left": left,
        "canvas_h": new_unpad[1] + top + bottom,
        "canvas_w": new_unpad[0] + left + right,
    }


@pytest.mark.parametrize(
    "hw,size",
    [
        ((720, 1280), 960),  # the production 720p large_hd case
        ((1080, 1920), 960),
        ((360, 640), 960),  # scale-up
        ((720, 1280), 640),
        ((540, 960), 960),
        ((480, 600), 640),  # non-16:9
        ((700, 1000), 960),  # odd paddings
    ],
)
def test_geometry_matches_ultralytics(hw, size):
    g = compute_work_geometry(hw, size)
    ref = _ultralytics_letterbox_geometry(hw, size)
    assert g.gain == pytest.approx(ref["gain"])
    assert (g.img_h, g.img_w) == (ref["img_h"], ref["img_w"])
    assert (g.pad_y, g.pad_x) == (ref["top"], ref["left"])
    assert (g.canvas_h, g.canvas_w) == (ref["canvas_h"], ref["canvas_w"])
    assert g.canvas_h % 32 == 0 and g.canvas_w % 32 == 0


def test_720p_large_hd_geometry_exact():
    """The flagship configuration: the canvas image region IS the keypoint
    model input, so the device keypoint path is a pure slice."""
    g = compute_work_geometry((720, 1280), 960)
    assert (g.img_h, g.img_w) == (540, 960)
    assert (g.canvas_h, g.canvas_w) == (544, 960)
    assert (g.pad_y, g.pad_x) == (2, 0)
    assert g.gain == 0.75


def test_host_letterbox_matches_cv2():
    import cv2

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (5, 720, 1280, 3), dtype=np.uint8)
    g = compute_work_geometry((720, 1280), 960)
    got = host_letterbox(frames, g)
    assert got.shape == (5, 544, 960, 3)
    for i in range(5):
        r = cv2.resize(frames[i], (960, 540), interpolation=cv2.INTER_LINEAR)
        exp = cv2.copyMakeBorder(r, 2, 2, 0, 0, cv2.BORDER_CONSTANT, value=(114, 114, 114))
        np.testing.assert_array_equal(got[i], exp)


def _smooth_scene(h, w, n=3, shift=3.0, seed=5):
    """Frames of smooth blobs translating by ``shift`` px/frame."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    centers = rng.uniform([40, 40], [w - 40, h - 40], size=(12, 2)).astype(np.float32)
    frames = []
    for t in range(n):
        img = np.zeros((h, w), np.float32)
        for cx, cy in centers + t * shift:
            img += 200 * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / 120.0))
        img = np.clip(img + 30, 0, 255)
        frames.append(np.stack([img] * 3, -1).astype(np.uint8))
    return np.stack(frames), centers


def test_flow_through_geometry_tracks_motion():
    """flow_with_filters with an enabled geometry must track original-space
    motion on host-prescaled frames (coordinates stay in original space)."""
    import jax.numpy as jnp

    from eagle_tpu.pipeline.temporal import flow_with_filters

    h, w = 288, 512
    frames, centers = _smooth_scene(h, w, n=2, shift=3.0)
    g = compute_work_geometry((h, w), 384)  # gain 0.75 -> (216, 384) in (224, 384)
    assert g.gain == 0.75
    work = host_letterbox(frames, g)

    cfg = PipelineConfig().replace(work=g)
    pts = np.zeros((57, 2), np.float32)
    valid = np.zeros(57, bool)
    k = len(centers)
    pts[:k] = centers
    valid[:k] = True

    new_pts, ok = flow_with_filters(
        jnp.asarray(work[1]), jnp.asarray(work[0]), jnp.asarray(pts), jnp.asarray(valid), cfg
    )
    new_pts, ok = np.asarray(new_pts), np.asarray(ok)
    assert ok[:k].sum() >= k - 2
    moved = new_pts[:k][ok[:k]] - pts[:k][ok[:k]]
    # truncation to int costs up to 1px; flow at 0.75x costs a little more
    assert np.all(np.abs(moved - 3.0) <= 1.6), moved


def test_pipeline_end_to_end_with_geometry():
    """Full CoordinateModel run (random weights, tiny variant) with the
    working-resolution path enabled: schema intact, geometry actually on."""
    from eagle_tpu.pipeline.coordinate_model import CoordinateModel

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, (20, 96, 128, 3), dtype=np.uint8)
    cfg = PipelineConfig().replace(
        detector=DetectorConfig(variant="medium", image_size=96, max_detections=16, nms_pre_topk=64),
        keypoint=KeypointConfig(input_hw=(72, 96)),
        chunk_frames=32,
    )
    model = CoordinateModel(config=cfg, verbose_init=False)
    g = model._geometry((96, 128))
    assert g.enabled and (g.img_h, g.img_w) == (72, 96)
    coords = model.get_coordinates(frames, 10, num_keypoint_detection=2, verbose=False)
    assert set(coords) == set(range(20))
    assert set(coords[0]) == {"Coordinates", "Time", "Keypoints", "Boundaries"}


def test_identity_geometry_with_custom_fns():
    from eagle_tpu.pipeline.coordinate_model import CoordinateModel

    model = CoordinateModel(
        keypoint_fn=lambda b: (np.zeros((len(b), 57, 3), np.float32), np.zeros((len(b), 57), bool)),
        detector_fn=lambda b: (
            np.zeros((len(b), 128, 4), np.float32),
            np.zeros((len(b), 128), np.float32),
            np.zeros((len(b), 128), np.int32),
            np.zeros((len(b), 128), bool),
        ),
        verbose_init=False,
    )
    assert not model._geometry((720, 1280)).enabled


def test_i420_roundtrip():
    """Device I420 decode matches cv2's own YUV2BGR_I420 within 1 LSB, and
    the full BGR->planes->BGR transport stays faithful on video-like
    content (chroma-smooth away from color edges)."""
    import cv2
    import jax.numpy as jnp

    from eagle_tpu.ops.preprocess import host_to_i420, i420_to_bgr
    from eagle_tpu.utils.synthetic import make_scene

    frames = make_scene(num_frames=2, width=256, height=128, num_players=4, fps=10).frames
    planes = host_to_i420(frames)
    assert planes.shape == (2, 192, 256) and planes.dtype == np.uint8
    back = np.asarray(i420_to_bgr(jnp.asarray(planes)))

    cv2_back = np.stack(
        [cv2.cvtColor(p, cv2.COLOR_YUV2BGR_I420) for p in planes]
    )
    assert np.abs(back.astype(int) - cv2_back.astype(int)).max() <= 1

    err = np.abs(back.astype(int) - frames.astype(int))
    assert err.mean() < 2.0  # video-like content: sub-LSB mean error


def test_upload_format_yuv_pipeline_close_to_bgr():
    """The production pipeline run through 4:2:0 transport produces the
    same output structure and near-identical keypoints as raw BGR."""
    from eagle_tpu.pipeline.coordinate_model import CoordinateModel
    from tests.oracles import oracle_detector_fn, oracle_keypoint_fn
    from eagle_tpu.utils.synthetic import make_scene

    scene = make_scene(num_frames=8, width=1280, height=720, num_players=4, fps=8)
    outs = {}
    for fmt in ("bgr", "yuv420"):
        # oracle models: frame pixels still flow through upload + flow/hue
        model = CoordinateModel(
            keypoint_fn=oracle_keypoint_fn(scene),
            detector_fn=oracle_detector_fn(scene),
            verbose_init=False,
        )
        model.config = model.config.replace(upload_format=fmt)
        outs[fmt] = model.get_coordinates(scene.frames, 8, verbose=False)
    assert set(outs["bgr"]) == set(outs["yuv420"])
    kb = np.array([outs["bgr"][t]["Keypoints"].get(1, (0, 0)) for t in outs["bgr"]])
    ky = np.array([outs["yuv420"][t]["Keypoints"].get(1, (0, 0)) for t in outs["yuv420"]])
    assert np.abs(kb - ky).max() <= 2.0


def test_plane_prescale_matches_two_step():
    """host_letterbox_i420 (convert full frame, resize planes) stays
    within a couple of LSB of the two-step path (resize BGR, convert
    canvas) -- convert and bilinear resize are both linear maps."""
    from eagle_tpu.ops.preprocess import (
        compute_work_geometry,
        host_letterbox,
        host_letterbox_i420,
        host_to_i420,
        i420_geometry_ok,
    )
    from eagle_tpu.utils.synthetic import make_scene

    frames = make_scene(num_frames=2, width=1280, height=720, num_players=6, fps=10).frames
    geom = compute_work_geometry((720, 1280), 960)
    assert i420_geometry_ok(geom, (720, 1280))

    direct = host_letterbox_i420(frames, geom)
    two_step = host_to_i420(host_letterbox(frames, geom))
    assert direct.shape == two_step.shape

    h = geom.canvas_h
    dy = np.abs(direct[:, :h].astype(int) - two_step[:, :h].astype(int))
    duv = np.abs(direct[:, h:].astype(int) - two_step[:, h:].astype(int))
    assert dy.mean() < 1.5, dy.mean()
    assert duv.mean() < 2.5, duv.mean()
    # letterbox padding identical (same gray encoding)
    assert (direct[:, :2] == two_step[:, :2]).all()


def test_device_letterbox_matches_host_prescale():
    """device_letterbox_i420 (raw planes up, resize+pad+decode on device,
    the prescale="device" mode) stays within a couple of LSB of the host
    plane-prescale path's device-decoded canvas."""
    import jax.numpy as jnp

    from eagle_tpu.ops.preprocess import (
        compute_work_geometry,
        device_letterbox_i420,
        host_letterbox_i420,
        host_to_i420,
        i420_geometry_ok,
        i420_to_bgr,
    )
    from eagle_tpu.utils.synthetic import make_scene

    frames = make_scene(num_frames=2, width=1280, height=720, num_players=6, fps=10).frames
    geom = compute_work_geometry((720, 1280), 960)
    assert i420_geometry_ok(geom, (720, 1280))

    host_canvas = np.asarray(i420_to_bgr(jnp.asarray(host_letterbox_i420(frames, geom))))
    dev_canvas = np.asarray(device_letterbox_i420(jnp.asarray(host_to_i420(frames)), geom))
    assert dev_canvas.shape == host_canvas.shape == (2, geom.canvas_h, geom.canvas_w, 3)

    d = np.abs(dev_canvas.astype(int) - host_canvas.astype(int))
    assert d.mean() < 1.0, d.mean()
    assert np.quantile(d, 0.999) <= 4, np.quantile(d, 0.999)
    # letterbox padding identical (same gray encoding on both paths)
    assert (dev_canvas[:, :2] == host_canvas[:, :2]).all()


def test_device_prescale_pipeline_matches_host():
    """get_coordinates with prescale="device" reproduces the host-prescale
    results: fake runners decode a per-frame id block from the canvas
    (robust to the couple-LSB resize difference), so boxes/keypoints must
    be identical."""
    import jax
    import jax.numpy as jnp

    from eagle_tpu.pipeline.coordinate_model import CoordinateModel
    from tests.oracles import oracle_keypoint_fn
    from eagle_tpu.utils.synthetic import make_scene

    n = 8
    scene = make_scene(num_frames=1, width=1280, height=720, num_players=0, fps=8, seed=9)
    base = scene.frames[0]
    frames = []
    for t in range(n):
        f = base.copy()
        f[0:128, 0:128] = 50 + 10 * t
        frames.append(f)
    frames = np.stack(frames)

    okp, ovalid = oracle_keypoint_fn(scene)(scene.frames[:1])
    kp_packed = np.concatenate([okp[0], ovalid[0].astype(np.float32)[:, None]], axis=-1)

    def run_with(prescale):
        model = CoordinateModel(verbose_init=False)
        model.config = model.config.replace(prescale=prescale)
        geom = model._geometry((720, 1280))
        assert geom.enabled

        def fake_det_runner(g, hw):
            @jax.jit
            def run(x):
                blk = x[:, 12:88, 12:88].astype(jnp.float32).mean(axis=(1, 2, 3))
                fid = jnp.round((blk - 50.0) / 10.0)
                b, d = x.shape[0], 128
                out = jnp.zeros((b, d, 7), jnp.float32)
                bx = jnp.stack(
                    [300.0 + 7.0 * fid, jnp.full_like(fid, 300.0),
                     340.0 + 7.0 * fid, jnp.full_like(fid, 400.0)], -1)
                row = jnp.concatenate(
                    [bx, jnp.full((b, 1), 0.9), jnp.zeros((b, 1)), jnp.ones((b, 1))], -1)
                return out.at[:, 0].set(row)

            return run

        def fake_kp_runner(g, hw):
            def run(batch):
                return jnp.tile(jnp.asarray(kp_packed)[None], (batch.shape[0], 1, 1))

            return run

        model._det_runner = fake_det_runner
        model._kp_runner = fake_kp_runner
        return model.get_coordinates(frames, 8, num_homography=1, num_keypoint_detection=2, verbose=False)

    res_host = run_with("host")
    res_dev = run_with("device")
    assert set(res_host) == set(res_dev)
    for t in res_host:
        assert res_host[t]["Keypoints"] == res_dev[t]["Keypoints"]
        for cls_name, items in res_host[t]["Coordinates"].items():
            got = res_dev[t]["Coordinates"][cls_name]
            assert set(got) == set(items)
            for oid, item in items.items():
                assert got[oid]["BBox"] == item["BBox"]
