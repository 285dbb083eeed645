"""YOLOv8 detector: shapes, parameter counts vs published model sizes,
DFL decode math, converter round-trip, and NMS vs a numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_tpu.models import yolov8
from eagle_tpu.ops.nms import batched_nms, box_iou_matrix, nms


def _param_count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.mark.parametrize(
    "variant,expected_m",
    [("n", 3.16), ("s", 11.17), ("m", 25.9), ("l", 43.7)],
)
def test_param_counts_match_published(variant, expected_m):
    """Parameter totals must match the published YOLOv8 model sizes at
    nc=80 (within 1%), evidence the architecture is wired correctly."""
    params = yolov8.init_params(jax.random.key(0), variant=variant, num_classes=80)
    count = _param_count(params)
    assert abs(count / 1e6 - expected_m) / expected_m < 0.01, f"{variant}: {count/1e6:.3f}M"


def test_forward_shapes():
    params = yolov8.init_params(jax.random.key(0), variant="n", num_classes=5)
    x = jnp.zeros((2, 160, 160, 3), jnp.float32)
    boxes, scores = yolov8.apply(params, x, variant="n")
    a = (160 // 8) ** 2 + (160 // 16) ** 2 + (160 // 32) ** 2
    assert boxes.shape == (2, a, 4)
    assert scores.shape == (2, a, 5)
    assert bool(((scores >= 0) & (scores <= 1)).all())


def test_dfl_decode_center_box():
    """With uniform box logits the DFL expectation is (REG_MAX-1)/2 = 7.5
    grid units per side; check a known anchor's decoded box."""
    params = yolov8.init_params(jax.random.key(1), variant="n", num_classes=5)
    # zero out the box head so logits are exactly the +1.0 bias
    for lvl in params["head"]["levels"]:
        lvl["box_out"]["w"] = jnp.zeros_like(lvl["box_out"]["w"])
        lvl["box_out"]["b"] = jnp.zeros_like(lvl["box_out"]["b"])
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    boxes, _ = yolov8.apply(params, x, variant="n")
    # first anchor of the stride-8 level is at (0.5, 0.5) grid units
    expected = np.array([(0.5 - 7.5) * 8, (0.5 - 7.5) * 8, (0.5 + 7.5) * 8, (0.5 + 7.5) * 8])
    np.testing.assert_allclose(np.asarray(boxes[0, 0]), expected, atol=1e-3)


def test_converter_roundtrip():
    """Build an ultralytics-style state dict from an init tree via the
    inverse name mapping and check the converter reproduces the tree."""
    params = yolov8.init_params(jax.random.key(2), variant="n", num_classes=5)

    sd = {}

    def put_cv(prefix, p):
        sd[f"{prefix}.conv.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        sd[f"{prefix}.bn.weight"] = np.asarray(p["bn"]["scale"])
        sd[f"{prefix}.bn.bias"] = np.asarray(p["bn"]["bias"])
        sd[f"{prefix}.bn.running_mean"] = np.asarray(p["bn"]["mean"])
        sd[f"{prefix}.bn.running_var"] = np.asarray(p["bn"]["var"])

    def put_c2f(prefix, p):
        put_cv(f"{prefix}.cv1", p["cv1"])
        put_cv(f"{prefix}.cv2", p["cv2"])
        for i, m in enumerate(p["m"]):
            put_cv(f"{prefix}.m.{i}.cv1", m["cv1"])
            put_cv(f"{prefix}.m.{i}.cv2", m["cv2"])

    B = params["backbone"]
    for name, idx in yolov8._BACKBONE_MAP:
        if name.startswith("c2f"):
            put_c2f(f"model.{idx}", B[name])
        elif name == "sppf":
            put_cv(f"model.{idx}.cv1", B[name]["cv1"])
            put_cv(f"model.{idx}.cv2", B[name]["cv2"])
        else:
            put_cv(f"model.{idx}", B[name])
    for name, idx in yolov8._NECK_MAP:
        if name.startswith("c2f"):
            put_c2f(f"model.{idx}", params["neck"][name])
        else:
            put_cv(f"model.{idx}", params["neck"][name])
    for i, lvl in enumerate(params["head"]["levels"]):
        put_cv(f"model.22.cv2.{i}.0", lvl["box"][0])
        put_cv(f"model.22.cv2.{i}.1", lvl["box"][1])
        sd[f"model.22.cv2.{i}.2.weight"] = np.asarray(lvl["box_out"]["w"]).transpose(3, 2, 0, 1)
        sd[f"model.22.cv2.{i}.2.bias"] = np.asarray(lvl["box_out"]["b"])
        put_cv(f"model.22.cv3.{i}.0", lvl["cls"][0])
        put_cv(f"model.22.cv3.{i}.1", lvl["cls"][1])
        sd[f"model.22.cv3.{i}.2.weight"] = np.asarray(lvl["cls_out"]["w"]).transpose(3, 2, 0, 1)
        sd[f"model.22.cv3.{i}.2.bias"] = np.asarray(lvl["cls_out"]["b"])

    converted = yolov8.yolov8_from_torch(sd)
    # the converter folds ultralytics' BN eps (1e-3) into the variance so
    # the runtime's 1e-5 reproduces torch exactly; every other leaf is
    # bit-identical
    shift = yolov8._ULTRALYTICS_BN_EPS - 1e-5
    pa = jax.tree_util.tree_flatten_with_path(params)[0]
    pb = jax.tree_util.tree_flatten_with_path(converted)[0]
    for (path_a, a), (path_b, b) in zip(pa, pb):
        assert path_a == path_b
        is_var = any(getattr(k, "key", None) == "var" for k in path_a)
        expect = np.asarray(a) + shift if is_var else np.asarray(a)
        np.testing.assert_allclose(expect, b, atol=0)


# ---------------------------------------------------------------------------
# Full-forward numerical parity vs a pure-torch ultralytics transcription
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("variant,size,seed", [("n", 128, 0), ("m", 160, 7)])
def test_forward_parity_with_torch(variant, size, seed):
    """The JAX forward must match the torch transcription of the
    ultralytics graph (tests/torch_graphs.py) end to end: random
    ultralytics-layout state_dict -> yolov8_from_torch -> decoded
    boxes/scores equal to the torch decode (reference consumption sites
    coordinate_model.py:54-57,567)."""
    import torch

    from .torch_graphs import YoloV8Torch, randomize_

    tm = randomize_(YoloV8Torch(variant=variant, nc=5), seed=seed)
    params = yolov8.yolov8_from_torch(tm.state_dict())

    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (2, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        tb, ts = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    jb, js = yolov8.apply(params, jnp.asarray(x), variant=variant)

    tb, ts = tb.numpy(), ts.numpy()
    jb, js = np.asarray(jb), np.asarray(js)
    assert jb.shape == tb.shape and js.shape == ts.shape
    # 3e-4: deeper variants accumulate ~1.6e-4 of fp32 conv-order noise
    np.testing.assert_allclose(js, ts, atol=3e-4)
    # boxes are in input-pixel units; the DFL softmax amplifies fp32 conv
    # noise on near-tied bins, so allow 1e-3*size (sub-0.2px -- far below
    # the IoU>=0.99 north-star granularity)
    np.testing.assert_allclose(jb, tb, atol=1e-3 * size)


def test_fused_converter_forward_parity():
    """BN-fused ultralytics layout (what an ONNX export carries): fold the
    torch transcription's BNs into conv weight+bias on the torch side,
    convert via yolov8_from_fused, and require the same forward."""
    import torch

    from .torch_graphs import YoloV8Torch, randomize_

    tm = randomize_(YoloV8Torch(variant="n", nc=5), seed=3)
    sd = tm.state_dict()
    fused = {}
    for k in list(sd.keys()):
        if k.endswith(".conv.weight") and k.replace(".conv.weight", ".bn.weight") in sd:
            p = k[: -len(".conv.weight")]
            w = sd[f"{p}.conv.weight"]
            g, b = sd[f"{p}.bn.weight"], sd[f"{p}.bn.bias"]
            mean, var = sd[f"{p}.bn.running_mean"], sd[f"{p}.bn.running_var"]
            inv = (var + 1e-3).rsqrt()
            fused[f"{p}.conv.weight"] = w * (g * inv).view(-1, 1, 1, 1)
            fused[f"{p}.conv.bias"] = b - mean * g * inv
        elif ".bn." in k or ".dfl." in k:
            continue
        else:
            fused[k] = sd[k]
    params = yolov8.yolov8_from_fused(fused)

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        tb, ts = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    jb, js = yolov8.apply(params, jnp.asarray(x), variant="n")
    np.testing.assert_allclose(np.asarray(js), ts.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(jb), tb.numpy(), atol=5e-4 * 128)


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------


def _numpy_nms(boxes, scores, conf_t, iou_t, max_det):
    """Classic sequential class-aware NMS oracle."""
    conf = scores.max(-1)
    cls = scores.argmax(-1)
    keep_idx = []
    cand = np.where(conf > conf_t)[0]
    cand = cand[np.argsort(-conf[cand], kind="stable")]
    for i in cand:
        ok = True
        for j in keep_idx:
            if cls[i] != cls[j]:
                continue
            # IoU
            lt = np.maximum(boxes[i, :2], boxes[j, :2])
            rb = np.minimum(boxes[i, 2:], boxes[j, 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            ua = (
                (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                + (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
                - inter
            )
            if inter / max(ua, 1e-9) > iou_t:
                ok = False
                break
        if ok:
            keep_idx.append(i)
        if len(keep_idx) == max_det:
            break
    return keep_idx


def test_iou_matrix():
    a = np.array([[0, 0, 10, 10], [5, 5, 15, 15]], np.float32)
    m = np.asarray(box_iou_matrix(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(np.diag(m), [1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(m[0, 1], 25.0 / 175.0, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nms_matches_numpy_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 200
    centers = rng.uniform(50, 600, (n, 2))
    wh = rng.uniform(10, 60, (n, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    scores = rng.uniform(0, 1, (n, 5)).astype(np.float32) * rng.uniform(0, 1, (n, 1)).astype(np.float32)

    ob, osc, ocls, oval = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.15, 0.7, max_det=64)
    got = [
        (tuple(np.asarray(ob[i]).round(3)), float(osc[i]), int(ocls[i]))
        for i in range(64)
        if bool(oval[i])
    ]
    ref_idx = _numpy_nms(boxes, scores, 0.15, 0.7, 64)
    expected = [
        (tuple(boxes[j].round(3)), float(scores[j].max()), int(scores[j].argmax()))
        for j in ref_idx
    ]
    assert got == expected


def test_nms_batched_and_empty():
    boxes = jnp.zeros((2, 50, 4))
    scores = jnp.zeros((2, 50, 5))
    ob, osc, ocls, oval = batched_nms(boxes, scores)
    assert ob.shape == (2, 128, 4)
    assert not bool(oval.any())
