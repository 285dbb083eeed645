"""ONNX ingestion: the wire-format parser against torch's own protobuf
serializer, and the fused-graph converter against the unfused network
(reference CPU path loads detector_medium.onnx,
coordinate_model.py:54-57)."""

import struct

import jax
import numpy as np
import pytest

from eagle_tpu.models import yolov8
from eagle_tpu.models.onnx_import import load_yolov8_onnx, parse_onnx

# ---------------------------------------------------------------------------
# minimal ONNX writer (test-side oracle for the reader)
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _len_field(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _tensor_proto(name: str, arr: np.ndarray) -> bytes:
    msg = b""
    for d in arr.shape:
        msg += _varint((1 << 3) | 0) + _varint(d)
    msg += _varint((2 << 3) | 0) + _varint(1)  # data_type FLOAT
    msg += _len_field(8, name.encode())
    msg += _len_field(9, np.ascontiguousarray(arr, np.float32).tobytes())
    return msg


def _write_onnx(path: str, tensors: dict[str, np.ndarray]):
    graph = b"".join(_len_field(5, _tensor_proto(k, v)) for k, v in tensors.items())
    graph += _len_field(2, b"main")
    model = _varint((1 << 3) | 0) + _varint(8)  # ir_version
    model += _len_field(7, graph)
    with open(path, "wb") as f:
        f.write(model)


def test_parser_roundtrip_own_writer(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "model.0.conv.weight": rng.normal(size=(8, 3, 3, 3)).astype(np.float32),
        "model.0.conv.bias": rng.normal(size=(8,)).astype(np.float32),
        "scalarish": rng.normal(size=(1,)).astype(np.float32),
    }
    p = tmp_path / "t.onnx"
    _write_onnx(str(p), tensors)
    init, nodes = parse_onnx(str(p))
    assert set(init) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(init[k], tensors[k])


def test_parser_against_torch_exporter(tmp_path):
    """torch.onnx.export (the legacy JIT-trace serializer, no onnx package
    needed) produces a real-world file; the parser must recover every
    parameter bit-exactly."""
    import torch

    class M(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = torch.nn.Conv2d(3, 6, 3, padding=1)
            self.bn = torch.nn.BatchNorm2d(6)

        def forward(self, x):
            return self.bn(self.conv(x))

    torch.manual_seed(0)
    m = M().eval()
    with torch.no_grad():
        m.bn.running_mean.normal_()
        m.bn.running_var.uniform_(0.5, 2.0)
    p = tmp_path / "m.onnx"
    try:
        torch.onnx.export(
            m, torch.randn(1, 3, 8, 8), str(p), dynamo=False, do_constant_folding=False
        )
    except Exception as e:  # the exporter itself requires the onnx package
        if "onnx" in str(e).lower():
            pytest.skip(f"torch.onnx.export unavailable without onnx: {e}")
        raise
    init, nodes = parse_onnx(str(p))
    sd = {k: v.numpy() for k, v in m.state_dict().items() if "num_batches" not in k}
    for k, v in sd.items():
        matches = [n for n in init if n == k or n.endswith(k)]
        assert matches, f"{k} not among initializers {list(init)}"
        np.testing.assert_array_equal(init[matches[0]].astype(np.float32), v)
    assert any(n["op_type"] == "Conv" for n in nodes)


def _fuse_tree(params):
    """Fold BN into conv per ultralytics fuse_conv_and_bn, producing the
    initializer dict an exported ONNX carries."""
    from eagle_tpu.models.layers import BN_EPS

    out = {}

    def put_plain(prefix, w, b):
        out[f"{prefix}.weight"] = np.asarray(w).transpose(3, 2, 0, 1)
        out[f"{prefix}.bias"] = np.asarray(b)

    def put_cv(prefix, p):
        w = np.asarray(p["w"], np.float64)
        bn = p["bn"]
        inv = np.asarray(bn["scale"], np.float64) / np.sqrt(
            np.asarray(bn["var"], np.float64) + BN_EPS
        )
        wf = (w * inv[None, None, None, :]).astype(np.float32)
        bf = (np.asarray(bn["bias"], np.float64) - np.asarray(bn["mean"], np.float64) * inv).astype(
            np.float32
        )
        out[f"{prefix}.conv.weight"] = wf.transpose(3, 2, 0, 1)
        out[f"{prefix}.conv.bias"] = bf

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
        put_plain(f"model.22.cv2.{i}.2", lvl["box_out"]["w"], lvl["box_out"]["b"])
        put_cv(f"model.22.cv3.{i}.0", lvl["cls"][0])
        put_cv(f"model.22.cv3.{i}.1", lvl["cls"][1])
        put_plain(f"model.22.cv3.{i}.2", lvl["cls_out"]["w"], lvl["cls_out"]["b"])
    # the DFL projection constant present in real exports (skipped on load)
    out["model.22.dfl.conv.weight"] = np.arange(16, dtype=np.float32).reshape(1, 16, 1, 1)
    return out


def test_fused_onnx_matches_unfused_forward(tmp_path):
    """A fused export loaded through the ONNX path must reproduce the
    unfused network's forward (the identity-BN wrap is exact; the only
    error is the f32 fold itself)."""
    rng = np.random.default_rng(3)
    params = yolov8.init_params(jax.random.key(7), variant="n", num_classes=5)
    # give BN stats non-trivial values so fusion actually does work
    def scatter(p):
        for k, leaf in p.items():
            if k == "bn":
                c = leaf["scale"].shape[0]
                leaf["scale"] = 1.0 + 0.2 * rng.normal(size=c).astype(np.float32)
                leaf["mean"] = 0.1 * rng.normal(size=c).astype(np.float32)
                leaf["var"] = (0.5 + rng.uniform(0.1, 1.0, c)).astype(np.float32)
            elif isinstance(leaf, dict):
                scatter(leaf)
            elif isinstance(leaf, list):
                for item in leaf:
                    scatter(item)

    scatter(params["backbone"])
    scatter(params["neck"])
    for lvl in params["head"]["levels"]:
        for item in lvl["box"] + lvl["cls"]:
            scatter({"x": item})

    p = tmp_path / "det.onnx"
    _write_onnx(str(p), _fuse_tree(params))
    loaded = load_yolov8_onnx(str(p))

    x = jax.numpy.asarray(rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32))
    b0, s0 = yolov8.apply(params, x, variant="n")
    b1, s1 = yolov8.apply(loaded, x, variant="n")
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(b0), np.asarray(b1), atol=2e-2)


def test_coordinate_model_accepts_onnx_checkpoint(tmp_path):
    from eagle_tpu.config import DetectorConfig, KeypointConfig, PipelineConfig
    from eagle_tpu.pipeline.coordinate_model import CoordinateModel

    params = yolov8.init_params(jax.random.key(1), variant="n", num_classes=5)
    p = tmp_path / "det.onnx"
    _write_onnx(str(p), _fuse_tree(params))
    cfg = PipelineConfig().replace(
        detector=DetectorConfig(variant="medium", image_size=64, max_detections=16, nms_pre_topk=64),
        keypoint=KeypointConfig(input_hw=(48, 64)),
        chunk_frames=16,
    )
    model = CoordinateModel(config=cfg, detector_checkpoint=str(p), verbose_init=False)
    frames = np.random.default_rng(0).integers(0, 255, (4, 64, 96, 3), np.uint8)
    coords = model.get_coordinates(frames, 4, verbose=False)
    assert len(coords) == 4
