"""One-command real-weight acceptance runner (BASELINE.md gates).

The reference's stored eval artifact (reference
eagle/models/weights/results.json) and BASELINE.md pin three acceptance
gates that can only be *fully* closed with the trained weight bundle
(reference eagle/models/get_weights.sh -- unreachable without egress):

  A. converter round-trip  -- msgpack trees load and re-convert bit-exact
  B. detection-box IoU     -- >= 0.99 vs the PyTorch reference forward
  C. pitch-coordinate RMSE -- <= 1e-2 end to end (keypoints -> homography
                              -> world projection, device path vs the
                              reference's cv2 float64 chain)
  D. results.json schema   -- the eval harness emits the reference
                              artifact's exact metric-key structure

Day-one usage once weights exist (see docs/roadmap.md):

    scripts/get_weights.sh                # fetch + convert the bundle
    python scripts/validate_acceptance.py # exits nonzero on any gate

Without weights it runs ``--dry-run`` automatically: every gate's
*plumbing* executes with randomly initialized models on the synthetic
scene; thresholds that are meaningless under random weights (B's IoU vs
a random torch net is exactly measurable and IS enforced -- the nets
share weights; C's keypoint quality is not, so C is checked on oracle
keypoints instead, which makes it weight-independent and enforced too).

The PyTorch "reference" for gate B is the transcription in
tests/torch_graphs.py and for gate C the reference's own
eagle/models/keypoint_hrnet.py torch module (loaded when /root/reference
exists) -- the same oracles the test suite pins against
(docs/parity.md "Oracle-risk caveats").
"""

import argparse
import json
import os
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np


def _force_cpu():
    """Acceptance gates are parity checks -- f32 CPU is the right place
    for them, and the axon TPU is claimed exclusively per process (a
    stray claim here would wedge a concurrent bench).  The env var alone
    is NOT enough: the environment's sitecustomize imports jax with the
    TPU plugin registered before it is read, so the config update after
    import is what actually sticks (same mechanism as tests/conftest.py).
    Set EAGLE_ACCEPTANCE_DEVICE=default to keep the ambient backend."""
    if os.environ.get("EAGLE_ACCEPTANCE_DEVICE") == "default":
        return
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

REFERENCE = "/root/reference"
REF_RESULTS = os.path.join(REFERENCE, "eagle/models/weights/results.json")

# the reference artifact's metric-key structure, used when the reference
# checkout is absent (mirrors reference results.json)
FALLBACK_SCHEMA = {
    "metrics": ["2", "4", "8", "12"],
    "classification": [
        f"{m}_{t}"
        for t in (2, 4, 8, 12)
        for m in ("precision", "recall", "f1", "true_positives", "false_positives", "false_negatives")
    ]
    + ["pdj"],
}


class Gate:
    def __init__(self, report):
        self.report = report

    def record(self, name, ok, detail, enforced=True, skipped=False):
        status = "SKIP" if skipped else ("PASS" if ok else "FAIL")
        self.report["gates"][name] = {
            "status": status,
            "enforced": bool(enforced and not skipped),
            **detail,
        }
        print(f"[{status}] {name}: {json.dumps(detail)}", flush=True)
        return skipped or ok or not enforced


def gate_a_converter_roundtrip(g, weights_dir, torch_dir, dry_run):
    """Every msgpack in weights_dir loads; when its torch source exists,
    a fresh conversion must be leaf-for-leaf bit-identical."""
    import jax

    from eagle_tpu.models.checkpoint import convert_and_save, load_params

    pairs = {  # msgpack name -> (kind, torch source name)
        "hrnet_w48.msgpack": ("hrnet", "keypoints_main.pth"),
        "yolov8l_hd.msgpack": ("yolov8", "detector_large_hd.pt"),
        "yolov8l.msgpack": ("yolov8", "detector_large.pt"),
        "yolov8m.msgpack": ("yolov8", "detector_medium.pt"),
        "osnet_x0_25.msgpack": ("osnet", "osnet_x0_25_msmt17.pt"),
    }
    found, roundtripped, mismatches = 0, 0, []
    for name, (kind, src_name) in pairs.items():
        path = os.path.join(weights_dir, name)
        if not os.path.exists(path):
            continue
        found += 1
        params = load_params(path)
        n_leaves = len(jax.tree.leaves(params))
        if n_leaves == 0:
            mismatches.append(f"{name}: empty tree")
            continue
        src = os.path.join(torch_dir, src_name)
        if os.path.exists(src) and kind in ("hrnet", "yolov8"):
            with tempfile.TemporaryDirectory() as td:
                fresh_path = os.path.join(td, name)
                convert_and_save(src, fresh_path, kind)
                fresh = load_params(fresh_path)
            a, b = jax.tree.leaves(params), jax.tree.leaves(fresh)
            if len(a) != len(b) or any(
                not np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(a, b)
            ):
                mismatches.append(f"{name}: reconversion differs from stored msgpack")
            else:
                roundtripped += 1
    if found == 0 and dry_run:
        # plumbing check: save+load a random tree bit-exact
        import jax.numpy as jnp

        from eagle_tpu.models import yolov8
        from eagle_tpu.models.checkpoint import save_params

        params = yolov8.init_params(jax.random.key(0), variant="n", num_classes=5)
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "t.msgpack")
            save_params(params, p)
            back = load_params(p)
        ok = all(
            np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree.leaves(params), jax.tree.leaves(back))
        )
        return g.record(
            "converter_roundtrip", ok, {"mode": "dry-run save/load", "leaves": len(jax.tree.leaves(params))}
        )
    return g.record(
        "converter_roundtrip",
        not mismatches and found > 0,
        {"msgpacks_found": found, "torch_roundtripped": roundtripped, "mismatches": mismatches},
    )


def gate_b_detector_iou(g, weights_dir, torch_dir, frames, dry_run, size):
    """Decoded + NMS'd detections of the JAX model vs the PyTorch
    transcription on the same weights: matched-box IoU >= 0.99.

    With real weights the state dict comes from the bundle; in dry-run
    both nets share a randomly initialized state dict -- the IoU gate is
    equally meaningful (it measures forward parity, not accuracy)."""
    try:
        import torch
    except ImportError:
        return g.record("detector_iou", False, {"reason": "torch unavailable"}, skipped=True)
    import jax.numpy as jnp

    from eagle_tpu.models import yolov8
    from eagle_tpu.ops.nms import box_iou_matrix
    from torch_graphs import YoloV8Torch, randomize_

    variant = "n" if dry_run else "l"
    src = os.path.join(torch_dir, "detector_large_hd.pt")
    if dry_run or not os.path.exists(src):
        tm = randomize_(YoloV8Torch(variant=variant, nc=5), seed=11)
        sd = tm.state_dict()
    else:
        sd = torch.load(src, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model" in sd and hasattr(sd["model"], "state_dict"):
            sd = sd["model"].state_dict()
        elif hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k[len("model.") :] if k.startswith("model.") else k: v for k, v in sd.items()}
        tm = YoloV8Torch(variant=variant, nc=5)
        tm.load_state_dict(sd)
    tm.eval()
    params = yolov8.yolov8_from_torch(sd)

    from eagle_tpu.utils.synthetic import make_scene

    scene = make_scene(num_frames=frames, width=2 * size, height=size, num_players=8, seed=5)
    x = scene.frames[:frames].astype(np.float32) / 255.0
    with torch.no_grad():
        tb, ts = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    jb, js = yolov8.apply(params, jnp.asarray(x), variant=variant)
    tb, ts = tb.numpy(), ts.numpy()
    jb, js = np.asarray(jb), np.asarray(js)

    # confidence-filter per frame on each side's own scores, then match
    ious, n_mismatch = [], 0
    for i in range(frames):
        tc = ts[i].max(axis=-1) > 0.25
        jc = js[i].max(axis=-1) > 0.25
        if tc.sum() != jc.sum():
            n_mismatch += 1
        if tc.sum() == 0 or jc.sum() == 0:
            continue
        m = np.asarray(box_iou_matrix(jnp.asarray(jb[i][jc]), jnp.asarray(tb[i][tc])))
        ious.extend(m.max(axis=-1).tolist())
    mean_iou = float(np.mean(ious)) if ious else float("nan")
    ok = bool(ious) and mean_iou >= 0.99 and n_mismatch == 0
    return g.record(
        "detector_iou",
        ok,
        {
            "variant": variant,
            "frames": frames,
            "boxes_matched": len(ious),
            "mean_iou": None if np.isnan(mean_iou) else round(mean_iou, 5),
            "count_mismatch_frames": n_mismatch,
            "threshold": 0.99,
        },
    )


def gate_c_pitch_rmse(g, weights_dir, frames, dry_run):
    """End-to-end pitch-coordinate RMSE <= 1e-2: project image points to
    world coordinates through (1) the device RANSAC homography and (2)
    cv2.findHomography float64 (the reference chain,
    reference coordinate_model.py:354-357 + perspectiveTransform), on the
    same keypoint correspondences.

    With trained weights the correspondences come from the real HRNet;
    in dry-run they are the synthetic scene's oracle keypoints -- the
    gate is weight-independent (it measures the homography+projection
    parity, which is exactly what BASELINE.md's RMSE row pins)."""
    import cv2
    import jax
    import jax.numpy as jnp

    from eagle_tpu import pitch
    from eagle_tpu.config import HomographyConfig
    from eagle_tpu.ops.homography import perspective_transform, ransac_homography_cfg
    from eagle_tpu.utils.synthetic import make_scene

    scene = make_scene(num_frames=frames, width=1280, height=720, num_players=6, seed=7)

    kp_path = os.path.join(weights_dir, "hrnet_w48.msgpack")
    used_model = False
    if not dry_run and os.path.exists(kp_path):
        from eagle_tpu.models import hrnet
        from eagle_tpu.models.checkpoint import load_params
        from eagle_tpu.ops.heatmap import decode_heatmaps
        from eagle_tpu.ops.preprocess import preprocess_keypoint

        params = load_params(kp_path)
        xb = preprocess_keypoint(jnp.asarray(scene.frames[:frames]))
        hm = hrnet.apply(params, xb)
        kp, valid = decode_heatmaps(hm, 0.5, (720, 1280))
        kp_xy = np.asarray(kp)[..., :2]
        kp_ok = np.asarray(valid)
        used_model = True
    else:
        kp_xy = np.tile(scene.keypoints_image[None], (frames, 1, 1)).astype(np.float32)
        inb = (
            (scene.keypoints_image[:, 0] >= 0)
            & (scene.keypoints_image[:, 0] < 1280)
            & (scene.keypoints_image[:, 1] >= 0)
            & (scene.keypoints_image[:, 1] < 720)
            & pitch.ON_PLANE_MASK
        )
        kp_ok = np.tile(inb[None], (frames, 1))

    world = pitch.WORLD_XY.astype(np.float32)
    cfg = HomographyConfig()
    rmses, failures = [], 0
    for i in range(frames):
        ok = kp_ok[i] & pitch.ON_PLANE_MASK
        if ok.sum() < 4:
            failures += 1
            continue
        H_dev, inl, found = ransac_homography_cfg(
            jnp.asarray(kp_xy[i]), jnp.asarray(world), jnp.asarray(ok), jax.random.key(i), cfg
        )
        if not bool(found):
            failures += 1
            continue
        H_ref, _ = cv2.findHomography(
            kp_xy[i][ok].astype(np.float64), world[ok].astype(np.float64), cv2.RANSAC, 5.0
        )
        if H_ref is None:
            failures += 1
            continue
        # probe points: the frame's own keypoint pixels (in-view grid)
        probes = kp_xy[i][ok].astype(np.float64)
        p_dev = np.asarray(perspective_transform(jnp.asarray(H_dev), jnp.asarray(probes)))
        p_ref = cv2.perspectiveTransform(probes[None].astype(np.float64), H_ref)[0]
        rmses.append(float(np.sqrt(np.mean(np.sum((p_dev - p_ref) ** 2, axis=-1)))))
    rmse = float(np.max(rmses)) if rmses else float("nan")
    ok = bool(rmses) and rmse <= 1e-2 and failures == 0
    return g.record(
        "pitch_rmse",
        ok,
        {
            "keypoint_source": "hrnet_w48.msgpack" if used_model else "synthetic oracle",
            "frames": frames,
            "failures": failures,
            "max_rmse_m": None if np.isnan(rmse) else round(rmse, 6),
            "threshold": 0.01,
        },
    )


def gate_d_results_schema(g, weights_dir, frames, dry_run, out_dir):
    """The eval harness must emit the reference artifact's metric-key
    structure (results.json: per-model metrics/time/classification)."""
    from eagle_tpu import pitch
    from eagle_tpu.eval import point_metrics
    from eagle_tpu.utils.synthetic import make_scene

    scene = make_scene(num_frames=frames, width=640, height=360, num_players=6, seed=9)
    # schema check drives the harness with oracle predictions (model
    # choice is irrelevant to the schema; scripts/evaluate.py runs the
    # real models)
    kp = np.tile(scene.keypoints_image[None], (frames, 1, 1))
    inb = (
        (scene.keypoints_image[:, 0] >= 0)
        & (scene.keypoints_image[:, 0] < 640)
        & (scene.keypoints_image[:, 1] >= 0)
        & (scene.keypoints_image[:, 1] < 360)
        & pitch.ON_PLANE_MASK
    )
    valid = np.tile(inb[None], (frames, 1))
    results = {
        "YOLO": {**point_metrics(kp, valid, kp, valid), "time": 0.0},
        "HRNet": {**point_metrics(kp, valid, kp, valid), "time": 0.0},
    }
    if os.path.exists(REF_RESULTS):
        with open(REF_RESULTS) as f:
            ref = json.load(f)
        schema = {
            "metrics": sorted(ref["YOLO"]["metrics"].keys()),
            "classification": sorted(ref["YOLO"]["classification"].keys()),
        }
        source = "reference artifact"
    else:
        schema = {
            "metrics": sorted(FALLBACK_SCHEMA["metrics"]),
            "classification": sorted(FALLBACK_SCHEMA["classification"]),
        }
        source = "built-in fallback"
    problems = []
    for model_name, section in results.items():
        if sorted(section["metrics"].keys()) != schema["metrics"]:
            problems.append(f"{model_name}.metrics keys differ")
        if sorted(section["classification"].keys()) != schema["classification"]:
            missing = set(schema["classification"]) - set(section["classification"])
            extra = set(section["classification"]) - set(schema["classification"])
            problems.append(f"{model_name}.classification: missing={sorted(missing)} extra={sorted(extra)}")
        if "time" not in section:
            problems.append(f"{model_name}.time missing")
    out_path = os.path.join(out_dir, "results.json")
    with open(out_path, "w") as f:
        json.dump(results, f)
    return g.record(
        "results_schema",
        not problems,
        {"schema_source": source, "problems": problems, "written": out_path},
    )


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--weights-dir", default=os.path.join(ROOT, "weights"))
    p.add_argument("--torch-dir", default=os.path.join(ROOT, "weights_torch"))
    p.add_argument("--frames", type=int, default=8)
    p.add_argument(
        "--dry-run",
        action="store_true",
        help="random weights, small variants; plumbing + weight-independent gates only",
    )
    p.add_argument("--size", type=int, default=None, help="detector input height (gate B)")
    p.add_argument("--out", default=None, help="report JSON path (default: <weights-dir>/acceptance.json)")
    args = p.parse_args()
    _force_cpu()

    have_weights = os.path.isdir(args.weights_dir) and any(
        f.endswith(".msgpack") for f in os.listdir(args.weights_dir)
    )
    dry_run = args.dry_run or not have_weights
    if dry_run and not args.dry_run:
        print(f"no .msgpack weights under {args.weights_dir} -- running --dry-run", flush=True)
    size = args.size or (128 if dry_run else 544)

    out_dir = args.weights_dir if have_weights else tempfile.mkdtemp(prefix="acceptance_")
    report = {"dry_run": dry_run, "weights_dir": args.weights_dir, "gates": {}}
    g = Gate(report)

    ok = True
    ok &= gate_a_converter_roundtrip(g, args.weights_dir, args.torch_dir, dry_run)
    ok &= gate_b_detector_iou(g, args.weights_dir, args.torch_dir, args.frames, dry_run, size)
    ok &= gate_c_pitch_rmse(g, args.weights_dir, args.frames, dry_run)
    ok &= gate_d_results_schema(g, args.weights_dir, args.frames, dry_run, out_dir)

    out = args.out or os.path.join(out_dir, "acceptance.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report: {out}", flush=True)
    print("ACCEPTANCE " + ("PASSED" if ok else "FAILED"), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
