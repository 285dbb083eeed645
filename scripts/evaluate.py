"""Model evaluation harness CLI.

Produces the metric schema of the reference's stored eval artifact
(eagle/models/weights/results.json: acc@{2,4,8,12}px +
precision/recall/F1 + PDJ per model) -- the harness itself is absent from
the reference repo (SURVEY.md section 6); this is the missing tool.

Without labeled footage it evaluates on the synthetic ground-truth scene
(--synthetic, default), exercising detector + keypoint model end to end;
with a labels JSON ({frame: {"keypoints": [[x,y,id],...], "boxes":
[[x1,y1,x2,y2,cls],...]}}) it scores real clips.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from argparse import ArgumentParser

import numpy as np


def main():
    p = ArgumentParser()
    p.add_argument("--keypoint_weights", default=None)
    p.add_argument("--detector_weights", default=None)
    p.add_argument("--video", default=None, help="clip to evaluate (else synthetic)")
    p.add_argument("--labels", default=None, help="ground-truth JSON for --video")
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--out", default="results.json")
    args = p.parse_args()

    from eagle_tpu import pitch
    from eagle_tpu.eval import detection_metrics, point_metrics
    from eagle_tpu.pipeline.coordinate_model import CoordinateModel

    model = CoordinateModel(
        keypoint_checkpoint=args.keypoint_weights,
        detector_checkpoint=args.detector_weights,
        verbose_init=False,
    )

    if args.video is None:
        from eagle_tpu.utils.synthetic import make_scene

        scene = make_scene(num_frames=args.frames, width=1280, height=720, num_players=10)
        frames = scene.frames
        gt_kp = np.tile(scene.keypoints_image, (len(frames), 1, 1))
        inb = (
            (scene.keypoints_image[:, 0] >= 0)
            & (scene.keypoints_image[:, 0] < 1280)
            & (scene.keypoints_image[:, 1] >= 0)
            & (scene.keypoints_image[:, 1] < 720)
            & pitch.ON_PLANE_MASK
        )
        gt_kp_valid = np.tile(inb, (len(frames), 1))
        gt_boxes = scene.player_boxes
        gt_box_valid = np.ones(gt_boxes.shape[:2], bool)
    else:
        import cv2

        from eagle_tpu.io import read_video_array

        frames, _ = read_video_array(args.video, fps=25)
        frames = frames[: args.frames]
        with open(args.labels) as f:
            labels = json.load(f)
        gt_kp = np.zeros((len(frames), 57, 2))
        gt_kp_valid = np.zeros((len(frames), 57), bool)
        max_gt = max(len(v.get("boxes", [])) for v in labels.values())
        gt_boxes = np.zeros((len(frames), max_gt, 4))
        gt_box_valid = np.zeros((len(frames), max_gt), bool)
        for k, v in labels.items():
            t = int(k)
            if t >= len(frames):
                continue
            for x, y, kid in v.get("keypoints", []):
                gt_kp[t, int(kid)] = (x, y)
                gt_kp_valid[t, int(kid)] = True
            for i, (x1, y1, x2, y2, _cls) in enumerate(v.get("boxes", [])):
                gt_boxes[t, i] = (x1, y1, x2, y2)
                gt_box_valid[t, i] = True

    # --- keypoint model
    t0 = time.perf_counter()
    kp, kp_valid = model._keypoint_fn(frames)
    kp_time = (time.perf_counter() - t0) / len(frames)
    kp_metrics = point_metrics(kp[:, :, :2], kp_valid, gt_kp, gt_kp_valid, labeled=True)

    # --- detector
    t0 = time.perf_counter()
    boxes, conf, cls, valid = model._detector_fn(frames)
    det_time = (time.perf_counter() - t0) / len(frames)
    person = valid & (cls <= 1) & (conf >= model.detector_conf)
    det_box_metrics = detection_metrics(boxes, person, gt_boxes, gt_box_valid)
    # bottom-center point metrics at pixel thresholds (the reference's
    # YOLO "metrics" are point distances)
    bc_pred = np.stack([(boxes[..., 0] + boxes[..., 2]) / 2, boxes[..., 3]], -1)
    bc_gt = np.stack([(gt_boxes[..., 0] + gt_boxes[..., 2]) / 2, gt_boxes[..., 3]], -1)
    det_pt_metrics = point_metrics(bc_pred, person, bc_gt, gt_box_valid, labeled=False)

    results = {
        "YOLO": {
            "metrics": det_pt_metrics["metrics"],
            "classification": det_pt_metrics["classification"],
            "boxes": det_box_metrics,
            "time": det_time,
        },
        "HRNet": {
            "metrics": kp_metrics["metrics"],
            "classification": kp_metrics["classification"],
            "time": kp_time,
        },
    }
    with open(args.out, "w") as f:
        json.dump(results, f)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
