"""Shared oracle model functions for pipeline tests: perfect detector and
keypoint model derived from the synthetic scene's ground truth."""

import numpy as np

from eagle_tpu import pitch


def oracle_keypoint_fn(scene):
    kp_img = scene.keypoints_image  # static camera
    h, w = scene.frames.shape[1:3]
    valid = (
        (kp_img[:, 0] >= 5)
        & (kp_img[:, 0] < w - 5)
        & (kp_img[:, 1] >= 5)
        & (kp_img[:, 1] < h - 5)
        & pitch.ON_PLANE_MASK
    )

    def fn(frames_batch):
        b = len(frames_batch)
        kp = np.zeros((b, 57, 3), np.float32)
        kp[:, :, 0] = np.trunc(kp_img[:, 0])
        kp[:, :, 1] = np.trunc(kp_img[:, 1])
        kp[:, :, 2] = 0.9
        return kp, np.tile(valid, (b, 1))

    return fn


def oracle_detections_at(scene, t, max_det=128, drop=()):
    """Perfect single-frame detection arrays for scene frame ``t``."""
    boxes = np.zeros((max_det, 4), np.float32)
    conf = np.zeros((max_det,), np.float32)
    cls = np.zeros((max_det,), np.int32)
    valid = np.zeros((max_det,), bool)
    slot = 0
    for p in range(scene.player_boxes.shape[1]):
        if p in drop:
            continue
        boxes[slot] = scene.player_boxes[t, p]
        conf[slot] = 0.9
        cls[slot] = 0
        valid[slot] = True
        slot += 1
    bx, by = scene.ball_image[t]
    boxes[slot] = [bx - 5, by - 10, bx + 5, by]
    conf[slot] = 0.8
    cls[slot] = 2
    valid[slot] = True
    return boxes, conf, cls, valid


def oracle_detector_fn(scene, max_det=128, drop=None):
    """Perfect detections from the scene; ``drop`` maps frame index to a
    set of player indices to omit (for occlusion tests)."""
    cursor = [0]
    drop = drop or {}

    def fn(frames_batch):
        b = len(frames_batch)
        t0 = cursor[0]
        cursor[0] += b
        boxes = np.zeros((b, max_det, 4), np.float32)
        conf = np.zeros((b, max_det), np.float32)
        cls = np.zeros((b, max_det), np.int32)
        valid = np.zeros((b, max_det), bool)
        n_total = len(scene.frames)
        for k in range(b):
            # batches may be padded by repeating the last frame; clamp
            t = min(t0 + k, n_total - 1)
            boxes[k], conf[k], cls[k], valid[k] = oracle_detections_at(
                scene, t, max_det, drop.get(t, ())
            )
        return boxes, conf, cls, valid

    return fn
