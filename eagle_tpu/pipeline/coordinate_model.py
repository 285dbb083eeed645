"""CoordinateModel: the public perception API.

Drop-in equivalent of the reference's CoordinateModel
(eagle/models/coordinate_model.py:47-417): given BGR frames and an fps, it
returns the per-frame dict of detections, keypoints, homography-projected
pitch coordinates and visible-pitch boundaries, with the same output
schema (docs/data.md).

TPU re-architecture (SURVEY.md section 7):
- Phase A (batched, device): keypoint model over sampled frames, detector
  + NMS over all frames -- stateless, frame-parallel, dispatched
  asynchronously.
- Phase B (scan, device): optical flow, keypoint cadence/synthesis,
  RANSAC homography, tracking -- the genuinely sequential state machine
  (:mod:`eagle_tpu.pipeline.temporal`), processed in fixed-size chunks.
- Phase C (host): float64 projection + dict assembly at the JSON edge.

Model weights: pass converted parameter pytrees (or .pth/.pt paths via the
loader helpers).  Both model slots also accept plain callables so tests
and downstream users can inject oracles or custom models.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from eagle_tpu import pitch
from eagle_tpu.config import DEFAULT_CONFIG, PipelineConfig
from eagle_tpu.models import hrnet, yolov8
from eagle_tpu.ops.heatmap import decode_heatmaps
from eagle_tpu.ops.nms import batched_nms
from eagle_tpu.ops.preprocess import letterbox, preprocess_keypoint
from eagle_tpu.pipeline import temporal

PITCH_WIDTH = 105
PITCH_HEIGHT = 68


def find_x_at_y(pt1, pt2, y_target):
    """Line solve used for the visible-pitch boundary clamp (reference
    coordinate_model.py:32-44), with Python division semantics (raises on
    vertical or horizontal lines, which the caller treats as no
    boundaries)."""
    x1, y1 = pt1
    x2, y2 = pt2
    m = (y2 - y1) / (x2 - x1)
    c = y1 - m * x1
    return (y_target - c) / m


def _project_int(H: np.ndarray, pt) -> np.ndarray:
    """cv2.perspectiveTransform of one point + astype(int) truncation."""
    v = H @ np.array([pt[0], pt[1], 1.0], dtype=np.float64)
    return (v[:2] / v[2]).astype(int)


class _DeviceFrames:
    """Clip frames uploaded in independent async pieces, so consumers of
    early frames start while later pieces are still in flight (the
    host->device link is the scarce resource)."""

    PIECE = 32

    def __init__(self, frames: np.ndarray):
        self.n = len(frames)
        self.pieces = [
            jnp.asarray(frames[i : i + self.PIECE]) for i in range(0, self.n, self.PIECE)
        ]

    def range(self, s0: int, s1: int) -> jnp.ndarray:
        """Device view of contiguous frames [s0, s1)."""
        parts = []
        for j in range(s0 // self.PIECE, (s1 - 1) // self.PIECE + 1):
            a = max(s0, j * self.PIECE) - j * self.PIECE
            b = min(s1, (j + 1) * self.PIECE) - j * self.PIECE
            parts.append(self.pieces[j][a:b])
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)

    def take(self, idxs) -> jnp.ndarray:
        """Device stack of arbitrary frame indices (small lists)."""
        return jnp.concatenate(
            [self.pieces[i // self.PIECE][i % self.PIECE][None] for i in idxs], axis=0
        )


class CoordinateModel:
    def __init__(
        self,
        keypoint_conf: float = 0.3,
        detector_conf: float = 0.35,
        *,
        config: PipelineConfig | None = None,
        keypoint_params=None,
        detector_params=None,
        keypoint_checkpoint: str | None = None,
        detector_checkpoint: str | None = None,
        keypoint_fn: Callable | None = None,
        detector_fn: Callable | None = None,
        seed: int = 0,
        verbose_init: bool = True,
    ):
        cfg = config or DEFAULT_CONFIG
        self.config = cfg
        self.keypoint_conf = keypoint_conf
        self.detector_conf = detector_conf
        self._key = jax.random.key(seed)
        self._jit_cache: dict = {}
        if verbose_init:
            print(f"Using {jax.default_backend()} for inference")

        # ------------------------------------------------ keypoint model
        if keypoint_fn is not None:
            self._keypoint_fn = keypoint_fn
        else:
            if keypoint_checkpoint is not None:
                if keypoint_checkpoint.endswith(".msgpack"):
                    from eagle_tpu.models.checkpoint import load_params

                    keypoint_params = load_params(keypoint_checkpoint)
                else:
                    from eagle_tpu.models.convert import load_hrnet_checkpoint

                    keypoint_params = load_hrnet_checkpoint(keypoint_checkpoint)
            if keypoint_params is None:
                keypoint_params = hrnet.init_params(jax.random.key(seed))
            self._keypoint_params = keypoint_params
            self._keypoint_fn = self._default_keypoint_fn

        # ------------------------------------------------------ detector
        if detector_fn is not None:
            self._detector_fn = detector_fn
        else:
            if detector_checkpoint is not None:
                if detector_checkpoint.endswith(".msgpack"):
                    from eagle_tpu.models.checkpoint import load_params

                    detector_params = load_params(detector_checkpoint)
                else:
                    import torch

                    sd = torch.load(detector_checkpoint, map_location="cpu", weights_only=True)
                    detector_params = yolov8.yolov8_from_torch(sd)
            if detector_params is None:
                detector_params = yolov8.init_params(
                    jax.random.key(seed + 1),
                    variant=cfg.detector.variant.replace("large_hd", "l").replace("large", "l").replace("medium", "m"),
                    num_classes=cfg.detector.num_classes,
                )
            self._detector_params = detector_params
            self._detector_fn = self._default_detector_fn

    # ------------------------------------------------------------------
    # default model functions (batched, jitted ONCE per image shape --
    # a fresh jax.jit per call would retrace the whole network each batch)
    # ------------------------------------------------------------------

    def _kp_runner(self, img_hw: tuple[int, int]):
        key = ("kp", img_hw)
        if key not in self._jit_cache:
            cfg = self.config.keypoint
            conf = self.keypoint_conf

            @jax.jit
            def run(x):
                pre = preprocess_keypoint(x, out_hw=cfg.input_hw)
                hm = hrnet.apply(self._keypoint_params, pre, use_bf16=cfg.use_bf16)
                return decode_heatmaps(hm, conf, img_hw, cfg.score_floor)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _default_keypoint_fn(self, frames_bgr):
        """(B, H, W, 3) uint8 BGR -> ((B, 57, 3) xi/yi/score, (B, 57) valid)
        as device arrays (dispatch is async; callers convert when needed)."""
        h, w = frames_bgr.shape[1:3]
        return self._kp_runner((int(h), int(w)))(jnp.asarray(frames_bgr))

    def _det_runner(self, img_hw: tuple[int, int]):
        key = ("det", img_hw)
        if key not in self._jit_cache:
            dcfg = self.config.detector
            h, w = img_hw
            variant = {"medium": "m", "large": "l", "large_hd": "l"}[dcfg.variant]
            low_conf = min(self.detector_conf, dcfg.low_conf)

            @jax.jit
            def run(x):
                imgs, gain, pad = letterbox(x, size=dcfg.image_size)
                boxes, scores = yolov8.apply(
                    self._detector_params, imgs, variant=variant, use_bf16=dcfg.use_bf16
                )
                b, s, c, v = batched_nms(
                    boxes,
                    scores,
                    conf_threshold=low_conf,
                    iou_threshold=dcfg.nms_iou,
                    max_det=dcfg.max_detections,
                    pre_topk=dcfg.nms_pre_topk,
                )
                # letterbox -> original pixels, clipped (ultralytics scale_boxes)
                b = (b - jnp.concatenate([pad, pad])) / gain
                b = jnp.clip(
                    b, 0.0, jnp.asarray([w - 1, h - 1, w - 1, h - 1], jnp.float32)
                )
                return b, s, c, v

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _default_detector_fn(self, frames_bgr):
        """(B, H, W, 3) uint8 BGR -> fixed-shape detections in original
        pixel coordinates: (boxes (B, D, 4), conf (B, D), cls (B, D),
        valid (B, D))."""
        h, w = frames_bgr.shape[1:3]
        return self._det_runner((int(h), int(w)))(jnp.asarray(frames_bgr))

    # ------------------------------------------------------------------
    # main entry point
    # ------------------------------------------------------------------

    def get_coordinates(
        self,
        frames,
        fps: int,
        num_homography: int = 1,
        num_keypoint_detection: int = 1,
        verbose: bool = True,
        calibration: bool = False,
        profile=None,
    ) -> dict:
        """See the reference contract (coordinate_model.py:188-204): returns
        {frame_idx: {"Coordinates", "Time", "Keypoints", "Boundaries"}}.

        ``profile``: optional :class:`eagle_tpu.utils.profiling.StageTimer`
        accumulating per-phase wall-clock (upload / keypoints / detector /
        scan / assembly)."""
        from eagle_tpu.utils.logging import log_event
        from eagle_tpu.utils.profiling import StageTimer

        timer = profile if profile is not None else StageTimer()
        frames = np.asarray(frames)
        n = len(frames)
        if n == 0:
            return {}
        cfg = self.config
        if calibration != cfg.calibration:
            cfg = cfg.replace(calibration=calibration)
        h_img, w_img = frames.shape[1:3]
        kp_interval = max(1, int(fps / max(1, num_keypoint_detection)))
        h_interval = max(1, int(fps / max(1, num_homography)))

        # the clip crosses host->device exactly once, in independent async
        # pieces; phase A consumes pieces in upload order so transfers and
        # compute overlap
        with timer("upload"):
            frames_dev = _DeviceFrames(frames)

        # ---------------- Phase A: batched model inference
        # every model batch is padded to a fixed size so XLA compiles each
        # network for exactly one shape (remainder batches repeat the last
        # frame; their results are sliced away)
        mem_kp = np.zeros((n, 57, 3), np.float32)
        mem_valid = np.zeros((n, 57), bool)
        sampled = list(range(0, n, kp_interval))
        bs = 8
        bs_det = 16  # detector batches are larger: per-dispatch RPC latency
        # dominates at batch 8 (measured ~100ms/call through the tunnel)

        def _pad_batch(idx_list, size):
            real = len(idx_list)
            padded = list(idx_list) + [idx_list[-1]] * (size - real)
            return padded, real

        det_boxes = np.zeros((n, cfg.detector.max_detections, 4), np.float32)
        det_conf = np.zeros((n, cfg.detector.max_detections), np.float32)
        det_cls = np.zeros((n, cfg.detector.max_detections), np.int32)
        det_valid = np.zeros((n, cfg.detector.max_detections), bool)
        embed_dim = cfg.tracker.embed_dim if cfg.tracker.use_appearance else 1
        det_embed = np.zeros((n, cfg.detector.max_detections, embed_dim), np.float32)
        it = range(0, n, bs_det)
        if verbose:
            from tqdm import tqdm

            it = tqdm(it, desc="Detecting objects")
        t_det = timer("detector"); t_det.__enter__()
        pending_det = []
        for i in it:
            idx, real = _pad_batch(list(range(i, min(i + bs_det, n))), bs_det)
            batch = frames_dev.range(i, i + bs_det) if real == bs_det else frames_dev.take(idx)
            out = self._detector_fn(batch)
            emb = None
            if cfg.tracker.use_appearance:
                from eagle_tpu.ops.embed import histogram_embeddings

                nb, d = out[0].shape[:2]
                fi = np.repeat(np.arange(nb, dtype=np.int32), d)
                emb = histogram_embeddings(
                    jnp.asarray(batch), jnp.asarray(fi), jnp.asarray(out[0]).reshape(-1, 4)
                )
            pending_det.append((i, real, out, emb))
        for i, real, (b, s, c, v), emb in pending_det:
            det_boxes[i : i + real] = np.asarray(b)[:real]
            det_conf[i : i + real] = np.asarray(s)[:real]
            det_cls[i : i + real] = np.asarray(c)[:real]
            det_valid[i : i + real] = np.asarray(v)[:real]
            if emb is not None:
                nb, d = b.shape[:2]
                det_embed[i : i + real] = np.asarray(emb).reshape(nb, d, -1)[:real]
        t_det.__exit__(None, None, None)

        # dispatch every batch asynchronously, then drain
        with timer("keypoints"):
            pending_kp = []
            for i in range(0, len(sampled), bs):
                idx, real = _pad_batch(sampled[i : i + bs], bs)
                pending_kp.append((idx, real, self._keypoint_fn(frames_dev.take(idx))))
            for idx, real, (kp, valid) in pending_kp:
                mem_kp[idx[:real]] = np.asarray(kp)[:real]
                mem_valid[idx[:real]] = np.asarray(valid)[:real]

        # ---------------- first-frame seeding
        if mem_valid[0].sum() < 4:
            found = next((j for j in sampled if mem_valid[j].sum() >= 4), None)
            if found is not None and found > 0:
                seed_xy, seed_ok = temporal.backward_seed(
                    frames_dev.range(0, found + 1),
                    jnp.asarray(mem_kp[found, :, :2]),
                    jnp.asarray(mem_valid[found]),
                    cfg,
                )
                seed_xy, seed_ok = np.asarray(seed_xy), np.asarray(seed_ok)
                for j in range(found):  # memoized entries win per-label
                    take = seed_ok[j] & ~mem_valid[j]
                    mem_kp[j, take, :2] = seed_xy[j, take]
                    mem_valid[j] |= seed_ok[j]

        # ---------------- Phase B: temporal scan in chunks, repeated when
        # the reference's on-demand keypoint detection would have fired
        # (flow collapse on a non-cadence frame, coordinate_model.py:316-319):
        # flagged frames get model keypoints memoized, then the scan re-runs
        for _ondemand_round in range(3):
            out = self._run_scan(
                frames_dev, mem_kp, mem_valid, det_boxes, det_conf, det_cls,
                det_valid, det_embed, n, kp_interval, h_interval, cfg, timer, verbose,
            )
            flagged = np.flatnonzero(np.asarray(out.need_kp) & ~mem_valid.any(axis=1))
            if len(flagged) == 0:
                break
            for i in range(0, len(flagged), bs):
                idx, real = _pad_batch(list(flagged[i : i + bs]), bs)
                kp, valid = self._keypoint_fn(frames_dev.take(idx))
                mem_kp[idx[:real]] = np.asarray(kp)[:real]
                mem_valid[idx[:real]] = np.asarray(valid)[:real]

        # ---------------- Phase C: host assembly (float64 projection)
        with timer("assembly"):
            res = self._assemble(
                out, det_boxes, det_conf, det_cls, det_valid, fps, (h_img, w_img)
            )
        log_event("get_coordinates", frames=n, **{k: v["total_s"] for k, v in timer.summary().items()})
        return res

    def _run_scan(
        self, frames_dev, mem_kp, mem_valid, det_boxes, det_conf, det_cls,
        det_valid, det_embed, n, kp_interval, h_interval, cfg, timer, verbose,
    ):
        carry = temporal.init_carry(cfg)
        outs = []
        chunk = cfg.chunk_frames
        it = range(0, n, chunk)
        if verbose:
            from tqdm import tqdm

            it = tqdm(it, desc="Processing Frames")
        for s0 in it:
            s1 = min(s0 + chunk, n)
            pad = chunk - (s1 - s0)  # final chunk padded to one fixed shape
            # (safe: padded steps only advance a carry nothing consumes,
            # and their outputs are sliced away)

            def padded(a):
                if pad == 0:
                    return a
                reps = jnp.repeat(a[-1:], pad, axis=0)
                return jnp.concatenate([a, reps], axis=0)

            if s0 == 0:  # previous-frame view via slices (frame 0 repeats)
                first = frames_dev.range(0, 1)
                prev_frames = (
                    jnp.concatenate([first, frames_dev.range(0, s1 - 1)], axis=0)
                    if s1 > 1
                    else first
                )
            else:
                prev_frames = frames_dev.range(s0 - 1, s1 - 1)

            xs = temporal.FrameInputs(
                frame_bgr=padded(frames_dev.range(s0, s1)),
                prev_frame_bgr=padded(prev_frames),
                model_kp=padded(jnp.asarray(mem_kp[s0:s1])),
                model_kp_valid=padded(jnp.asarray(mem_valid[s0:s1])),
                is_kp_frame=padded(jnp.asarray(np.arange(s0, s1) % kp_interval == 0)),
                is_h_frame=padded(jnp.asarray(np.arange(s0, s1) % h_interval == 0)),
                det_boxes=padded(jnp.asarray(det_boxes[s0:s1])),
                det_conf=padded(jnp.asarray(det_conf[s0:s1])),
                det_cls=padded(jnp.asarray(det_cls[s0:s1])),
                det_valid=padded(jnp.asarray(det_valid[s0:s1])),
                det_embed=padded(jnp.asarray(det_embed[s0:s1])),
                t=padded(jnp.arange(s0, s1, dtype=jnp.int32)),
            )
            with timer("scan"):
                carry, out = _run_chunk(carry, xs, cfg, self._key)
            outs.append(jax.tree.map(lambda a: a[: s1 - s0], out) if pad else out)

        with timer("scan"):
            outs = [jax.tree.map(np.asarray, o) for o in outs]
        return jax.tree.map(lambda *x: np.concatenate(x, axis=0), *outs)

    # ------------------------------------------------------------------

    def _assemble(self, out, det_boxes, det_conf, det_cls, det_valid, fps, img_hw):
        """Per-frame dict assembly matching the reference's output schema
        bit-for-bit in structure (coordinate_model.py:369-415 +
        detect_objects :557-628)."""
        h_img, w_img = img_hw
        n = len(out.kp_xy)
        class_names = dict(enumerate(self.config.detector.class_names))
        res = {}
        for i in range(n):
            H = np.asarray(out.H[i], np.float64)
            H_ok = bool(out.H_ok[i])

            # ---- objects dict (tracker output, then fallbacks)
            objects = {"Player": {}, "Goalkeeper": {}}
            tv = out.track_valid[i]
            for k in np.flatnonzero(tv):
                cls_name = class_names.get(int(out.track_cls[i][k]))
                if cls_name not in objects:
                    continue
                conf = float(out.track_conf[i][k])
                if conf < self.detector_conf:
                    continue
                x1, y1, x2, y2 = out.track_boxes[i][k]
                x1 = int(np.clip(x1, 0, w_img - 1))
                y1 = int(np.clip(y1, 0, h_img - 1))
                x2 = int(np.clip(x2, 0, w_img - 1))
                y2 = int(np.clip(y2, 0, h_img - 1))
                objects[cls_name][int(out.track_id[i][k])] = {
                    "BBox": [x1, y1, x2, y2],
                    "Confidence": conf,
                    "Bottom_center": [int((x1 + x2) / 2), y2],
                }

            # fallback to raw detections when tracking yields nothing
            if (
                not objects["Player"]
                and not objects["Goalkeeper"]
                and det_valid[i].any()
            ):
                for d in np.flatnonzero(det_valid[i]):
                    cls_name = class_names.get(int(det_cls[i][d]))
                    if cls_name not in objects:
                        continue
                    if float(det_conf[i][d]) < self.detector_conf:
                        continue
                    x1, y1, x2, y2 = det_boxes[i][d].astype(int)
                    x1 = int(np.clip(x1, 0, w_img - 1))
                    y1 = int(np.clip(y1, 0, h_img - 1))
                    x2 = int(np.clip(x2, 0, w_img - 1))
                    y2 = int(np.clip(y2, 0, h_img - 1))
                    objects[cls_name][int(d)] = {
                        "BBox": [x1, y1, x2, y2],
                        "Confidence": float(det_conf[i][d]),
                        "Bottom_center": [int((x1 + x2) / 2), y2],
                    }

            # the ball comes from raw detections, never tracked (:618-627)
            ball_idx = np.flatnonzero(det_valid[i] & (det_cls[i] == 2))
            if len(ball_idx) > 0:
                objects["Ball"] = {}
                for bi, d in enumerate(ball_idx):
                    if float(det_conf[i][d]) < self.detector_conf:
                        continue
                    box = det_boxes[i][d].astype(int)
                    objects["Ball"][bi] = {
                        "BBox": box,
                        "Confidence": float(det_conf[i][d]),
                        "Bottom_center": [int((box[0] + box[2]) / 2), int(box[3])],
                    }

            # ---- projection to pitch coordinates (:369-392)
            indiv = {}
            for class_name, class_dict in objects.items():
                for obj_id, obj in class_dict.items():
                    bottom_center = obj["Bottom_center"]
                    bbox_coords = np.array(obj["BBox"], dtype=np.uint16).tolist()
                    conf = obj["Confidence"]
                    if not H_ok:
                        curr = {
                            int(obj_id): {
                                "BBox": bbox_coords,
                                "Confidence": conf,
                                "Transformed_Coordinates": None,
                                "Image_Bottom_center": bottom_center,
                            }
                        }
                    else:
                        t = _project_int(H, bottom_center)
                        tx, ty = int(t[0]), int(t[1])
                        if tx < 0 or tx > PITCH_WIDTH or ty < 0 or ty > PITCH_HEIGHT:
                            curr = {
                                int(obj_id): {
                                    "BBox": bbox_coords,
                                    "Confidence": conf,
                                    "Transformed_Coordinates": None,
                                    "Image_Bottom_center": bottom_center,
                                }
                            }
                        else:
                            curr = {
                                int(obj_id): {
                                    "BBox": bbox_coords,
                                    "Confidence": conf,
                                    "Transformed_Coordinates": [tx, ty],
                                }
                            }
                    indiv.setdefault(class_name, {}).update(curr)

            # ---- visible-pitch boundaries (:394-414)
            boundaries = [None, None, None, None]
            if H_ok:
                tl = _project_int(H, (0, 0)).tolist()
                tr = _project_int(H, (w_img, 0)).tolist()
                bl = _project_int(H, (0, h_img)).tolist()
                br = _project_int(H, (w_img, h_img)).tolist()
                try:
                    tl2 = (find_x_at_y(tl, bl, PITCH_HEIGHT), PITCH_HEIGHT)
                    tr2 = (find_x_at_y(tr, br, PITCH_HEIGHT), PITCH_HEIGHT)
                    bl2 = (find_x_at_y(bl, tl2, 0), 0)
                    br2 = (find_x_at_y(br, tr2, 0), 0)
                    boundaries = [bl2, tl2, tr2, br2]
                except ZeroDivisionError:
                    pass

            # ---- keypoints dict
            kps = {
                pitch.KEYPOINT_NAMES[k]: (int(out.kp_xy[i][k][0]), int(out.kp_xy[i][k][1]))
                for k in np.flatnonzero(out.kp_valid[i])
            }

            res[i] = {
                "Coordinates": indiv,
                "Time": f"{i // fps // 60:02d}:{i // fps % 60:02d}",
                "Keypoints": kps,
                "Boundaries": boundaries,
            }
        return res


@functools.partial(jax.jit, static_argnames=("cfg",))
def _run_chunk(carry, xs, cfg: PipelineConfig, base_key):
    def step(c, x):
        return temporal.temporal_step(c, x, cfg, base_key)

    return jax.lax.scan(step, carry, xs)
