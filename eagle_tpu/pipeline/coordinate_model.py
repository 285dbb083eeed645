"""CoordinateModel: the public perception API.

Drop-in equivalent of the reference's CoordinateModel
(eagle/models/coordinate_model.py:47-417): given BGR frames and an fps, it
returns the per-frame dict of detections, keypoints, homography-projected
pitch coordinates and visible-pitch boundaries, with the same output
schema (docs/data.md).

TPU re-architecture (SURVEY.md section 7):
- Host prescale: every frame is letterboxed ONCE on the host to the
  detector's rectangular working canvas (ultralytics LetterBox(auto=True)
  geometry, cv2 INTER_LINEAR); that single uint8 buffer is the only bulk
  host->device transfer and every device stage consumes it.
- Phase A (batched, device): the detector reads working-canvas pieces
  directly (no device letterbox, rectangular inference); the keypoint
  model reads its 540x960 input straight out of the canvas image region
  (bit-identical to the reference's Resize when the region matches).
  Dispatch is asynchronous; each call returns ONE packed array so a
  degraded host link pays one round-trip per batch, not five.
- Phase B (scan, device): optical flow, keypoint cadence/synthesis,
  RANSAC homography, tracking -- the genuinely sequential state machine
  (:mod:`eagle_tpu.pipeline.temporal`), processed in fixed-size chunks
  whose frames are re-assembled from the uploaded pieces INSIDE the jitted
  program.  Per-chunk carries are checkpointed so the reference's
  on-demand keypoint fallback re-runs only from the first flagged chunk.
- Phase C (host): float64 projection + dict assembly at the JSON edge.

Model weights: pass converted parameter pytrees (or .pth/.pt paths via the
loader helpers).  Both model slots also accept plain callables so tests
and downstream users can inject oracles or custom models; custom callables
receive original-resolution frames (the working-canvas fast path applies
to the built-in models only).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from eagle_tpu import pitch
from eagle_tpu.config import DEFAULT_CONFIG, PipelineConfig, WorkGeometry
from eagle_tpu.models import hrnet, yolov8
from eagle_tpu.ops.heatmap import decode_heatmaps
from eagle_tpu.ops.nms import batched_nms
from eagle_tpu.ops.preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    compute_work_geometry,
    host_letterbox,
    letterbox,
    preprocess_keypoint,
    resize_bilinear,
    resolve_upload_format,
)
from eagle_tpu.pipeline import temporal

PITCH_WIDTH = 105
PITCH_HEIGHT = 68

#: frames per uploaded piece == detector batch (measured: per-dispatch RPC
#: latency dominates below 16 through the tunneled host link)
PIECE = 16
#: keypoint-model batch
KP_BATCH = 8


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


def _flat_slice(srcs, i: int, j: int) -> np.ndarray:
    """frames[i:j] over a flat multi-clip timeline: a zero-copy view when
    the range stays inside one source clip, a small concat otherwise."""
    parts = []
    off = 0
    for src in srcs:
        lo, hi = max(i - off, 0), min(j - off, len(src))
        if lo < hi:
            parts.append(src[lo:hi])
        off += len(src)
    return parts[0] if len(parts) == 1 else np.concatenate(parts)


def _iter_padded_chunks(srcs, n: int, piece: int):
    """Yield the flat timeline as ``piece``-frame BGR chunks, repeating the
    final frame to pad the tail (sliced away downstream)."""
    for i in range(0, n, piece):
        chunk = _flat_slice(srcs, i, min(i + piece, n))
        if len(chunk) < piece:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], piece - len(chunk), axis=0)]
            )
        yield chunk


class PrescaledPieces(NamedTuple):
    """Host-prescaled upload pieces produced by
    :meth:`_DevicePieces.precompute_host` (e.g. on a prefetch thread while
    the previous clip's device phase runs) and consumed via
    ``_DevicePieces(precomputed=...)`` / ``get_coordinates(prescaled=...)``."""

    mode: str  # must match the consumer's upload-mode decision
    piece: int
    n: int
    pieces: list  # one host array per piece, already padded to `piece`


class _DevicePieces:
    """The clip as fixed-size device pieces, uploaded asynchronously.

    Pieces double as detector batches and as the scan's frame source
    (chunks concatenate pieces inside jit) -- the clip crosses
    host->device exactly once.  When a prescale geometry is given, each
    piece is cv2-letterboxed on the host right before its async upload, so
    resize and transfer pipeline.  With ``fmt="yuv420"`` the piece crosses
    the link as packed I420 planes (half the bytes; broadcast sources are
    natively 4:2:0) and one jitted conversion per piece rebuilds the BGR
    canvas on device -- every downstream consumer sees BGR either way."""

    @staticmethod
    def _host_plan(img_hw, geom, fmt: str, prescale: str):
        """The upload-mode decision + the host-side per-chunk transform.

        Returns ``(mode, use_yuv, host_fn)`` where ``host_fn(chunk)`` maps
        a padded BGR chunk to the array stored in ``host_pieces`` (and
        shipped to the device).  Shared by the inline path and
        :meth:`precompute_host` so a prefetched prescale can never diverge
        from what the consumer would have computed."""
        from eagle_tpu.ops.preprocess import (
            host_letterbox_i420,
            host_to_i420,
            i420_geometry_ok,
        )

        img_h, img_w = img_hw
        # parity is a property of what is UPLOADED: the canvas when a
        # prescale geometry is given, the raw frames otherwise.  H % 4
        # (not just even): the packed I420 layout stores each chroma
        # plane as H//4 whole rows (see ops.preprocess.host_to_i420)
        if geom is not None:
            even = geom.canvas_h % 4 == 0 and geom.canvas_w % 2 == 0
        else:
            even = img_h % 4 == 0 and img_w % 2 == 0
        use_yuv = fmt == "yuv420" and even
        # with an even-parity geometry, prescale straight in 4:2:0 (~30%
        # cheaper host prescale: convert once, resize planes)
        i420_ok = (
            use_yuv
            and geom is not None
            and i420_geometry_ok(geom, (int(img_h), int(img_w)))
        )
        if prescale == "device" and i420_ok:
            # host: one BGR->I420 conversion (no resize); the letterbox
            # runs on device from the raw planes
            return (
                "raw_planes",
                use_yuv,
                lambda chunk: host_to_i420(np.ascontiguousarray(chunk)),
            )
        if i420_ok:
            return (
                "canvas_planes",
                use_yuv,
                lambda chunk: host_letterbox_i420(np.ascontiguousarray(chunk), geom),
            )
        if geom is not None:
            return (
                "canvas_bgr",
                use_yuv,
                lambda chunk: np.ascontiguousarray(host_letterbox(chunk, geom)),
            )
        return "raw_bgr", use_yuv, np.ascontiguousarray

    @classmethod
    def precompute_host(
        cls,
        frames,
        piece: int = PIECE,
        geom=None,
        fmt: str = "bgr",
        prescale: str = "host",
    ) -> PrescaledPieces:
        """Run ONLY the host-side prescale (no device traffic): the part a
        serving pipeline can overlap with the previous clip's device
        phase.  cv2/native prescale kernels release the GIL, so this runs
        on a worker thread at full speed."""
        srcs = (
            [np.asarray(c) for c in frames]
            if isinstance(frames, (list, tuple))
            else [np.asarray(frames)]
        )
        n = sum(len(c) for c in srcs)
        img_h, img_w = srcs[0].shape[1:3]
        mode, _, host_fn = cls._host_plan((int(img_h), int(img_w)), geom, fmt, prescale)
        pieces = [
            host_fn(chunk) for chunk in _iter_padded_chunks(srcs, n, piece)
        ]
        return PrescaledPieces(mode=mode, piece=piece, n=n, pieces=pieces)

    def __init__(
        self,
        frames,
        piece: int = PIECE,
        geom=None,
        fmt: str = "bgr",
        on_piece=None,
        prescale: str = "host",
        precomputed: PrescaledPieces | None = None,
    ):
        """``frames``: one (N, H, W, 3) array OR a list of same-resolution
        clip arrays treated as one flat timeline -- the list form lets a
        multi-clip caller skip the ~hundreds-of-MB np.stack (chunks are
        copied piece-by-piece during prescale anyway).

        ``prescale="device"``: upload RAW-resolution 4:2:0 planes and run
        the letterbox on device (ops.preprocess.device_letterbox_i420) --
        ~1.5x less host CPU per frame at ~1.8x the link bytes; falls
        back to the host prescale when the 4:2:0 geometry does not
        apply.

        ``precomputed``: host pieces from :meth:`precompute_host` (same
        frames/geometry/config); the loop then only uploads + dispatches."""
        from eagle_tpu.ops.preprocess import (
            device_letterbox_i420,
            host_to_i420,
            i420_to_bgr,
        )

        self._srcs = (
            [np.asarray(c) for c in frames]
            if isinstance(frames, (list, tuple))
            else [frames]
        )
        self.n = sum(len(c) for c in self._srcs)
        self.piece = piece
        self.host_pieces = []
        self.pieces = []
        img_h, img_w = self._srcs[0].shape[1:3]
        mode, use_yuv, host_fn = self._host_plan(
            (int(img_h), int(img_w)), geom, fmt, prescale
        )
        self._host_is_planes = mode == "canvas_planes"
        self._host_raw_planes = mode == "raw_planes"
        self._geom = geom
        if precomputed is not None:
            assert (
                precomputed.mode == mode
                and precomputed.piece == piece
                and precomputed.n == self.n
            ), (
                f"prescaled pieces were computed for mode={precomputed.mode} "
                f"piece={precomputed.piece} n={precomputed.n}, this run needs "
                f"{mode}/{piece}/{self.n} (config or clip changed)"
            )
        chunks = (
            iter(precomputed.pieces)
            if precomputed is not None
            else (host_fn(c) for c in _iter_padded_chunks(self._srcs, self.n, piece))
        )
        for host_np in chunks:
            self.host_pieces.append(host_np)
            if mode == "raw_planes":
                self.pieces.append(
                    device_letterbox_i420(jax.device_put(host_np), geom)
                )
            elif mode == "canvas_planes":
                self.pieces.append(i420_to_bgr(jax.device_put(host_np)))
            elif use_yuv and host_np.shape[1] % 4 == 0 and host_np.shape[2] % 2 == 0:
                planes = jax.device_put(host_to_i420(host_np))  # async
                self.pieces.append(i420_to_bgr(planes))  # device decode
            else:
                self.pieces.append(jax.device_put(host_np))  # async; next
                # piece prescales while this one is in flight
            if on_piece is not None:
                # enqueue this piece's downstream program (e.g. the
                # detector) BEFORE the next piece's upload-dependent ops:
                # on an in-order device queue that lets piece k's compute
                # run while piece k+1 is still crossing the link
                on_piece(len(self.pieces) - 1, self.pieces[-1])

    def at(self, j: int) -> jax.Array:
        """Piece ``j``, repeating the final piece past the end (chunk
        padding)."""
        return self.pieces[min(j, len(self.pieces) - 1)]

    def host_range(self, n: int, start: int = 0) -> np.ndarray:
        """Host view of (working-canvas) frames ``[start, start + n)``,
        decoding from planes when the prescale ran in 4:2:0 and
        letterboxing when it runs on device (raw planes on host)."""
        j0 = start // self.piece
        k = -(-(start + n) // self.piece)
        arr = np.concatenate(self.host_pieces[j0:k], axis=0)
        arr = arr[start - j0 * self.piece :][:n]
        if self._host_is_planes or self._host_raw_planes:
            import cv2

            arr = np.stack(
                [cv2.cvtColor(p, cv2.COLOR_YUV2BGR_I420) for p in arr]
            )
        if self._host_raw_planes:
            arr = host_letterbox(arr, self._geom)
        return arr

    def release_host(self) -> None:
        """Drop the host canvas copies (~1.5 MB/frame) once the only host
        consumer (first-frame seeding) is past; device pieces stay."""
        self.host_pieces = []


def _pad_idx(idx_list, size):
    real = len(idx_list)
    return list(idx_list) + [idx_list[-1]] * (size - real), real


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
        reid_params=None,
        reid_checkpoint: str | None = None,
        seed: int = 0,
        verbose_init: bool = True,
    ):
        cfg = config or DEFAULT_CONFIG
        # Resolve the tri-state appearance default: None means "follow the
        # weights" -- ReID turns on exactly when a checkpoint/params are
        # supplied, matching the reference's weights-present-implies-ReID
        # construction (reference coordinate_model.py:68-72).  Explicit
        # True/False in the config always wins.
        if cfg.tracker.use_appearance is None:
            import dataclasses

            cfg = dataclasses.replace(
                cfg,
                tracker=dataclasses.replace(
                    cfg.tracker,
                    use_appearance=(reid_checkpoint is not None or reid_params is not None),
                ),
            )
        self.config = cfg
        self.keypoint_conf = keypoint_conf
        self.detector_conf = detector_conf
        self._key = jax.random.key(seed)
        self._jit_cache: dict = {}
        #: chunk-scan invocation counter (observability + fallback tests)
        self.scan_chunks_run = 0
        if verbose_init:
            print(f"Using {jax.default_backend()} for inference")

        # ------------------------------------------------ keypoint model
        self._custom_kp = keypoint_fn is not None
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
        self._custom_det = detector_fn is not None
        if detector_fn is not None:
            self._detector_fn = detector_fn
        else:
            if detector_checkpoint is not None:
                if detector_checkpoint.endswith(".msgpack"):
                    from eagle_tpu.models.checkpoint import load_params

                    detector_params = load_params(detector_checkpoint)
                elif detector_checkpoint.endswith(".onnx"):
                    from eagle_tpu.models.onnx_import import load_yolov8_onnx

                    detector_params = load_yolov8_onnx(detector_checkpoint)
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

        # ------------------------------------------------- ReID embedder
        # (the reference constructs BotSort with OSNet-x0.25 ReID,
        # coordinate_model.py:68-72; wired here whenever the appearance
        # slot is enabled with the "osnet" embedder)
        self._reid_params = None
        if cfg.tracker.use_appearance and cfg.tracker.embedder not in (
            "osnet",
            "histogram",
        ):
            raise ValueError(
                f"TrackerConfig.embedder must be 'osnet' or 'histogram' when "
                f"use_appearance=True, got {cfg.tracker.embedder!r}"
            )
        if (reid_checkpoint is not None or reid_params is not None) and not (
            cfg.tracker.use_appearance and cfg.tracker.embedder == "osnet"
        ):
            raise ValueError(
                "reid_checkpoint/reid_params given but the tracker would not "
                "use them: set TrackerConfig(use_appearance=True, "
                'embedder="osnet") (docs/parity.md deviation #10)'
            )
        if cfg.tracker.use_appearance and cfg.tracker.embedder == "osnet":
            from eagle_tpu.models import osnet

            if reid_checkpoint is not None:
                if reid_checkpoint.endswith(".msgpack"):
                    from eagle_tpu.models.checkpoint import load_params

                    reid_params = load_params(reid_checkpoint)
                else:
                    import torch

                    sd = torch.load(reid_checkpoint, map_location="cpu", weights_only=True)
                    reid_params = osnet.osnet_from_torch(sd)
            if reid_params is None:
                if verbose_init:
                    print(
                        "WARNING: OSNet ReID enabled without weights -- "
                        "appearance embeddings are RANDOM (association falls "
                        "back to its IoU behavior at best); pass "
                        "reid_checkpoint= (converted osnet_x0_25_msmt17.pt) "
                        "for the reference's ReID"
                    )
                reid_params = osnet.init_params(
                    jax.random.key(seed + 2), "x0_25", feature_dim=cfg.tracker.embed_dim
                )
            feat_dim = int(reid_params["fc"]["w"].shape[-1])
            if feat_dim != cfg.tracker.embed_dim:
                raise ValueError(
                    f"ReID checkpoint feature dim {feat_dim} != "
                    f"TrackerConfig.embed_dim {cfg.tracker.embed_dim} -- the "
                    "packed detector output and the track-embedding carry are "
                    "sized by embed_dim (osnet_x0_25_msmt17.pt is 512-d)"
                )
            self._reid_params = reid_params

    # ------------------------------------------------------------------
    # geometry
    # ------------------------------------------------------------------

    def _geometry(self, img_hw: tuple[int, int]) -> WorkGeometry:
        """Working-canvas geometry for this clip, or identity when custom
        model callables are injected (they expect original frames) or the
        canvas image region would be smaller than the keypoint input (the
        keypoint model would upsample)."""
        if self._custom_kp or self._custom_det:
            return WorkGeometry()
        g = compute_work_geometry(img_hw, self.config.detector.image_size)
        kh, kw = self.config.keypoint.input_hw
        if g.img_h < kh or g.img_w < kw:
            return WorkGeometry()
        return g

    # ------------------------------------------------------------------
    # default model runners (jitted ONCE per geometry -- a fresh jax.jit
    # per call would retrace the whole network each batch)
    # ------------------------------------------------------------------

    def _kp_runner(self, geom: WorkGeometry, img_hw: tuple[int, int]):
        """Keypoint forward on a (B, H, W, 3) uint8 BGR batch -> packed
        (B, 57, 4) [x, y, score, valid] in ORIGINAL image coordinates."""
        key = ("kp", geom, img_hw)
        if key not in self._jit_cache:
            cfg = self.config.keypoint
            conf = self.keypoint_conf

            @jax.jit
            def run(x):
                if geom.enabled:
                    img = x[
                        :,
                        geom.pad_y : geom.pad_y + geom.img_h,
                        geom.pad_x : geom.pad_x + geom.img_w,
                    ]
                    img = img[..., ::-1].astype(jnp.float32)  # BGR -> RGB
                    if (geom.img_h, geom.img_w) != cfg.input_hw:
                        img = resize_bilinear(img, cfg.input_hw)
                    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
                    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
                    pre = (img - mean) / std
                else:
                    pre = preprocess_keypoint(x, out_hw=cfg.input_hw)
                hm = hrnet.apply(self._keypoint_params, pre, use_bf16=cfg.use_bf16)
                kp, valid = decode_heatmaps(hm, conf, img_hw, cfg.score_floor)
                return jnp.concatenate(
                    [kp, valid.astype(jnp.float32)[..., None]], axis=-1
                )

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _kp_pieces_runner(self, geom, img_hw, pattern: tuple):
        """Keypoint forward whose batch is gathered from uploaded pieces
        inside the program: ``pattern`` is a static tuple of
        (piece_slot, row) pairs -- the sampled frames never re-cross the
        host link."""
        key = ("kp_pieces", geom, img_hw, pattern)
        if key not in self._jit_cache:
            base = self._kp_runner(geom, img_hw)

            @jax.jit
            def run(*pieces):
                batch = jnp.stack([pieces[pi][row] for pi, row in pattern])
                return base(batch)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _kp_on_demand_batch(self, pieces, idx, geom, img_hw):
        """Keypoint forward for a DATA-DEPENDENT frame set (the on-demand
        flow-collapse fallback): a jitted per-pattern gather (as on the
        cadence path, whose patterns are deterministic) would re-trace the
        whole keypoint network per novel pattern. Gather the rows eagerly
        (shape-cached slice ops) and run the one fixed-shape batch runner."""
        rows = [pieces.at(int(k) // PIECE)[int(k) % PIECE][None] for k in idx]
        return self._kp_runner(geom, img_hw)(jnp.concatenate(rows, axis=0))

    def _default_keypoint_fn(self, frames_bgr):
        """Compatibility entry (multi-clip runner / direct callers):
        (B, H, W, 3) uint8 BGR at ORIGINAL resolution ->
        ((B, 57, 3), (B, 57) valid) as device arrays."""
        h, w = frames_bgr.shape[1:3]
        packed = self._kp_runner(WorkGeometry(), (int(h), int(w)))(jnp.asarray(frames_bgr))
        return packed[..., :3], packed[..., 3] > 0.5

    def _det_runner(self, geom: WorkGeometry, img_hw: tuple[int, int]):
        """Detector forward + NMS on a (B, H, W, 3) uint8 BGR batch ->
        packed (B, D, 7[+E]) [x1, y1, x2, y2, conf, cls, valid, embed...]
        in ORIGINAL pixel coordinates."""
        key = ("det", geom, img_hw)
        if key not in self._jit_cache:
            dcfg = self.config.detector
            h, w = img_hw
            variant = {"medium": "m", "large": "l", "large_hd": "l"}[dcfg.variant]
            low_conf = min(self.detector_conf, dcfg.low_conf)
            use_embed = self.config.tracker.use_appearance

            @jax.jit
            def run(x):
                if geom.enabled:
                    # the canvas IS the letterbox (rectangular inference,
                    # like the reference's ultralytics .pt predict path)
                    imgs = x[..., ::-1].astype(jnp.float32) / 255.0
                    gain = jnp.float32(geom.gain)
                    pad = jnp.asarray([geom.pad_x, geom.pad_y], jnp.float32)
                else:
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
                packed = jnp.concatenate(
                    [
                        b,
                        s[..., None],
                        c.astype(jnp.float32)[..., None],
                        v.astype(jnp.float32)[..., None],
                    ],
                    axis=-1,
                )
                if use_embed:
                    # crops sample ``x`` (the uploaded frames): boxes map
                    # to canvas space on the working-resolution path and
                    # stay in original pixels otherwise
                    bx = (
                        b * gain + jnp.concatenate([pad, pad])
                        if geom.enabled
                        else b
                    )
                    packed = jnp.concatenate(
                        [packed, self._compute_embeddings(x, bx)], axis=-1
                    )
                return packed

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _default_detector_fn(self, frames_bgr):
        """Compatibility entry (multi-clip runner / direct callers):
        (B, H, W, 3) uint8 BGR at ORIGINAL resolution -> (boxes (B, D, 4),
        conf (B, D), cls (B, D) int32, valid (B, D) bool)."""
        h, w = frames_bgr.shape[1:3]
        packed = np.asarray(
            self._det_runner(WorkGeometry(), (int(h), int(w)))(jnp.asarray(frames_bgr))
        )
        return (
            packed[..., :4],
            packed[..., 4],
            packed[..., 5].astype(np.int32),
            packed[..., 6] > 0.5,
        )

    def _compute_embeddings(self, x, boxes_x):
        """(B, H, W, 3) uint8 frames + (B, D, 4) xyxy boxes in the SAME
        pixel space -> (B, D, E) appearance embeddings for the tracker
        (reference role: boxmot's OSNet ReID, coordinate_model.py:69).
        Traced inside the calling jit.  Only the first
        ``TrackerConfig.reid_slots`` confidence-sorted slots are embedded;
        later slots get zeros, which the appearance gate treats as a miss
        (cosine distance 0.5 > appearance_thresh -> IoU-only cost)."""
        tcfg = self.config.tracker
        nb, d = boxes_x.shape[:2]
        k = min(tcfg.reid_slots, d)
        if tcfg.embedder == "osnet":
            from eagle_tpu.models import osnet

            emb = osnet.embed_boxes(
                self._reid_params,
                x,
                boxes_x[:, :k],
                use_bf16=self.config.detector.use_bf16,
            )
        else:
            from eagle_tpu.ops.embed import HIST_BINS, histogram_embeddings

            assert tcfg.embed_dim == int(np.prod(HIST_BINS)), (
                "the histogram appearance embedder is a fixed "
                f"{int(np.prod(HIST_BINS))}-bin HSV histogram; set "
                "TrackerConfig.embed_dim to match (or use embedder='osnet')"
            )
            fi = jnp.repeat(jnp.arange(nb, dtype=jnp.int32), k)
            emb = histogram_embeddings(x, fi, boxes_x[:, :k].reshape(-1, 4)).reshape(
                nb, k, -1
            )
        if k < d:
            emb = jnp.concatenate(
                [emb, jnp.zeros((nb, d - k, emb.shape[-1]), emb.dtype)], axis=1
            )
        return emb

    def _embed_runner(self, img_hw: tuple[int, int]):
        """Appearance embeddings for the custom-detector path (original
        frames, boxes in original pixels).

        Only the first ``TrackerConfig.reid_slots`` slots are embedded
        (later slots get the zero-embedding gate-miss), so a custom
        ``detector_fn`` must FRONT-COMPACT its valid detections into the
        leading slots — the built-in NMS and the test oracles both do."""
        key = ("embed", img_hw)
        if key not in self._jit_cache:

            @jax.jit
            def run(frames, boxes):
                return self._compute_embeddings(frames, boxes)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def prescale_clip(self, frames) -> PrescaledPieces:
        """Host-side prescale of a clip into upload pieces, with the exact
        same geometry/format decision :meth:`get_coordinates` would make --
        run it on a worker thread while the previous clip's device phase is
        in flight, then pass the result as ``get_coordinates(...,
        prescaled=...)`` to take the prescale off the serial path (the
        native/cv2 kernels release the GIL).  No device traffic."""
        frames_list = (
            [np.asarray(c) for c in frames]
            if isinstance(frames, (list, tuple))
            else np.asarray(frames)
        )
        first = frames_list[0] if isinstance(frames_list, list) else frames_list
        img_hw = (int(first.shape[1]), int(first.shape[2]))
        geom = self._geometry(img_hw)
        fmt = resolve_upload_format(self.config.upload_format, geom.enabled)
        return _DevicePieces.precompute_host(
            frames_list,
            PIECE,
            geom if geom.enabled else None,
            fmt=fmt,
            prescale=self.config.prescale,
        )

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
        prescaled: PrescaledPieces | None = None,
        _clip_lens: list[int] | None = None,
        _stream_in: dict | None = None,
        _stream_out: bool = False,
    ) -> dict:
        """See the reference contract (coordinate_model.py:188-204): returns
        {frame_idx: {"Coordinates", "Time", "Keypoints", "Boundaries"}}.

        ``profile``: optional :class:`eagle_tpu.utils.profiling.StageTimer`
        accumulating per-phase wall-clock (upload / keypoints / detector /
        scan / assembly).

        ``_clip_lens``: internal (used by :class:`MultiClipRunner` on one
        device): ``frames`` is a list of C equal-length (padded) clips
        flattened into one stream; ``t`` becomes the within-clip index and
        the scan carry resets at every clip boundary, so the result is
        semantically per-clip (tracker identity included) while riding the
        single-clip machinery.  Returns a list of per-clip dicts.

        ``_stream_in`` / ``_stream_out``: internal (used by
        :meth:`stream_coordinates`): continue a long clip across calls in
        bounded memory.  ``_stream_in`` carries {"carry", "prev_piece",
        "t"} from the previous block (the temporal-scan carry, the last
        uploaded device piece for cross-block optical flow, and the global
        frame index); ``_stream_out=True`` returns ``(res, state)``.  Keys
        and "Time" in ``res`` use GLOBAL frame indices."""
        from eagle_tpu.utils.logging import log_event
        from eagle_tpu.utils.profiling import StageTimer

        timer = profile if profile is not None else StageTimer()
        if _clip_lens is not None:
            assert not (self._custom_det or self._custom_kp), (
                "_clip_lens rides the built-in piece pipeline"
            )
            clip_list = [np.asarray(c) for c in frames]
            C, L = len(clip_list), len(clip_list[0])
            assert all(len(c) == L for c in clip_list)
            n = C * L
            tt_flat = np.tile(np.arange(L, dtype=np.int64), C)
            first_frames = clip_list[0]
        else:
            frames = np.asarray(frames)
            n = len(frames)
            tt_flat = np.arange(n, dtype=np.int64)
            first_frames = frames
        t0 = 0
        if _stream_in is not None or _stream_out:
            assert _clip_lens is None, "streaming is single-clip"
        if _stream_in is not None:
            t0 = int(_stream_in["t"])
            tt_flat = np.arange(t0, t0 + n, dtype=np.int64)
        if n == 0:
            empty = {} if _clip_lens is None else []
            return (empty, _stream_in) if _stream_out else empty
        cfg = self.config
        if calibration != cfg.calibration:
            cfg = cfg.replace(calibration=calibration)
        h_img, w_img = first_frames.shape[1:3]
        img_hw = (int(h_img), int(w_img))
        geom = self._geometry(img_hw)
        cfg = cfg.replace(work=geom)
        kp_interval = max(1, int(fps / max(1, num_keypoint_detection)))
        h_interval = max(1, int(fps / max(1, num_homography)))

        D = cfg.detector.max_detections
        embed_dim = cfg.tracker.embed_dim if cfg.tracker.use_appearance else 0
        det_pieces = []

        # the clip crosses host->device exactly once: prescaled on the
        # host to the working canvas, uploaded in detector-batch pieces.
        # Prescale, upload, and the detector program for each piece are
        # interleaved in dispatch order (cv2 resizes piece k+1 and the
        # link streams it while the device detects piece k)
        with timer("upload"):
            # 4:2:0 transport on the production working-resolution path
            # (the prescale already deviates from raw frames there;
            # raw-resolution runs stay bit-identical BGR)
            fmt = resolve_upload_format(cfg.upload_format, geom.enabled)
            sampled = np.flatnonzero(tt_flat % kp_interval == 0).tolist()
            if _clip_lens is not None:
                # pad frames (short clips repeated to L) are copies of the
                # last real frame: never sample them -- a per-clip run
                # wouldn't, and a pad detection must not back-seed frame 0
                sampled = [j for j in sampled if j % L < _clip_lens[j // L]]
            kp_pending = []
            kp_plan = []  # (idx, real, slots, pattern, last_piece) per batch
            if not self._custom_kp:
                for i in range(0, len(sampled), KP_BATCH):
                    idx, real = _pad_idx(sampled[i : i + KP_BATCH], KP_BATCH)
                    slots = sorted({k // PIECE for k in idx})
                    pattern = tuple(
                        (slots.index(k // PIECE), k % PIECE) for k in idx
                    )
                    kp_plan.append((idx, real, slots, pattern, max(slots)))

            on_piece = None
            uploaded: list = []
            if not self._custom_det or not self._custom_kp:
                det_runner = (
                    None if self._custom_det else self._det_runner(geom, img_hw)
                )

                def on_piece(j, arr):
                    # keep the in-order device queue busy: this piece's
                    # detector, then any keypoint batch whose last piece
                    # just arrived, all BEFORE the next piece's upload.
                    # (Inner timers attribute dispatch/compile to their
                    # stage; the enclosing "upload" total spans the whole
                    # interleaved window.)
                    uploaded.append(arr)
                    if det_runner is not None:
                        with timer("detector"):
                            det_pieces.append(det_runner(arr))
                    for idx, real, slots, pattern, last in kp_plan:
                        if last == j:
                            with timer("keypoints"):
                                run = self._kp_pieces_runner(geom, img_hw, pattern)
                                kp_pending.append(
                                    (idx, real, run(*[uploaded[s] for s in slots]))
                                )

            pieces = _DevicePieces(
                clip_list if _clip_lens is not None else frames,
                PIECE, geom if geom.enabled else None, fmt=fmt,
                on_piece=on_piece, prescale=cfg.prescale,
                precomputed=prescaled,
            )

        # ---------------- Phase A: detector over every piece (async;
        # the built-in detector was dispatched piece-interleaved above)
        with timer("detector"):
            if self._custom_det:
                it = range(len(pieces.pieces))
                if verbose:
                    from tqdm import tqdm

                    it = tqdm(it, desc="Detecting objects")
                for j in it:
                    idx, real = _pad_idx(list(range(j * PIECE, min((j + 1) * PIECE, n))), PIECE)
                    batch = frames[idx]
                    b, s, c, v = (np.asarray(a) for a in self._detector_fn(batch))
                    packed = np.concatenate(
                        [
                            b.astype(np.float32),
                            s.astype(np.float32)[..., None],
                            c.astype(np.float32)[..., None],
                            v.astype(np.float32)[..., None],
                        ],
                        axis=-1,
                    )
                    if embed_dim:
                        emb = self._embed_runner(img_hw)(
                            jnp.asarray(batch), jnp.asarray(b.astype(np.float32))
                        )
                        packed = np.concatenate([packed, np.asarray(emb)], axis=-1)
                    det_pieces.append(packed)
            else:
                # already dispatched piece-interleaved during upload
                assert len(det_pieces) == len(pieces.pieces)

        # ---------------- keypoint model at the sampling cadence (async;
        # the piece-fed batches were dispatched interleaved during upload)
        with timer("keypoints"):
            if self._custom_kp:
                for i in range(0, len(sampled), KP_BATCH):
                    idx, real = _pad_idx(sampled[i : i + KP_BATCH], KP_BATCH)
                    kp, valid = self._keypoint_fn(frames[idx])
                    packed = np.concatenate(
                        [np.asarray(kp), np.asarray(valid, np.float32)[..., None]],
                        axis=-1,
                    )
                    kp_pending.append((idx, real, packed))
            else:
                assert len(kp_pending) == len(kp_plan)

        # ---------------- drain the keypoint memos (the detector drains
        # LAST -- its host copy is only needed for Phase C assembly, so
        # its D2H overlaps the scan dispatch below)
        mem_kp = np.zeros((n, 57, 3), np.float32)
        mem_valid = np.zeros((n, 57), bool)
        # the reference memoizes every attempted frame, found or not
        # (mem[idx] is set even when empty, coordinate_model.py:263-276),
        # so a barren frame is never re-detected
        mem_attempted = np.zeros((n,), bool)
        if _clip_lens is not None:
            # pad frames (short clips repeated to L) never trigger
            # on-demand keypoint detection
            for ci, ln in enumerate(_clip_lens):
                mem_attempted[ci * L + ln : (ci + 1) * L] = True
        with timer("keypoints"):
            if len(kp_pending) > 1 and not isinstance(kp_pending[0][2], np.ndarray):
                # one device concat -> one D2H (each transfer pays the
                # link round trip)
                stacked = np.asarray(jnp.concatenate([p for _, _, p in kp_pending]))
                b = kp_pending[0][2].shape[0]
                kp_pending = [
                    (idx, real, stacked[i * b : (i + 1) * b])
                    for i, (idx, real, _) in enumerate(kp_pending)
                ]
            for idx, real, packed in kp_pending:
                packed = np.asarray(packed)
                mem_kp[idx[:real]] = packed[:real, :, :3]
                mem_valid[idx[:real]] = packed[:real, :, 3] > 0.5
                mem_attempted[idx[:real]] = True

        # ---------------- first-frame seeding (per clip: reference :288-307).
        # A streaming continuation arrives with a warm carry, so the
        # cold-start backward seed only ever runs on the first block.
        if _stream_in is not None:
            clip_spans = []
        elif _clip_lens is None:
            clip_spans = [(0, n)]
        else:
            # bound the seed search by the REAL clip length: a per-clip run
            # never sees the pad frames
            clip_spans = [(ci * L, ln) for ci, ln in enumerate(_clip_lens)]
        for base, clip_n in clip_spans:
            if mem_valid[base].sum() >= 4:
                continue
            found = next(
                (
                    j - base
                    for j in sampled
                    if base <= j < base + clip_n and mem_valid[j].sum() >= 4
                ),
                None,
            )
            if found is None or found == 0:
                continue
            seed_xy, seed_ok = temporal.backward_seed(
                jnp.asarray(pieces.host_range(found + 1, start=base)),
                jnp.asarray(mem_kp[base + found, :, :2]),
                jnp.asarray(mem_valid[base + found]),
                cfg,
            )
            seed_xy, seed_ok = np.asarray(seed_xy), np.asarray(seed_ok)
            for j in range(found):  # memoized entries win per-label
                take = seed_ok[j] & ~mem_valid[base + j]
                mem_kp[base + j, take, :2] = seed_xy[j, take]
                mem_valid[base + j] |= seed_ok[j]
        pieces.release_host()  # seeding was the only host consumer

        # ---------------- Phase B: chunked temporal scan with per-chunk
        # carry checkpoints.  When the reference's on-demand keypoint
        # detection would have fired (flow collapse on a non-cadence frame,
        # coordinate_model.py:316-319), flagged frames get model keypoints
        # memoized and the scan RESUMES from the first affected chunk.
        chunk = cfg.chunk_frames
        assert chunk % PIECE == 0, "chunk_frames must be a multiple of the piece size"
        ppc = chunk // PIECE
        num_chunks = max(1, -(-n // chunk))
        carry0 = (
            temporal.init_carry(cfg) if _stream_in is None else _stream_in["carry"]
        )
        carries = [carry0] + [None] * num_chunks
        packed_outs = [None] * num_chunks
        start = 0
        for _ondemand_round in range(3):
            it = range(start, num_chunks)
            if verbose:
                from tqdm import tqdm

                it = tqdm(it, desc="Processing Frames")
            # diagnostic attribution (bench --scan-split pass): separate
            # "waiting on uploads/upstream detector compute" from the scan
            # program itself.  Serializes the chunk pipeline, so it is
            # OFF on timed paths and used only for auditing the breakdown.
            split_scan = bool(getattr(timer, "split_scan", False))
            for k in it:
                s0 = k * chunk
                frame_pieces = tuple(pieces.at(k * ppc + j) for j in range(ppc))
                det_chunk = tuple(
                    det_pieces[min(k * ppc + j, len(det_pieces) - 1)]
                    for j in range(ppc)
                )
                if split_scan:
                    with timer("scan_wait_upstream"):
                        jax.block_until_ready(
                            [p for p in frame_pieces if not isinstance(p, np.ndarray)]
                            + [d for d in det_chunk if not isinstance(d, np.ndarray)]
                        )
                with timer("scan"):
                    idx, _ = _pad_idx(list(range(s0, min(s0 + chunk, n))), chunk)
                    tt = tt_flat[idx].astype(np.int32)
                    if k > 0:
                        prev_piece, first = pieces.at(k * ppc - 1), False
                    elif _stream_in is not None:
                        # cross-block flow: the previous block's final
                        # uploaded piece (its last row is the true
                        # previous frame); same piece shape, so the
                        # first=False chunk program is reused as-is
                        prev_piece, first = _stream_in["prev_piece"], False
                    else:
                        prev_piece, first = frame_pieces[0], True
                    carry, packed = _run_chunk(
                        carries[k],
                        frame_pieces,
                        prev_piece,
                        det_chunk,
                        jnp.asarray(mem_kp[idx]),
                        jnp.asarray(mem_valid[idx]),
                        jnp.asarray(tt % kp_interval == 0),
                        jnp.asarray(tt % h_interval == 0),
                        jnp.asarray(tt),
                        self._key,
                        cfg,
                        first,
                        embed_dim,
                        reset_on_t0=_clip_lens is not None,
                    )
                    carries[k + 1] = carry
                    packed_outs[k] = packed
                if split_scan:
                    with timer("scan_compute"):
                        jax.block_until_ready(packed)
                self.scan_chunks_run += 1
            with timer("scan"):
                out_full = np.concatenate([np.asarray(p) for p in packed_outs])[:n]
            F = temporal.packed_width(cfg.tracker.max_tracks)
            out = temporal.unpack_outputs(out_full[:, :F], cfg.tracker.max_tracks)
            flagged = np.flatnonzero(out.need_kp & ~mem_attempted)
            if len(flagged) == 0:
                break
            with timer("keypoints"):
                pending = []
                for i in range(0, len(flagged), KP_BATCH):
                    idx, real = _pad_idx(list(flagged[i : i + KP_BATCH]), KP_BATCH)
                    if self._custom_kp:
                        kp, valid = self._keypoint_fn(frames[idx])
                        packed = np.concatenate(
                            [np.asarray(kp), np.asarray(valid, np.float32)[..., None]],
                            axis=-1,
                        )
                    else:
                        packed = self._kp_on_demand_batch(pieces, idx, geom, img_hw)
                    pending.append((idx, real, packed))
                for idx, real, packed in pending:
                    packed = np.asarray(packed)
                    mem_kp[idx[:real]] = packed[:real, :, :3]
                    mem_valid[idx[:real]] = packed[:real, :, 3] > 0.5
                    mem_attempted[idx[:real]] = True
            start = int(flagged[0]) // chunk

        # ---------------- detector rows: already drained — they rode the
        # scan chunks' packed transfer (see _run_chunk), so no second
        # device->host round trip is paid here.  The scan's det_chunk
        # clamps piece indices when the detector produced fewer pieces
        # than the chunk needs (streaming tails); fall back to a direct
        # drain for exactly that mismatch.
        with timer("detector"):
            # .shape reads device-array metadata only — np.asarray here
            # would force the whole piece down and pay the very RTT this
            # combined drain exists to avoid
            det_cols = int(det_pieces[0].shape[-1])
            det_slots = int(det_pieces[0].shape[1])
            combined = out_full[:, F:]
            if combined.shape[1] == det_slots * det_cols and sum(
                int(p.shape[0]) for p in det_pieces
            ) >= n:
                det_packed = combined.reshape(n, det_slots, det_cols)
            elif len(det_pieces) == 1:
                det_packed = np.asarray(det_pieces[0])[:n]
            elif isinstance(det_pieces[0], np.ndarray):
                det_packed = np.concatenate(det_pieces)[:n]
            else:
                cat_key = ("detcat", len(det_pieces))
                if cat_key not in self._jit_cache:
                    self._jit_cache[cat_key] = jax.jit(
                        lambda *ps: jnp.concatenate(ps, axis=0)
                    )
                det_packed = np.asarray(self._jit_cache[cat_key](*det_pieces))[:n]
        det_boxes = det_packed[..., :4]
        det_conf = det_packed[..., 4]
        det_cls = det_packed[..., 5].astype(np.int32)
        det_valid = det_packed[..., 6] > 0.5

        # ---------------- Phase C: host assembly (float64 projection)
        with timer("assembly"):
            if _clip_lens is None:
                res = self._assemble(
                    out, det_boxes, det_conf, det_cls, det_valid, fps, img_hw,
                    t_offset=t0,
                )
            else:
                res = []
                for ci, ln in enumerate(_clip_lens):
                    sl = slice(ci * L, ci * L + ln)
                    clip_out = jax.tree.map(lambda a, sl=sl: a[sl], out)
                    res.append(
                        self._assemble(
                            clip_out,
                            det_boxes[sl],
                            det_conf[sl],
                            det_cls[sl],
                            det_valid[sl],
                            fps,
                            img_hw,
                        )
                    )
        log_event("get_coordinates", frames=n, **{k: v["total_s"] for k, v in timer.summary().items()})
        if _stream_out:
            # the final piece's last row is always the block's last real
            # frame (the host-pad tail repeats it), so the next block's
            # chunk 0 can consume it via the standard first=False path
            return res, {
                "carry": carries[num_chunks],
                "prev_piece": pieces.at(len(pieces.pieces) - 1),
                "t": t0 + n,
            }
        return res

    def stream_coordinates(
        self,
        segments,
        fps: int,
        num_homography: int = 1,
        num_keypoint_detection: int = 1,
        verbose: bool = False,
        calibration: bool = False,
        prefetch: bool | str = "auto",
        profile=None,
    ):
        """Bounded-memory streaming variant of :meth:`get_coordinates` for
        long videos (e.g. :func:`eagle_tpu.io.iter_video` on a full match):
        only one block of frames is ever resident.

        ``segments``: iterable of (N_i, H, W, 3) uint8 BGR arrays (any
        lengths, same resolution).  Yields ``{global_frame_idx: frame_dict}``
        blocks whose union equals ``get_coordinates`` on the concatenated
        stream: the temporal-scan carry (keypoints, homography, retry
        state, tracker identities) and the previous frame for optical flow
        hand off across blocks on device, and the keypoint/homography
        cadence runs on the global frame index.

        Two streaming horizons (both cold-start-only): first-frame backward
        seeding searches only the first block, and the on-demand keypoint
        fallback (reference coordinate_model.py:316-319) resolves within
        the block that flags it.  Non-final blocks are internally
        rebuffered to ``chunk_frames`` multiples so the hand-off carry
        never sees the padded tail of a short final chunk (the tracker
        would otherwise age through duplicate frames).

        ``prefetch="auto"``: when a spare CPU core exists, the NEXT
        block's decode (pulling ``segments``) and host prescale run on a
        worker thread while the current block's device phase is in flight
        (same machinery and caveat as ``serve_clips(overlap=...)``:
        bit-identical output, a measured loss on a single core)."""
        chunk = self.config.chunk_frames
        state: dict | None = None
        buf: np.ndarray | None = None

        def run(block, prescaled=None):
            nonlocal state
            res, state = self.get_coordinates(
                block,
                fps,
                num_homography=num_homography,
                num_keypoint_detection=num_keypoint_detection,
                verbose=verbose,
                calibration=calibration,
                prescaled=prescaled,
                profile=profile,
                _stream_in=state,
                _stream_out=True,
            )
            return res

        def blocks():
            nonlocal buf
            for seg in segments:
                seg = np.asarray(seg)
                if len(seg) == 0:
                    continue
                if buf is not None:
                    seg = np.concatenate([buf, seg])
                    buf = None
                keep = len(seg) % chunk
                if keep == len(seg):
                    buf = seg
                    continue
                if keep:
                    buf = seg[len(seg) - keep :].copy()  # detach from block
                    seg = seg[: len(seg) - keep]
                yield seg
            if buf is not None and len(buf):
                yield buf

        if prefetch == "auto":
            from eagle_tpu.utils import available_cpus

            prefetch = available_cpus() > 1
        if not prefetch:
            for seg in blocks():
                yield run(seg)
            return

        from concurrent.futures import ThreadPoolExecutor

        it = blocks()

        def pull_next():
            """Decode + prescale the next block off-thread (decode happens
            as the worker advances the ``segments`` iterator inside
            ``blocks()``)."""
            nxt = next(it, None)
            return None if nxt is None else (nxt, self.prescale_clip(nxt))

        with ThreadPoolExecutor(max_workers=1) as ex:
            cur = pull_next()
            while cur is not None:
                fut = ex.submit(pull_next)
                seg, pre = cur
                yield run(seg, prescaled=pre)
                cur = fut.result()

    # ------------------------------------------------------------------

    def _assemble(
        self, out, det_boxes, det_conf, det_cls, det_valid, fps, img_hw, t_offset=0
    ):
        """Per-frame dict assembly matching the reference's output schema
        bit-for-bit in structure (coordinate_model.py:369-415 +
        detect_objects :557-628).  ``t_offset`` shifts the dict keys and
        "Time" stamps to global frame indices for streamed blocks."""
        h_img, w_img = img_hw
        n = len(out.kp_xy)
        class_names = dict(enumerate(self.config.detector.class_names))
        res = {}

        # whole-clip hoists: the per-scalar np.clip / np.array calls of a
        # straight per-frame transcription dominate this stage (~70% of
        # 354 us/frame measured); batch them once and hand the loop plain
        # python ints via tolist().  Semantics are element-for-element
        # identical: float clip then int() truncation == the batched
        # clip().astype(int), and the uint16 BBox cast == `& 0xFFFF` for
        # any int (two's complement).
        clip_hi = np.array([w_img - 1, h_img - 1, w_img - 1, h_img - 1], np.float32)
        tb_list = (
            np.clip(np.asarray(out.track_boxes), 0.0, clip_hi).astype(int).tolist()
        )
        tid_list = np.asarray(out.track_id).astype(int).tolist()
        tcls_list = np.asarray(out.track_cls).astype(int).tolist()
        tconf_list = np.asarray(out.track_conf).tolist()
        tvalid = np.asarray(out.track_valid, bool)
        db_int = np.asarray(det_boxes).astype(int)  # reference casts pre-clip
        db_list = db_int.tolist()
        db_clipped_list = np.clip(db_int, 0, clip_hi.astype(int)).tolist()
        dconf_list = np.asarray(det_conf).tolist()
        dcls_list = np.asarray(det_cls).tolist()
        det_valid = np.asarray(det_valid, bool)
        ball_mask = det_valid & (np.asarray(det_cls) == 2)
        det_any = det_valid.any(axis=1)
        kp_list = np.asarray(out.kp_xy).astype(int).tolist()
        kp_valid = np.asarray(out.kp_valid, bool)
        H_rows = np.asarray(out.H, np.float64).reshape(n, 9).tolist()
        H_ok_list = np.asarray(out.H_ok, bool).tolist()
        conf_floor = self.detector_conf

        for i in range(n):
            H_ok = H_ok_list[i]
            h00, h01, h02, h10, h11, h12, h20, h21, h22 = H_rows[i]

            def project(x, y):
                """cv2.perspectiveTransform of one point + int truncation
                (scalar twin of :func:`_project_int`, same f64 math)."""
                d = h20 * x + h21 * y + h22
                return int((h00 * x + h01 * y + h02) / d), int(
                    (h10 * x + h11 * y + h12) / d
                )

            # ---- objects dict (tracker output, then fallbacks)
            objects = {"Player": {}, "Goalkeeper": {}}
            for k in np.flatnonzero(tvalid[i]):
                cls_name = class_names.get(tcls_list[i][k])
                if cls_name not in objects:
                    continue
                conf = tconf_list[i][k]
                if conf < conf_floor:
                    continue
                x1, y1, x2, y2 = tb_list[i][k]
                objects[cls_name][tid_list[i][k]] = {
                    "BBox": [x1, y1, x2, y2],
                    "Confidence": conf,
                    "Bottom_center": [int((x1 + x2) / 2), y2],
                }

            # fallback to raw detections when tracking yields nothing
            if not objects["Player"] and not objects["Goalkeeper"] and det_any[i]:
                for d in np.flatnonzero(det_valid[i]):
                    cls_name = class_names.get(dcls_list[i][d])
                    if cls_name not in objects:
                        continue
                    if dconf_list[i][d] < conf_floor:
                        continue
                    x1, y1, x2, y2 = db_clipped_list[i][d]
                    objects[cls_name][int(d)] = {
                        "BBox": [x1, y1, x2, y2],
                        "Confidence": dconf_list[i][d],
                        "Bottom_center": [int((x1 + x2) / 2), y2],
                    }

            # the ball comes from raw detections, never tracked (:618-627)
            ball_idx = np.flatnonzero(ball_mask[i])
            if len(ball_idx) > 0:
                objects["Ball"] = {}
                for bi, d in enumerate(ball_idx):
                    if dconf_list[i][d] < conf_floor:
                        continue
                    box = db_list[i][d]
                    objects["Ball"][bi] = {
                        "BBox": box,
                        "Confidence": dconf_list[i][d],
                        "Bottom_center": [int((box[0] + box[2]) / 2), box[3]],
                    }

            # ---- projection to pitch coordinates (:369-392)
            indiv = {}
            for class_name, class_dict in objects.items():
                for obj_id, obj in class_dict.items():
                    bottom_center = obj["Bottom_center"]
                    bbox_coords = [v & 0xFFFF for v in obj["BBox"]]  # uint16 cast
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
                        tx, ty = project(bottom_center[0], bottom_center[1])
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
                tl = list(project(0, 0))
                tr = list(project(w_img, 0))
                bl = list(project(0, h_img))
                br = list(project(w_img, h_img))
                try:
                    tl2 = (find_x_at_y(tl, bl, PITCH_HEIGHT), PITCH_HEIGHT)
                    tr2 = (find_x_at_y(tr, br, PITCH_HEIGHT), PITCH_HEIGHT)
                    bl2 = (find_x_at_y(bl, tl2, 0), 0)
                    br2 = (find_x_at_y(br, tr2, 0), 0)
                    boundaries = [bl2, tl2, tr2, br2]
                except ZeroDivisionError:
                    pass

            # ---- keypoints dict
            kp_row = kp_list[i]
            kps = {
                pitch.KEYPOINT_NAMES[k]: (kp_row[k][0], kp_row[k][1])
                for k in np.flatnonzero(kp_valid[i])
            }

            gi = t_offset + i
            res[gi] = {
                "Coordinates": indiv,
                "Time": f"{gi // fps // 60:02d}:{gi // fps % 60:02d}",
                "Keypoints": kps,
                "Boundaries": boundaries,
            }
        return res


@functools.partial(jax.jit, static_argnames=("cfg", "first", "embed_dim", "reset_on_t0"))
def _run_chunk(
    carry,
    frame_pieces,
    prev_piece,
    det_pieces,
    model_kp,
    model_kp_valid,
    is_kp_frame,
    is_h_frame,
    t,
    base_key,
    cfg: PipelineConfig,
    first: bool,
    embed_dim: int,
    reset_on_t0: bool = False,
):
    """One fixed-size scan chunk.  Frames and detections arrive as the
    uploaded pieces and are re-assembled here, inside the program -- no
    eager device ops, no host round-trips.  Returns (carry, packed outputs)
    with the whole chunk's outputs flattened into one array.

    ``reset_on_t0``: multiple clips flattened into one stream with
    WITHIN-CLIP ``t`` -- the carry (keypoints, homography, retry flag,
    tracker state) resets to ``init_carry`` wherever ``t == 0``, which
    makes the flattened scan semantically identical to running each clip
    separately (tracker identity stays per-clip) while keeping the
    single-clip step (no vmap tax on the inner lax.conds)."""
    frames = jnp.concatenate(frame_pieces, axis=0)
    tail = prev_piece[0:1] if first else prev_piece[-1:]
    prev = jnp.concatenate([tail, frames[:-1]], axis=0)
    det = jnp.concatenate([jnp.asarray(p) for p in det_pieces], axis=0)
    det = det[: frames.shape[0]]
    n, d = det.shape[:2]
    xs = temporal.FrameInputs(
        frame_bgr=frames,
        prev_frame_bgr=prev,
        model_kp=model_kp,
        model_kp_valid=model_kp_valid,
        is_kp_frame=is_kp_frame,
        is_h_frame=is_h_frame,
        det_boxes=det[..., :4],
        det_conf=det[..., 4],
        det_cls=det[..., 5].astype(jnp.int32),
        det_valid=det[..., 6] > 0.5,
        det_embed=det[..., 7:] if embed_dim else jnp.zeros((n, d, 1), jnp.float32),
        t=t,
    )

    def step(c, x):
        if reset_on_t0:
            fresh = temporal.init_carry(cfg)
            c = jax.tree.map(lambda a, b: jnp.where(x.t == 0, b, a), c, fresh)
        return temporal.temporal_step(c, x, cfg, base_key)

    carry, out = jax.lax.scan(step, carry, xs)
    # the detector rows ride the SAME packed array: one device->host
    # transfer serves both the scan outputs and Phase C's detections —
    # every separate drain pays a full tunnel round trip (~25-90 ms
    # measured, docs/architecture.md "link-state variance") while the
    # extra ~3.6 KB/frame of payload costs ~no wall time
    return carry, jnp.concatenate(
        [temporal.pack_outputs(out), det.reshape(n, -1)], axis=-1
    )
