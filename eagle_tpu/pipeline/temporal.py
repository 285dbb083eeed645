"""The temporal (sequential) stage of the pipeline as a ``lax.scan``.

This is the TPU re-architecture of the reference's per-frame hot loop
(coordinate_model.py:277-415).  The stateless heavy stages (HRNet, YOLO,
NMS, preprocessing, pyramids) run *batched* over the frame axis before the
scan; this module consumes their fixed-shape outputs and carries only the
genuinely sequential state across frames:

  carry = (keypoints, homography, retry flag, tracker state)

Per frame the scan performs, matching the reference's semantics:
  1. LK optical-flow propagation of the previous keypoints with the
     movement-z-score and hue-change filters (:419-478)
  2. the keypoint cadence/merge rules (:283-324) on fixed 57-slot arrays
  3. geometric keypoint synthesis when >= 2 points (:326-327)
  4. optional brightness-snap calibration (:520-555)
  5. RANSAC homography at the configured cadence with retry-on-failure and
     inlier filtering (:333-367)
  6. a BoT-SORT tracker step on the frame's detections (:557-628)

Projection to pitch coordinates and dict/JSON assembly are cheap and
happen on the host (float64, matching cv2's internal precision).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from eagle_tpu import pitch
from eagle_tpu.config import PipelineConfig
from eagle_tpu.ops import color
from eagle_tpu.ops.geometry import masked_median as geometry_masked_median
from eagle_tpu.ops.geometry import synthesize_keypoints
from eagle_tpu.ops.homography import ransac_homography
from eagle_tpu.ops.optical_flow import lk_flow
from eagle_tpu.track import botsort

# host numpy constants: baked into jitted programs at trace time (a
# module-level jnp.asarray would device_put at import and hang `import
# eagle_tpu` when the TPU is unreachable)
_ON_PLANE = np.asarray(pitch.ON_PLANE_MASK)
_WORLD_XY = pitch.WORLD_XY.astype(np.float32)


class TemporalCarry(NamedTuple):
    kp_xy: jax.Array  # (57, 2) previous keypoints (integer-valued floats)
    kp_valid: jax.Array  # (57,)
    H: jax.Array  # (3, 3) image -> pitch homography
    H_ok: jax.Array  # () bool: any homography ever computed
    retry_h: jax.Array  # () bool: recompute at the next frame
    tracker: botsort.TrackerState


class FrameInputs(NamedTuple):
    """Per-frame scan inputs (leading time axis added by the caller)."""

    frame_bgr: jax.Array  # (H, W, 3) uint8
    prev_frame_bgr: jax.Array  # (H, W, 3) uint8 previous frame
    model_kp: jax.Array  # (57, 3) memoized keypoint-model output
    model_kp_valid: jax.Array  # (57,)
    is_kp_frame: jax.Array  # () bool: t % keypoint_interval == 0
    is_h_frame: jax.Array  # () bool: t % homography_interval == 0
    det_boxes: jax.Array  # (D, 4) xyxy
    det_conf: jax.Array  # (D,)
    det_cls: jax.Array  # (D,) int32
    det_valid: jax.Array  # (D,)
    #: (D, E) appearance embeddings, or a (D, 1) zero placeholder when
    #: appearance association is off
    det_embed: jax.Array
    t: jax.Array  # () int32 global frame index


class FrameOutputs(NamedTuple):
    kp_xy: jax.Array  # (57, 2)
    kp_valid: jax.Array  # (57,)
    #: () bool -- non-cadence frame whose flow collapsed below 4 points
    #: with no memoized model output: the reference would run the keypoint
    #: model on demand here (coordinate_model.py:316-319); the caller
    #: fills the memo and re-runs the scan
    need_kp: jax.Array
    H: jax.Array  # (3, 3)
    H_ok: jax.Array  # ()
    track_boxes: jax.Array  # (T, 4)
    track_id: jax.Array  # (T,)
    track_conf: jax.Array  # (T,)
    track_cls: jax.Array  # (T,)
    track_valid: jax.Array  # (T,)


def pack_outputs(out: FrameOutputs) -> jax.Array:
    """Flatten a time-stacked :class:`FrameOutputs` into one (N, F) float32
    array so a whole chunk crosses device->host in a single transfer (the
    host link charges ~constant latency per array)."""
    n = out.kp_xy.shape[0]

    def flat(a):
        return a.astype(jnp.float32).reshape(n, -1)

    return jnp.concatenate([flat(a) for a in out], axis=-1)


def packed_width(max_tracks: int) -> int:
    """Column count of :func:`pack_outputs`'s flattened rows (the scan
    chunk's packed output may carry extra columns appended after this
    width — e.g. the detector rows riding the same device->host
    transfer; callers slice with this)."""
    return 57 * 2 + 57 + 1 + 9 + 1 + 8 * max_tracks


def unpack_outputs(arr: np.ndarray, max_tracks: int) -> FrameOutputs:
    """Host-side inverse of :func:`pack_outputs` (numpy arrays)."""
    n = arr.shape[0]
    t = max_tracks
    specs = [
        ((57, 2), np.float32),  # kp_xy
        ((57,), bool),  # kp_valid
        ((), bool),  # need_kp
        ((3, 3), np.float32),  # H
        ((), bool),  # H_ok
        ((t, 4), np.float32),  # track_boxes
        ((t,), np.int32),  # track_id
        ((t,), np.float32),  # track_conf
        ((t,), np.int32),  # track_cls
        ((t,), bool),  # track_valid
    ]
    fields = []
    off = 0
    for shape, dtype in specs:
        size = int(np.prod(shape, dtype=int)) if shape else 1
        chunk = arr[:, off : off + size].reshape((n, *shape))
        if dtype is bool:
            fields.append(chunk > 0.5)
        else:
            fields.append(chunk.astype(dtype))
        off += size
    assert off == arr.shape[1], (off, arr.shape)
    return FrameOutputs(*fields)


def init_carry(cfg: PipelineConfig) -> TemporalCarry:
    return TemporalCarry(
        kp_xy=jnp.zeros((57, 2)),
        kp_valid=jnp.zeros((57,), bool),
        H=jnp.eye(3),
        H_ok=jnp.bool_(False),
        retry_h=jnp.bool_(False),
        tracker=botsort.init_state(
            cfg.tracker.max_tracks,
            cfg.tracker.embed_dim if cfg.tracker.use_appearance else 1,
        ),
    )


# canonical implementation lives in ops.geometry (shared with the
# feature-GMC robust fit); re-exported here because the lower-middle
# even-count convention is part of this module's pinned GMC behavior
masked_median = geometry_masked_median


def estimate_gmc_warp(
    prev_xy: jax.Array, new_xy: jax.Array, valid: jax.Array, affine: bool = True
) -> jax.Array:
    """Camera-motion warp (2, 3) mapping previous-frame pixels to the
    current frame, from tracked keypoint correspondences.

    ``affine=True`` fits a least-squares affine on the valid pairs
    (centered normal equations; the role of boxmot's ECC/sparse-flow GMC),
    falling back to the median translation below 3 correspondences.
    ``affine=False`` always uses the median translation."""
    tx = masked_median(new_xy[:, 0] - prev_xy[:, 0], valid)
    ty = masked_median(new_xy[:, 1] - prev_xy[:, 1], valid)
    trans = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]) + jnp.zeros((2, 3)).at[
        :, 2
    ].set(jnp.stack([tx, ty]))
    if not affine:
        return trans

    m = valid.astype(jnp.float32)
    cnt = m.sum()
    mu = (prev_xy * m[:, None]).sum(0) / jnp.maximum(cnt, 1.0)
    a = (prev_xy - mu) * m[:, None]
    b = (new_xy - mu) * m[:, None]
    A = jnp.concatenate([a, m[:, None]], axis=-1)  # (K, 3), masked rows = 0
    M = A.T @ A + 1e-4 * jnp.eye(3)
    sol = jnp.linalg.solve(M, A.T @ b)  # (3, 2): [R^T; t'^T]
    R = sol[:2].T
    t = sol[2] + mu - R @ mu
    aff = jnp.concatenate([R, t[:, None]], axis=1)
    return jnp.where(cnt >= 3, aff, trans)


def flow_with_filters(
    frame_bgr: jax.Array,
    prev_frame_bgr: jax.Array,
    kp_xy: jax.Array,
    kp_valid: jax.Array,
    cfg: PipelineConfig,
) -> tuple[jax.Array, jax.Array]:
    """Optical-flow keypoint propagation with the reference's two filters
    (coordinate_model.py:419-478): movement z-score > 2 rejected, 3x3 mean
    hue change > 25 rejected.  Returns integer-truncated points + mask.

    Keypoint coordinates are in ORIGINAL image space; when the pipeline
    runs at a working resolution (``cfg.work.enabled``) the frames passed
    here are the prescaled canvases and coordinates are mapped through the
    letterbox geometry for pixel sampling only."""
    if cfg.flow.backend == "pallas2":
        from eagle_tpu.ops.pallas_flow2 import lk_flow_pallas2

        flow_fn = lk_flow_pallas2
    elif cfg.flow.backend == "xla":
        flow_fn = lk_flow
    else:
        raise ValueError(
            f"unknown flow backend {cfg.flow.backend!r}; valid: 'xla', 'pallas2' "
            "(the per-point 'pallas' v1 kernel was measured slower than both and "
            "removed -- see docs/architecture.md, Pallas flow backends)"
        )
    g = cfg.work
    scale = jnp.float32(g.gain) if g.enabled else jnp.float32(1.0)
    pad = (
        jnp.asarray([g.pad_x, g.pad_y], jnp.float32)
        if g.enabled
        else jnp.zeros((2,), jnp.float32)
    )
    new_w, status = flow_fn(
        prev_frame_bgr,
        frame_bgr,
        kp_xy * scale + pad,
        kp_valid,
        window=cfg.flow.window,
        levels=cfg.flow.pyramid_levels,
        iterations=cfg.flow.iterations,
        epsilon=cfg.flow.epsilon,
    )
    new_pts = (new_w - pad) / scale
    if g.enabled:
        # the canvas extends past the image by the letterbox padding; keep
        # the reference's original-frame bounds check
        status = (
            status
            & (new_pts[:, 0] >= 0)
            & (new_pts[:, 0] <= g.orig_w - 1)
            & (new_pts[:, 1] >= 0)
            & (new_pts[:, 1] <= g.orig_h - 1)
        )
    moves = jnp.linalg.norm(new_pts - kp_xy, axis=-1)
    n = jnp.maximum(status.sum(), 1)
    mean = jnp.where(status, moves, 0.0).sum() / n
    var = jnp.where(status, (moves - mean) ** 2, 0.0).sum() / n
    std = jnp.sqrt(var) + 1e-6
    z_ok = (moves - mean) / std <= cfg.flow.zscore_max

    new_int = jnp.trunc(new_pts)
    # both windows sampled from the *current* frame, as the reference
    # does; one batched call -> one window gather instead of two
    k = kp_xy.shape[0]
    hue_both = color.window_mean_hue(
        frame_bgr,
        jnp.concatenate([kp_xy * scale + pad, new_int * scale + pad], axis=0),
    )
    hue_ok = jnp.abs(hue_both[k:] - hue_both[:k]) <= cfg.flow.hue_delta_max

    return new_int, status & z_ok & hue_ok


def calibrate_keypoints(
    frame_bgr: jax.Array, kp_xy: jax.Array, kp_valid: jax.Array, offset: int = 3,
    threshold: float = 150.0,
) -> jax.Array:
    """Brightness-snap calibration (coordinate_model.py:520-555): dim
    keypoints move to the brightest pixel of the [x-3, x+3) x [y-3, y+3)
    window (the reference's asymmetric window, quirks preserved).  The
    brightness map is computed full-frame first and windows slice the
    float32 2-D map: the uint8 3-channel window gather costs ~0.25 ms
    fixed on v5e vs ~0.03 for the f32 map (measured, round 5; see
    ops.color.extract_windows), and per-pixel values are identical."""
    h, w, _ = frame_bgr.shape
    d = 2 * offset
    x = kp_xy[:, 0].astype(jnp.int32)
    y = kp_xy[:, 1].astype(jnp.int32)
    in_bounds = (x >= 0) & (x < w) & (y >= 0) & (y < h)
    xs = jnp.clip(x, 0, w - 1)
    ys = jnp.clip(y, 0, h - 1)

    vmap_full = color.value(frame_bgr)  # (H, W) float32 brightness
    v, org = color.extract_windows(vmap_full, jnp.stack([xs, ys], -1), d)
    rows = org[:, 1][:, None] + jnp.arange(d)[None, :]  # absolute ys
    cols = org[:, 0][:, None] + jnp.arange(d)[None, :]
    x_min = jnp.maximum(0, xs - offset)
    y_min = jnp.maximum(0, ys - offset)
    row_ok = (rows >= y_min[:, None]) & (rows < jnp.minimum(h, ys + offset)[:, None])
    col_ok = (cols >= x_min[:, None]) & (cols < jnp.minimum(w, xs + offset)[:, None])
    cell_ok = row_ok[:, :, None] & col_ok[:, None, :]
    # the point's own brightness, read out of the same window
    at_pt = (rows == ys[:, None])[:, :, None] & (cols == xs[:, None])[:, None, :]
    base_v = jnp.where(at_pt, v, 0.0).sum(axis=(1, 2))

    masked = jnp.where(cell_ok, v, -1.0).reshape(v.shape[0], -1)
    best = jnp.argmax(masked, axis=-1)
    by_abs = jnp.take_along_axis(rows, (best // d)[:, None], 1)[:, 0]
    bx_abs = jnp.take_along_axis(cols, (best % d)[:, None], 1)[:, 0]
    # reference index math: adjusted = clip(x + idx_in_clipped_grid - 3)
    adj_x = jnp.clip(xs + (bx_abs - x_min) - offset, 0, w - 1)
    adj_y = jnp.clip(ys + (by_abs - y_min) - offset, 0, h - 1)

    snap = kp_valid & in_bounds & (base_v < threshold)
    out_x = jnp.where(snap, adj_x, x)
    out_y = jnp.where(snap, adj_y, y)
    return jnp.stack([out_x, out_y], axis=-1).astype(kp_xy.dtype)


def _pre_homography(carry: TemporalCarry, xs: FrameInputs, cfg: PipelineConfig):
    """Flow + cadence merge + synthesis + calibration: everything up to
    (but excluding) the homography decision.  Returns
    (flow_xy, flow_valid, kp_xy, kp_valid, need_kp, corr_valid, do_h)."""
    # ------------------------------------------------------------- flow
    flow_xy, flow_valid = flow_with_filters(
        xs.frame_bgr,
        xs.prev_frame_bgr,
        carry.kp_xy,
        carry.kp_valid & (xs.t > 0),
        cfg,
    )

    # ----------------------------------------------- cadence merge rules
    model_valid = xs.model_kp_valid
    model_xy = xs.model_kp[:, :2]
    model_count = model_valid.sum()
    # flow participates on non-model frames, or when the model found < 4
    use_flow = (xs.t > 0) & (~xs.is_kp_frame | (model_count < 4))
    kp_valid = (flow_valid & use_flow) | model_valid
    kp_xy = jnp.where(model_valid[:, None], model_xy, flow_xy)
    # reference on-demand detection trigger (:316-319)
    need_kp = (
        (xs.t > 0) & ~xs.is_kp_frame & (model_count == 0) & (flow_valid.sum() < 4)
    )

    # ------------------------------------------------------- synthesis
    if cfg.synthesis.enabled:
        syn_xy, syn_valid = synthesize_keypoints(
            kp_xy,
            kp_valid,
            min_points_per_line=cfg.synthesis.min_points_per_line,
            max_new_points=cfg.synthesis.max_new_points,
        )
        do_syn = kp_valid.sum() >= cfg.synthesis.min_keypoints
        kp_xy = jnp.where(do_syn, syn_xy, kp_xy)
        kp_valid = jnp.where(do_syn, syn_valid, kp_valid)

    if cfg.calibration:
        if cfg.work.enabled:
            # brightness-snap at working resolution (+-3 work px ~= +-4
            # original px); untouched points keep their exact coordinates
            g = cfg.work
            pad = jnp.asarray([g.pad_x, g.pad_y], jnp.float32)
            kpw = jnp.trunc(kp_xy * g.gain + pad)
            snapped = calibrate_keypoints(xs.frame_bgr, kpw, kp_valid)
            moved = jnp.any(snapped != kpw, axis=-1, keepdims=True)
            kp_xy = jnp.where(moved, jnp.trunc((snapped - pad) / g.gain), kp_xy)
        else:
            kp_xy = calibrate_keypoints(xs.frame_bgr, kp_xy, kp_valid)

    # ------------------------------------------------------- homography
    corr_valid = kp_valid & _ON_PLANE
    n_corr = corr_valid.sum()
    do_h = (xs.is_h_frame | carry.retry_h) & (n_corr >= cfg.homography.min_points)
    return flow_xy, flow_valid, kp_xy, kp_valid, need_kp, corr_valid, do_h


def _run_ransac(kp_xy, corr_valid, t, cfg: PipelineConfig, base_key: jax.Array):
    key = jax.random.fold_in(base_key, t)
    return ransac_homography(
        kp_xy.astype(jnp.float32),
        _WORLD_XY,
        corr_valid,
        key,
        iters=cfg.homography.ransac_iters,
        threshold=cfg.homography.reproj_threshold,
        refine_steps=cfg.homography.refine_steps,
        lmeds_fallback=cfg.homography.lmeds_fallback,
    )


def _features_gmc_warp(carry, xs, cfg: PipelineConfig, flow_xy, flow_valid):
    """Full-frame sparse-feature GMC (``TrackerConfig.gmc="features"``):
    grid corners on the previous frame, LK-tracked to the current frame,
    robust 4-DOF partial-affine fit — the boxmot sparse-optical-flow GMC
    the reference's tracker runs per update (reference
    coordinate_model.py:66-72,577).  Falls back to the keypoint-flow
    affine when fewer than ``gmc_min_features`` feature tracks survive
    (exactly the frames where the two estimates would otherwise diverge
    most — but with no features there is nothing better to fit).

    Frames in ``xs`` are working-canvas pixels when ``cfg.work.enabled``;
    the fit runs in canvas space and the warp is mapped back to original
    pixels (tracker state lives there): with ``x_c = g x_o + p``,
    ``R_o = R_c`` and ``t_o = (R_c p + t_c - p) / g``."""
    from eagle_tpu.ops.corners import fit_similarity_robust, grid_corners

    pts, pvalid = grid_corners(xs.prev_frame_bgr)
    new_pts, status = lk_flow(
        xs.prev_frame_bgr,
        xs.frame_bgr,
        pts,
        pvalid,
        window=cfg.flow.window,
        levels=cfg.flow.pyramid_levels,
        iterations=cfg.flow.iterations,
        epsilon=cfg.flow.epsilon,
    )
    warp_c, n_inl = fit_similarity_robust(pts, new_pts, pvalid & status)
    g = cfg.work
    if g.enabled:
        pad = jnp.asarray([g.pad_x, g.pad_y], jnp.float32)
        R = warp_c[:, :2]
        t = (R @ pad + warp_c[:, 2] - pad) / jnp.float32(g.gain)
        warp = jnp.concatenate([R, t[:, None]], 1)
    else:
        warp = warp_c
    fallback = estimate_gmc_warp(carry.kp_xy, flow_xy, flow_valid, affine=True)
    return jnp.where(n_inl >= cfg.tracker.gmc_min_features, warp, fallback)


def temporal_step(
    carry: TemporalCarry,
    xs: FrameInputs,
    cfg: PipelineConfig,
    base_key: jax.Array,
) -> tuple[TemporalCarry, FrameOutputs]:
    flow_xy, flow_valid, kp_xy, kp_valid, need_kp, corr_valid, do_h = _pre_homography(
        carry, xs, cfg
    )

    def compute_h(_):
        return _run_ransac(kp_xy, corr_valid, xs.t, cfg, base_key)

    def skip_h(_):
        return carry.H, kp_valid, jnp.bool_(False)

    H_new, inliers, h_success = jax.lax.cond(do_h, compute_h, skip_h, None)

    return _post_homography(
        carry, xs, cfg, flow_xy, flow_valid, kp_xy, kp_valid, need_kp,
        H_new, inliers, h_success,
    )


def _post_homography(
    carry, xs, cfg, flow_xy, flow_valid, kp_xy, kp_valid, need_kp,
    H_new, inliers, h_success,
):
    """Homography result application + tracker + output assembly (shared
    by the sequential and clip-batched steps)."""
    H = jnp.where(h_success, H_new, carry.H)
    H_ok = carry.H_ok | h_success
    # on success the keypoint set collapses to the homography inliers
    # (reference :358-362 replaces keypoints/prev_keypoints)
    kp_valid = jnp.where(h_success, inliers, kp_valid)
    # retry semantics (:350-352, :366-367): a failed or starved attempt at
    # an interval frame sets the retry flag until a success
    attempted = xs.is_h_frame | carry.retry_h
    retry_h = attempted & ~h_success

    # ---------------------------------------------------------- tracker
    # camera motion for GMC: by default estimated from the pitch-keypoint
    # flow (deviation #5); gmc="features" runs the boxmot-style full-frame
    # sparse-feature estimate (grid corners + LK + robust partial affine,
    # boxmot sof.py semantics) with the keypoint-flow warp as fallback
    # when too few feature tracks survive
    gmc = None
    if cfg.tracker.gmc == "features":
        gmc = _features_gmc_warp(carry, xs, cfg, flow_xy, flow_valid)
    elif cfg.tracker.gmc != "off":
        gmc = estimate_gmc_warp(
            carry.kp_xy, flow_xy, flow_valid, affine=cfg.tracker.gmc == "affine"
        )
    tracker, tout = botsort.step(
        carry.tracker,
        xs.det_boxes,
        xs.det_conf,
        xs.det_cls,
        xs.det_valid,
        cfg.tracker,
        gmc_warp=gmc,
        det_embed=xs.det_embed if cfg.tracker.use_appearance else None,
    )

    new_carry = TemporalCarry(
        kp_xy=kp_xy, kp_valid=kp_valid, H=H, H_ok=H_ok, retry_h=retry_h, tracker=tracker
    )
    out = FrameOutputs(
        kp_xy=kp_xy,
        kp_valid=kp_valid,
        need_kp=need_kp,
        H=H,
        H_ok=H_ok,
        track_boxes=tout.boxes,
        track_id=tout.track_id,
        track_conf=tout.conf,
        track_cls=tout.cls,
        track_valid=tout.valid,
    )
    return new_carry, out


def temporal_step_clips(
    carries: TemporalCarry,
    xs: FrameInputs,
    cfg: PipelineConfig,
    base_key: jax.Array,
) -> tuple[TemporalCarry, FrameOutputs]:
    """One time step for a BATCH of clips (leading clip axis on every
    carry/input leaf).

    Semantically identical to ``vmap(temporal_step)`` with one crucial
    difference: under plain vmap the per-frame homography gate
    (``lax.cond``) lowers to a select, so the 512-hypothesis RANSAC
    executes on EVERY frame for EVERY clip (measured 9.5 vs 1.8 ms/frame
    at load).  Here the cond is hoisted to ``any(do_h)`` across the clip
    batch -- with aligned cadences (``t`` identical across clips) that is
    exactly the per-clip gate, and RANSAC runs vmapped only on the steps
    where at least one clip needs it."""
    pre = jax.vmap(lambda c, x: _pre_homography(c, x, cfg))(carries, xs)
    flow_xy, flow_valid, kp_xy, kp_valid, need_kp, corr_valid, do_h = pre
    n_clips = do_h.shape[0]

    def compute_all(_):
        return jax.vmap(
            lambda k, cv, t: _run_ransac(k, cv, t, cfg, base_key)
        )(kp_xy, corr_valid, xs.t)

    def skip_all(_):
        return (
            jnp.broadcast_to(jnp.eye(3, dtype=carries.H.dtype), carries.H.shape),
            kp_valid,
            jnp.zeros((n_clips,), bool),
        )

    H_new, inliers, ok = jax.lax.cond(jnp.any(do_h), compute_all, skip_all, None)
    # a clip whose own gate is off ignores the (wasted) solve entirely
    h_success = ok & do_h

    return jax.vmap(
        lambda c, x, a, b, k1, k2, nk, hn, il, hs: _post_homography(
            c, x, cfg, a, b, k1, k2, nk, hn, il, hs
        )
    )(carries, xs, flow_xy, flow_valid, kp_xy, kp_valid, need_kp, H_new, inliers, h_success)


@functools.partial(jax.jit, static_argnames=("cfg",))
def scan_chunk(
    carry: TemporalCarry, xs: FrameInputs, cfg: PipelineConfig, base_key: jax.Array
) -> tuple[TemporalCarry, FrameOutputs]:
    """Plain ``lax.scan`` of :func:`temporal_step` over time-stacked
    inputs (the sequential reference for the parallel/timeshard paths;
    the production pipeline uses the piece-fed chunk runner in
    :mod:`eagle_tpu.pipeline.coordinate_model`)."""

    def step(c, x):
        return temporal_step(c, x, cfg, base_key)

    return jax.lax.scan(step, carry, xs)


def backward_seed(
    frames_bgr: jax.Array,
    seed_xy: jax.Array,
    seed_valid: jax.Array,
    cfg: PipelineConfig,
) -> tuple[jax.Array, jax.Array]:
    """First-frame seeding (reference :288-307): starting from keypoints at
    frame j (the last index of the arrays), flow *backward* to frame 0,
    producing keypoints for every earlier frame.

    frames_bgr : (J, H, W, 3) frames 0..j (ascending)

    Returns (kp_xy (J, 57, 2), kp_valid (J, 57)) for frames 0..j-1 at
    [:-1]; the last row repeats the seed.
    """
    j = frames_bgr.shape[0] - 1

    def step(carry, idx):
        kp_xy, kp_valid = carry
        # track from frame idx to frame idx+1 starting at kp_{idx+1}
        # (the reference's inverted-arguments backward pass, :303)
        flow_xy, flow_valid = flow_with_filters(
            frames_bgr[idx + 1], frames_bgr[idx], kp_xy, kp_valid, cfg
        )
        any_flow = flow_valid.any()
        new_xy = jnp.where(any_flow, flow_xy, kp_xy)
        new_valid = jnp.where(any_flow, flow_valid, kp_valid)
        return (new_xy, new_valid), (new_xy, new_valid)

    idxs = jnp.arange(j - 1, -1, -1)
    _, (xs_xy, xs_valid) = jax.lax.scan(step, (seed_xy, seed_valid), idxs)
    # outputs are for frames j-1 .. 0; flip ascending and append the seed
    out_xy = jnp.concatenate([xs_xy[::-1], seed_xy[None]], axis=0)
    out_valid = jnp.concatenate([xs_valid[::-1], seed_valid[None]], axis=0)
    return out_xy, out_valid
