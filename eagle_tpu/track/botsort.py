"""BoT-SORT-style multi-object tracker as a fixed-shape state machine.

Functional re-design of the tracker the reference drives through boxmot
(coordinate_model.py:68-72, :577: ``update(Nx6 [xyxy, conf, cls], frame)
-> Mx8 [xyxy, id, conf, cls, det_idx]``).  Instead of Python track objects
and lists, the whole tracker is a pytree of (MAX_TRACKS,)-shaped arrays
plus one pure ``step`` function, so it composes with ``jax.lax.scan`` over
the frame axis and runs entirely on device.

Association follows boxmot 15.0.2's BoTSORT cascade (pinned by the
numpy transcription oracle in tests/boxmot_oracle.py):
  1. confirmed (+lost) tracks x high-confidence detections, cost =
     1 - IoU (fused with detection score only when
     ``fuse_first_associate``, boxmot default off), gate ``match_thresh``
  2. still-tracked leftovers x low-confidence detections, IoU gate 0.5
  3. tentative tracks x remaining high detections, fused IoU gate 0.7
  4. leftover high detections above ``new_track_thresh`` spawn tracks
  5. duplicate suppression between tracked and lost (IoU dist < 0.15
     removes the shorter-lived track)
Track lifecycle: tentative until re-matched once (activated on the very
first frame), lost tracks kept ``track_buffer`` frames.  Motion model is
the size-scaled constant-velocity Kalman filter in
:mod:`eagle_tpu.ops.kalman`.

Camera-motion compensation (boxmot's sparse-flow GMC) enters as an
optional per-frame translation estimated from the pitch-keypoint flow;
appearance costs (boxmot's OSNet ReID) enter as optional per-detection
embeddings fused into the first association stage.  Assignment uses the
auction solver by default (scan-friendly) or the exact JV solver -- the
same algorithm as the lapx C++ solver boxmot calls.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from eagle_tpu.config import TrackerConfig
from eagle_tpu.ops.assignment import masked_assignment, masked_auction
from eagle_tpu.ops.kalman import (
    kf_initiate_batch,
    kf_predict_batch,
    kf_update_batch,
    xywh_to_xyxy,
    xyxy_to_xywh,
)
from eagle_tpu.ops.nms import box_iou_matrix


class TrackerState(NamedTuple):
    mean: jax.Array  # (T, 8) xywh + velocities
    cov: jax.Array  # (T, 8, 8)
    active: jax.Array  # (T,) slot holds a live (tracked or lost) track
    confirmed: jax.Array  # (T,) activated (outputs are emitted)
    lost_for: jax.Array  # (T,) frames since last update; 0 = updated
    track_id: jax.Array  # (T,) int32
    conf: jax.Array  # (T,)
    cls: jax.Array  # (T,) int32
    embed: jax.Array  # (T, E) EMA appearance embedding (zeros if unused)
    start_frame: jax.Array  # (T,) int32 frame the track spawned on
    next_id: jax.Array  # () int32
    frame: jax.Array  # () int32 (1-based after first step)


class TrackerOutput(NamedTuple):
    boxes: jax.Array  # (T, 4) xyxy
    track_id: jax.Array  # (T,)
    conf: jax.Array  # (T,)
    cls: jax.Array  # (T,)
    det_idx: jax.Array  # (T,) matched detection index this frame
    valid: jax.Array  # (T,) emit mask


def init_state(max_tracks: int = 64, embed_dim: int = 64) -> TrackerState:
    t = max_tracks
    return TrackerState(
        mean=jnp.zeros((t, 8)),
        cov=jnp.zeros((t, 8, 8)),
        active=jnp.zeros((t,), bool),
        confirmed=jnp.zeros((t,), bool),
        lost_for=jnp.zeros((t,), jnp.int32),
        track_id=jnp.zeros((t,), jnp.int32),
        conf=jnp.zeros((t,)),
        cls=jnp.zeros((t,), jnp.int32),
        embed=jnp.zeros((t, embed_dim)),
        start_frame=jnp.zeros((t,), jnp.int32),
        next_id=jnp.int32(1),
        frame=jnp.int32(0),
    )


def _iou_cost(track_boxes, det_boxes):
    return 1.0 - box_iou_matrix(track_boxes, det_boxes)


def _fuse_score(cost, det_conf):
    """ByteTrack fuse_score: similarity scaled by detection confidence."""
    return 1.0 - (1.0 - cost) * det_conf[None, :]


def step(
    state: TrackerState,
    det_boxes: jax.Array,
    det_conf: jax.Array,
    det_cls: jax.Array,
    det_valid: jax.Array,
    cfg: TrackerConfig = TrackerConfig(),
    gmc_warp: jax.Array | None = None,
    det_embed: jax.Array | None = None,
) -> tuple[TrackerState, TrackerOutput]:
    """Advance the tracker one frame.

    det_boxes (D, 4) xyxy / det_conf (D,) / det_cls (D,) / det_valid (D,)
    are the fixed-shape NMS outputs.

    gmc_warp : optional (2, 3) camera-motion affine warp since the last
        frame (BoT-SORT's GMC role); applied to live tracks after the
        Kalman predict with boxmot's multi_gmc semantics (the 2x2 part
        rotates every (x,y)/(w,h)/velocity pair of the state).
    det_embed : optional (D, E) L2-normalized appearance embeddings
        (BoT-SORT's ReID role); fused into the first and unconfirmed
        association stages as min(iou_dist, cosine_dist/2) with
        proximity/appearance gating when ``cfg.use_appearance``.
    """
    T = state.mean.shape[0]
    D = det_boxes.shape[0]
    frame = state.frame + 1

    # --- KF predict for the activated pool (lost tracks get zeroed size
    # velocity, boxmot multi_predict; tentative tracks are NOT predicted,
    # matching boxmot's unconfirmed handling), then camera-motion
    # compensation for every live track
    damp = jnp.where(
        (state.lost_for > 0)[:, None],
        jnp.asarray([1.0, 1, 1, 1, 1, 1, 0, 0]),
        jnp.ones(8),
    )
    pred_mean, pred_cov = kf_predict_batch(state.mean * damp, state.cov)
    predict = state.confirmed
    mean = jnp.where(predict[:, None], pred_mean, state.mean)
    cov = jnp.where(predict[:, None, None], pred_cov, state.cov)
    if gmc_warp is not None and cfg.gmc != "off":
        # boxmot multi_gmc: R8x8 = kron(eye(4), R) -- the 2x2 warp applies
        # to each of the (x,y), (w,h), (vx,vy), (vw,vh) pairs
        R = gmc_warp[:, :2]
        t_xy = gmc_warp[:, 2]
        warped = (mean.reshape(T, 4, 2) @ R.T).reshape(T, 8)
        warped = warped.at[:, :2].add(t_xy)
        wcov = jnp.einsum(
            "ap,tipjq,bq->tiajb", R, cov.reshape(T, 4, 2, 4, 2), R
        ).reshape(T, 8, 8)
        mean = jnp.where(state.active[:, None], warped, mean)
        cov = jnp.where(state.active[:, None, None], wcov, cov)
    mean = jnp.where(state.active[:, None], mean, state.mean)
    cov = jnp.where(state.active[:, None, None], cov, state.cov)
    track_boxes = xywh_to_xyxy(mean[:, :4])

    was_tracked = state.active & (state.lost_for == 0)
    # boxmot's strict split: first stage takes conf > high, second stage
    # takes low < conf < high
    high = det_valid & (det_conf > cfg.track_high_thresh)
    low = det_valid & (det_conf > cfg.track_low_thresh) & (det_conf < cfg.track_high_thresh)

    iou_c = _iou_cost(track_boxes, det_boxes)  # (T, D), reused by all stages
    solver = masked_auction if cfg.assignment == "auction" else masked_assignment

    # appearance distance, shared by stages 1 and 3 (boxmot computes it
    # against the same predicted track states)
    emb_d = None
    if cfg.use_appearance and det_embed is not None:
        emb_d = 0.5 * (1.0 - state.embed @ det_embed.T)  # cosine distance / 2
        # BoT-SORT gating: distant boxes or dissimilar appearance -> 1.0
        emb_d = jnp.where(
            (emb_d > cfg.appearance_thresh) | (iou_c > cfg.proximity_thresh), 1.0, emb_d
        )

    # --- stage 1: confirmed pool x high dets (boxmot fuses scores here
    # only when fuse_first_associate)
    rows1 = state.active & state.confirmed
    cost1 = _fuse_score(iou_c, det_conf) if cfg.fuse_first_associate else iou_c
    if emb_d is not None:
        cost1 = jnp.minimum(cost1, emb_d)
    m1, used_det1 = solver(cost1, rows1, high, cfg.match_thresh)

    # --- stage 2: still-tracked unmatched x low dets, raw IoU gate 0.5
    rows2 = rows1 & was_tracked & (m1 < 0)
    m2, used_det2 = solver(iou_c, rows2, low, 0.5)

    # --- stage 3: tentative tracks x leftover high dets, fused gate 0.7
    rows3 = state.active & ~state.confirmed
    cols3 = high & ~used_det1
    cost3 = _fuse_score(iou_c, det_conf)
    if emb_d is not None:
        cost3 = jnp.minimum(cost3, emb_d)
    m3, used_det3 = solver(cost3, rows3, cols3, 0.7)

    match = jnp.where(m1 >= 0, m1, jnp.where(m2 >= 0, m2, m3))
    matched = match >= 0

    # --- measurement update for matched tracks
    # (selection via one-hot matmuls: XLA gathers/scatters cost ~0.6 ms
    # each on TPU, far too slow for a per-frame step inside the scan)
    det_ids = jnp.arange(D, dtype=jnp.int32)
    sel = (match[:, None] == det_ids[None, :]).astype(det_boxes.dtype)  # (T, D)
    z = sel @ xyxy_to_xywh(det_boxes)
    # keep unmatched rows numerically benign for the vmapped update
    z = jnp.where(matched[:, None], z, mean[:, :4])
    new_mean, new_cov = kf_update_batch(mean, cov, z)
    mean = jnp.where(matched[:, None], new_mean, mean)
    cov = jnp.where(matched[:, None, None], new_cov, cov)
    conf = jnp.where(matched, sel @ det_conf, state.conf)
    cls = jnp.where(matched, (sel @ det_cls.astype(sel.dtype)).astype(jnp.int32), state.cls)
    confirmed = state.confirmed | matched  # tentative -> activated on match
    lost_for = jnp.where(matched, 0, state.lost_for + 1)

    embed = state.embed
    if cfg.use_appearance and det_embed is not None:
        z_emb = sel @ det_embed
        ema = cfg.embed_momentum * embed + (1.0 - cfg.embed_momentum) * z_emb
        norm = jnp.maximum(jnp.linalg.norm(ema, axis=-1, keepdims=True), 1e-9)
        embed = jnp.where(matched[:, None], ema / norm, embed)

    # --- lifecycle: drop stale lost tracks and unmatched tentatives
    keep = state.active & (
        matched
        | (state.confirmed & (lost_for <= cfg.track_buffer))
    )
    active = keep

    # --- spawn new tracks from leftover high detections (k-th free slot
    # takes the k-th new detection; all selection is rank matching, no
    # scatter/gather)
    new_det = high & ~used_det1 & ~used_det3 & (det_conf >= cfg.new_track_thresh)
    new_rank = jnp.cumsum(new_det) - 1  # (D,)
    free = ~active
    free_rank = jnp.cumsum(free) - 1  # (T,)
    n_new = new_det.sum()
    spawn = free & (free_rank < n_new)
    # (T, D) pairing: slot t's rank equals detection d's rank
    pair = (
        spawn[:, None]
        & new_det[None, :]
        & (free_rank[:, None] == new_rank[None, :])
    ).astype(det_boxes.dtype)
    src_xywh = pair @ xyxy_to_xywh(det_boxes)
    src_xywh = jnp.where(spawn[:, None], src_xywh, jnp.ones_like(src_xywh))

    init_mean, init_cov = kf_initiate_batch(src_xywh)
    mean = jnp.where(spawn[:, None], init_mean, mean)
    cov = jnp.where(spawn[:, None, None], init_cov, cov)
    conf = jnp.where(spawn, pair @ det_conf, conf)
    cls = jnp.where(spawn, (pair @ det_cls.astype(pair.dtype)).astype(jnp.int32), cls)
    track_id = jnp.where(
        spawn, state.next_id + jnp.where(spawn, free_rank, 0).astype(jnp.int32), state.track_id
    )
    confirmed = jnp.where(spawn, frame == 1, confirmed)
    lost_for = jnp.where(spawn, 0, lost_for)
    active = active | spawn
    start_frame = jnp.where(spawn, frame, state.start_frame)
    if cfg.use_appearance and det_embed is not None:
        embed = jnp.where(spawn[:, None], pair @ det_embed, embed)

    # --- duplicate suppression (boxmot remove_duplicate_stracks): when a
    # currently-tracked and a lost track overlap with IoU distance < 0.15,
    # the shorter-lived one is removed entirely
    boxes_now = xywh_to_xyxy(mean[:, :4])
    tracked_now = active & (lost_for == 0)
    lost_now = active & (lost_for > 0)
    dup_iou = box_iou_matrix(boxes_now, boxes_now)  # (T, T)
    age = (frame - lost_for) - start_frame  # boxmot: frame_id - start_frame
    pair_dup = tracked_now[:, None] & lost_now[None, :] & (dup_iou > 0.85)
    older_t = age[:, None] > age[None, :]
    kill = (pair_dup & older_t).any(axis=0) | (pair_dup & ~older_t).any(axis=1)
    active = active & ~kill

    new_state = TrackerState(
        mean=mean,
        cov=cov,
        active=active,
        confirmed=confirmed,
        lost_for=lost_for,
        track_id=track_id,
        conf=conf,
        cls=cls,
        embed=embed,
        start_frame=start_frame,
        next_id=state.next_id + n_new.astype(jnp.int32),
        frame=frame,
    )

    emit = active & confirmed & (matched | spawn)
    out = TrackerOutput(
        boxes=xywh_to_xyxy(mean[:, :4]),
        track_id=track_id,
        conf=conf,
        cls=cls,
        det_idx=jnp.where(
            matched,
            match,
            jnp.where(spawn, (pair * det_ids[None, :].astype(pair.dtype)).sum(1).astype(jnp.int32), -1),
        ),
        valid=emit,
    )
    return new_state, out
