"""Multi-clip batched inference: several broadcast clips tracked in one
device program, clips data-parallel over the mesh.

This is BASELINE.json configuration 5 ("Multi-clip batched inference on
v5e-8").  Two execution strategies:

- **One device (built-in models)**: the clips run as ONE flattened
  stream through the single-clip machinery
  (``CoordinateModel.get_coordinates(_clip_lens=...)``) with within-clip
  ``t`` and a scan-carry reset at every clip boundary -- semantically
  per-clip (tracker identity included) with zero vmap tax and every
  single-clip optimization (piece-interleaved upload/detect/keypoints,
  chunk-checkpointed scan, on-demand keypoint resume).
- **Sharded mesh / custom models**: the stateless perception stages
  shard the flattened *frame* axis over the mesh (GSPMD partitions the
  model runners from the input shardings alone), and the temporal scans
  run vmapped with the *clip* axis sharded over ICI, at N-chips
  throughput.  The clip-batched temporal step
  (temporal.temporal_step_clips) hoists the homography gate above the
  vmap: RANSAC fires once per step gated on any(do_h) across the batch.

Both strategies reproduce the reference's on-demand keypoint
re-detection (flow collapse below 4 points on a non-cadence frame,
coordinate_model.py:316-319): the scan flags frames via
FrameOutputs.need_kp, the keypoint model runs on the flagged frames, the
memo updates, and the scan re-runs (up to 3 rounds; the flattened path
resumes from the first affected chunk).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from eagle_tpu.parallel.mesh import make_mesh, pad_to_multiple, shard_batch
from eagle_tpu.parallel.pipeline import multi_clip_scan
from eagle_tpu.pipeline import temporal, transfer
from eagle_tpu.pipeline.coordinate_model import KP_BATCH, PIECE, CoordinateModel
from eagle_tpu.ops.preprocess import host_letterbox


class MultiClipRunner:
    """Runs a :class:`CoordinateModel` over a batch of clips.

    >>> runner = MultiClipRunner(model)
    >>> results = runner.run([clip_a, clip_b], fps=24)   # list of dicts
    """

    def __init__(self, model: CoordinateModel, mesh=None):
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh(model.config.mesh)

    def run(
        self,
        clips: list[np.ndarray],
        fps: int,
        num_homography: int = 1,
        num_keypoint_detection: int = 1,
        verbose: bool = False,
        profile=None,
    ) -> list[dict]:
        """``profile``: optional StageTimer accumulating per-stage wall
        clock (upload, detector, keypoints, seed, scan, assembly)."""
        from eagle_tpu.utils.profiling import StageTimer

        timer = profile if profile is not None else StageTimer()
        model = self.model
        clips = [np.asarray(c) for c in clips]
        h_img, w_img = clips[0].shape[1:3]
        img_hw = (int(h_img), int(w_img))
        assert all(c.shape[1:3] == (h_img, w_img) for c in clips), "clips must share resolution"
        lengths = [len(c) for c in clips]
        L = max(lengths)
        C = len(clips)
        n_dev = len(self.mesh.devices.flat)

        geom = model._geometry(img_hw)
        cfg = model.config.replace(work=geom)

        # pad shorter clips by repeating their last frame (sliced off
        # later); clips stay as a LIST -- stacking them into one (C, L, H,
        # W, 3) array costs a few hundred MB of host memcpy that the
        # piece-by-piece prescale would immediately re-copy anyway
        clips_padded = [
            np.concatenate([c, np.repeat(c[-1:], L - len(c), axis=0)]) if len(c) < L else c
            for c in clips
        ]
        flat_orig_cache: list = []

        def flat_orig() -> np.ndarray:
            """(C*L, H, W, 3) original-resolution frames, stacked lazily
            (only the custom-model paths consume it)."""
            if not flat_orig_cache:
                flat_orig_cache.append(np.concatenate(clips_padded, axis=0))
            return flat_orig_cache[0]

        fast_path = n_dev == 1 and not model._custom_det and geom.enabled
        if fast_path and not model._custom_kp:
            # single-device flagship path: run the clips as ONE flattened
            # stream through the single-clip machinery (piece-interleaved
            # upload/detect/keypoints, chunk-checkpointed scan, on-demand
            # resume) with within-clip t and a carry reset at every clip
            # boundary -- semantically identical to per-clip runs (tracker
            # identity included) without the clip-vmap tax on the step's
            # inner lax.conds (measured +33% per frame-step at C=2)
            return model.get_coordinates(
                clips_padded,
                fps,
                num_homography=num_homography,
                num_keypoint_detection=num_keypoint_detection,
                verbose=verbose,
                profile=timer,
                _clip_lens=lengths,
            )
        dev_bgr = None
        det_piece_outs = None
        if fast_path:
            # single-device fast path, sharing _DevicePieces with the
            # single-clip pipeline: prescale + (4:2:0) pack + upload piece
            # by piece, with the detector program for each piece enqueued
            # right behind its decode (in-order device queue: piece k
            # detects while piece k+1 crosses the link), then one device
            # concat -- the scan and keypoint batches slice the
            # device-resident decoded canvas instead of re-uploading
            from eagle_tpu.ops.preprocess import resolve_upload_format
            from eagle_tpu.pipeline.coordinate_model import _DevicePieces

            runner = model._det_runner(geom, img_hw)
            det_piece_outs = []
            with timer("upload"):
                pieces_obj = _DevicePieces(
                    clips_padded,
                    PIECE,
                    geom,
                    fmt=resolve_upload_format(cfg.upload_format, geom.enabled),
                    on_piece=lambda j, arr: det_piece_outs.append(runner(arr)),
                    prescale=cfg.prescale,
                )
                dev_bgr = (
                    jnp.concatenate(pieces_obj.pieces)
                    if len(pieces_obj.pieces) > 1
                    else pieces_obj.pieces[0]
                )[: C * L]
                # no host canvas copy on this path: decoding all frames
                # 4:2:0->BGR on the host costs ~1s/96x720p frames and the
                # only consumer (first-frame seeding) can slice the
                # device-resident canvas instead
                work = None
                pieces_obj.release_host()
                # drop the per-piece device references: dev_bgr is the only
                # device copy from here on (keeping both doubles the clip's
                # HBM footprint)
                pieces_obj.pieces = []
        else:
            with timer("upload"):
                work = (
                    host_letterbox(flat_orig(), geom).reshape(
                        C, L, geom.canvas_h, geom.canvas_w, 3
                    )
                    if geom.enabled
                    else flat_orig().reshape(C, L, h_img, w_img, 3)
                )

        kp_interval = max(1, int(fps / max(1, num_keypoint_detection)))
        h_interval = max(1, int(fps / max(1, num_homography)))

        D = cfg.detector.max_detections
        embed_dim = cfg.tracker.embed_dim if cfg.tracker.use_appearance else 0
        flat_work = None if work is None else work.reshape(C * L, *work.shape[2:])

        # sharded (multi-device) path: batches still cross the link as
        # 4:2:0 planes when the format allows -- device_put shards the
        # planes on the batch axis and the elementwise decode runs under
        # GSPMD, so the halved bytes carry over to real multi-chip hosts
        from eagle_tpu.ops.preprocess import host_to_i420, i420_to_bgr, resolve_upload_format

        shard_yuv = (
            flat_work is not None
            and not model._custom_det
            and resolve_upload_format(cfg.upload_format, geom.enabled) == "yuv420"
            and flat_work.shape[1] % 4 == 0
            and flat_work.shape[2] % 2 == 0
        )

        def to_device_batch(batch_np):
            if shard_yuv:
                return i420_to_bgr(shard_batch(host_to_i420(batch_np), self.mesh))
            return shard_batch(batch_np, self.mesh)


        # ---- phase A: detector over the flattened frame axis, sharded
        # over the mesh (global batch = per-device batch x devices; GSPMD
        # partitions the jitted runner from the input sharding)
        with timer("detector"):
            if model._custom_det:
                det_packed = np.zeros((C * L, D, 7 + max(embed_dim, 0)), np.float32)
                for i in range(0, C * L, PIECE):
                    idx = list(range(i, min(i + PIECE, C * L)))
                    pad_idx = idx + [idx[-1]] * (PIECE - len(idx))
                    b, s, c_, v = (np.asarray(a) for a in model._detector_fn(flat_orig()[pad_idx]))
                    packed = np.concatenate(
                        [
                            b.astype(np.float32),
                            s.astype(np.float32)[..., None],
                            c_.astype(np.float32)[..., None],
                            v.astype(np.float32)[..., None],
                        ],
                        axis=-1,
                    )[: len(idx)]
                    if embed_dim:
                        emb = model._embed_runner(img_hw)(
                            jnp.asarray(flat_orig()[pad_idx]), jnp.asarray(b.astype(np.float32))
                        )
                        packed = np.concatenate([packed, np.asarray(emb)[: len(idx)]], axis=-1)
                    det_packed[idx] = packed
            elif det_piece_outs is not None:
                # dispatched piece-interleaved during upload; one device
                # concat -> one D2H transfer (each transfer pays the link's
                # round-trip latency).  The concat is enqueued HERE but the
                # host-side drain is deferred until after the keypoint
                # programs are dispatched: the detector buffer is ready as
                # soon as its (earlier-queued) op executes, so its D2H
                # streams while the keypoint model computes instead of
                # stalling the host before the keypoint dispatch.
                outs = det_piece_outs
                if len(outs) > 1 and not isinstance(outs[0], np.ndarray):
                    det_packed = None
                    det_cat = jnp.concatenate(outs)
                else:
                    det_packed = np.concatenate([np.asarray(o) for o in outs])[: C * L]
            else:
                runner = model._det_runner(geom, img_hw)
                batch = PIECE * n_dev
                frames_p, n_real = pad_to_multiple(flat_work, batch)
                outs = []
                for i in range(0, len(frames_p), batch):
                    outs.append(runner(to_device_batch(frames_p[i : i + batch])))
                det_packed = np.concatenate([np.asarray(o) for o in outs])[:n_real]

        # ---- keypoint model at the per-clip sampling cadence, sharded
        with timer("keypoints"):
            sampled_rel = list(range(0, L, kp_interval))
            # pad frames (short clips repeated to L) are copies of the last
            # real frame: never sample them -- a per-clip run wouldn't, and a
            # pad detection must not back-seed a short clip's opening frames
            # (same rule as the flattened path, coordinate_model.py)
            sampled = [c * L + t for c in range(C) for t in sampled_rel if t < lengths[c]]
            mem_kp = np.zeros((C * L, 57, 3), np.float32)
            mem_valid = np.zeros((C * L, 57), bool)
            if model._custom_kp:
                for i in range(0, len(sampled), KP_BATCH):
                    idx = sampled[i : i + KP_BATCH]
                    pad_idx = idx + [idx[-1]] * (KP_BATCH - len(idx))
                    kp, valid = model._keypoint_fn(flat_orig()[pad_idx])
                    mem_kp[idx] = np.asarray(kp)[: len(idx)]
                    mem_valid[idx] = np.asarray(valid)[: len(idx)]
            else:
                # (dev_bgr cannot reach here: the fast path with the built-in
                # keypoint model early-returns through get_coordinates above,
                # so a non-None dev_bgr always pairs with _custom_kp)
                krun = model._kp_runner(geom, img_hw)
                kbatch = KP_BATCH * n_dev
                samp_frames, n_samp = pad_to_multiple(flat_work[sampled], kbatch)
                outs = []
                for i in range(0, len(samp_frames), kbatch):
                    outs.append(krun(to_device_batch(samp_frames[i : i + kbatch])))
                if det_packed is None and outs and not isinstance(outs[0], np.ndarray):
                    # keypoint batches and the deferred detector concat
                    # become ready at the same point: ONE flattened D2H
                    # serves both instead of two round trips
                    *kp_outs, det_np = transfer.drain_together(*outs, det_cat)
                    det_packed = det_np[: C * L]
                    packed = np.concatenate(kp_outs)[:n_samp]
                else:
                    packed = np.concatenate([np.asarray(o) for o in outs])[:n_samp]
                mem_kp[sampled] = packed[..., :3]
                mem_valid[sampled] = packed[..., 3] > 0.5
            if det_packed is None:  # custom-kp path skipped the deferred drain
                det_packed = np.asarray(det_cat)[: C * L]

        # ---- per-clip first-frame seeding (reference :288-307)
        with timer("seed"):
            for ci in range(C):
                base = ci * L
                if mem_valid[base].sum() >= 4:
                    continue
                found = next(
                    (
                        t
                        for t in sampled_rel
                        if t < lengths[ci] and mem_valid[base + t].sum() >= 4
                    ),
                    None,
                )
                if found is None or found == 0:
                    continue
                seed_frames = (
                    dev_bgr[base : base + found + 1]
                    if work is None
                    else jnp.asarray(work[ci, : found + 1])
                )
                seed_xy, seed_ok = temporal.backward_seed(
                    seed_frames,
                    jnp.asarray(mem_kp[base + found, :, :2]),
                    jnp.asarray(mem_valid[base + found]),
                    cfg,
                )
                seed_xy, seed_ok = np.asarray(seed_xy), np.asarray(seed_ok)
                for t in range(found):  # memoized entries win per-label
                    take = seed_ok[t] & ~mem_valid[base + t]
                    mem_kp[base + t, take, :2] = seed_xy[t, take]
                    mem_valid[base + t] |= seed_ok[t]

        # ---- clip-parallel temporal scan
        def clipped(a):
            return np.asarray(a).reshape(C, L, *np.asarray(a).shape[1:])

        det_boxes = det_packed[..., :4]
        det_conf = det_packed[..., 4]
        det_cls = det_packed[..., 5].astype(np.int32)
        det_valid = det_packed[..., 6] > 0.5
        det_embed = (
            clipped(det_packed[..., 7:])
            if embed_dim
            else np.zeros((C, L, D, 1), np.float32)
        )
        if dev_bgr is not None:  # already device-resident; no re-upload
            dev_work = dev_bgr.reshape(C, L, *dev_bgr.shape[1:])
        elif shard_yuv:
            # one 4:2:0 upload for the scan too (decode under GSPMD)
            planes = host_to_i420(np.ascontiguousarray(flat_work))
            dev_work = i420_to_bgr(jnp.asarray(planes)).reshape(C, L, *flat_work.shape[1:])
        else:
            dev_work = jnp.asarray(work)  # one upload; prev derives in-program
        xs = temporal.FrameInputs(
            frame_bgr=dev_work,
            prev_frame_bgr=dev_work[:, :1],  # placeholder; derive_prev rebuilds
            model_kp=jnp.asarray(clipped(mem_kp)),
            model_kp_valid=jnp.asarray(clipped(mem_valid)),
            is_kp_frame=jnp.tile(jnp.asarray(np.arange(L) % kp_interval == 0), (C, 1)),
            is_h_frame=jnp.tile(jnp.asarray(np.arange(L) % h_interval == 0), (C, 1)),
            det_boxes=jnp.asarray(clipped(det_boxes)),
            det_conf=jnp.asarray(clipped(det_conf)),
            det_cls=jnp.asarray(clipped(det_cls)),
            det_valid=jnp.asarray(clipped(det_valid)),
            det_embed=jnp.asarray(det_embed),
            t=jnp.tile(jnp.arange(L, dtype=jnp.int32), (C, 1)),
        )
        carries = jax.vmap(lambda _: temporal.init_carry(cfg))(jnp.arange(C))
        scan = multi_clip_scan(self.mesh, cfg, model._key, derive_prev=True, packed=True)

        # the reference memoizes every attempted frame, found or not
        # (coordinate_model.py:263-276): attempted frames never re-detect
        mem_attempted = np.zeros((C * L,), bool)
        mem_attempted[sampled] = True
        real_mask = np.zeros((C, L), bool)
        for ci in range(C):
            real_mask[ci, : lengths[ci]] = True

        def detect_kp_flagged(flagged):
            """Run the keypoint model on flagged global frame indices and
            memoize (the multi-clip twin of the single-clip on-demand pass,
            coordinate_model.py:651-709)."""
            kbatch = KP_BATCH if model._custom_kp else KP_BATCH * n_dev
            pending = []
            for i in range(0, len(flagged), kbatch):
                idx = [int(j) for j in flagged[i : i + kbatch]]
                real = len(idx)
                pad_idx = idx + [idx[-1]] * (kbatch - real)
                if model._custom_kp:
                    kp, valid = model._keypoint_fn(flat_orig()[pad_idx])
                    packed = np.concatenate(
                        [np.asarray(kp), np.asarray(valid, np.float32)[..., None]],
                        axis=-1,
                    )
                else:  # dev_bgr non-None implies _custom_kp (handled above)
                    krun = model._kp_runner(geom, img_hw)
                    packed = krun(to_device_batch(flat_work[pad_idx]))
                pending.append((idx, real, packed))
            for idx, real, packed in pending:
                packed = np.asarray(packed)
                mem_kp[idx[:real]] = packed[:real, :, :3]
                mem_valid[idx[:real]] = packed[:real, :, 3] > 0.5
                mem_attempted[idx[:real]] = True

        out = None
        for _ondemand_round in range(3):
            with timer("scan"):
                _, packed_out = scan(carries, xs)
                packed_np = np.asarray(packed_out)  # one transfer for all clips
                out = jax.tree.map(
                    lambda *leaves: np.stack(leaves),
                    *[
                        temporal.unpack_outputs(packed_np[ci], cfg.tracker.max_tracks)
                        for ci in range(C)
                    ],
                )
            flagged = np.flatnonzero(
                (np.asarray(out.need_kp, bool) & real_mask).reshape(-1) & ~mem_attempted
            )
            if len(flagged) == 0:
                break
            with timer("keypoints"):
                detect_kp_flagged(flagged)
                xs = xs._replace(
                    model_kp=jnp.asarray(clipped(mem_kp)),
                    model_kp_valid=jnp.asarray(clipped(mem_valid)),
                )

        # ---- per-clip host assembly
        with timer("assembly"):
            results = []
            for ci in range(C):
                n = lengths[ci]
                clip_out = jax.tree.map(lambda a: a[ci][:n], out)
                results.append(
                    model._assemble(
                        clip_out,
                        det_boxes.reshape(C, L, D, 4)[ci][:n],
                        det_conf.reshape(C, L, D)[ci][:n],
                        det_cls.reshape(C, L, D)[ci][:n],
                        det_valid.reshape(C, L, D)[ci][:n],
                        fps,
                        img_hw,
                    )
                )
        return results
