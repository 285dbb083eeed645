"""Multi-clip batched inference: several broadcast clips tracked in one
device program, clips data-parallel over the mesh.

This is BASELINE.json configuration 5 ("Multi-clip batched inference on
v5e-8"): the stateless perception stages batch over all clips' frames,
and the temporal scans run vmapped with the clip axis sharded over ICI --
semantically identical to running the reference once per clip (tracker
identity stays per-clip), at N-chips throughput.

Note: under vmap, the homography recomputation gate (a lax.cond in the
single-clip scan) executes on every frame for every clip; correctness is
unchanged, throughput trades a few extra RANSAC solves for full batching.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from eagle_tpu.parallel.mesh import make_mesh
from eagle_tpu.parallel.pipeline import multi_clip_scan
from eagle_tpu.pipeline import temporal
from eagle_tpu.pipeline.coordinate_model import CoordinateModel


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
    ) -> list[dict]:
        model = self.model
        cfg = model.config
        clips = [np.asarray(c) for c in clips]
        h_img, w_img = clips[0].shape[1:3]
        assert all(c.shape[1:3] == (h_img, w_img) for c in clips), "clips must share resolution"
        lengths = [len(c) for c in clips]
        L = max(lengths)
        C = len(clips)
        # pad shorter clips by repeating their last frame (sliced off later)
        padded = np.stack(
            [np.concatenate([c, np.repeat(c[-1:], L - len(c), axis=0)]) if len(c) < L else c for c in clips]
        )  # (C, L, H, W, 3)

        kp_interval = max(1, int(fps / max(1, num_keypoint_detection)))
        h_interval = max(1, int(fps / max(1, num_homography)))

        # ---- phase A over the flattened frame axis
        flat = padded.reshape(C * L, h_img, w_img, 3)
        mem_kp = np.zeros((C * L, 57, 3), np.float32)
        mem_valid = np.zeros((C * L, 57), bool)
        sampled_rel = list(range(0, L, kp_interval))
        sampled = [c * L + t for c in range(C) for t in sampled_rel]
        bs = 8
        for i in range(0, len(sampled), bs):
            idx = sampled[i : i + bs]
            pad_idx = idx + [idx[-1]] * (bs - len(idx))
            kp, valid = model._keypoint_fn(flat[pad_idx])
            mem_kp[idx] = np.asarray(kp)[: len(idx)]
            mem_valid[idx] = np.asarray(valid)[: len(idx)]

        D = cfg.detector.max_detections
        det_boxes = np.zeros((C * L, D, 4), np.float32)
        det_conf = np.zeros((C * L, D), np.float32)
        det_cls = np.zeros((C * L, D), np.int32)
        det_valid = np.zeros((C * L, D), bool)
        for i in range(0, C * L, bs):
            idx = list(range(i, min(i + bs, C * L)))
            pad_idx = idx + [idx[-1]] * (bs - len(idx))
            b, s, c_, v = model._detector_fn(flat[pad_idx])
            det_boxes[idx] = np.asarray(b)[: len(idx)]
            det_conf[idx] = np.asarray(s)[: len(idx)]
            det_cls[idx] = np.asarray(c_)[: len(idx)]
            det_valid[idx] = np.asarray(v)[: len(idx)]

        # ---- per-clip first-frame seeding (reference :288-307)
        for ci in range(C):
            base = ci * L
            if mem_valid[base].sum() >= 4:
                continue
            found = next(
                (t for t in sampled_rel if mem_valid[base + t].sum() >= 4), None
            )
            if found is None or found == 0:
                continue
            seed_xy, seed_ok = temporal.backward_seed(
                jnp.asarray(padded[ci, : found + 1]),
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

        prev_rel = np.maximum(np.arange(L) - 1, 0)
        embed_dim = cfg.tracker.embed_dim if cfg.tracker.use_appearance else 1
        xs = temporal.FrameInputs(
            frame_bgr=jnp.asarray(padded),
            prev_frame_bgr=jnp.asarray(padded[:, prev_rel]),
            model_kp=jnp.asarray(clipped(mem_kp)),
            model_kp_valid=jnp.asarray(clipped(mem_valid)),
            is_kp_frame=jnp.tile(jnp.asarray(np.arange(L) % kp_interval == 0), (C, 1)),
            is_h_frame=jnp.tile(jnp.asarray(np.arange(L) % h_interval == 0), (C, 1)),
            det_boxes=jnp.asarray(clipped(det_boxes)),
            det_conf=jnp.asarray(clipped(det_conf)),
            det_cls=jnp.asarray(clipped(det_cls)),
            det_valid=jnp.asarray(clipped(det_valid)),
            det_embed=jnp.zeros((C, L, D, embed_dim), jnp.float32),
            t=jnp.tile(jnp.arange(L, dtype=jnp.int32), (C, 1)),
        )
        carries = jax.vmap(lambda _: temporal.init_carry(cfg))(jnp.arange(C))
        scan = multi_clip_scan(self.mesh, cfg, model._key)
        _, out = scan(carries, xs)
        out = jax.tree.map(np.asarray, out)

        # ---- per-clip host assembly
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
                    (h_img, w_img),
                )
            )
        return results
