"""Multi-clip batched inference: results must match running the
single-clip pipeline per clip (modulo the always-on RANSAC under vmap,
which on clean synthetic data converges to the same homography)."""

import numpy as np
import pytest

from eagle_tpu import pitch
from eagle_tpu.pipeline.coordinate_model import CoordinateModel
from eagle_tpu.pipeline.multiclip import MultiClipRunner
from eagle_tpu.utils.synthetic import make_scene

from .oracles import oracle_detections_at, oracle_detector_fn, oracle_keypoint_fn


class _MultiSceneOracles:
    """Detector oracle over the flattened (clip-major) frame order used by
    MultiClipRunner's phase A."""

    def __init__(self, scenes, L):
        self.scenes = scenes
        self.L = L
        self.cursor = 0

    def __call__(self, frames_batch):
        outs = []
        for k in range(len(frames_batch)):
            g = min(self.cursor + k, len(self.scenes) * self.L - 1)
            ci, t = divmod(g, self.L)
            scene = self.scenes[ci]
            t = min(t, len(scene.frames) - 1)
            outs.append(oracle_detections_at(scene, t))
        self.cursor += len(frames_batch)
        b = np.stack([o[0] for o in outs])
        c = np.stack([o[1] for o in outs])
        k_ = np.stack([o[2] for o in outs])
        v = np.stack([o[3] for o in outs])
        return b, c, k_, v


@pytest.mark.parametrize("n_clips", [2])
def test_multiclip_matches_single(n_clips):
    scenes = [
        make_scene(num_frames=8, width=640, height=360, num_players=4, fps=8, seed=20 + i)
        for i in range(n_clips)
    ]
    L = 8

    def kp_fn_multi(frames_batch):
        # static camera in every scene: same keypoints everywhere
        return oracle_keypoint_fn(scenes[0])(frames_batch)

    model_multi = CoordinateModel(
        keypoint_fn=kp_fn_multi,
        detector_fn=_MultiSceneOracles(scenes, L),
        verbose_init=False,
    )
    runner = MultiClipRunner(model_multi)
    results = runner.run([s.frames for s in scenes], fps=8, num_homography=1, num_keypoint_detection=2)
    assert len(results) == n_clips

    for ci, scene in enumerate(scenes):
        single = CoordinateModel(
            keypoint_fn=oracle_keypoint_fn(scene),
            detector_fn=oracle_detector_fn(scene),
            verbose_init=False,
        ).get_coordinates(scene.frames, 8, num_homography=1, num_keypoint_detection=2, verbose=False)

        multi = results[ci]
        assert set(multi) == set(single)
        for t in multi:
            ms, ss = multi[t], single[t]
            assert ms["Time"] == ss["Time"]
            assert set(ms["Coordinates"]) == set(ss["Coordinates"])
            for cls_name, items in ss["Coordinates"].items():
                assert set(ms["Coordinates"][cls_name]) == set(items)
                for oid, item in items.items():
                    got = ms["Coordinates"][cls_name][oid]
                    assert got["BBox"] == item["BBox"]
                    a, b = got["Transformed_Coordinates"], item["Transformed_Coordinates"]
                    if a is not None and b is not None:
                        assert abs(a[0] - b[0]) <= 1 and abs(a[1] - b[1]) <= 1


def test_multiclip_on_demand_keypoints_match_single():
    """Flow collapse in ONE clip of a batch (hard cut to featureless
    frames) must trigger the on-demand keypoint fallback
    (coordinate_model.py:316-319) for that clip and converge to the same
    per-frame results as the single-clip path run on each clip."""
    L = 8
    good = make_scene(num_frames=L, width=640, height=360, num_players=0, fps=8, seed=40)
    cut = make_scene(num_frames=L, width=640, height=360, num_players=0, fps=8, seed=41)
    cut_frames = cut.frames.copy()
    cut_frames[4:] = 127  # LK gradient singular: flow collapses

    def no_dets(batch):
        b = len(batch)
        return (
            np.zeros((b, 128, 4), np.float32),
            np.zeros((b, 128), np.float32),
            np.zeros((b, 128), np.int32),
            np.zeros((b, 128), bool),
        )

    calls = [0]
    inner = oracle_keypoint_fn(good)  # static cameras: same GT everywhere

    def counting_kp(batch):
        calls[0] += 1
        return inner(batch)

    model = CoordinateModel(keypoint_fn=counting_kp, detector_fn=no_dets, verbose_init=False)
    # cadence 1/s at 8 fps -> model frames {0} per clip; 4.. have no memo
    results = MultiClipRunner(model).run(
        [good.frames, cut_frames], fps=8, num_homography=1, num_keypoint_detection=1
    )
    phase_a_calls = calls[0]
    assert phase_a_calls >= 2, "phase A + at least one on-demand pass"

    singles = []
    for frames in (good.frames, cut_frames):
        m = CoordinateModel(
            keypoint_fn=oracle_keypoint_fn(good), detector_fn=no_dets, verbose_init=False
        )
        singles.append(
            m.get_coordinates(frames, 8, num_homography=1, num_keypoint_detection=1, verbose=False)
        )

    # the collapsed clip recovered >= 4 keypoints on flagged frames
    for t in range(4, L):
        assert len(results[1][t]["Keypoints"]) >= 4, f"frame {t} not recovered"

    for ci in range(2):
        multi, single = results[ci], singles[ci]
        assert set(multi) == set(single)
        for t in multi:
            km, ks = multi[t]["Keypoints"], single[t]["Keypoints"]
            assert set(km) == set(ks), f"clip {ci} frame {t}: {set(km) ^ set(ks)}"
            for name in km:
                assert abs(km[name][0] - ks[name][0]) <= 1
                assert abs(km[name][1] - ks[name][1]) <= 1


def test_multiclip_first_frame_seeding():
    """A clip whose opening frames lack model keypoints must be seeded
    backward from the first detected frame, per clip."""
    scene = make_scene(num_frames=8, width=640, height=360, num_players=2, fps=8, seed=30)
    inner = oracle_keypoint_fn(scene)
    L = 8

    calls = {"i": 0}

    def kp_fn(frames_batch):
        kp, valid = inner(frames_batch)
        # suppress detections for global sampled frames mapping to t < 2
        # (sampled order is clip-major, kp_interval=4 -> rel t = 0, 4)
        b = len(frames_batch)
        start = calls["i"]
        calls["i"] += b
        for k in range(b):
            g = start + k
            rel = (g % 2) * 4  # two samples per clip: t=0 and t=4
            if rel < 2:
                valid[k] = False
        return kp, valid

    model = CoordinateModel(
        keypoint_fn=kp_fn, detector_fn=_MultiSceneOracles([scene, scene], L), verbose_init=False
    )
    runner = MultiClipRunner(model)
    results = runner.run([scene.frames, scene.frames], fps=8, num_keypoint_detection=2)
    for res in results:
        # frame 0 recovered keypoints via backward flow from frame 4
        assert len(res[0]["Keypoints"]) >= 4


def test_multiclip_production_path_sharded():
    """Production shape: default (random-weight) models, working-resolution
    geometry, mesh-sharded phase A, appearance embeddings wired through the
    packed detector outputs.  Two identical clips must produce identical
    results (clip-parallel scan is deterministic), and the geometry must
    actually be enabled."""
    from eagle_tpu.config import DetectorConfig, KeypointConfig, PipelineConfig, TrackerConfig

    rng = np.random.default_rng(11)
    clip = rng.integers(0, 255, (24, 96, 128, 3), dtype=np.uint8)
    cfg = PipelineConfig().replace(
        detector=DetectorConfig(variant="medium", image_size=96, max_detections=16, nms_pre_topk=64),
        keypoint=KeypointConfig(input_hw=(72, 96)),
        tracker=TrackerConfig(max_tracks=16, use_appearance=True, embedder="histogram", embed_dim=64),
        chunk_frames=32,
    )
    model = CoordinateModel(config=cfg, verbose_init=False)
    assert model._geometry((96, 128)).enabled
    runner = MultiClipRunner(model)
    assert len(runner.mesh.devices.flat) == 8, "tests force the 8-device mesh"
    results = runner.run([clip, clip.copy()], fps=12, num_keypoint_detection=12)
    assert len(results) == 2
    assert set(results[0]) == set(range(24))
    # identical inputs -> identical outputs across the clip axis
    for t in range(24):
        assert results[0][t] == results[1][t], f"frame {t} differs between identical clips"


def test_multiclip_ragged_lengths_default_models():
    """Clips of different lengths pad/truncate correctly on the sharded
    phase-A path."""
    from eagle_tpu.config import DetectorConfig, KeypointConfig, PipelineConfig

    rng = np.random.default_rng(12)
    a = rng.integers(0, 255, (20, 96, 128, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (11, 96, 128, 3), dtype=np.uint8)
    cfg = PipelineConfig().replace(
        detector=DetectorConfig(variant="medium", image_size=96, max_detections=16, nms_pre_topk=64),
        keypoint=KeypointConfig(input_hw=(72, 96)),
        chunk_frames=32,
    )
    model = CoordinateModel(config=cfg, verbose_init=False)
    results = MultiClipRunner(model).run([a, b], fps=10, num_keypoint_detection=10)
    assert set(results[0]) == set(range(20))
    assert set(results[1]) == set(range(11))


def test_multiclip_yuv_single_device_matches_bgr():
    """The single-device 4:2:0 fast path (one planes upload, device-resident
    slices for detector/keypoints/scan) is plumbing-equivalent to the BGR
    path: identical detections (device-decoded from frames via a
    yuv-robust block code), keypoints within the 4:2:0 pixel envelope."""
    import jax
    import jax.numpy as jnp

    from eagle_tpu.parallel.mesh import make_mesh

    C, L = 2, 8
    scene = make_scene(num_frames=1, width=1280, height=720, num_players=0, fps=8, seed=5)
    base = scene.frames[0]
    clips = []
    for ci in range(C):
        fs = []
        for t in range(L):
            f = base.copy()
            # frame id as a flat block: survives prescale + 4:2:0 (+-2)
            f[0:128, 0:128] = 50 + 10 * (ci * L + t)
            fs.append(f)
        clips.append(np.stack(fs))

    okp, ovalid = oracle_keypoint_fn(scene)(scene.frames[:1])
    kp_packed = np.concatenate(
        [okp[0], ovalid[0].astype(np.float32)[:, None]], axis=-1
    )  # (57, 4)

    def run_with(fmt):
        model = CoordinateModel(verbose_init=False)
        model.config = model.config.replace(upload_format=fmt)
        geom = model._geometry((720, 1280))
        assert geom.enabled

        def fake_det_runner(g, hw):
            @jax.jit
            def run(x):
                # decode the id block (canvas coords: gain .75, pad_y 2)
                blk = x[:, 12:88, 12:88].astype(jnp.float32).mean(axis=(1, 2, 3))
                fid = jnp.round((blk - 50.0) / 10.0)
                b, d = x.shape[0], 128
                out = jnp.zeros((b, d, 7), jnp.float32)
                # two deterministic player boxes derived from the id
                x1 = 300.0 + 7.0 * fid
                for slot in range(2):
                    bx = jnp.stack(
                        [x1 + 90 * slot, jnp.full_like(fid, 300.0),
                         x1 + 90 * slot + 40, jnp.full_like(fid, 400.0)], -1)
                    row = jnp.concatenate(
                        [bx, jnp.full((b, 1), 0.9), jnp.zeros((b, 1)), jnp.ones((b, 1))], -1)
                    out = out.at[:, slot].set(row)
                return out

            return run

        def fake_kp_runner(g, hw):
            def run(batch):
                return np.tile(kp_packed, (int(batch.shape[0]), 1, 1))

            return run

        model._det_runner = fake_det_runner
        model._kp_runner = fake_kp_runner
        mesh = make_mesh(devices=jax.devices()[:1])
        return MultiClipRunner(model, mesh=mesh).run(
            clips, fps=8, num_homography=1, num_keypoint_detection=2
        )

    res_bgr = run_with("bgr")
    res_yuv = run_with("yuv420")
    for rb, ry in zip(res_bgr, res_yuv):
        assert set(rb) == set(ry)
        for t in rb:
            pb = rb[t]["Coordinates"].get("Player", {})
            py = ry[t]["Coordinates"].get("Player", {})
            assert set(pb) == set(py)
            for pid in pb:
                assert pb[pid]["BBox"] == py[pid]["BBox"]
            kb = rb[t]["Keypoints"]
            ky = ry[t]["Keypoints"]
            for k in set(kb) & set(ky):
                assert abs(kb[k][0] - ky[k][0]) <= 2 and abs(kb[k][1] - ky[k][1]) <= 2


def test_multiclip_yuv_sharded_matches_single_device():
    """The sharded (multi-device) 4:2:0 path -- planes device_put with a
    batch sharding, decoded under GSPMD -- produces the same detections
    and near-identical keypoints as the single-device fast path."""
    import jax
    import jax.numpy as jnp

    from eagle_tpu.parallel.mesh import make_mesh

    C, L = 2, 8
    scene = make_scene(num_frames=1, width=1280, height=720, num_players=0, fps=8, seed=6)
    base = scene.frames[0]
    clips = []
    for ci in range(C):
        fs = []
        for t in range(L):
            f = base.copy()
            f[0:128, 0:128] = 50 + 10 * (ci * L + t)
            fs.append(f)
        clips.append(np.stack(fs))

    okp, ovalid = oracle_keypoint_fn(scene)(scene.frames[:1])
    kp_packed = np.concatenate(
        [okp[0], ovalid[0].astype(np.float32)[:, None]], axis=-1
    )

    def run_with(mesh):
        model = CoordinateModel(verbose_init=False)
        geom = model._geometry((720, 1280))
        assert geom.enabled

        def fake_det_runner(g, hw):
            @jax.jit
            def run(x):
                blk = x[:, 12:88, 12:88].astype(jnp.float32).mean(axis=(1, 2, 3))
                fid = jnp.round((blk - 50.0) / 10.0)
                b, d = x.shape[0], 128
                out = jnp.zeros((b, d, 7), jnp.float32)
                x1 = 300.0 + 7.0 * fid
                for slot in range(2):
                    bx = jnp.stack(
                        [x1 + 90 * slot, jnp.full_like(fid, 300.0),
                         x1 + 90 * slot + 40, jnp.full_like(fid, 400.0)], -1)
                    row = jnp.concatenate(
                        [bx, jnp.full((b, 1), 0.9), jnp.zeros((b, 1)), jnp.ones((b, 1))], -1)
                    out = out.at[:, slot].set(row)
                return out

            return run

        def fake_kp_runner(g, hw):
            def run(batch):
                return np.tile(kp_packed, (int(batch.shape[0]), 1, 1))

            return run

        model._det_runner = fake_det_runner
        model._kp_runner = fake_kp_runner
        return MultiClipRunner(model, mesh=mesh).run(
            clips, fps=8, num_homography=1, num_keypoint_detection=2
        )

    res_one = run_with(make_mesh(devices=jax.devices()[:1]))
    res_all = run_with(make_mesh())  # the full 8-device test mesh
    for r1, r8 in zip(res_one, res_all):
        assert set(r1) == set(r8)
        for t in r1:
            p1 = r1[t]["Coordinates"].get("Player", {})
            p8 = r8[t]["Coordinates"].get("Player", {})
            assert set(p1) == set(p8)
            for pid in p1:
                assert p1[pid]["BBox"] == p8[pid]["BBox"]
            k1 = r1[t]["Keypoints"]
            k8 = r8[t]["Keypoints"]
            for k in set(k1) & set(k8):
                assert abs(k1[k][0] - k8[k][0]) <= 2 and abs(k1[k][1] - k8[k][1]) <= 2


def test_multiclip_flattened_path_matches_single_per_clip():
    """The 1-device built-in-model path (clips flattened through the
    single-clip chunked scan with a carry reset at clip boundaries,
    multiclip.py delegation -> get_coordinates(_clip_lens=...)) must be
    EXACTLY per-clip: unequal clip lengths (pad frames discarded), and
    per-clip backward first-frame seeding at a nonzero stream base
    (host_range(start=)).  Runner-level fakes (not custom model fns, so
    the delegation engages) decode a per-frame id block from the canvas,
    as in test_multiclip_yuv_single_device_matches_bgr."""
    import jax
    import jax.numpy as jnp

    from eagle_tpu.parallel.mesh import make_mesh

    L = 8
    lens = [8, 6]
    scene = make_scene(num_frames=1, width=1280, height=720, num_players=0, fps=8, seed=6)
    base = scene.frames[0]

    def stamped(fid):
        f = base.copy()
        f[0:128, 0:128] = 50 + 10 * fid
        return f

    clips = [
        np.stack([stamped(ci * L + t) for t in range(lens[ci])]) for ci in range(2)
    ]

    okp, ovalid = oracle_keypoint_fn(scene)(scene.frames[:1])
    kp_packed = np.concatenate(
        [okp[0], ovalid[0].astype(np.float32)[:, None]], axis=-1
    )  # (57, 4)

    def make_model():
        model = CoordinateModel(verbose_init=False)
        geom = model._geometry((720, 1280))
        assert geom.enabled

        def decode_fid(x):
            blk = x[:, 12:88, 12:88].astype(jnp.float32).mean(axis=(1, 2, 3))
            return jnp.round((blk - 50.0) / 10.0)

        def fake_det_runner(g, hw):
            @jax.jit
            def run(x):
                fid = decode_fid(x)
                b, d = x.shape[0], 128
                out = jnp.zeros((b, d, 7), jnp.float32)
                x1 = 300.0 + 7.0 * fid
                for slot in range(2):
                    bx = jnp.stack(
                        [x1 + 90 * slot, jnp.full_like(fid, 300.0),
                         x1 + 90 * slot + 40, jnp.full_like(fid, 400.0)], -1)
                    row = jnp.concatenate(
                        [bx, jnp.full((b, 1), 0.9), jnp.zeros((b, 1)), jnp.ones((b, 1))], -1)
                    out = out.at[:, slot].set(row)
                return out

            return run

        def fake_kp_runner(g, hw):
            kp_const = jnp.asarray(kp_packed)

            def run(batch):
                fid = decode_fid(batch)
                # clip 1's frames are barren before within-clip t=2:
                # forces per-clip backward seeding from its t=4 sample
                suppress = (fid >= L) & ((fid % L) < 2)
                out = jnp.tile(kp_const[None], (batch.shape[0], 1, 1))
                return out.at[:, :, 3].set(
                    jnp.where(suppress[:, None], 0.0, out[:, :, 3])
                )

            return run

        model._det_runner = fake_det_runner
        model._kp_runner = fake_kp_runner
        return model

    mesh = make_mesh(devices=jax.devices()[:1])
    model = make_model()
    results = MultiClipRunner(model, mesh=mesh).run(
        clips, fps=8, num_homography=1, num_keypoint_detection=2
    )
    assert len(results) == 2 and [len(r) for r in results] == lens

    for ci in range(2):
        single = make_model().get_coordinates(
            clips[ci], 8, num_homography=1, num_keypoint_detection=2, verbose=False
        )
        multi = results[ci]
        assert set(multi) == set(single)
        for t in multi:
            ms, ss = multi[t], single[t]
            assert ms["Time"] == ss["Time"]
            assert ms["Keypoints"] == ss["Keypoints"]
            assert ms["Boundaries"] == ss["Boundaries"]
            for cls_name, items in ss["Coordinates"].items():
                got = ms["Coordinates"][cls_name]
                assert set(got) == set(items)
                for oid, item in items.items():
                    assert got[oid]["BBox"] == item["BBox"]
                    assert got[oid]["Transformed_Coordinates"] == item["Transformed_Coordinates"]

    # clip 1's opening frames recovered keypoints via per-clip seeding
    assert len(results[1][0]["Keypoints"]) >= 4


@pytest.mark.parametrize("n_dev", [1, None])  # 1 = flattened path; None = all devices (sharded)
def test_multiclip_pad_frames_never_seed(n_dev):
    """Pad frames (short clips repeated to L) must not participate in
    keypoint sampling or first-frame seeding: with clip 1 only 3 frames
    long (single sample t=0, suppressed) the per-clip reference run never
    seeds, so neither multi-clip strategy may either -- even though the
    padded range contains a samplable pad copy (t=4) with full keypoints."""
    import jax
    import jax.numpy as jnp

    from eagle_tpu.parallel.mesh import make_mesh

    L = 8
    lens = [8, 3]
    scene = make_scene(num_frames=1, width=1280, height=720, num_players=0, fps=8, seed=9)
    base = scene.frames[0]

    def stamped(fid):
        f = base.copy()
        f[0:128, 0:128] = 50 + 10 * fid
        return f

    clips = [
        np.stack([stamped(ci * L + t) for t in range(lens[ci])]) for ci in range(2)
    ]

    okp, ovalid = oracle_keypoint_fn(scene)(scene.frames[:1])
    kp_packed = np.concatenate(
        [okp[0], ovalid[0].astype(np.float32)[:, None]], axis=-1
    )

    def make_model():
        model = CoordinateModel(verbose_init=False)
        geom = model._geometry((720, 1280))
        assert geom.enabled

        def decode_fid(x):
            blk = x[:, 12:88, 12:88].astype(jnp.float32).mean(axis=(1, 2, 3))
            return jnp.round((blk - 50.0) / 10.0)

        def fake_det_runner(g, hw):
            @jax.jit
            def run(x):
                fid = decode_fid(x)
                b, d = x.shape[0], 128
                out = jnp.zeros((b, d, 7), jnp.float32)
                bx = jnp.stack(
                    [300.0 + 7.0 * fid, jnp.full_like(fid, 300.0),
                     340.0 + 7.0 * fid, jnp.full_like(fid, 400.0)], -1)
                row = jnp.concatenate(
                    [bx, jnp.full((b, 1), 0.9), jnp.zeros((b, 1)), jnp.ones((b, 1))], -1)
                return out.at[:, 0].set(row)

            return run

        def fake_kp_runner(g, hw):
            kp_const = jnp.asarray(kp_packed)

            def run(batch):
                fid = decode_fid(batch)
                # barren ONLY at clip 1's frame 0; its other frames (and
                # therefore the pad copies of frame 2) carry keypoints
                suppress = fid == float(L)
                out = jnp.tile(kp_const[None], (batch.shape[0], 1, 1))
                return out.at[:, :, 3].set(
                    jnp.where(suppress[:, None], 0.0, out[:, :, 3])
                )

            return run

        model._det_runner = fake_det_runner
        model._kp_runner = fake_kp_runner
        return model

    devices = jax.devices()[:1] if n_dev == 1 else jax.devices()
    mesh = make_mesh(devices=devices)
    results = MultiClipRunner(make_model(), mesh=mesh).run(
        clips, fps=8, num_homography=1, num_keypoint_detection=2
    )
    for ci in range(2):
        single = make_model().get_coordinates(
            clips[ci], 8, num_homography=1, num_keypoint_detection=2, verbose=False
        )
        multi = results[ci]
        assert set(multi) == set(single)
        for t in multi:
            mk, sk = multi[t]["Keypoints"], single[t]["Keypoints"]
            if n_dev == 1:
                # flattened path rides the identical machinery: exact
                assert mk == sk, (ci, t)
            else:
                # sharded path: same labels, flow within transport LSBs
                assert set(mk) == set(sk), (ci, t)
                for k in mk:
                    assert abs(mk[k][0] - sk[k][0]) <= 2, (ci, t, k)
                    assert abs(mk[k][1] - sk[k][1]) <= 2, (ci, t, k)
    # sanity: the scenario actually has a barren clip-1 opening (no seeding)
    assert len(results[1][0]["Keypoints"]) == 0


def test_multiclip_flattened_chunk_crossing_matches_single():
    """Flattened path where clips straddle scan-chunk boundaries
    (chunk_frames=32 < C*L=48): the carry checkpoint crosses a chunk edge
    mid-clip and the clip-boundary reset fires mid-chunk.  Results must
    still be exactly per-clip."""
    import jax
    import jax.numpy as jnp

    from eagle_tpu.parallel.mesh import make_mesh

    L = 24
    scene = make_scene(num_frames=1, width=1280, height=720, num_players=0, fps=8, seed=7)
    base = scene.frames[0]

    def stamped(fid):
        f = base.copy()
        f[0:128, 0:128] = 50 + 10 * (fid % 20)
        return f

    clips = [np.stack([stamped(ci * L + t) for t in range(L)]) for ci in range(2)]

    okp, ovalid = oracle_keypoint_fn(scene)(scene.frames[:1])
    kp_packed = np.concatenate(
        [okp[0], ovalid[0].astype(np.float32)[:, None]], axis=-1
    )

    def make_model():
        model = CoordinateModel(verbose_init=False)
        model.config = model.config.replace(chunk_frames=32)
        geom = model._geometry((720, 1280))
        assert geom.enabled

        def fake_det_runner(g, hw):
            @jax.jit
            def run(x):
                blk = x[:, 12:88, 12:88].astype(jnp.float32).mean(axis=(1, 2, 3))
                fid = jnp.round((blk - 50.0) / 10.0)
                b, d = x.shape[0], 128
                out = jnp.zeros((b, d, 7), jnp.float32)
                bx = jnp.stack(
                    [300.0 + 7.0 * fid, jnp.full_like(fid, 300.0),
                     340.0 + 7.0 * fid, jnp.full_like(fid, 400.0)], -1)
                row = jnp.concatenate(
                    [bx, jnp.full((b, 1), 0.9), jnp.zeros((b, 1)), jnp.ones((b, 1))], -1)
                return out.at[:, 0].set(row)

            return run

        def fake_kp_runner(g, hw):
            def run(batch):
                return jnp.tile(jnp.asarray(kp_packed)[None], (batch.shape[0], 1, 1))

            return run

        model._det_runner = fake_det_runner
        model._kp_runner = fake_kp_runner
        return model

    mesh = make_mesh(devices=jax.devices()[:1])
    results = MultiClipRunner(make_model(), mesh=mesh).run(
        clips, fps=8, num_homography=1, num_keypoint_detection=2
    )
    for ci in range(2):
        single = make_model().get_coordinates(
            clips[ci], 8, num_homography=1, num_keypoint_detection=2, verbose=False
        )
        multi = results[ci]
        assert set(multi) == set(single)
        for t in multi:
            assert multi[t]["Keypoints"] == single[t]["Keypoints"]
            for cls_name, items in single[t]["Coordinates"].items():
                got = multi[t]["Coordinates"][cls_name]
                assert set(got) == set(items)
                for oid, item in items.items():
                    assert got[oid]["BBox"] == item["BBox"]
                    assert got[oid]["Transformed_Coordinates"] == item["Transformed_Coordinates"]
