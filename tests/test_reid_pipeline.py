"""Pipeline-level OSNet ReID parity (VERDICT r3 #1 done-criterion).

The reference constructs BotSort with OSNet-x0.25 ReID
(/root/reference/eagle/models/coordinate_model.py:68-72; boxmot's
with_reid defaults on), so its association fuses appearance.  These tests
pin eagle-tpu's production wiring of the same path: get_coordinates with
``TrackerConfig(use_appearance=True, embedder="osnet")`` computes OSNet
embeddings inside the detector program and the resulting track
ids/boxes must equal the boxmot-15.0.2 oracle fed the SAME detections
and the SAME OSNet embeddings.
"""

import jax.numpy as jnp
import numpy as np

from eagle_tpu.config import PipelineConfig, TrackerConfig
from eagle_tpu.pipeline.coordinate_model import PIECE, CoordinateModel
from eagle_tpu.utils.synthetic import make_scene

from .boxmot_oracle import BotSortOracle
from .oracles import oracle_detector_fn, oracle_keypoint_fn

D_SLOTS = 16
EMB = 32
CONF_FLOOR = 0.35


def _reid_config():
    from eagle_tpu.config import DetectorConfig

    base = PipelineConfig()
    return base.replace(
        # f32: the CPU backend compiles bf16 convs ~6x slower (42.7 vs
        # 7.1 s measured for the OSNet graph); the wiring under test is
        # dtype-independent
        detector=DetectorConfig(use_bf16=False),
        tracker=TrackerConfig(
            max_tracks=16,
            use_appearance=True,
            embedder="osnet",
            embed_dim=EMB,
            reid_slots=8,
            gmc="off",
            assignment="exact",
        ),
        chunk_frames=16,
    )


def _pipeline_tracks(res, n_frames):
    """{frame: {track_id: (bbox_int, conf)}} for Player/Goalkeeper."""
    out = []
    for t in range(n_frames):
        rows = {}
        for cls_name in ("Player", "Goalkeeper"):
            for tid, obj in res[t]["Coordinates"].get(cls_name, {}).items():
                rows[int(tid)] = (np.asarray(obj["BBox"]), float(obj["Confidence"]))
        out.append(rows)
    return out


def test_pipeline_osnet_association_matches_boxmot_oracle(scene=None):
    scene = make_scene(num_frames=12, width=480, height=270, num_players=6, fps=12, seed=4)
    n = len(scene.frames)
    img_hw = scene.frames.shape[1:3]
    cfg = _reid_config()

    model = CoordinateModel(
        keypoint_fn=oracle_keypoint_fn(scene),
        detector_fn=oracle_detector_fn(scene, max_det=D_SLOTS),
        config=cfg,
        verbose_init=False,
    )
    assert model._reid_params is not None, "osnet embedder must be constructed"
    res = model.get_coordinates(scene.frames, 12, num_keypoint_detection=12, verbose=False)
    ours = _pipeline_tracks(res, n)

    # ---- reproduce the EXACT embedding inputs the pipeline used: the
    # custom-detector path embeds each padded piece with _embed_runner on
    # the original frames + oracle boxes (coordinate_model.py phase A)
    det_fn = oracle_detector_fn(scene, max_det=D_SLOTS)
    frames = np.asarray(scene.frames)
    per_frame = {}
    for j in range(-(-n // PIECE)):
        idx = list(range(j * PIECE, min((j + 1) * PIECE, n)))
        pad_idx = idx + [idx[-1]] * (PIECE - len(idx))
        batch = frames[pad_idx]
        b, s, c, v = (np.asarray(a) for a in det_fn(batch))
        emb = np.asarray(
            model._embed_runner((int(img_hw[0]), int(img_hw[1])))(
                jnp.asarray(batch), jnp.asarray(b.astype(np.float32))
            )
        )
        for k, t in enumerate(idx):
            rows = np.flatnonzero(v[k])
            # every valid detection must occupy a SLOT INDEX inside the
            # embedded range (the oracle front-compacts valid rows — the
            # contract _embed_runner documents for custom detectors);
            # otherwise the pipeline would feed it a zero embedding and
            # this test would silently stop exercising ReID for it
            assert rows.max(initial=-1) < cfg.tracker.reid_slots
            dets = np.concatenate(
                [b[k, rows], s[k, rows, None], c[k, rows, None].astype(np.float32)],
                axis=-1,
            )
            per_frame[t] = (dets, emb[k, rows])

    # ---- boxmot oracle on the same detections + same OSNet embeddings
    oracle = BotSortOracle(with_reid=True)
    theirs = []
    for t in range(n):
        dets, embs = per_frame[t]
        out = oracle.update(dets, embs=embs)
        rows = {}
        for row in out:
            if int(row[6]) in (0, 1) and row[5] >= CONF_FLOOR:
                rows[int(row[4])] = (row[:4], float(row[5]))
        theirs.append(rows)

    for t in range(n):
        assert set(ours[t]) == set(theirs[t]), (
            f"frame {t}: ids {sorted(ours[t])} != {sorted(theirs[t])}"
        )
        for tid, (box_o, conf_o) in theirs[t].items():
            box_p, conf_p = ours[t][tid]
            np.testing.assert_allclose(conf_p, conf_o, atol=1e-5)
            # pipeline boxes are clipped + int-truncated f32; oracle f64
            clip_hi = [img_hw[1] - 1, img_hw[0] - 1, img_hw[1] - 1, img_hw[0] - 1]
            box_oi = np.clip(box_o, 0, clip_hi).astype(int)
            assert (np.abs(box_p - box_oi) <= 1).all(), f"frame {t} id {tid}"


def test_builtin_detector_osnet_shards_over_mesh():
    """The GSPMD claim in models/osnet.py::embed_boxes: the crop resample
    (per-frame interpolation matmuls) and the OSNet forward partition over
    the frame axis with no cross-shard traffic, so running the SAME jitted
    detector program on a mesh-sharded batch must reproduce the
    single-device packed output — embedding columns included."""
    import jax

    from eagle_tpu.config import DetectorConfig, KeypointConfig
    from eagle_tpu.parallel.mesh import make_mesh, shard_batch

    cfg = PipelineConfig().replace(
        detector=DetectorConfig(
            variant="medium", image_size=96, max_detections=16, nms_pre_topk=64, use_bf16=False
        ),
        keypoint=KeypointConfig(input_hw=(72, 96)),
        tracker=TrackerConfig(
            max_tracks=16, use_appearance=True, embedder="osnet", embed_dim=EMB, reid_slots=4
        ),
    )
    model = CoordinateModel(config=cfg, verbose_init=False)
    geom = model._geometry((96, 128))
    assert geom.enabled
    runner = model._det_runner(geom, (96, 128))

    rng = np.random.default_rng(3)
    x = rng.integers(0, 255, (8, geom.canvas_h, geom.canvas_w, 3), dtype=np.uint8)

    single = np.asarray(runner(jax.device_put(x, jax.devices()[0])))
    mesh = make_mesh()
    assert len(mesh.devices.flat) == 8, "tests force the 8-device mesh"
    sharded = np.asarray(runner(shard_batch(x, mesh)))
    assert single.shape == (8, 16, 7 + EMB)
    np.testing.assert_allclose(sharded, single, atol=1e-5)
    # the embedding columns are live (unit-norm), not zeros
    norms = np.linalg.norm(single[..., 7:][:, :4], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_builtin_detector_packs_osnet_embeddings():
    """The built-in detector program appends (D, embed_dim) OSNet
    embeddings; the first reid_slots rows are unit-norm, later rows are
    zero (gate-miss semantics)."""
    from eagle_tpu.config import DetectorConfig, KeypointConfig

    cfg = PipelineConfig().replace(
        detector=DetectorConfig(
            variant="medium", image_size=96, max_detections=16, nms_pre_topk=64, use_bf16=False
        ),
        keypoint=KeypointConfig(input_hw=(72, 96)),
        tracker=TrackerConfig(max_tracks=16, use_appearance=True, embed_dim=EMB, reid_slots=4),
    )
    model = CoordinateModel(config=cfg, verbose_init=False)
    geom = model._geometry((96, 128))
    assert geom.enabled
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (2, geom.canvas_h, geom.canvas_w, 3), dtype=np.uint8)
    packed = np.asarray(model._det_runner(geom, (96, 128))(jnp.asarray(x)))
    assert packed.shape == (2, 16, 7 + EMB)
    emb = packed[..., 7:]
    norms = np.linalg.norm(emb, axis=-1)
    np.testing.assert_allclose(norms[:, :4], 1.0, atol=1e-3)
    assert (emb[:, 4:] == 0).all()
