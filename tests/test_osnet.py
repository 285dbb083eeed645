"""OSNet ReID model: structure, embedding contract, tracker-slot wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_tpu.models import osnet


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def test_param_count_matches_paper():
    """OSNet x1.0 is published at ~2.2M backbone parameters."""
    p10 = osnet.init_params(jax.random.key(0), variant="x1_0")
    assert abs(_count(p10) / 1e6 - 2.2) < 0.4, _count(p10) / 1e6
    p025 = osnet.init_params(jax.random.key(0), variant="x0_25")
    assert _count(p025) < _count(p10) / 5


def test_forward_embedding():
    params = osnet.init_params(jax.random.key(1), variant="x0_25")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 256, 128, 3)).astype(np.float32))
    e = osnet.apply(params, x)
    assert e.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(e), axis=-1), 1.0, atol=1e-5)


def test_forward_parity_with_torch():
    """The JAX forward must match the torch transcription of the torchreid
    OSNet graph (tests/torch_graphs.py): random torchreid-layout
    state_dict -> osnet_from_torch -> identical L2-normalized embeddings
    (reference consumption site coordinate_model.py:69 via boxmot)."""
    import torch

    from .torch_graphs import OSNetTorch, randomize_

    tm = randomize_(OSNetTorch(variant="x0_25"), seed=5)
    params = osnet.osnet_from_torch(tm.state_dict())

    rng = np.random.default_rng(5)
    x = rng.normal(size=(3, 256, 128, 3)).astype(np.float32)
    with torch.no_grad():
        te = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    je = np.asarray(osnet.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(je, te, atol=1e-4)


def test_reid_embedding_fn_slots_into_tracker():
    params = osnet.init_params(jax.random.key(2), variant="x0_25")
    fn = osnet.reid_embedding_fn(params, use_bf16=False)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (2, 270, 480, 3), dtype=np.uint8))
    boxes = jnp.asarray(np.array([[10, 10, 60, 150], [100, 20, 150, 160]], np.float32))
    emb = fn(frames, jnp.asarray([0, 1], jnp.int32), boxes)
    assert emb.shape == (2, 512)
    # similar crops embed closer than dissimilar ones
    same = fn(frames, jnp.asarray([0, 0], jnp.int32), jnp.stack([boxes[0], boxes[0] + 1.0]))
    assert float(same[0] @ same[1]) > float(emb[0] @ emb[1])
