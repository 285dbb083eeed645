"""drain_together: one flattened D2H serving several device arrays."""

import jax.numpy as jnp
import numpy as np

from eagle_tpu.pipeline.transfer import drain_together


def test_drain_together_roundtrips_shapes_and_values(rng):
    a = rng.random((3, 57, 4)).astype(np.float32)
    b = rng.random((6, 128, 7)).astype(np.float32)
    c = rng.random((5,)).astype(np.float32)
    out = drain_together(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    assert [o.shape for o in out] == [a.shape, b.shape, c.shape]
    np.testing.assert_array_equal(out[0], a)
    np.testing.assert_array_equal(out[1], b)
    np.testing.assert_array_equal(out[2], c)
