"""Test configuration: force an 8-device CPU platform so every mesh /
shard_map / collective path is exercised without real TPU hardware
(SURVEY.md section 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's sitecustomize may have already imported jax with a TPU
# plugin registered; the config update takes precedence either way.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled-program caches at every module boundary.

    The suite compiles hundreds of XLA:CPU programs across ~35 modules in
    one process; with that state accumulated, a shard_map trace deep into
    the run has been observed to segfault inside the runtime
    (test_timeshard at ~75%, flaky — the same module passes in
    isolation).  Live jitted callables simply retrace on next use, and
    within-module caching (where nearly all reuse lives) is unaffected.
    """
    jax.clear_caches()
    yield


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def scene():
    from eagle_tpu.utils.synthetic import make_scene

    return make_scene(num_frames=24, width=960, height=540, num_players=8, fps=24, seed=3)
