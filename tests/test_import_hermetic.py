"""Importing the package must never initialize a JAX backend.

A module-level ``jnp.asarray`` (device_put) anywhere in the import graph
would connect to the configured platform at import time -- which hangs the
CLI outright when the TPU is unreachable and steals the caller's chance to
pick a platform first.  Constants that feed jitted code stay host numpy
(they are baked into the programs at trace time)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import importlib, pkgutil
import eagle_tpu
import main  # the CLI import graph (models, pipeline, processor, render)
for m in pkgutil.walk_packages(eagle_tpu.__path__, "eagle_tpu."):
    if m.name.rsplit(".", 1)[-1].startswith("_"):  # ctypes .so libraries (_lapjv, _prescale)
        continue
    importlib.import_module(m.name)
import jax._src.xla_bridge as xb
assert not xb._backends, f"import initialized backends: {list(xb._backends)}"
print("hermetic")
"""


def test_package_import_initializes_no_backend():
    r = subprocess.run(
        [sys.executable, "-c", _PROBE],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
        timeout=240,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "hermetic" in r.stdout
