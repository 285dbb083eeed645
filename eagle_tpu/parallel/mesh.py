"""Device mesh + sharding helpers.

The reference has no distributed execution at all (SURVEY.md section 2.4);
this layer is the TPU-native scale-out design: a 1-D ``data`` mesh over
ICI shards the frame axis for the stateless stages (preprocess, detector,
keypoint model, NMS) and the clip axis for the temporal scan, with XLA
inserting the collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eagle_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    """1-D ``(data,)`` mesh over ICI, or -- with ``cfg.hosts > 1`` -- a
    hierarchical ``(dcn, data)`` mesh whose outer axis is the host grid.
    Batch shards stay host-major (see :func:`batch_sharding`), so the
    pipeline's data parallelism sends nothing over DCN."""
    devices = list(devices if devices is not None else jax.devices())
    n = cfg.data_parallel or len(devices)
    if cfg.hosts > 1:
        assert n % cfg.hosts == 0, f"{n} devices do not tile {cfg.hosts} hosts"
        # group by owning process so each (dcn) row is one host's devices:
        # jax.devices() is NOT guaranteed process-contiguous on real
        # multi-host slices, and a row that mixes hosts would silently put
        # the data axis on DCN.  Stable sort keeps in-host device order.
        devices = sorted(devices[:n], key=lambda d: getattr(d, "process_index", 0))
        grid = np.array(devices).reshape(cfg.hosts, n // cfg.hosts)
        procs = [{getattr(d, "process_index", 0) for d in row} for row in grid]
        n_procs = len({p for row in procs for p in row})
        assert n_procs == 1 or all(len(p) == 1 for p in procs), (
            f"devices do not tile {cfg.hosts} hosts evenly: rows span processes {procs}"
        )
        return Mesh(grid, (cfg.dcn_axis, cfg.data_axis))
    return Mesh(np.array(devices[:n]), (cfg.data_axis,))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch/frame/clip) axis over EVERY mesh axis
    (host-major on a hierarchical mesh), replicate the rest."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names), *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0) -> tuple[np.ndarray, int]:
    """Pad ``axis`` up to a multiple (edge-repeat) so it shards evenly.
    Returns (padded, original_size)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return np.pad(x, pad, mode="edge"), n


def shard_batch(x, mesh: Mesh):
    """device_put with the leading axis sharded over the mesh."""
    return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))
