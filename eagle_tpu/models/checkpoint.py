"""Native parameter-pytree persistence.

The reference's checkpoints are torch .pth/.pt files loaded with
torch.load (coordinate_model.py:54-59).  Here converted parameter pytrees
persist as msgpack (flax.serialization), so deployment needs neither torch
nor pickle.  Orbax is also supported for sharded / async checkpoints of
larger trees.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np
from flax import serialization


def save_params(params, path: str) -> str:
    """Serialize a parameter pytree to msgpack.  The tree structure is
    stored alongside (``<path>.tree``) so loading needs no template."""
    params = jax.tree.map(np.asarray, params)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    treedef = jax.tree.structure(params)
    with open(path + ".tree", "wb") as f:
        pickle.dump(treedef, f)
    return path


def load_params(path: str, template=None):
    """Load a parameter pytree.  With a ``template`` pytree the msgpack is
    restored against it; otherwise the stored treedef is used."""
    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        return serialization.from_bytes(template, data)
    with open(path + ".tree", "rb") as f:
        treedef = pickle.load(f)
    template = jax.tree.unflatten(treedef, [0.0] * treedef.num_leaves)
    return serialization.from_bytes(template, data)


def convert_and_save(torch_path: str, out_path: str, kind: str) -> str:
    """One-shot torch checkpoint -> native msgpack conversion.

    kind: "hrnet" (KeypointModel .pth state dict) or "yolov8"
    (ultralytics state dict).
    """
    import torch

    sd = torch.load(torch_path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict) and "model" in sd and hasattr(sd["model"], "state_dict"):
        sd = sd["model"].state_dict()  # ultralytics .pt layout
    if kind == "hrnet":
        from eagle_tpu.models.convert import hrnet_from_torch

        params = hrnet_from_torch(sd)
    elif kind == "yolov8":
        from eagle_tpu.models.yolov8 import yolov8_from_torch

        prefix = "model." if any(k.startswith("model.") for k in sd) else ""
        params = yolov8_from_torch(sd, prefix=prefix)
    else:
        raise ValueError(f"unknown kind: {kind}")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    return save_params(params, out_path)
