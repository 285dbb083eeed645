"""Torch checkpoint -> JAX parameter-pytree converters.

The reference ships torch weights (keypoints_main.pth for HRNet,
detector_*.pt for YOLO -- coordinate_model.py:54-59).  These converters map
torch state_dicts onto the functional parameter trees used by
:mod:`eagle_tpu.models`, transposing conv kernels OIHW -> HWIO for the
TPU-native NHWC layout.  They accept plain numpy arrays or torch tensors,
so torch is only required when actually loading a .pth file.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from eagle_tpu.models.hrnet import STAGE2, STAGE3, STAGE4


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _conv_w(sd: Mapping[str, Any], name: str) -> np.ndarray:
    """OIHW torch conv weight -> HWIO."""
    return _np(sd[name]).transpose(2, 3, 1, 0)


def _bn(sd: Mapping[str, Any], prefix: str) -> dict:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }


def _conv_bn(sd: Mapping[str, Any], conv: str, bn: str) -> dict:
    return {"w": _conv_w(sd, f"{conv}.weight"), "bn": _bn(sd, bn)}


def hrnet_from_torch(state_dict: Mapping[str, Any]) -> dict:
    """Convert a reference KeypointModel state_dict (torch names under
    'unnormalized_model.0' for the backbone and 'unnormalized_model.1' for
    the head -- keypoint_hrnet.py:549-563) into the pytree consumed by
    :func:`eagle_tpu.models.hrnet.apply`."""
    sd = state_dict
    B = "unnormalized_model.0"

    params: dict = {}
    params["stem"] = {
        "conv1": _conv_bn(sd, f"{B}.conv1", f"{B}.bn1"),
        "conv2": _conv_bn(sd, f"{B}.conv2", f"{B}.bn2"),
    }

    layer1 = []
    for k in range(4):
        p = {
            "conv1": _conv_bn(sd, f"{B}.layer1.{k}.conv1", f"{B}.layer1.{k}.bn1"),
            "conv2": _conv_bn(sd, f"{B}.layer1.{k}.conv2", f"{B}.layer1.{k}.bn2"),
            "conv3": _conv_bn(sd, f"{B}.layer1.{k}.conv3", f"{B}.layer1.{k}.bn3"),
        }
        if f"{B}.layer1.{k}.downsample.0.weight" in sd:
            p["down"] = _conv_bn(sd, f"{B}.layer1.{k}.downsample.0", f"{B}.layer1.{k}.downsample.1")
        layer1.append(p)
    params["layer1"] = layer1

    params["transition1"] = [
        _conv_bn(sd, f"{B}.transition1.0.0", f"{B}.transition1.0.1"),
        [_conv_bn(sd, f"{B}.transition1.1.0.0", f"{B}.transition1.1.0.1")],
    ]
    params["transition2"] = [
        None,
        None,
        [_conv_bn(sd, f"{B}.transition2.2.0.0", f"{B}.transition2.2.0.1")],
    ]
    params["transition3"] = [
        None,
        None,
        None,
        [_conv_bn(sd, f"{B}.transition3.3.0.0", f"{B}.transition3.3.0.1")],
    ]

    for stage, (num_modules, num_branches, num_blocks, _ch) in (
        ("stage2", STAGE2),
        ("stage3", STAGE3),
        ("stage4", STAGE4),
    ):
        modules = []
        for m in range(num_modules):
            S = f"{B}.{stage}.{m}"
            branches = []
            for b in range(num_branches):
                blocks = []
                for k in range(num_blocks):
                    blocks.append(
                        {
                            "conv1": _conv_bn(sd, f"{S}.branches.{b}.{k}.conv1", f"{S}.branches.{b}.{k}.bn1"),
                            "conv2": _conv_bn(sd, f"{S}.branches.{b}.{k}.conv2", f"{S}.branches.{b}.{k}.bn2"),
                        }
                    )
                branches.append(blocks)
            multi_scale = not (stage == "stage4" and m == num_modules - 1)
            n_out = num_branches if multi_scale else 1
            fuse = []
            for i in range(n_out):
                row = []
                for j in range(num_branches):
                    F = f"{S}.fuse_layers.{i}.{j}"
                    if i == j:
                        row.append(None)
                    elif j > i:
                        row.append(_conv_bn(sd, f"{F}.0", f"{F}.1"))
                    else:
                        chain = [
                            _conv_bn(sd, f"{F}.{k}.0", f"{F}.{k}.1") for k in range(i - j)
                        ]
                        row.append(chain)
                fuse.append(row)
            modules.append({"branches": branches, "fuse": fuse})
        params[stage] = modules

    params["head"] = {
        "w": _conv_w(sd, "unnormalized_model.1.weight"),
        "b": _np(sd["unnormalized_model.1.bias"]),
    }
    return params


def load_hrnet_checkpoint(path: str) -> dict:
    """Load a .pth HRNet checkpoint from disk (requires torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return hrnet_from_torch(sd)
