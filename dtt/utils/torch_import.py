"""PyTorch checkpoint importer.

Maps torchvision-layout ResNet weights (and, name-map permitting, full
reference D&T checkpoints) into dtt's flax parameter tree for pretrained
initialization and cross-framework numerical parity runs (SURVEY.md §3.5).

Conversions:
* conv kernels: torch (O, I, kh, kw) -> flax (kh, kw, I, O)
* BatchNorm (gamma, beta, mean, var) folds into the FrozenAffine
  (scale, bias): scale = gamma / sqrt(var + eps), bias = beta - mean * scale
* position-sensitive 1x1 conv outputs: the Caffe/reference channel layout
  c = (d*k + ph)*k + pw is permuted to dtt's bin-major c = (ph*k + pw)*D + d
  (see dtt.ops.psroi).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

_BN_EPS = 1e-5


def conv_to_flax(w: np.ndarray) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def fold_bn(gamma, beta, mean, var, eps: float = _BN_EPS):
    scale = gamma / np.sqrt(var + eps)
    bias = beta - mean * scale
    return scale.astype(np.float32), bias.astype(np.float32)


def permute_ps_channels(w: np.ndarray, k: int, d: int) -> np.ndarray:
    """Permute a 1x1 ps-conv kernel's output channels Caffe -> dtt layout.

    w: flax-layout kernel (1, 1, I, k*k*d) whose outputs are ordered
    c_caffe = (dd*k + ph)*k + pw; returns outputs ordered
    c_dtt = (ph*k + pw)*d + dd.
    """
    perm = np.empty(k * k * d, np.int64)
    for dd in range(d):
        for ph in range(k):
            for pw in range(k):
                src = (dd * k + ph) * k + pw
                dst = (ph * k + pw) * d + dd
                perm[dst] = src
    return w[..., perm]


def _to_np(t):
    # torch tensor or array-like -> numpy (no torch import required here)
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      np.float32)


def import_resnet_backbone(state_dict: Dict, params: Dict,
                           strict: bool = True) -> Dict:
    """Pour a torchvision(-style) ResNet state_dict into backbone params.

    `params` is the full flax variables dict from DnT.init (or the backbone's
    own init); returns a new dict with backbone leaves replaced.
    """
    sd = {k: _to_np(v) for k, v in state_dict.items()
          if not k.endswith("num_batches_tracked")}
    import copy
    out = copy.deepcopy(params)
    root = out["params"]
    bk = root["backbone"] if "backbone" in root else root

    used = set()

    def take(name):
        used.add(name)
        if name not in sd:
            raise KeyError(f"missing torch key {name!r}")
        return sd[name]

    def set_bn(dst, prefix):
        scale, bias = fold_bn(take(f"{prefix}.weight"), take(f"{prefix}.bias"),
                              take(f"{prefix}.running_mean"),
                              take(f"{prefix}.running_var"))
        dst["scale"], dst["bias"] = scale, bias

    bk["conv1"]["kernel"] = conv_to_flax(take("conv1.weight"))
    set_bn(bk["bn1"], "bn1")

    for li in range(1, 5):
        layer_name = f"layer{li}"
        if layer_name not in bk:
            continue
        layer = bk[layer_name]
        blocks = sorted(layer.keys(), key=lambda s: int(s.replace("block", "")))
        for bi, bname in enumerate(blocks):
            blk = layer[bname]
            tp = f"{layer_name}.{bi}"
            for ci in (1, 2, 3):
                blk[f"conv{ci}"]["kernel"] = conv_to_flax(
                    take(f"{tp}.conv{ci}.weight"))
                set_bn(blk[f"bn{ci}"], f"{tp}.bn{ci}")
            if "downsample_conv" in blk:
                blk["downsample_conv"]["kernel"] = conv_to_flax(
                    take(f"{tp}.downsample.0.weight"))
                set_bn(blk["downsample_bn"], f"{tp}.downsample.1")

    if strict:
        unused = {k for k in sd if not k.startswith("fc.")} - used
        if unused:
            raise KeyError(f"unconsumed torch keys: {sorted(unused)[:8]}...")
    return out


def load_pth(path: str) -> Dict:
    """torch.load a .pth (weights only) and return its flat state_dict."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    return {k.replace("module.", ""): v for k, v in obj.items()}


def import_pretrained_backbone(pth_path: str, params: Dict) -> Dict:
    """Convenience: .pth file -> params with pretrained backbone."""
    return import_resnet_backbone(load_pth(pth_path), params)
