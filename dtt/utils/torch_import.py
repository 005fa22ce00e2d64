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


def ps_channel_perm(k: int, d: int) -> np.ndarray:
    """Index permutation Caffe ps layout -> dtt bin-major layout.

    perm[dst] = src with src = (dd*k + ph)*k + pw, dst = (ph*k + pw)*d + dd;
    apply as x[..., perm].
    """
    perm = np.empty(k * k * d, np.int64)
    for dd in range(d):
        for ph in range(k):
            for pw in range(k):
                perm[(ph * k + pw) * d + dd] = (dd * k + ph) * k + pw
    return perm


def permute_ps_channels(w: np.ndarray, k: int, d: int) -> np.ndarray:
    """Permute a 1x1 ps-conv kernel's output channels Caffe -> dtt layout.

    w: flax-layout kernel (1, 1, I, k*k*d) whose outputs are ordered
    c_caffe = (dd*k + ph)*k + pw; returns outputs ordered
    c_dtt = (ph*k + pw)*d + dd.
    """
    return w[..., ps_channel_perm(k, d)]


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

    def fill_block(blk, tp):
        for ci in (1, 2, 3):
            blk[f"conv{ci}"]["kernel"] = conv_to_flax(
                take(f"{tp}.conv{ci}.weight"))
            set_bn(blk[f"bn{ci}"], f"{tp}.bn{ci}")
        if "downsample_conv" in blk:
            blk["downsample_conv"]["kernel"] = conv_to_flax(
                take(f"{tp}.downsample.0.weight"))
            set_bn(blk["downsample_bn"], f"{tp}.downsample.1")

    for li in range(1, 5):
        layer_name = f"layer{li}"
        if layer_name not in bk:
            continue
        layer = bk[layer_name]
        if "blocks" in layer:
            # scan_blocks layout: block0 + params of blocks 1..N-1 stacked
            # along a leading scan axis (dtt.models.resnet ResNetStage.scan)
            fill_block(layer["block0"], f"{layer_name}.0")
            stacked = layer["blocks"]["block"]
            n_rest = next(iter(stacked["conv1"].values())).shape[0]
            rows = []
            for bi in range(1, n_rest + 1):
                blk = {m: {"kernel": None} for m in ("conv1", "conv2", "conv3")}
                for m in ("bn1", "bn2", "bn3"):
                    blk[m] = {}
                fill_block(blk, f"{layer_name}.{bi}")
                rows.append(blk)

            def stack(*path):
                leaf = stacked
                for p in path[:-1]:
                    leaf = leaf[p]
                vals = [r[path[0]][path[1]] for r in rows]
                leaf[path[-1]] = np.stack(vals, axis=0)

            for m in ("conv1", "conv2", "conv3"):
                stack(m, "kernel")
            for m in ("bn1", "bn2", "bn3"):
                stack(m, "scale")
                stack(m, "bias")
        else:
            blocks = sorted(layer.keys(),
                            key=lambda s: int(s.replace("block", "")))
            for bi, bname in enumerate(blocks):
                fill_block(layer[bname], f"{layer_name}.{bi}")

    if strict:
        unused = {k for k in sd if not k.startswith("fc.")} - used
        if unused:
            raise KeyError(f"unconsumed torch keys: {sorted(unused)[:8]}...")
    return out


# ---------------------------------------------------------------------------
# Full D&T checkpoint import (ref: trainval_net.py torch.save of the model
# state_dict; module naming follows the jwyang-lineage `_init_modules`
# conventions — RCNN_rpn.RPN_Conv / RPN_cls_score / RPN_bbox_pred, the
# RCNN_base/RCNN_top Sequential backbone, and the R-FCN head convs. The
# reference mount was empty when this was written, so each dtt parameter
# accepts several candidate reference names; extend NAME_CANDIDATES if the
# real checkpoint uses different ones.)
# ---------------------------------------------------------------------------

# dtt param path -> candidate torch module names (first present wins)
NAME_CANDIDATES = {
    "rpn/conv": ("RCNN_rpn.RPN_Conv", "rpn.RPN_Conv", "RPN_Conv"),
    "rpn/cls_score": ("RCNN_rpn.RPN_cls_score", "rpn.RPN_cls_score",
                      "RPN_cls_score"),
    "rpn/bbox_pred": ("RCNN_rpn.RPN_bbox_pred", "rpn.RPN_bbox_pred",
                      "RPN_bbox_pred"),
    "reduce": ("RCNN_conv_new", "conv_new_1", "RCNN_conv_1x1", "conv_new"),
    "cls_maps": ("RCNN_cls_base", "rfcn_cls", "RCNN_cls_score_net",
                 "cls_score_net"),
    "bbox_maps": ("RCNN_bbox_base", "rfcn_bbox", "RCNN_bbox_pred_net",
                  "bbox_pred_net"),
    "track_maps": ("RCNN_tracking", "rfcn_tracking", "tracking_pred",
                   "RCNN_tracking_base"),
}

# torchvision sequential-wrapper backbone naming of the jwyang lineage:
# RCNN_base = Sequential(conv1, bn1, relu, maxpool, layer1, layer2, layer3),
# RCNN_top = Sequential(layer4)
_RCNN_BASE_MAP = {"RCNN_base.0": "conv1", "RCNN_base.1": "bn1",
                  "RCNN_base.4": "layer1", "RCNN_base.5": "layer2",
                  "RCNN_base.6": "layer3", "RCNN_top.0": "layer4"}


def normalize_backbone_keys(sd: Dict) -> Dict:
    """Rewrite RCNN_base.N / RCNN_top.N sequential names to torchvision names."""
    out = {}
    for k, v in sd.items():
        for pre, sub in _RCNN_BASE_MAP.items():
            if k.startswith(pre + "."):
                k = sub + k[len(pre):]
                break
        out[k] = v
    return out


def _rpn_cls_perm(num_anchors: int) -> np.ndarray:
    """Torch RPN cls channels are class-major (bg anchors..., fg anchors...)
    — the jwyang reshape-to-(2, A*H, W) softmax layout; dtt reshapes
    (H, W, 2A) to (HWA, 2), i.e. anchor-major. dst a*2+s <- src s*A+a."""
    a = num_anchors
    perm = np.empty(2 * a, np.int64)
    for s in range(2):
        for i in range(a):
            perm[i * 2 + s] = s * a + i
    return perm


def import_full_checkpoint(state_dict: Dict, params: Dict, cfg,
                           strict: bool = True) -> Dict:
    """Pour a complete reference D&T state_dict into a dtt parameter tree.

    Maps backbone + RPN + reduce ("conv new") + position-sensitive cls/bbox
    convs + tracking conv, applying the layout conversions:
    * conv kernels (O, I, kh, kw) -> (kh, kw, I, O)
    * BN -> FrozenAffine folding
    * ps-conv output channels Caffe (d, ph, pw) -> dtt bin-major (ph, pw, d)
    * RPN cls channels class-major -> anchor-major

    Args:
      state_dict: flat torch-name -> tensor mapping (see load_pth).
      params: dtt variables dict from DnT.init.
      cfg: the ModelConfig the params were built with (channel layouts).
    Returns a new params dict. With strict=True, unknown head keys raise.
    """
    sd = normalize_backbone_keys(
        {k: _to_np(v) for k, v in state_dict.items()
         if not k.endswith("num_batches_tracked")})

    backbone_sd = {k: v for k, v in sd.items()
                   if k.split(".")[0] in
                   ("conv1", "bn1", "layer1", "layer2", "layer3", "layer4")}
    out = import_resnet_backbone(backbone_sd, params, strict=strict)
    root = out["params"]

    used = set(backbone_sd)

    def find(slot):
        for cand in NAME_CANDIDATES[slot]:
            if cand + ".weight" in sd:
                return cand
        if strict:
            raise KeyError(f"no reference weights found for {slot!r} "
                           f"(tried {NAME_CANDIDATES[slot]})")
        return None

    def put(dst: Dict, name: str, out_perm: np.ndarray | None = None):
        w = conv_to_flax(sd[name + ".weight"])
        b = sd[name + ".bias"]
        used.update({name + ".weight", name + ".bias"})
        # shape check BEFORE any permutation: a fancy-index with a short perm
        # would silently truncate a mismatched channel count
        if w.shape != tuple(dst["kernel"].shape):
            raise ValueError(f"{name}: kernel shape {w.shape} != dtt "
                             f"{tuple(dst['kernel'].shape)}")
        if out_perm is not None:
            w = w[..., out_perm]
            b = b[out_perm]
        dst["kernel"], dst["bias"] = w, b

    k = cfg.roi.ps_grid
    nb = 2 if cfg.roi.class_agnostic else cfg.num_classes
    ps = cfg.roi.pooling_mode == "psroi"

    def ps_perm(d):
        if not ps:
            return None  # single channel group: no bin-major permutation
        return ps_channel_perm(k, d)

    name = find("rpn/conv")
    if name:
        put(root["rpn"]["conv"], name)
    name = find("rpn/cls_score")
    if name:
        put(root["rpn"]["cls_score"], name,
            _rpn_cls_perm(cfg.anchors.num_anchors))
    name = find("rpn/bbox_pred")
    if name:  # torch layout a*4+coord == dtt layout: no permutation
        put(root["rpn"]["bbox_pred"], name)
    name = find("reduce")
    if name:
        put(root["reduce"], name)
    name = find("cls_maps")
    if name:
        put(root["cls_maps"], name, ps_perm(cfg.num_classes))
    name = find("bbox_maps")
    if name:
        put(root["bbox_maps"], name, ps_perm(4 * nb))
    name = find("track_maps")
    if name:
        put(root["track_maps"], name, ps_perm(4))

    if strict:
        unused = {key for key in sd if not key.startswith("fc.")} - used
        if unused:
            raise KeyError(f"unconsumed reference keys: {sorted(unused)[:8]}...")
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
