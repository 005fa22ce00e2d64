"""Data-dependent frozen-BN calibration (LSUV-style).

The backbone's BatchNorms are frozen per-channel affines
(dtt.models.resnet.FrozenAffine): with an ImageNet-pretrained checkpoint
they carry folded running statistics, but at random init they are identity,
so a deep backbone has no normalization at all and cannot train from
scratch (observed: flagship-config loss plateaus). The reference sidesteps
this by always loading pretrained torchvision weights whose BN running
stats it freezes (ref: trainval_net.py / resnet_atrous.py `_init_modules`).

This module is the rebuild's no-checkpoint substitute: estimate the missing
statistics from data. Each affine, in topological order, is rescaled so its
output over a calibration batch has zero mean / unit variance per channel —
exactly what folding true BN running stats would produce. Downstream
affines see already-calibrated upstream activations, so one sequential
sweep suffices (LSUV: Mishkin & Matas, "All you need is a good init",
ICLR 2016). Used by the synthetic-accuracy evidence runs
(tools/run_mid_synth.py) and `train.py --calibrate-bn`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dtt.models.resnet import FrozenAffine, ResNetBackbone


def _affine_paths(params: dict, prefix=()) -> list[tuple[str, ...]]:
    """Paths of every FrozenAffine param subtree ({"scale", "bias"} leaves)."""
    out = []
    for k, v in params.items():
        if isinstance(v, dict):
            if set(v.keys()) == {"scale", "bias"}:
                out.append(prefix + (k,))
            else:
                out.extend(_affine_paths(v, prefix + (k,)))
    return out


def _order_key(path: tuple[str, ...]):
    """Topological order: stem, then (layer, block, bn-position).

    bn3 and downsample_bn are parallel branches of the same block and share
    a rank, so they are calibrated from the same forward pass.
    """
    if path == ("bn1",):
        return (0, 0, 0)
    layer = int(path[0].removeprefix("layer"))
    block = int(path[1].removeprefix("block"))
    bn = {"bn1": 0, "bn2": 1, "bn3": 2, "downsample_bn": 2}[path[2]]
    return (layer, block, bn)


def affine_groups(params: dict) -> list[list[tuple[str, ...]]]:
    """Affine paths grouped by topological rank (same rank = same forward)."""
    paths = sorted(_affine_paths(params), key=_order_key)
    groups: list[list[tuple[str, ...]]] = []
    last = None
    for p in paths:
        k = _order_key(p)
        if k != last:
            groups.append([])
            last = k
        groups[-1].append(p)
    return groups


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    """Functional nested-dict update (params trees are plain dicts)."""
    if not path:
        return value
    new = dict(tree)
    new[path[0]] = _set(tree[path[0]], path[1:], value)
    return new


def calibrate_backbone(backbone: ResNetBackbone, params: dict,
                       images: jnp.ndarray, eps: float = 1e-5) -> dict:
    """Return backbone params with every FrozenAffine set so its output over
    `images` (B, H, W, 3, mean-subtracted) is ~N(0, 1) per channel."""
    if any("blocks" in (params.get(f"layer{i}") or {}) for i in range(1, 5)):
        raise ValueError(
            "calibrate_backbone does not support scan_blocks param layout "
            "(calibration is a from-scratch tool; scanned backbones are for "
            "pretrained production configs) — set model.scan_blocks=false")
    filt = lambda mdl, method: isinstance(mdl, FrozenAffine)

    @jax.jit
    def stats_fn(p):
        _, st = backbone.apply({"params": p}, images,
                               capture_intermediates=filt,
                               mutable=["intermediates"])
        out = {}

        def walk(tree, path):
            if "__call__" in tree:
                y = tree["__call__"][0].astype(jnp.float32)
                axes = tuple(range(y.ndim - 1))
                out[path] = (jnp.mean(y, axes), jnp.var(y, axes))
            else:
                for k, v in tree.items():
                    walk(v, path + (k,))

        walk(st["intermediates"], ())
        return out

    for group in affine_groups(params):
        stats = jax.device_get(stats_fn(params))
        for path in group:
            mean, var = stats[path]
            std = jnp.sqrt(jnp.asarray(var) + eps)
            leaf = _get(params, path)
            # affine y = x*s + b  ->  (y - mean)/std
            params = _set(params, path, {
                "scale": (leaf["scale"] / std).astype(leaf["scale"].dtype),
                "bias": ((leaf["bias"] - mean) / std).astype(leaf["bias"].dtype),
            })
    return params


def calibrate_model_backbone(cfg, params, pair_images: jnp.ndarray) -> dict:
    """Calibrate the backbone inside a full DnT params tree.

    `pair_images`: (B, 2, H, W, 3) mean-subtracted frame pairs (one training
    batch); both frames are used as calibration samples.
    """
    from dtt.models.dnt import _BACKBONES
    m = cfg.model
    backbone = ResNetBackbone(_BACKBONES[m.backbone],
                              frozen_stages=m.frozen_stages,
                              dtype=jnp.dtype(m.dtype), remat=m.remat)
    images = jnp.asarray(pair_images).reshape(-1, *pair_images.shape[2:])
    inner = params["params"] if "params" in params else params
    new_bb = calibrate_backbone(backbone, inner["backbone"], images)
    new_inner = dict(inner, backbone=new_bb)
    return (dict(params, params=new_inner) if "params" in params
            else new_inner)
