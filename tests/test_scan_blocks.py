"""scan_blocks backbone: scanned stages match the unrolled ones exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dtt.models.resnet import ResNetBackbone
from dtt.utils.torch_import import conv_to_flax, import_resnet_backbone

LAYERS = (2, 3, 2, 2)


pytestmark = pytest.mark.slow  # compiles production-ish models; run via `pytest -m slow`


def _loop_to_scan(params: dict) -> dict:
    """Re-layout loop params {blockN} -> scan params {block0, blocks.block}."""
    out = {}
    for k, v in params.items():
        if k.startswith("layer") and any(b != "block0" for b in v):
            n = len(v)
            rest = [v[f"block{i}"] for i in range(1, n)]
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *rest)
            out[k] = {"block0": v["block0"], "blocks": {"block": stacked}}
        else:
            out[k] = v
    return out


def test_scan_matches_unrolled(rng):
    x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    loop_bb = ResNetBackbone(LAYERS, frozen_stages=0, dtype=jnp.float32)
    scan_bb = ResNetBackbone(LAYERS, frozen_stages=0, dtype=jnp.float32,
                             scan=True)
    params = loop_bb.init(jax.random.PRNGKey(0), x)["params"]
    scan_params = _loop_to_scan(params)
    # layouts agree with a fresh scan init
    ref_shapes = jax.tree.map(jnp.shape,
                              scan_bb.init(jax.random.PRNGKey(0), x)["params"])
    assert jax.tree.map(jnp.shape, scan_params) == ref_shapes

    outs_l = loop_bb.apply({"params": params}, x)
    outs_s = scan_bb.apply({"params": scan_params}, x)
    # scanned and unrolled convs fuse differently; differences are pure
    # float reassociation (measured ~1e-5 absolute on O(10) activations)
    for a, b in zip(outs_l, outs_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)


def test_scan_remat_gradients_match(rng):
    x = jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32))
    loop_bb = ResNetBackbone(LAYERS, frozen_stages=0, dtype=jnp.float32)
    scan_bb = ResNetBackbone(LAYERS, frozen_stages=0, dtype=jnp.float32,
                             scan=True, remat=True)
    params = loop_bb.init(jax.random.PRNGKey(1), x)["params"]
    scan_params = _loop_to_scan(params)

    def loss_loop(p):
        return sum(jnp.sum(o.astype(jnp.float32) ** 2)
                   for o in loop_bb.apply({"params": p}, x))

    def loss_scan(p):
        return sum(jnp.sum(o.astype(jnp.float32) ** 2)
                   for o in scan_bb.apply({"params": p}, x))

    g_loop = jax.grad(loss_loop)(params)
    g_scan = jax.grad(loss_scan)(scan_params)
    g_loop_s = _loop_to_scan(g_loop)
    flat_a = jax.tree_util.tree_leaves(g_loop_s)
    flat_b = jax.tree_util.tree_leaves(g_scan)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-3)


def _fake_torchvision_sd(layers, rng):
    """Random torchvision-layout ResNet state_dict (numpy stands in for torch)."""
    sd = {}
    sd["conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32) * 0.05

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{prefix}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    bn("bn1", 64)
    in_c = 64
    for li, n in enumerate(layers, start=1):
        planes = 64 * 2 ** (li - 1)
        for bi in range(n):
            tp = f"layer{li}.{bi}"
            c_in = in_c if bi == 0 else planes * 4
            sd[f"{tp}.conv1.weight"] = rng.randn(planes, c_in, 1, 1).astype(np.float32) * 0.05
            bn(f"{tp}.bn1", planes)
            sd[f"{tp}.conv2.weight"] = rng.randn(planes, planes, 3, 3).astype(np.float32) * 0.05
            bn(f"{tp}.bn2", planes)
            sd[f"{tp}.conv3.weight"] = rng.randn(planes * 4, planes, 1, 1).astype(np.float32) * 0.05
            bn(f"{tp}.bn3", planes * 4)
            if bi == 0:
                sd[f"{tp}.downsample.0.weight"] = rng.randn(
                    planes * 4, c_in, 1, 1).astype(np.float32) * 0.05
                bn(f"{tp}.downsample.1", planes * 4)
        in_c = planes * 4
    return sd


def test_importer_handles_scan_layout(rng):
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    sd = _fake_torchvision_sd(LAYERS, rng)
    loop_bb = ResNetBackbone(LAYERS, frozen_stages=0, dtype=jnp.float32)
    scan_bb = ResNetBackbone(LAYERS, frozen_stages=0, dtype=jnp.float32,
                             scan=True)
    vars_loop = loop_bb.init(jax.random.PRNGKey(0), x)
    vars_scan = scan_bb.init(jax.random.PRNGKey(1), x)
    got_loop = import_resnet_backbone(sd, vars_loop)
    got_scan = import_resnet_backbone(sd, vars_scan)
    # the imported scan params equal the stacked imported loop params...
    want = _loop_to_scan(got_loop["params"])
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(want)[0],
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_flatten_with_path(got_scan["params"])[0],
                   key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # ...and both models produce identical features from the import
    xr = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    outs_l = loop_bb.apply(got_loop, xr)
    outs_s = scan_bb.apply(got_scan, xr)
    for a, b in zip(outs_l, outs_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)
