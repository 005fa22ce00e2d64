"""Cross-framework parity: a real torch ResNet vs the imported flax backbone."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dtt.models.resnet import ResNetBackbone  # noqa: E402
from dtt.utils.torch_import import (conv_to_flax, fold_bn,  # noqa: E402
                                    import_resnet_backbone,
                                    permute_ps_channels)


pytestmark = pytest.mark.slow  # compiles production-ish models; run via `pytest -m slow`


class TorchBottleneck(tnn.Module):
    """torchvision-layout Bottleneck (stride on conv2, optional dilation)."""

    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                padding=dilation, dilation=dilation, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idt)


class TorchTinyResNet(tnn.Module):
    """(1,1,1,1)-block dilated ResNet matching dtt's tiny backbone."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = tnn.Sequential(TorchBottleneck(64, 64, downsample=True))
        self.layer2 = tnn.Sequential(TorchBottleneck(256, 128, stride=2,
                                                     downsample=True))
        self.layer3 = tnn.Sequential(TorchBottleneck(512, 256, stride=2,
                                                     downsample=True))
        self.layer4 = tnn.Sequential(TorchBottleneck(1024, 512, stride=1,
                                                     dilation=2,
                                                     downsample=True))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c3, c4, c5


def randomized_bn(m):
    """Give BN layers non-trivial folded statistics."""
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            with torch.no_grad():
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.5, 0.5)
                mod.running_mean.uniform_(-0.3, 0.3)
                mod.running_var.uniform_(0.5, 2.0)


def test_backbone_parity_with_torch(rng):
    torch.manual_seed(0)
    tm = TorchTinyResNet().eval()
    randomized_bn(tm)

    fm = ResNetBackbone((1, 1, 1, 1), frozen_stages=0, dtype=jnp.float32)
    x = rng.randn(1, 64, 96, 3).astype(np.float32)
    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = import_resnet_backbone(tm.state_dict(), params)

    with torch.no_grad():
        tout = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    fout = fm.apply(params, jnp.asarray(x))

    for name, t, f in zip(("c3", "c4", "c5"), tout, fout):
        t_np = np.transpose(t.numpy(), (0, 2, 3, 1))
        f_np = np.asarray(f)
        assert t_np.shape == f_np.shape, name
        np.testing.assert_allclose(f_np, t_np, rtol=2e-3, atol=2e-3,
                                   err_msg=name)


def test_fold_bn_matches_torch_eval():
    torch.manual_seed(1)
    bn = tnn.BatchNorm2d(8).eval()
    with torch.no_grad():
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.uniform_(-1, 1)
        bn.running_mean.uniform_(-1, 1)
        bn.running_var.uniform_(0.5, 2)
    x = torch.randn(2, 8, 4, 4)
    want = bn(x).detach().numpy()
    scale, bias = fold_bn(bn.weight.detach().numpy(),
                          bn.bias.detach().numpy(),
                          bn.running_mean.numpy(), bn.running_var.numpy())
    got = x.numpy() * scale[None, :, None, None] + bias[None, :, None, None]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_conv_layout_conversion():
    torch.manual_seed(2)
    conv = tnn.Conv2d(5, 7, 3, padding=1, bias=False)
    x = torch.randn(1, 5, 9, 9)
    want = conv(x).detach().numpy()
    import flax.linen as nn
    fconv = nn.Conv(7, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
    kernel = conv_to_flax(conv.weight.detach().numpy())
    out = fconv.apply({"params": {"kernel": kernel}},
                      jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))))
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_permute_ps_channels_roundtrip(rng):
    k, d = 3, 5
    w = rng.randn(1, 1, 4, k * k * d).astype(np.float32)
    out = permute_ps_channels(w, k, d)
    # caffe channel (dd*k+ph)*k+pw must land at dtt channel (ph*k+pw)*d+dd
    for dd in range(d):
        for ph in range(k):
            for pw in range(k):
                np.testing.assert_array_equal(
                    out[..., (ph * k + pw) * d + dd],
                    w[..., (dd * k + ph) * k + pw])


def test_import_rejects_extra_keys(rng):
    tm = TorchTinyResNet()
    fm = ResNetBackbone((1, 1, 1, 1), frozen_stages=0, dtype=jnp.float32)
    params = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    sd = dict(tm.state_dict())
    sd["layer9.0.conv1.weight"] = torch.zeros(1, 1, 1, 1)
    with pytest.raises(KeyError):
        import_resnet_backbone(sd, params, strict=True)


# ---------------------------------------------------------------------------
# Full D&T checkpoint import: reference-layout torch model -> dtt, end to end
# ---------------------------------------------------------------------------

from dtt.utils.torch_import import (_rpn_cls_perm,  # noqa: E402
                                    import_full_checkpoint, ps_channel_perm)


def _full_setup(rng):
    from tests.test_models import tiny_config
    from tests.torch_ref import TorchTinyDnT
    from dtt.models.dnt import make_model

    cfg = tiny_config()
    cfg = cfg.replace(input=cfg.input.replace(canvas_height=64,
                                              canvas_width=96, max_gt_boxes=4))
    tm = TorchTinyDnT().randomize(0)
    model = make_model(cfg.model)
    x = (rng.randn(1, 2, 64, 96, 3) * 0.5).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = import_full_checkpoint(tm.state_dict(), params, cfg.model)
    return cfg, tm, model, params, x


def _nhwc(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


def test_full_import_feature_map_parity(rng):
    """Every imported weight is exercised: RPN maps, ps cls/bbox maps and the
    correlation tracking maps must match the torch reference pointwise."""
    cfg, tm, model, params, x = _full_setup(rng)
    k, C = cfg.model.roi.ps_grid, cfg.model.num_classes
    A = cfg.model.anchors.num_anchors

    f_t, f_tau, track = model.apply(params, jnp.asarray(x))
    tf_t = tm.frame_features(x[0, 0:1])
    tf_tau = tm.frame_features(x[0, 1:2])
    t_track = tm.track_maps(tf_t, tf_tau)

    tol = dict(rtol=2e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(f_t.reduced),
                               _nhwc(tf_t["reduced"]), **tol)
    np.testing.assert_allclose(np.asarray(f_t.rpn_cls),
                               _nhwc(tf_t["rpn_cls"])[..., _rpn_cls_perm(A)],
                               **tol)
    np.testing.assert_allclose(np.asarray(f_t.rpn_bbox),
                               _nhwc(tf_t["rpn_bbox"]), **tol)
    np.testing.assert_allclose(
        np.asarray(f_t.cls_maps),
        _nhwc(tf_t["cls_maps"])[..., ps_channel_perm(k, C)], **tol)
    np.testing.assert_allclose(
        np.asarray(f_tau.bbox_maps),
        _nhwc(tf_tau["bbox_maps"])[..., ps_channel_perm(k, 8)], **tol)
    np.testing.assert_allclose(
        np.asarray(track), _nhwc(t_track)[..., ps_channel_perm(k, 4)],
        rtol=5e-3, atol=5e-3)


def test_full_import_head_parity_at_fixed_rois(rng):
    """Caffe PSRoI pooling of caffe-layout torch maps == dtt rfcn_head of
    dtt-layout maps with the imported (permuted) weights."""
    from tests.torch_ref import psroi_pool_caffe
    from dtt.models.dnt import rfcn_head, track_rois

    cfg, tm, model, params, x = _full_setup(rng)
    k = cfg.model.roi.ps_grid
    rois = np.stack([
        np.array([5, 5, 40, 30]), np.array([20, 10, 90, 60]),
        np.array([0, 0, 95, 63]), np.array([33, 17, 52, 39]),
    ]).astype(np.float32)

    f_t, f_tau, track = model.apply(params, jnp.asarray(x))
    tf_t = tm.frame_features(x[0, 0:1])
    t_track = tm.track_maps(tf_t, tm.frame_features(x[0, 1:2]))

    ss = 1.0 / cfg.model.anchors.feat_stride
    cls_d, bbox_d = rfcn_head(cfg.model, f_t.cls_maps[0], f_t.bbox_maps[0],
                              jnp.asarray(rois), ss)
    cls_ref = psroi_pool_caffe(tf_t["cls_maps"].numpy()[0], rois, ss, k
                               ).mean(axis=(2, 3))
    bbox_ref = psroi_pool_caffe(tf_t["bbox_maps"].numpy()[0], rois, ss, k
                                ).mean(axis=(2, 3))
    np.testing.assert_allclose(np.asarray(cls_d), cls_ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(bbox_d), bbox_ref, rtol=2e-3, atol=2e-3)

    trk_d = track_rois(cfg.model, track, jnp.asarray(rois))
    trk_ref = psroi_pool_caffe(t_track.numpy()[0], rois, ss, k).mean(axis=(2, 3))
    np.testing.assert_allclose(np.asarray(trk_d), trk_ref, rtol=5e-3, atol=5e-3)


def test_full_import_decoded_detection_parity(rng):
    """North-star harness: dtt's jitted single-frame step with imported
    weights vs an independent NumPy pipeline (proposal layer -> PSRoI heads
    -> per-class decode+NMS) over the torch reference maps."""
    from tests.torch_ref import reference_single_frame_detections
    from dtt.core.anchors import grid_anchors_for
    from dtt.eval.inference import make_single_frame_step

    cfg, tm, model, params, x = _full_setup(rng)
    mcfg, ecfg = cfg.model, cfg.eval
    step = make_single_frame_step(cfg, model)
    boxes, scores, valid = step(params, jnp.asarray(x[0, 0:1]))
    boxes, scores, valid = map(np.asarray, (boxes, scores, valid))

    anchors = np.asarray(grid_anchors_for(mcfg.anchors, 4, 6), np.float64)
    ref = reference_single_frame_detections(
        tm.frame_features(x[0, 0:1]), anchors, 64.0, 96.0,
        k=mcfg.roi.ps_grid, pre_nms=mcfg.rpn.pre_nms_top_n_test,
        post_nms=mcfg.rpn.post_nms_top_n_test, rpn_nms=mcfg.rpn.nms_thresh,
        min_size=mcfg.rpn.min_size, score_thresh=ecfg.score_thresh,
        det_nms=ecfg.nms_thresh, max_per_class=ecfg.max_per_class,
        bbox_stds=mcfg.roi.bbox_normalize_stds,
        spatial_scale=1.0 / mcfg.anchors.feat_stride)

    total = 0
    for c in range(mcfg.num_classes - 1):
        got = sorted([(float(s), b) for s, b, v in
                      zip(scores[c], boxes[c], valid[c]) if v],
                     key=lambda t: -t[0])
        want = sorted(ref[c], key=lambda t: -t[0])
        assert len(got) == len(want), (
            f"class {c}: {len(got)} dtt dets vs {len(want)} reference")
        total += len(got)
        for (gs, gb), (ws, wb) in zip(got, want):
            np.testing.assert_allclose(gs, ws, rtol=0, atol=2e-3)
            np.testing.assert_allclose(gb, wb, rtol=0, atol=0.15)
    assert total > 0, "parity test vacuous: no detections at all"


def test_full_import_rejects_shape_mismatch(rng):
    from tests.test_models import tiny_config
    from tests.torch_ref import TorchTinyDnT
    from dtt.models.dnt import make_model
    cfg = tiny_config()
    tm = TorchTinyDnT(k=5).randomize(0)   # wrong ps grid
    model = make_model(cfg.model)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 96, 3)))
    with pytest.raises(ValueError):
        import_full_checkpoint(tm.state_dict(), params, cfg.model)
