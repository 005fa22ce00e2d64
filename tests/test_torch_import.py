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
