"""Executable PyTorch reference for cross-framework parity tests.

A miniature D&T network in PyTorch with the REFERENCE's layouts and naming
(ref: jwyang-lineage `_init_modules` module names — RCNN_base/RCNN_top
Sequential backbone, RCNN_rpn.RPN_Conv/RPN_cls_score/RPN_bbox_pred heads —
plus the R-FCN conv-new/rfcn_cls/rfcn_bbox/rfcn_tracking head convs and
Caffe channel conventions):

* position-sensitive conv outputs ordered c = (d*k + ph)*k + pw
  (class-major; dtt is bin-major — the importer permutes),
* RPN cls channels class-major (bg anchors then fg anchors; dtt is
  anchor-major),
* BatchNorm in eval mode with nontrivial running stats (the importer folds
  them into FrozenAffine scale/bias).

Plus NumPy oracles for the non-parameterized reference ops (Caffe PSRoI
pooling, FlowNet correlation, bbox decode, greedy NMS) so a full
detection pipeline can be computed without any dtt code. Everything here is
test scaffolding: it exists so `import_full_checkpoint` can be verified
end-to-end today and a REAL reference checkpoint can be verified the day the
mount is populated.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ------------------------------------------------------------------ backbone

class Bottleneck(nn.Module):
    """torchvision-layout bottleneck (stride on the 3x3 conv)."""

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4))
        else:
            self.downsample = None

    def forward(self, x):
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        sc = self.downsample(x) if self.downsample is not None else x
        return self.relu(out + sc)


def _stage(inplanes, planes, blocks, stride=1, dilation=1):
    layers = [Bottleneck(inplanes, planes, stride, dilation, downsample=True)]
    for _ in range(1, blocks):
        layers.append(Bottleneck(planes * 4, planes, 1, dilation))
    return nn.Sequential(*layers)


class TinyResNet(nn.Module):
    """layers-(1,1,1,1) dilated ResNet in torchvision naming."""

    def __init__(self, layers=(1, 1, 1, 1)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = _stage(64, 64, layers[0], stride=1)
        self.layer2 = _stage(256, 128, layers[1], stride=2)
        self.layer3 = _stage(512, 256, layers[2], stride=2)
        self.layer4 = _stage(1024, 512, layers[3], stride=1, dilation=2)


class TorchRPN(nn.Module):
    """ref rpn.py: RPN_Conv 3x3 -> relu -> twin 1x1 heads."""

    def __init__(self, in_ch, channels, num_anchors):
        super().__init__()
        self.RPN_Conv = nn.Conv2d(in_ch, channels, 3, padding=1)
        self.RPN_cls_score = nn.Conv2d(channels, num_anchors * 2, 1)
        self.RPN_bbox_pred = nn.Conv2d(channels, num_anchors * 4, 1)

    def forward(self, feat):
        x = F.relu(self.RPN_Conv(feat))
        return self.RPN_cls_score(x), self.RPN_bbox_pred(x)


class TorchTinyDnT(nn.Module):
    """Reference-layout tiny D&T: produces the same maps as dtt's DnT.

    Module names mirror the jwyang-lineage state_dict so its state_dict is a
    stand-in for a real reference checkpoint.
    """

    def __init__(self, num_classes=4, num_anchors=12, rpn_channels=32,
                 reduced=64, k=3, class_agnostic=True,
                 max_displacement=2, corr_stride=1):
        super().__init__()
        resnet = TinyResNet()
        self.RCNN_base = nn.Sequential(
            resnet.conv1, resnet.bn1, resnet.relu, resnet.maxpool,
            resnet.layer1, resnet.layer2, resnet.layer3)
        self.RCNN_top = nn.Sequential(resnet.layer4)
        self.RCNN_rpn = TorchRPN(1024, rpn_channels, num_anchors)
        nb = 2 if class_agnostic else num_classes
        self.RCNN_conv_new = nn.Conv2d(2048, reduced, 1)
        self.rfcn_cls = nn.Conv2d(reduced, k * k * num_classes, 1)
        self.rfcn_bbox = nn.Conv2d(reduced, k * k * 4 * nb, 1)
        nd = (2 * (max_displacement // corr_stride) + 1) ** 2
        self.rfcn_tracking = nn.Conv2d(2 * reduced + 3 * nd, k * k * 4, 1)
        self.max_displacement = max_displacement
        self.corr_stride = corr_stride

    def randomize(self, seed=0):
        """Nontrivial weights AND BN running stats (exercises BN folding)."""
        g = torch.Generator().manual_seed(seed)
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.normal_(m.weight, std=0.05, generator=g)
                if m.bias is not None:
                    nn.init.normal_(m.bias, std=0.02, generator=g)
            elif isinstance(m, nn.BatchNorm2d):
                nn.init.uniform_(m.weight, 0.5, 1.5, generator=g)
                nn.init.normal_(m.bias, std=0.1, generator=g)
                m.running_mean.normal_(0.0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
        self.eval()
        return self

    @torch.no_grad()
    def frame_features(self, images_nhwc: np.ndarray):
        """(B, H, W, 3) -> dict of NCHW torch maps (mirrors DnT.frame_features)."""
        x = torch.from_numpy(np.ascontiguousarray(
            images_nhwc.transpose(0, 3, 1, 2))).float()
        c4 = self.RCNN_base(x)
        c3 = self.RCNN_base[:6](x)            # up to layer2 output (stride 8)
        c5 = self.RCNN_top(c4)
        rpn_cls, rpn_bbox = self.RCNN_rpn(c4)
        reduced = F.relu(self.RCNN_conv_new(c5))
        cls_maps = self.rfcn_cls(reduced)
        bbox_maps = self.rfcn_bbox(reduced)
        c3p = F.max_pool2d(c3, 2, 2)
        return {"rpn_cls": rpn_cls, "rpn_bbox": rpn_bbox, "cls_maps": cls_maps,
                "bbox_maps": bbox_maps, "reduced": reduced,
                "corr": {"c3": c3p, "c4": c4, "c5": reduced}}

    @torch.no_grad()
    def track_maps(self, feats_t: dict, feats_tau: dict):
        """Cosine-normalized multi-scale correlation -> tracking ps maps."""
        corrs = []
        for s in ("c3", "c4", "c5"):
            a = cosine_prep(feats_t["corr"][s].numpy())
            b = cosine_prep(feats_tau["corr"][s].numpy())
            c = np.stack([correlation_np(a[i], b[i], self.max_displacement,
                                         self.corr_stride)
                          for i in range(a.shape[0])])
            corrs.append(torch.from_numpy(c).float())
        stacked = torch.cat([feats_t["reduced"], feats_tau["reduced"]] + corrs,
                            dim=1)
        return self.rfcn_tracking(stacked)


# ----------------------------------------------------------- numpy oracles

def cosine_prep(x_nchw: np.ndarray) -> np.ndarray:
    """Unit-normalize channels, rescale by sqrt(C) (dtt track.normalize)."""
    n = np.sqrt(np.sum(np.square(x_nchw), axis=1, keepdims=True) + 1e-6)
    return x_nchw / n * np.sqrt(float(x_nchw.shape[1]))


def correlation_np(f1_chw: np.ndarray, f2_chw: np.ndarray,
                   max_displacement: int, stride: int) -> np.ndarray:
    """FlowNet correlation, channel-mean dot products over the window.

    (C, H, W) x2 -> (D^2, H, W) with zero padding outside f2
    (ref: lib/model/correlation CUDA kernel semantics).
    """
    c, h, w = f1_chw.shape
    d = max_displacement
    offs = range(-d, d + 1, stride)
    f2p = np.pad(f2_chw, ((0, 0), (d, d), (d, d)))
    out = []
    for dy in offs:
        for dx in offs:
            sl = f2p[:, d + dy:d + dy + h, d + dx:d + dx + w]
            out.append(np.mean(f1_chw * sl, axis=0))
    return np.stack(out)


def psroi_pool_caffe(maps_chw: np.ndarray, rois: np.ndarray,
                     spatial_scale: float, k: int) -> np.ndarray:
    """Caffe/R-FCN PSRoI pooling with the CAFFE channel layout
    c = (d*k + ph)*k + pw (ref: psroi_pooling_kernel.cu math).

    (k*k*D, H, W), (N, 4) -> (N, D, k, k).
    """
    c, h, w = maps_chw.shape
    d_ch = c // (k * k)
    n = rois.shape[0]
    out = np.zeros((n, d_ch, k, k), np.float32)
    for i, roi in enumerate(rois):
        sw = round(float(roi[0])) * spatial_scale
        sh = round(float(roi[1])) * spatial_scale
        ew = round(float(roi[2]) + 1.0) * spatial_scale
        eh = round(float(roi[3]) + 1.0) * spatial_scale
        roi_w = max(ew - sw, 0.1)
        roi_h = max(eh - sh, 0.1)
        bw, bh = roi_w / k, roi_h / k
        for ph in range(k):
            for pw_ in range(k):
                hs = int(np.clip(np.floor(ph * bh + sh), 0, h))
                he = int(np.clip(np.ceil((ph + 1) * bh + sh), 0, h))
                ws = int(np.clip(np.floor(pw_ * bw + sw), 0, w))
                we = int(np.clip(np.ceil((pw_ + 1) * bw + sw), 0, w))
                if he <= hs or we <= ws:
                    continue
                for dd in range(d_ch):
                    ch = (dd * k + ph) * k + pw_
                    out[i, dd, ph, pw_] = maps_chw[ch, hs:he, ws:we].mean()
    return out


def decode_boxes_np(boxes: np.ndarray, deltas: np.ndarray,
                    means=None, stds=None) -> np.ndarray:
    """bbox_transform_inv with the Detectron-consistent -1 on x2/y2."""
    deltas = deltas.reshape(len(boxes), -1, 4).astype(np.float64)
    if stds is not None:
        deltas = deltas * np.asarray(stds)
    if means is not None:
        deltas = deltas + np.asarray(means)
    w = boxes[:, 2] - boxes[:, 0] + 1.0
    h = boxes[:, 3] - boxes[:, 1] + 1.0
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    pcx = deltas[..., 0] * w[:, None] + cx[:, None]
    pcy = deltas[..., 1] * h[:, None] + cy[:, None]
    pw = np.exp(np.minimum(deltas[..., 2], 4.135166556742356)) * w[:, None]
    ph = np.exp(np.minimum(deltas[..., 3], 4.135166556742356)) * h[:, None]
    out = np.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                    pcx + 0.5 * pw - 1.0, pcy + 0.5 * ph - 1.0], axis=-1)
    return out.reshape(len(boxes), -1)


def clip_boxes_np(boxes: np.ndarray, h: float, w: float) -> np.ndarray:
    b = boxes.reshape(len(boxes), -1, 4).copy()
    b[..., 0] = np.clip(b[..., 0], 0, w - 1.0)
    b[..., 1] = np.clip(b[..., 1], 0, h - 1.0)
    b[..., 2] = np.clip(b[..., 2], 0, w - 1.0)
    b[..., 3] = np.clip(b[..., 3], 0, h - 1.0)
    return b.reshape(boxes.shape)


def greedy_nms_np(boxes: np.ndarray, scores: np.ndarray, thresh: float
                  ) -> list[int]:
    """Reference greedy NMS (keep while ovr <= thresh)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        iw = np.maximum(xx2 - xx1 + 1, 0)
        ih = np.maximum(yy2 - yy1 + 1, 0)
        inter = iw * ih
        area = lambda z: (z[..., 2] - z[..., 0] + 1) * (z[..., 3] - z[..., 1] + 1)
        ovr = inter / (area(boxes[i]) + area(boxes) - inter)
        suppressed |= ovr > thresh
    return keep


def reference_single_frame_detections(
        feats: dict, anchors: np.ndarray, im_h: float, im_w: float,
        *, k: int, pre_nms: int, post_nms: int, rpn_nms: float,
        min_size: float, score_thresh: float, det_nms: float,
        max_per_class: int, bbox_stds, spatial_scale: float):
    """Full single-frame R-FCN pipeline in NumPy from torch feature maps.

    Independent re-derivation of the reference test path (proposal layer ->
    PSRoI heads -> per-class decode + NMS) used as the oracle for dtt's
    jitted single-frame step with imported weights. `feats` is the dict from
    TorchTinyDnT.frame_features (batch 1). Returns {class_id(0-based):
    [(score, box(4,)), ...]} with class-agnostic box regression.
    """
    rpn_cls = feats["rpn_cls"].numpy()[0]          # (2A, H, W) class-major
    rpn_bbox = feats["rpn_bbox"].numpy()[0]        # (4A, H, W)
    a2, fh, fw = rpn_cls.shape
    a = a2 // 2
    # class-major (bg..., fg...) -> per-anchor (bg, fg) logits, HWA order
    logits = np.transpose(rpn_cls.reshape(2, a, fh, fw), (2, 3, 1, 0)
                          ).reshape(-1, 2).astype(np.float64)
    fg = np.exp(logits[:, 1] - logits.max(1)) / np.exp(
        logits - logits.max(1, keepdims=True)).sum(1)
    deltas = np.transpose(rpn_bbox.reshape(a, 4, fh, fw), (2, 3, 0, 1)
                          ).reshape(-1, 4)
    props = clip_boxes_np(decode_boxes_np(anchors, deltas), im_h, im_w)
    ws = props[:, 2] - props[:, 0] + 1
    hs = props[:, 3] - props[:, 1] + 1
    scores = np.where((ws >= min_size) & (hs >= min_size), fg, -1.0)
    order = np.argsort(-scores)[:pre_nms]
    cand_boxes, cand_scores = props[order], scores[order]
    ok = cand_scores >= 0
    keep = [i for i in greedy_nms_np(cand_boxes[ok], cand_scores[ok], rpn_nms)]
    rois = cand_boxes[ok][keep][:post_nms]

    cls_maps = feats["cls_maps"].numpy()[0]
    bbox_maps = feats["bbox_maps"].numpy()[0]
    cls_score = psroi_pool_caffe(cls_maps, rois, spatial_scale, k
                                 ).mean(axis=(2, 3))              # (N, C)
    bbox_pred = psroi_pool_caffe(bbox_maps, rois, spatial_scale, k
                                 ).mean(axis=(2, 3))              # (N, 4*nb)
    e = np.exp(cls_score - cls_score.max(1, keepdims=True))
    prob = e / e.sum(1, keepdims=True)

    boxes = clip_boxes_np(
        decode_boxes_np(rois, bbox_pred[:, 4:8], stds=bbox_stds), im_h, im_w)
    out = {}
    for c in range(1, prob.shape[1]):
        s = prob[:, c]
        m = s > score_thresh
        if not m.any():
            out[c - 1] = []
            continue
        keep = greedy_nms_np(boxes[m], s[m], det_nms)[:max_per_class]
        out[c - 1] = [(float(s[m][i]), boxes[m][i].copy()) for i in keep]
    return out
