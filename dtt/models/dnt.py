"""The Detect & Track network: siamese R-FCN + correlation tracking head.

TPU-native equivalent of the reference's main model module
(ref: lib/model/rfcn/rfcn.py-style D&T network; D&T paper §3). One flax
module owns every parameterized layer; the detection/tracking pipelines are
pure functions over its outputs so they compose freely under jit/vmap/
shard_map.

Architecture (paper §3.1-3.3):
  ResNet-101 (dilated conv5)  ->  c3 (s8), c4 (s16), c5 (s16)
  RPN on c4                                        [per frame]
  1x1 "new conv" c5 -> 1024 (reduced)              [per frame]
  1x1 -> k^2*(C+1) cls ps-maps ; 1x1 -> k^2*4*nb bbox ps-maps
  PSRoI pool + vote (mean over bins)  ->  per-RoI scores / box deltas
  correlation(f_t, f_t+τ) at scales {c3 (pooled to s16), c4, reduced}
  concat [reduced_t, reduced_τ, corr*] -> 1x1 -> k^2*4 tracking ps-maps
  PSRoI pool + vote at frame-t RoIs  ->  inter-frame box displacement

Channel layout of every position-sensitive map is dtt's bin-major
``c = (ph*k + pw)*D + d`` (see dtt.ops.psroi).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from dtt.core import boxes as box_ops
from dtt.core.config import ModelConfig
from dtt.models.resnet import ResNetBackbone
from dtt.models.rpn import Proposals, RPNHead, proposal_layer
from dtt.ops.correlation import correlation
from dtt.ops.nms import multiclass_nms
from dtt.ops.psroi import psroi_pool, psroi_pool_batched
from dtt.ops.roi_ops import roi_align, roi_crop, roi_pool

_BACKBONES = {
    "resnet101": (3, 4, 23, 3),
    "resnet50": (3, 4, 6, 3),
    "tiny": (1, 1, 1, 1),
}


class FrameFeats(NamedTuple):
    """Everything the per-frame trunk produces (batched over frames)."""

    rpn_cls: jnp.ndarray    # (B, H, W, 2A)
    rpn_bbox: jnp.ndarray   # (B, H, W, 4A)
    cls_maps: jnp.ndarray   # (B, H, W, k^2*(C+1))
    bbox_maps: jnp.ndarray  # (B, H, W, k^2*4*nb)
    reduced: jnp.ndarray    # (B, H, W, 1024)
    corr_feats: Dict[str, jnp.ndarray]  # per-scale stride-16 maps for correlation


class DnT(nn.Module):
    """All parameterized layers of the D&T model."""

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        self.backbone = ResNetBackbone(_BACKBONES[c.backbone],
                                       frozen_stages=c.frozen_stages,
                                       dtype=dtype, remat=c.remat,
                                       scan=c.scan_blocks, name="backbone")
        self.rpn = RPNHead(c.anchors.num_anchors, c.rpn.channels, dtype,
                           name="rpn")
        # cfg.roi.pooling_mode (ref: cfg.POOLING_MODE in the jwyang lineage):
        # "psroi" heads emit k^2 position-sensitive channel groups; the other
        # modes (align/pool/crop) pool plain per-class score maps at RoIs, so
        # their head convs emit one channel group (see rfcn_head).
        k2 = c.roi.ps_grid ** 2 if c.roi.pooling_mode == "psroi" else 1
        nb = 2 if c.roi.class_agnostic else c.num_classes
        conv = lambda f, std, name: nn.Conv(
            f, (1, 1), kernel_init=nn.initializers.normal(std), dtype=dtype,
            param_dtype=jnp.float32, name=name)
        self.reduce = conv(c.reduced_channels, 0.01, "reduce")
        self.cls_conv = conv(k2 * c.num_classes, 0.01, "cls_maps")
        self.bbox_conv = conv(k2 * 4 * nb, 0.001, "bbox_maps")
        self.track_conv = conv(k2 * 4, 0.001, "track_maps")

    def frame_features(self, images: jnp.ndarray) -> FrameFeats:
        """(B, H, W, 3) mean-subtracted images -> per-frame trunk outputs."""
        c3, c4, c5 = self.backbone(images)
        rpn_cls, rpn_bbox = self.rpn(c4)
        reduced = nn.relu(self.reduce(c5))
        cls_maps = self.cls_conv(reduced).astype(jnp.float32)
        bbox_maps = self.bbox_conv(reduced).astype(jnp.float32)
        # pool c3 (stride 8) to stride 16 so all correlation scales align
        c3p = nn.max_pool(c3, (2, 2), strides=(2, 2))
        corr_feats = {"c3": c3p, "c4": c4, "c5": reduced}
        return FrameFeats(rpn_cls=rpn_cls, rpn_bbox=rpn_bbox,
                          cls_maps=cls_maps, bbox_maps=bbox_maps,
                          reduced=reduced, corr_feats=corr_feats)

    def _corr_volumes(self, feats_t: FrameFeats, feats_tau: FrameFeats
                      ) -> list:
        """Per-scale cosine-correlation volumes (B, H, W, D^2) (paper §3.2)."""
        c = self.cfg.track
        corr_fn = lambda a, b: correlation(a, b, c.max_displacement, c.stride)

        def prep(x):
            if not c.normalize:
                return x
            # cosine correlation: unit-normalize channels, rescale by sqrt(C)
            # so correlation()'s 1/C mean yields values in [-1, 1]
            n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                                 keepdims=True) + 1e-6)
            return (x / n.astype(x.dtype)) * jnp.sqrt(float(x.shape[-1])).astype(x.dtype)

        return [jax.vmap(corr_fn)(prep(feats_t.corr_feats[s]),
                                  prep(feats_tau.corr_feats[s]))
                for s in c.scales]

    def _track_input(self, feats_t: FrameFeats, feats_tau: FrameFeats
                     ) -> jnp.ndarray:
        """Tracking-head input: [reduced_t, reduced_τ, corr@scales] concat.

        D&T paper eq. (7): the tracking regressor sees {correlation features,
        frame-t features, frame-τ features}. reduced_t is the FIRST channel
        block — fused_psmaps relies on that to address the cls/bbox kernels.
        """
        corrs = self._corr_volumes(feats_t, feats_tau)
        return jnp.concatenate(
            [feats_t.reduced, feats_tau.reduced]
            + [x.astype(feats_t.reduced.dtype) for x in corrs], axis=-1)

    def track_psmaps(self, feats_t: FrameFeats, feats_tau: FrameFeats
                     ) -> jnp.ndarray:
        """Cross-frame correlation + 1x1 conv -> (B, H, W, k^2*4) track maps."""
        return self.track_conv(
            self._track_input(feats_t, feats_tau)).astype(jnp.float32)

    def fused_psmaps(self, feats_t: FrameFeats, feats_tau: FrameFeats
                     ) -> jnp.ndarray:
        """ALL head ps-maps in one conv: (B, H, W, k^2*(Dc+Db+4)), bin-major
        per-bin layout [cls | bbox | track].

        The heads stage was ~26% of the inference step and its cost is
        GATHER-ROW bound, not channel bound (tools/profile_heads.py: a D=43
        pool costs the same ~20 ms as a D=31 one, three separate pools 48 ms)
        — so pooling once over a fused map is ~2.3x cheaper.

        The fused map is produced as THREE partial 1x1 convs summed in f32
        (round 5): the tracking input's channel blocks are [reduced_t |
        reduced_τ | corr], and only the first block feeds the cls/bbox
        outputs — the single 2291-in x 2107-out conv over the concat spent
        ~half its MXU FLOPs multiplying structurally-zero kernel blocks and
        materialized the 2291-channel concat through HBM (round-2 "split
        track-conv" note, re-costed in round 5). Splitting by input block
        halves the conv FLOPs and drops the concat entirely. A 1x1 conv of
        a channel concat IS the sum of the per-block convs (one f32
        accumulator split into three partial f32 sums), so results match
        the three separate convs to f32 addition order; parity-tested in
        tests/test_fused_heads.py. Param tree unchanged (importer-compatible).
        """
        cr = feats_t.reduced.shape[-1]
        ck = self.cls_conv.variables["params"]["kernel"]    # (1,1,cr,k2*dc)
        bk = self.bbox_conv.variables["params"]["kernel"]   # (1,1,cr,k2*db)
        tk = self.track_conv.variables["params"]["kernel"]  # (1,1,cs,k2*dt)
        cb_, bb_, tb_ = (m.variables["params"]["bias"] for m in
                        (self.cls_conv, self.bbox_conv, self.track_conv))
        c = self.cfg
        k2 = c.roi.ps_grid ** 2 if c.roi.pooling_mode == "psroi" else 1
        dc, db, dt = (x.shape[-1] // k2 for x in (ck, bk, tk))
        d = dc + db + dt
        cs = tk.shape[-2]
        dtype = feats_t.reduced.dtype

        def conv1x1(x, kern_f32):
            return jax.lax.conv_general_dilated(
                x, kern_f32.astype(dtype), window_strides=(1, 1),
                padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)

        # frame-t block: cls + bbox + the track kernel's reduced_t rows,
        # interleaved bin-major [cls | bbox | track] per bin
        k1 = jnp.zeros((cr, k2, d), jnp.float32)
        k1 = k1.at[:, :, :dc].set(ck.reshape(cr, k2, dc))
        k1 = k1.at[:, :, dc:dc + db].set(bk.reshape(cr, k2, db))
        k1 = k1.at[:, :, dc + db:].set(tk[0, 0, :cr].reshape(cr, k2, dt))
        out = conv1x1(feats_t.reduced, k1.reshape(1, 1, cr, k2 * d))
        # frame-τ and correlation blocks only feed the track output slots
        k2tau = tk[0, 0, cr:2 * cr].reshape(1, 1, cr, k2 * dt)
        track = conv1x1(feats_tau.reduced, k2tau)
        corrs = self._corr_volumes(feats_t, feats_tau)
        corr = jnp.concatenate([x.astype(dtype) for x in corrs], axis=-1)
        k3 = tk[0, 0, 2 * cr:cs].reshape(1, 1, cs - 2 * cr, k2 * dt)
        track = track + conv1x1(corr, k3)
        b, hh, ww = out.shape[:3]
        out = out.reshape(b, hh, ww, k2, d)
        out = out.at[..., dc + db:].add(track.reshape(b, hh, ww, k2, dt))
        bias = jnp.concatenate([cb_.reshape(k2, dc), bb_.reshape(k2, db),
                                tb_.reshape(k2, dt)], axis=-1).reshape(k2 * d)
        # NOT worth casting to the pool's bf16 here for the direct path:
        # measured identical (P0 23.80 vs 23.85 ms, round 5) — XLA already
        # fuses detect_track_fused's downstream cast into this epilogue, so
        # the f32 map never materializes at f32 width.
        return out.reshape(b, hh, ww, k2 * d) + bias

    def frame_trunk(self, images: jnp.ndarray) -> FrameFeats:
        """frame_features WITHOUT the cls/bbox map convs (their kernels run
        inside fused_psmaps on the fused eval path); cls_maps/bbox_maps are
        None."""
        c3, c4, c5 = self.backbone(images)
        rpn_cls, rpn_bbox = self.rpn(c4)
        reduced = nn.relu(self.reduce(c5))
        c3p = nn.max_pool(c3, (2, 2), strides=(2, 2))
        corr_feats = {"c3": c3p, "c4": c4, "c5": reduced}
        return FrameFeats(rpn_cls=rpn_cls, rpn_bbox=rpn_bbox, cls_maps=None,
                          bbox_maps=None, reduced=reduced,
                          corr_feats=corr_feats)

    def __call__(self, image_pairs: jnp.ndarray):
        """(B, 2, H, W, 3) -> (frame-t feats, frame-τ feats, track ps-maps).

        Exists so `init` creates every parameter; the pipelines below call
        the individual methods via `apply(..., method=...)`.
        """
        b = image_pairs.shape[0]
        flat = image_pairs.reshape(-1, *image_pairs.shape[2:])
        feats = self.frame_features(flat)
        f_t = jax.tree.map(lambda x: x[0::2] if hasattr(x, "shape") else x, feats)
        f_tau = jax.tree.map(lambda x: x[1::2] if hasattr(x, "shape") else x, feats)
        track = self.track_psmaps(f_t, f_tau)
        return f_t, f_tau, track


def normalize_device_images(images: jnp.ndarray, im_size: jnp.ndarray,
                            pixel_means) -> jnp.ndarray:
    """uint8 canvas -> mean-subtracted float with exact-zero padding, on device.

    H2D transfer through this machine's tunnel is the training bottleneck
    (~40 MB/s vs a 124 ms step); shipping uint8 canvases is 4x fewer bytes
    than float32 and EXACT (pixels are integers, so host-side f32 mean-sub
    equals device-side). The canvas-padding invariant (exactly 0 AFTER mean
    subtraction — see dtt.data.transforms.resize_to_canvas) is preserved by
    masking beyond the true `im_size` extent. Float inputs pass through
    unchanged (already normalized on host).
    """
    if images.dtype != jnp.uint8:
        return images
    h, w = images.shape[-3], images.shape[-2]
    x = images.astype(jnp.float32) - jnp.asarray(pixel_means, jnp.float32)
    rows = jnp.arange(h)[:, None, None] < im_size[0]
    cols = jnp.arange(w)[None, :, None] < im_size[1]
    return jnp.where(rows & cols, x, 0.0)


class Detections(NamedTuple):
    rois: jnp.ndarray        # (N, 4) proposal boxes
    roi_valid: jnp.ndarray   # (N,)
    cls_prob: jnp.ndarray    # (N, C) softmax class probabilities
    bbox_pred: jnp.ndarray   # (N, 4*nb) normalized regression output


def pool_vote(cfg: ModelConfig, maps, rois, spatial_scale: float,
              impl: str = "auto"):
    """RoI pooling + bin vote per cfg.roi.pooling_mode: (H, W, ·) -> (N, D).

    Dispatches the reference's cfg.POOLING_MODE (ref: jwyang-lineage net
    modules switching psroi/align/pool/crop):
    * "psroi" — position-sensitive pooling of k^2-grouped maps (R-FCN path).
    * "align"/"pool"/"crop" — the corresponding RoI pooling of plain score
      maps followed by the bin average. For "align"/"crop" (linear samplers)
      conv-then-pool is mathematically identical to the lineage's
      pool-then-fc with the same weights (both are linear in features);
      "pool" (max) votes over max-pooled score-map bins.
    """
    k = cfg.roi.ps_grid
    mode = cfg.roi.pooling_mode
    if mode == "psroi":
        pooled = psroi_pool(maps, rois, spatial_scale, k, impl)
    elif mode == "align":
        pooled = roi_align(maps, rois, spatial_scale, k)
    elif mode == "pool":
        pooled = roi_pool(maps, rois, spatial_scale, k)
    elif mode == "crop":
        pooled = roi_crop(maps, rois, spatial_scale, k)
    else:
        raise ValueError(f"unknown pooling_mode {mode!r}")
    return pooled.mean(axis=(1, 2))


def pool_vote_batched(cfg: ModelConfig, maps, rois, spatial_scale: float,
                      impl: str = "gather"):
    """Frame-batched pool_vote: (B, H, W, ·), (B, N, 4) -> (B, N, D).

    psroi mode dispatches `impl`:
    * "gather" — batch-folded flat SAT gather (psroi_pool_batched); exact
      f32, differentiable via transpose-of-gather (scatter-add). vmapping
      the per-frame form instead would turn the gather multi-axis, the
      known slow path on TPU.
    * "direct" — the SAT-free interval-indicator MXU kernel with the
      mirror-image matmul backward (psroi_pool_batched_direct_ad), pooled
      at the model compute dtype. The training path uses this
      (cfg.roi.train_pool_impl): the gather form's scatter-add backward
      was 64.5 ms of the 217 ms batch-8 train step (BASELINE.md round-5
      train profile).
    Other pooling modes vmap their per-frame op.
    """
    if cfg.roi.pooling_mode == "psroi":
        if impl == "direct":
            from dtt.ops.psroi import psroi_pool_batched_direct_ad
            pooled = psroi_pool_batched_direct_ad(
                maps.astype(jnp.dtype(cfg.dtype)), rois, spatial_scale,
                cfg.roi.ps_grid)
            return pooled.astype(jnp.float32).mean(axis=(2, 3))
        assert impl == "gather", f"unknown batched psroi impl {impl!r}"
        return psroi_pool_batched(maps, rois, spatial_scale,
                                  cfg.roi.ps_grid).mean(axis=(2, 3))
    return jax.vmap(lambda m, r: pool_vote(cfg, m, r, spatial_scale)
                    )(maps, rois)


def rfcn_head(cfg: ModelConfig, cls_maps, bbox_maps, rois,
              spatial_scale: float, impl: str = "auto"):
    """RoI pool + vote: per-RoI class scores and box deltas (single image)."""
    cls_score = pool_vote(cfg, cls_maps, rois, spatial_scale, impl)
    bbox_pred = pool_vote(cfg, bbox_maps, rois, spatial_scale, impl)
    return cls_score, bbox_pred


def detect_frame(cfg: ModelConfig, feats: FrameFeats, anchors: jnp.ndarray,
                 im_height, im_width, im_scale, frame_idx: int = 0,
                 train: bool = False) -> tuple[Proposals, Detections]:
    """Single-frame R-FCN detection pipeline (driver config #1).

    Consumes one frame's slice of the batched FrameFeats.
    """
    i = frame_idx
    props = proposal_layer(feats.rpn_cls[i], feats.rpn_bbox[i], anchors,
                           im_height, im_width, im_scale, cfg.rpn, train)
    spatial_scale = 1.0 / cfg.anchors.feat_stride
    cls_score, bbox_pred = rfcn_head(cfg, feats.cls_maps[i], feats.bbox_maps[i],
                                     props.rois, spatial_scale)
    cls_prob = jax.nn.softmax(cls_score, axis=-1)
    return props, Detections(rois=props.rois, roi_valid=props.valid,
                             cls_prob=cls_prob, bbox_pred=bbox_pred)


def detect_frames_batched(cfg: ModelConfig, feats: FrameFeats,
                          anchors: jnp.ndarray, im_height, im_width, im_scale,
                          train: bool = False) -> tuple[Proposals, Detections]:
    """vmapped detection over the whole frame batch.

    One batched NMS scan instead of B sequential ones — the per-frame
    Python loop serializes B 300-iteration suppression loops, which
    dominates post-processing latency at inference.
    """
    spatial_scale = 1.0 / cfg.anchors.feat_stride

    def proposals_one(rpn_cls, rpn_bbox):
        return proposal_layer(rpn_cls, rpn_bbox, anchors,
                              im_height, im_width, im_scale, cfg.rpn, train)

    props = jax.vmap(proposals_one)(feats.rpn_cls, feats.rpn_bbox)
    # heads pooled with the batch-folded gather, NOT under the vmap (see
    # pool_vote_batched)
    cls_score = pool_vote_batched(cfg, feats.cls_maps, props.rois,
                                  spatial_scale)
    bbox_pred = pool_vote_batched(cfg, feats.bbox_maps, props.rois,
                                  spatial_scale)
    return props, Detections(rois=props.rois, roi_valid=props.valid,
                             cls_prob=jax.nn.softmax(cls_score, axis=-1),
                             bbox_pred=bbox_pred)


def detect_track_fused(cfg: ModelConfig, feats: FrameFeats,
                       fused_maps: jnp.ndarray, anchors: jnp.ndarray,
                       im_height, im_width, im_scale
                       ) -> tuple[Proposals, Detections, jnp.ndarray]:
    """Batched proposals + ONE fused PSRoI pool -> detections + track deltas.

    Consumes DnT.fused_psmaps output (per-bin [cls | bbox | track] layout);
    pooling is linear per channel, so splitting the pooled vote equals the
    three separate pools of detect_frames_batched + track_rois_batched
    exactly — at one-third the gather cost (see fused_psmaps docstring).
    psroi pooling_mode only.
    """
    assert cfg.roi.pooling_mode == "psroi"
    spatial_scale = 1.0 / cfg.anchors.feat_stride

    def proposals_one(rpn_cls, rpn_bbox):
        return proposal_layer(rpn_cls, rpn_bbox, anchors,
                              im_height, im_width, im_scale, cfg.rpn, False)

    props = jax.vmap(proposals_one)(feats.rpn_cls, feats.rpn_bbox)
    impl = cfg.roi.eval_pool_impl
    if impl == "direct":
        from dtt.ops.psroi import psroi_pool_batched_direct
        # SAT-free MXU kernel; bf16 maps pool at the conv's own precision
        pool = psroi_pool_batched_direct(
            fused_maps.astype(jnp.dtype(cfg.dtype)), props.rois,
            spatial_scale, cfg.roi.ps_grid).astype(jnp.float32)
    elif impl == "pallas_mm":
        from dtt.ops.psroi import psroi_pool_batched_pallas_mm
        pool = psroi_pool_batched_pallas_mm(fused_maps, props.rois,
                                            spatial_scale, cfg.roi.ps_grid)
    else:
        assert impl == "gather", f"unknown roi.eval_pool_impl {impl!r}"
        pool = psroi_pool_batched(fused_maps, props.rois, spatial_scale,
                                  cfg.roi.ps_grid)
    pooled = pool.mean(axis=(2, 3))
    dc = cfg.num_classes
    db = 8 if cfg.roi.class_agnostic else 4 * cfg.num_classes
    cls_score = pooled[..., :dc]
    bbox_pred = pooled[..., dc:dc + db]
    track_deltas = pooled[..., dc + db:]
    det = Detections(rois=props.rois, roi_valid=props.valid,
                     cls_prob=jax.nn.softmax(cls_score, axis=-1),
                     bbox_pred=bbox_pred)
    return props, det, track_deltas


def track_rois_batched(cfg: ModelConfig, track_maps: jnp.ndarray,
                       rois: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, k^2*4), (B, N, 4) -> (B, N, 4) tracking deltas."""
    spatial_scale = 1.0 / cfg.anchors.feat_stride
    return pool_vote_batched(cfg, track_maps, rois, spatial_scale)


def decode_detections_batched(cfg: ModelConfig, det: Detections,
                              im_height, im_width, score_thresh, nms_thresh,
                              max_per_class: int,
                              track_deltas: jnp.ndarray | None = None,
                              select_block: int = 16):
    """vmapped decode_frame_detections over the frame batch."""
    if track_deltas is None:
        fn = lambda d: decode_frame_detections(
            cfg, d, im_height, im_width, score_thresh, nms_thresh,
            max_per_class, select_block=select_block)
        return jax.vmap(fn)(det)
    fn = lambda d, t: decode_frame_detections(
        cfg, d, im_height, im_width, score_thresh, nms_thresh,
        max_per_class, track_deltas=t, select_block=select_block)
    return jax.vmap(fn)(det, track_deltas)


def track_rois(cfg: ModelConfig, track_maps: jnp.ndarray, rois: jnp.ndarray,
               frame_idx: int = 0) -> jnp.ndarray:
    """RoI-pooled tracking displacement for frame-t RoIs: (N, 4) deltas."""
    spatial_scale = 1.0 / cfg.anchors.feat_stride
    return pool_vote(cfg, track_maps[frame_idx], rois, spatial_scale)


def decode_frame_detections(cfg: ModelConfig, det: Detections,
                            im_height, im_width,
                            score_thresh=None, nms_thresh=None,
                            max_per_class: int = 20,
                            track_deltas: jnp.ndarray | None = None,
                            select_block: int = 16):
    """Per-class box decode + NMS (ref: test_net.py post-processing).

    Returns (boxes (C-1, M, 4), scores (C-1, M), valid (C-1, M)[, track boxes]).
    Background class is dropped. If `track_deltas` is given, each kept
    detection also gets its tracked box in frame t+τ.
    """
    from dtt.models.targets import roi_norm_params
    means, stds = roi_norm_params(cfg.roi)
    if cfg.roi.class_agnostic:
        deltas = det.bbox_pred[:, 4:8]  # fg half of the (bg, fg) pair
        boxes = box_ops.decode_boxes(det.rois, deltas, means, stds)
        boxes = box_ops.clip_boxes(boxes, im_height, im_width)
        per_class_boxes = False
    else:
        deltas = det.bbox_pred
        boxes = box_ops.decode_boxes(det.rois, deltas, means, stds)
        boxes = box_ops.clip_boxes(boxes, im_height, im_width)
        boxes = boxes.reshape(boxes.shape[0], -1, 4)[:, 1:]  # drop bg
        per_class_boxes = True

    scores = det.cls_prob[:, 1:]  # drop background column
    det_boxes, det_scores, det_valid, det_idx = multiclass_nms(
        boxes, scores, nms_thresh, max_per_class,
        score_threshold=score_thresh, valid=det.roi_valid,
        per_class_boxes=per_class_boxes, select_block=select_block)
    if track_deltas is None:
        return det_boxes, det_scores, det_valid

    t_means = jnp.asarray(cfg.track.bbox_normalize_means)
    t_stds = jnp.asarray(cfg.track.bbox_normalize_stds)
    tracked = box_ops.decode_boxes(det.rois, track_deltas, t_means, t_stds)
    tracked = box_ops.clip_boxes(tracked, im_height, im_width)
    # gather each kept detection's tracked box with the SAME NMS selection
    det_tracked = tracked[det_idx] * det_valid[..., None]
    return det_boxes, det_scores, det_valid, det_tracked


def make_model(cfg: ModelConfig) -> DnT:
    return DnT(cfg=cfg)
