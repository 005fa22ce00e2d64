"""Immutable configuration tree.

TPU-native replacement for the reference's mutable global ``easydict`` config
(ref: lib/model/utils/config.py + cfgs/res101.yml). Frozen dataclasses are
hashable, so a config can be passed as a ``static_argnum`` to ``jax.jit``
without tripping retracing or mutability hazards. Defaults mirror the
reference semantics (anchor scales/ratios, NMS thresholds, RoI batch sizes,
position-sensitive k=7 grid, correlation d=8/stride 2 — D&T paper §3).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Tuple

import yaml



class _Replaceable:
    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class AnchorConfig(_Replaceable):
    """Anchor lattice (ref: lib/model/rpn/generate_anchors.py defaults)."""

    base_size: int = 16
    scales: Tuple[float, ...] = (4.0, 8.0, 16.0, 32.0)
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    feat_stride: int = 16

    @property
    def num_anchors(self) -> int:
        return len(self.scales) * len(self.ratios)


@dataclass(frozen=True)
class RPNConfig(_Replaceable):
    """RPN head + proposal filtering (ref: lib/model/rpn/{rpn,proposal_layer}.py)."""

    channels: int = 512
    # Static-shape proposal budget. The jwyang lineage uses 12000/2000 train
    # and 6000/300 test; R-FCN itself trains with 300 RoIs (R-FCN paper §3,
    # OHEM over 300 proposals) which is also 2.1x faster here (63 vs 130
    # ms/step on v5e) — so 300 is the default; set 2000 for lineage parity.
    pre_nms_top_n_train: int = 6000
    post_nms_top_n_train: int = 300
    pre_nms_top_n_test: int = 6000
    post_nms_top_n_test: int = 300
    nms_thresh: float = 0.7
    min_size: float = 16.0
    # proposal NMS multi-select width (nms_padded_fast): boxes committed
    # per while-loop step. Larger = fewer serial steps but a wider per-step
    # top-k + IoU panel; round-4 sweep at 33 frames: 16 -> 149.6 ms stage-D,
    # 32 -> 147.1, 64 -> 147.6 (tools/profile_video33.py --select-block).
    nms_select_block: int = 32
    # anchor_target_layer sampling (ref: lib/model/rpn/anchor_target_layer.py)
    batch_size: int = 256
    fg_fraction: float = 0.5
    positive_overlap: float = 0.7
    negative_overlap: float = 0.3
    clobber_positives: bool = False
    bbox_inside_weight: float = 1.0
    positive_weight: float = -1.0  # -1 => uniform 1/num_examples


@dataclass(frozen=True)
class RoIConfig(_Replaceable):
    """Proposal-target sampling + PSRoI heads (ref: proposal_target_layer_cascade.py)."""

    batch_size: int = 128          # sampled RoIs per image
    fg_fraction: float = 0.25
    fg_thresh: float = 0.5
    bg_thresh_hi: float = 0.5
    bg_thresh_lo: float = 0.0      # reference cfg BG_THRESH_LO=0.0 for VID
    bbox_normalize_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    bbox_normalize_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    bbox_normalize_targets_precomputed: bool = True
    # Position-sensitive grid (R-FCN k=7; D&T paper §3.1)
    ps_grid: int = 7
    # cfg.POOLING_MODE parity (ref: jwyang-lineage net modules). "psroi" is
    # the R-FCN/D&T architecture (position-sensitive k^2 channel groups);
    # "align"/"pool"/"crop" switch the heads to pooling plain score maps with
    # the corresponding dtt.ops.roi_ops op (see dtt.models.dnt.pool_vote).
    pooling_mode: str = "psroi"
    class_agnostic: bool = True    # R-FCN bbox head is class-agnostic in the lineage
    # Batched pooling implementation for the fused EVAL heads (training and
    # the per-frame ops keep psroi_pool's own dispatch): "gather" = SAT +
    # flat corner gathers (psroi_pool_batched), "pallas_mm" = SAT bilinear
    # MXU kernel, "direct" = SAT-free interval-indicator MXU kernel
    # (psroi_pool_batched_direct). Round-4 production-scale decision
    # (33-frame chunk, pool stage only): direct 12.3 ms, gather 26.5,
    # pallas_mm 49.7 — "direct" is the default (table in BASELINE.md).
    eval_pool_impl: str = "direct"
    # Batched pooling implementation for the TRAINING loss (batch_loss):
    # "direct" = interval-indicator MXU kernel + mirror matmul backward
    # (psroi_pool_batched_direct_ad), pooling at the model compute dtype;
    # "gather" = exact-f32 SAT gather whose transpose is a scatter-add —
    # measured 22 ms fwd + 64.5 ms bwd of the 217 ms batch-8 train step
    # (BASELINE.md round-5 train profile), which is why "direct" is the
    # default. Loss formulation-parity tests pin "gather" (bit-exact).
    train_pool_impl: str = "direct"


@dataclass(frozen=True)
class TrackConfig(_Replaceable):
    """Cross-frame correlation + tracking head (D&T paper §3.2-3.3)."""

    max_displacement: int = 8
    stride: int = 2                # displacement stride => (2d/s+1)^2 = 81 channels
    # L2-normalize features before correlating (cosine correlation). Raw
    # activation products have unbounded magnitude and destabilize the
    # tracking head (observed divergence); cosine keeps outputs in [-1, 1]
    # while preserving the displacement peak the tracking regressor reads.
    normalize: bool = True
    # feature scales correlated: conv3 (stride 8, pooled to 16), conv4, conv5
    scales: Tuple[str, ...] = ("c3", "c4", "c5")
    bbox_normalize_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    bbox_normalize_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)

    @property
    def num_corr_channels(self) -> int:
        d = 2 * (self.max_displacement // self.stride) + 1
        return d * d


@dataclass(frozen=True)
class ModelConfig(_Replaceable):
    backbone: str = "resnet101"
    num_classes: int = 31          # ImageNet VID: 30 classes + background
    reduced_channels: int = 1024   # 1x1 conv after conv5 (R-FCN "new conv")
    rpn: RPNConfig = field(default_factory=RPNConfig)
    anchors: AnchorConfig = field(default_factory=AnchorConfig)
    roi: RoIConfig = field(default_factory=RoIConfig)
    track: TrackConfig = field(default_factory=TrackConfig)
    dtype: str = "bfloat16"        # compute dtype for backbone/heads
    frozen_stages: int = 2         # freeze conv1 + layer1 (R-FCN practice)
    # rematerialize backbone stages in the backward pass (jax.checkpoint):
    # trades ~30% step time for activation memory, enabling larger
    # per-chip train batches
    remat: bool = False
    # lax.scan over each stage's identical bottlenecks (stacked params): the
    # compiled program holds ONE block per stage instead of all 23 of
    # ResNet-101's layer3, shrinking compile time and program size (the
    # tunnel 413-limits huge uploads). Changes the checkpoint param layout;
    # the torch importer handles both. Incompatible with --calibrate-bn.
    scan_blocks: bool = False


@dataclass(frozen=True)
class InputConfig(_Replaceable):
    """Host input pipeline (ref: lib/roi_data_layer/minibatch.py, utils/blob.py)."""

    # Reference: shorter side 600, max 1000. TPU: one fixed padded canvas so
    # every batch has an identical static shape (multiples of 32 for the
    # stride-32-free but conv-friendly layout).
    target_short_side: int = 600
    canvas_height: int = 608
    canvas_width: int = 1088
    pixel_means: Tuple[float, ...] = (102.9801, 115.9465, 122.7717)  # BGR, Caffe
    use_flipped: bool = True
    max_gt_boxes: int = 30         # static pad of gt boxes per frame
    # synthetic-data scene density: objects per frame pair drawn uniformly
    # from [lo, hi] (train.py --synthetic; eval snippets pass their own
    # count). Denser scenes raise per-class exposure per step — the 30-way
    # flagship synthetic run needs it (BASELINE.md round-2: classification
    # converges with exposure, not steps).
    synthetic_objects: Tuple[int, int] = (1, 3)
    # DET:VID mixture for joint training (D&T paper §3.4 balances the
    # sources; DET-train is ~10x VID-train's pair set, so plain
    # concatenation would be dominated by identity pairs). In [0, 1]: each
    # batch slot draws a DET identity pair with this probability and a VID
    # pair otherwise. -1 (default) keeps natural concatenation sampling.
    det_fraction: float = -1.0


@dataclass(frozen=True)
class TrainConfig(_Replaceable):
    """Optimizer + schedule (ref: trainval_net.py defaults)."""

    learning_rate: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 5e-4
    double_bias_lr: bool = True
    bias_decay: bool = False
    gamma: float = 0.1             # lr decay factor
    lr_decay_steps: Tuple[int, ...] = (80000,)
    # linear lr warmup over the first N steps (0 = off, the reference has
    # none; from-scratch runs without pretrained BN stats need it)
    warmup_steps: int = 0
    clip_gradients: float = 10.0
    batch_size_per_chip: int = 1   # frame-pairs per chip
    total_steps: int = 120000
    ohem: bool = True
    ohem_top_k: int = 128          # hardest RoIs kept for the cls/box loss
    # NMS among loss-ranked RoIs before the top-k (R-FCN OHEM practice:
    # suppress near-duplicate proposals so they don't crowd the hard set).
    # <= 0 disables and reverts to a raw top-k over per-RoI loss.
    ohem_nms_thresh: float = 0.7
    seed: int = 3
    checkpoint_every: int = 5000
    log_every: int = 100


@dataclass(frozen=True)
class EvalConfig(_Replaceable):
    score_thresh: float = 1e-3
    nms_thresh: float = 0.3
    max_dets_per_frame: int = 100  # static per-frame detection budget
    max_per_class: int = 20        # padded per-class detections entering linking
    tube_score_boost: str = "mean_top_half"  # D&T paper: boost by tube statistic
    max_tubes_per_class: int = 20
    link_iou_weight: float = 1.0   # psi(IoU) weight in link score
    # per-class NMS multi-select width (see RPNConfig.nms_select_block)
    nms_select_block: int = 32
    # Two-dispatch video/pair step: trunk in one jitted program, correlation
    # + heads + decode in a second (arrays stay on device between the two).
    # The 3-scale correlation compiles ~2.5x slower when it shares a program
    # with the backbone (round-5 interaction probes, BASELINE.md: 33.2 ms
    # in-program vs 13.3 ms as its own program on the SAME buffers —
    # invariant to dtype/copies/optimization_barrier/VMEM limits), so the
    # split recovers ~16 ms per 33-frame chunk. Results are bit-identical
    # (tests/test_inference.py split-parity test).
    split_video_step: bool = True


@dataclass(frozen=True)
class Config(_Replaceable):
    model: ModelConfig = field(default_factory=ModelConfig)
    input: InputConfig = field(default_factory=InputConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    exp_name: str = "dtt"


# ---------------------------------------------------------------------------
# YAML + dotted-key overrides (capability parity with cfg_from_file/cfg_from_list)
# ---------------------------------------------------------------------------

def _merge_into(obj, data: dict):
    """Return a copy of frozen dataclass `obj` with dict `data` merged in."""
    updates = {}
    fields = {f.name: f for f in dataclasses.fields(obj)}
    for key, value in data.items():
        if key not in fields:
            raise KeyError(f"unknown config key {key!r} for {type(obj).__name__}")
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            updates[key] = _merge_into(current, value)
        elif isinstance(value, dict):
            raise TypeError(
                f"config key {key!r} of {type(obj).__name__} is a scalar, "
                f"cannot assign nested value {value!r}"
            )
        elif isinstance(value, list):
            updates[key] = tuple(value)
        else:
            updates[key] = value
    return dataclasses.replace(obj, **updates)


def load_config(yaml_path: str | None = None, overrides: list[str] | None = None) -> Config:
    """Build a Config from defaults, an optional YAML file, and CLI overrides.

    `overrides` are ``dotted.key=value`` strings (the reference's ``--set``
    list), e.g. ``model.roi.ps_grid=3`` or ``train.learning_rate=0.01``.
    """
    cfg = Config()
    if yaml_path:
        with open(yaml_path) as f:
            data = yaml.safe_load(f) or {}
        cfg = _merge_into(cfg, data)
    for item in overrides or []:
        key, _, raw = item.partition("=")
        if not _:
            raise ValueError(f"override {item!r} must be key=value")
        value = yaml.safe_load(raw)
        tree: Any = value
        for part in reversed(key.strip().split(".")):
            tree = {part: tree}
        cfg = _merge_into(cfg, tree)
    return cfg


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f, sort_keys=False)
