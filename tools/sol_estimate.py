"""Analytic speed-of-light model of the production video-inference step.

Computes per-stage FLOPs and minimum HBM traffic for the flagship D&T graph
(ResNet-101 dilated, fused eval heads, 3-scale correlation) at the config
canvas, and the implied lower-bound stage times on one v5e chip:

    t_SoL(stage) = max(FLOPs / peak_flops, bytes / peak_bw)

Pair with tools/profile_video33.py's measured stage table to see which stage
is furthest from light speed (BASELINE.md round-3 table). Peaks default to
this machine's measured calibration (187 TFLOP/s bf16 matmul through the
axon tunnel; ~819 GB/s v5e HBM) — override with --peak-tflops/--peak-gbps.

`--train B` models the TRAINING step at batch B instead (round-4 VERDICT
task 4): forward over 2B frames, backward at 2x the forward FLOPs for every
non-frozen conv (dL/dx + dL/dw are each conv-shaped; frozen_stages skip
backward entirely), activation write+read traffic across fwd->bwd, and the
f32 optimizer pass over the trainable params. Pair with
tools/profile_train_step.py's measured stage table.

Pure host arithmetic — safe to run while the TPU is busy.
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dtt.core.config import Config


def conv(px, cin, cout, k=1, bytes_per=2):
    """(flops, hbm bytes) for one conv: read in + weights, write out."""
    flops = 2 * px * cin * cout * k * k
    bytes_ = (px * cin + px * cout) * bytes_per + cin * cout * k * k * bytes_per
    return flops, bytes_


def bottleneck(px, cin, mid, cout, dil_k=3, bytes_per=2, downsample=False):
    f = b = 0
    for fl, by in (conv(px, cin, mid), conv(px, mid, mid, dil_k),
                   conv(px, mid, cout)):
        f += fl
        b += by
    if downsample:
        fl, by = conv(px, cin, cout)
        f += fl
        b += by
    return f, b


def train_main(args):
    """SoL for the training step at batch B (2B frames + backward + SGD).

    Backward convs are 2x the forward FLOPs (dL/dx and dL/dw are each a
    conv-shaped contraction); frozen stages (stop_gradient) have no backward.
    HBM: forward writes every activation, backward re-reads it plus the
    incoming gradient and writes the outgoing one — modeled as bwd bytes =
    2x fwd bytes for trained stages. Target assignment / proposal NMS /
    OHEM top-k are serial-select stages excluded here, exactly like the eval
    model excludes NMS/decode — the measured-vs-SoL gap prices them.
    """
    cfg = Config()
    mc = cfg.model
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    B = args.train
    F = 2 * B                      # frames per step
    red = mc.reduced_channels
    rpn_ch = mc.rpn.channels
    disp = mc.track.max_displacement
    v = (2 * disp // mc.track.stride + 1) ** 2
    k2 = mc.roi.ps_grid ** 2
    dc = mc.num_classes
    db = 8 if mc.roi.class_agnostic else 4 * mc.num_classes

    px = {"stem": (h // 2) * (w // 2), "s2": (h // 4) * (w // 4),
          "s3": (h // 8) * (w // 8), "s4": (h // 16) * (w // 16)}

    # (name, fwd_flops, fwd_bytes, trained, per_pair)
    rows = []

    def add(name, fb, trained, per_pair=False):
        rows.append((name, fb[0], fb[1], trained, per_pair))

    fs = mc.frozen_stages
    add("stem conv1+pool", conv(px["stem"], 3, 64, 7, bytes_per=4), fs < 1)
    f = b = 0
    for i in range(3):
        fl, by = bottleneck(px["s2"], 64 if i == 0 else 256, 64, 256,
                            downsample=(i == 0))
        f, b = f + fl, b + by
    add("stage2 (x3 @ /4)", (f, b), fs < 2)
    f = b = 0
    for i in range(4):
        fl, by = bottleneck(px["s3"], 256 if i == 0 else 512, 128, 512,
                            downsample=(i == 0))
        f, b = f + fl, b + by
    add("stage3 (x4 @ /8)", (f, b), fs < 3)
    f = b = 0
    for i in range(23):
        fl, by = bottleneck(px["s4"], 512 if i == 0 else 1024, 256, 1024,
                            downsample=(i == 0))
        f, b = f + fl, b + by
    add("stage4 (x23 @ /16)", (f, b), fs < 4)
    f = b = 0
    for i in range(3):
        fl, by = bottleneck(px["s4"], 1024 if i == 0 else 2048, 512, 2048,
                            downsample=(i == 0))
        f, b = f + fl, b + by
    add("stage5 dilated (x3 @ /16)", (f, b), True)

    f1, b1 = conv(px["s4"], 1024, rpn_ch, 3)
    n_anch = len(mc.anchors.scales) * len(mc.anchors.ratios)
    f2, b2 = conv(px["s4"], rpn_ch, n_anch * 6)
    f3, b3 = conv(px["s4"], 2048, red)
    add("rpn + reduce convs", (f1 + f2 + f3, b1 + b2 + b3), True)

    # per-frame ps-map head convs (train path: separate cls/bbox convs)
    fc, bc = conv(px["s4"], red, k2 * dc)
    fb_, bb_ = conv(px["s4"], red, k2 * db)
    add("cls+bbox ps-map convs", (fc + fb_, bc + bb_), True)

    # per-pair: 3-scale correlation + track ps-map conv
    s3px = px["s3"] // 4
    corr_f = corr_b = 0
    for cpx, ch in ((s3px, 512), (px["s4"], 1024), (px["s4"], red)):
        corr_f += 2 * cpx * ch * v
        corr_b += (2 * cpx * ch + cpx * v) * 2
    add("correlation x3 scales [/pair]", (corr_f, corr_b), True, per_pair=True)
    add("track ps-map conv [/pair]",
        conv(px["s4"], 2 * red + 3 * v, k2 * 4), True, per_pair=True)

    # PSRoI pools (gather form at train): traffic ~ maps + roi outputs; both
    # frames pool cls+bbox, frame t additionally pools the track maps
    n_rois = mc.rpn.post_nms_top_n_train + cfg.input.max_gt_boxes
    pool_b = (px["s4"] * k2 * (dc + db) * 4 * 2        # SAT f32 passes, 2 frames
              + px["s4"] * k2 * 4 * 4                  # track SAT, frame t
              + n_rois * k2 * (2 * (dc + db) + 4) * 4)
    add("PSRoI pools (train, SAT)", (0, pool_b), True)

    # optimizer: trainable params, f32 momentum SGD (read g, read m, write m,
    # read p, write p) + decay mask reads
    p_backbone = 44.5e6
    p_frozen = {0: 0, 1: 9.4e3, 2: 9.4e3 + 0.22e6, 3: 9.4e3 + 1.4e6}.get(fs, 4e6)
    p_heads = (3 * 3 * 1024 * rpn_ch + rpn_ch * n_anch * 6 + 2048 * red
               + red * k2 * (dc + db) + (2 * red + 3 * v) * k2 * 4)
    p_train = p_backbone - p_frozen + p_heads
    add("optimizer (SGD momentum, f32)", (0, int(p_train) * 5 * 4), False)

    print(f"train-step speed-of-light: batch {B} ({F} frames), canvas "
          f"{h}x{w}, frozen_stages={fs}, "
          f"{args.peak_tflops:.0f} TFLOP/s bf16, {args.peak_gbps:.0f} GB/s")
    print(f"{'stage':34s} {'GFLOP/step':>12s} {'MB/step':>10s} "
          f"{'SoL ms':>8s} {'bound':>6s}")
    tot_f = tot_b = tot_t = 0.0
    for name, fl, by, trained, per_pair in rows:
        if name.startswith("optimizer") or name.startswith("PSRoI"):
            mult = 1
        elif per_pair:
            mult = B
        else:
            mult = F
        bwd = 3.0 if trained else 1.0          # fwd + 2x bwd
        bwd_by = 3.0 if trained else 1.0       # act write+read + grad traffic
        fl, by = fl * mult * bwd, by * mult * bwd_by
        t_f = fl / (args.peak_tflops * 1e12)
        t_b = by / (args.peak_gbps * 1e9)
        t = max(t_f, t_b)
        tot_f, tot_b, tot_t = tot_f + fl, tot_b + by, tot_t + t
        print(f"{name:34s} {fl / 1e9:12.1f} {by / 1e6:10.1f} "
              f"{t * 1e3:8.2f} {'HBM' if t_b > t_f else 'MXU':>6s}")
    print(f"{'TOTAL':34s} {tot_f / 1e9:12.1f} {tot_b / 1e6:10.1f} "
          f"{tot_t * 1e3:8.2f}")
    print(f"-> speed-of-light train throughput: {B / tot_t:.0f} pairs/s/chip "
          f"(excl. target-assignment/NMS/OHEM serial selects + dispatch)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=33)
    p.add_argument("--train", type=int, default=0, metavar="B",
                   help="model the TRAIN step at batch B instead of eval")
    p.add_argument("--peak-tflops", type=float, default=187.0,
                   help="measured bf16 matmul peak through the tunnel")
    p.add_argument("--peak-gbps", type=float, default=819.0)
    args = p.parse_args()
    if args.train:
        return train_main(args)

    cfg = Config()
    mc = cfg.model
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    F = args.frames
    k2 = mc.roi.ps_grid ** 2
    dc = mc.num_classes
    db = 8 if mc.roi.class_agnostic else 4 * mc.num_classes
    n_rois = mc.rpn.post_nms_top_n_test
    red = mc.reduced_channels
    rpn_ch = mc.rpn.channels
    disp = mc.track.max_displacement
    v = (2 * disp // mc.track.stride + 1) ** 2  # correlation channels/scale

    px = {"stem": (h // 2) * (w // 2), "s2": (h // 4) * (w // 4),
          "s3": (h // 8) * (w // 8), "s4": (h // 16) * (w // 16)}
    stages = {}

    # ---- backbone (ResNet-101: 3/4/23/3 bottlenecks; conv5 dilated @ /16)
    f, b = conv(px["stem"], 3, 64, 7, bytes_per=4)  # f32 input frames
    stages["stem conv1+pool"] = (f, b)
    f = b = 0
    for i in range(3):
        fl, by = bottleneck(px["s2"], 64 if i == 0 else 256, 64, 256,
                            downsample=(i == 0))
        f, b = f + fl, b + by
    stages["stage2 (x3 @ /4)"] = (f, b)
    f = b = 0
    for i in range(4):
        fl, by = bottleneck(px["s3"], 256 if i == 0 else 512, 128, 512,
                            downsample=(i == 0))
        f, b = f + fl, b + by
    stages["stage3 (x4 @ /8)"] = (f, b)
    f = b = 0
    for i in range(23):
        fl, by = bottleneck(px["s4"], 512 if i == 0 else 1024, 256, 1024,
                            downsample=(i == 0))
        f, b = f + fl, b + by
    stages["stage4 (x23 @ /16)"] = (f, b)
    f = b = 0
    for i in range(3):
        fl, by = bottleneck(px["s4"], 1024 if i == 0 else 2048, 512, 2048,
                            downsample=(i == 0))
        f, b = f + fl, b + by
    stages["stage5 dilated (x3 @ /16)"] = (f, b)

    # ---- necks: RPN 3x3 + heads, reduce 1x1
    f1, b1 = conv(px["s4"], 1024, rpn_ch, 3)
    n_anch = len(mc.anchors.scales) * len(mc.anchors.ratios)
    f2, b2 = conv(px["s4"], rpn_ch, n_anch * 6)  # 2 cls + 4 box per anchor
    f3, b3 = conv(px["s4"], 2048, red)
    stages["rpn + reduce convs"] = (f1 + f2 + f3, b1 + b2 + b3)

    # ---- correlation (per PAIR): banded matmul, 3 scales
    s3px = px["s3"] // 4  # c3 max-pooled 2x2
    corr_f = corr_b = 0
    for cpx, ch in ((s3px, 512), (px["s4"], 1024), (px["s4"], red)):
        corr_f += 2 * cpx * ch * v  # one dot per displacement per position
        corr_b += (2 * cpx * ch + cpx * v) * 2
    stages["correlation x3 scales [/pair]"] = (corr_f, corr_b)

    # ---- fused ps-maps conv (per PAIR): cs -> k2*(dc+db+4)
    cs = 2 * red + 3 * v
    d = dc + db + 4
    stages["fused ps-maps conv [/pair]"] = conv(px["s4"], cs, k2 * d)

    # ---- fused PSRoI pool (per PAIR): direct interval-indicator form
    fh, fw = h // 16, w // 16
    k = mc.roi.ps_grid
    pool_f = k2 * (2 * n_rois * fh * fw * d + 2 * n_rois * fw * d * d)
    pool_b = px["s4"] * k2 * d * 2 + n_rois * k2 * d * 4
    stages["fused PSRoI pool [/pair]"] = (pool_f, pool_b)

    per_frame = ("stem", "stage2", "stage3", "stage4", "stage5", "rpn")
    print(f"speed-of-light model: {F}-frame chunk ({F - 1} pairs), "
          f"canvas {h}x{w}, {args.peak_tflops:.0f} TFLOP/s bf16, "
          f"{args.peak_gbps:.0f} GB/s HBM")
    print(f"{'stage':34s} {'GFLOP/chunk':>12s} {'MB/chunk':>10s} "
          f"{'SoL ms':>8s} {'bound':>6s}")
    tot_f = tot_b = tot_t = 0.0
    for name, (fl, by) in stages.items():
        mult = F if any(name.startswith(s) for s in per_frame) else F - 1
        fl, by = fl * mult, by * mult
        t_f = fl / (args.peak_tflops * 1e12)
        t_b = by / (args.peak_gbps * 1e9)
        t = max(t_f, t_b)
        tot_f, tot_b, tot_t = tot_f + fl, tot_b + by, tot_t + t
        print(f"{name:34s} {fl / 1e9:12.1f} {by / 1e6:10.1f} "
              f"{t * 1e3:8.2f} {'HBM' if t_b > t_f else 'MXU':>6s}")
    print(f"{'TOTAL':34s} {tot_f / 1e9:12.1f} {tot_b / 1e6:10.1f} "
          f"{tot_t * 1e3:8.2f}")
    print(f"-> speed-of-light throughput: {(F - 1) / tot_t:.0f} pairs/s/chip "
          f"(excl. NMS/decode serial steps + dispatch)")


if __name__ == "__main__":
    main()
