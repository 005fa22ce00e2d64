"""Stage profile of the CURRENT production video step at the 33-frame chunk
(round-3 target: >=200 pairs/s/chip — find the next lever).

Probes the fused-heads path exactly as bench.py runs it (frame_trunk,
fused_psmaps with Pallas MXU correlation, batched proposals, fused PSRoI
pool with a selectable roi.eval_pool_impl, decode + per-class NMS),
incrementally, plus a chunk-size sweep of the full step. Chained-iteration
timing (one fori_loop per probe — deferral-proof, no 413 risk).

Run on the TPU host: python tools/profile_video33.py [--frames 33]
                     [--impl gather|pallas_mm|direct] [--sweep]
"""

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dtt.utils.cache import enable_compilation_cache
enable_compilation_cache()

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from dtt.core.anchors import grid_anchors_for
from dtt.core.config import Config
from dtt.models.dnt import DnT, detect_track_fused, decode_detections_batched, make_model
from dtt.models.rpn import proposal_layer
from dtt.utils.timing import chained_time

p = argparse.ArgumentParser()
p.add_argument("--frames", type=int, default=33)
p.add_argument("--impl", default="gather",
               choices=("gather", "pallas_mm", "direct"))
p.add_argument("--iters", type=int, default=10)
p.add_argument("--only", default=None)
p.add_argument("--sweep", action="store_true",
               help="full-step chunk-size sweep instead of stage probes")
p.add_argument("--sweep-frames", type=int, nargs="*", default=None,
               help="chunk sizes for --sweep (default 17 33 49 65 97)")
p.add_argument("--select-block", type=int, default=16,
               help="multi-select NMS width (proposal + per-class)")
args = p.parse_args()

cfg = Config()
cfg = cfg.replace(
    model=cfg.model.replace(
        roi=cfg.model.roi.replace(eval_pool_impl=args.impl),
        rpn=cfg.model.rpn.replace(nms_select_block=args.select_block)),
    eval=cfg.eval.replace(nms_select_block=args.select_block))
mcfg = cfg.model
h, w = cfg.input.canvas_height, cfg.input.canvas_width
model = make_model(mcfg)
rng = np.random.RandomState(0)
F = args.frames
frames = jnp.asarray(rng.randn(F, h, w, 3).astype(np.float32))
params = jax.jit(model.init)(jax.random.PRNGKey(0), frames[None, :2])
anchors = jnp.asarray(grid_anchors_for(mcfg.anchors, h // 16, w // 16))
im_hw = jnp.asarray([h, w], jnp.float32)
ecfg = cfg.eval


def t(name, fn, iters=args.iters):
    if args.only and args.only not in name:
        return None
    ms = chained_time(fn, iters=iters, args=(params, frames)) * 1e3
    pairs = (F - 1) / (ms / 1e3)
    print(f"{name:44s} {ms:8.2f} ms  ({pairs:6.1f} pairs/s)", flush=True)
    return ms


def trunk(c, params, frames):
    feats = model.apply(params, frames + c * 1e-12, method=DnT.frame_trunk)
    return (jnp.sum(feats.reduced) + jnp.sum(feats.rpn_cls)) * 1e-9 + c * 1e-9


def backbone_only(c, params, frames):
    c3, c4, c5 = model.apply(params, frames + c * 1e-12,
                             method=lambda m, x: m.backbone(x))
    return (jnp.sum(c5) + jnp.sum(c4) * 1e-3 + jnp.sum(c3) * 1e-3) * 1e-9 + c * 1e-9


def plus_fused_maps(c, params, frames):
    feats = model.apply(params, frames + c * 1e-12, method=DnT.frame_trunk)
    f_t = jax.tree.map(lambda x: x[:-1], feats)
    f_tau = jax.tree.map(lambda x: x[1:], feats)
    fm = model.apply(params, f_t, f_tau, method=DnT.fused_psmaps)
    return jnp.sum(fm) * 1e-9 + c * 1e-9


def plus_prep(c, params, frames):
    """trunk + the cosine-normalization prep of all 3 corr scales (no corr)."""
    feats = model.apply(params, frames + c * 1e-12, method=DnT.frame_trunk)
    f_t = jax.tree.map(lambda x: x[:-1], feats)
    f_tau = jax.tree.map(lambda x: x[1:], feats)
    tot = 0.0
    for s in mcfg.track.scales:
        for x in (f_t.corr_feats[s], f_tau.corr_feats[s]):
            n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                                 keepdims=True) + 1e-6)
            xn = (x / n.astype(x.dtype)) * jnp.sqrt(float(x.shape[-1])).astype(x.dtype)
            tot = tot + jnp.sum(xn.astype(jnp.float32)) * 1e-9
    return tot + c * 1e-9


def plus_corr(c, params, frames):
    """trunk + 3-scale cosine correlation volumes (no concat, no conv)."""
    from dtt.ops.correlation import correlation
    feats = model.apply(params, frames + c * 1e-12, method=DnT.frame_trunk)
    f_t = jax.tree.map(lambda x: x[:-1], feats)
    f_tau = jax.tree.map(lambda x: x[1:], feats)
    tcfg = mcfg.track

    def prep(x):
        n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1,
                             keepdims=True) + 1e-6)
        return (x / n.astype(x.dtype)) * jnp.sqrt(float(x.shape[-1])).astype(x.dtype)

    tot = 0.0
    for s in tcfg.scales:
        v = jax.vmap(lambda a, b: correlation(a, b, tcfg.max_displacement,
                                              tcfg.stride))(
            prep(f_t.corr_feats[s]), prep(f_tau.corr_feats[s]))
        tot = tot + jnp.sum(v.astype(jnp.float32)) * 1e-9
    return tot + c * 1e-9


def plus_track_input(c, params, frames):
    """trunk + the full 2291-channel concat (corr + concat, no conv)."""
    feats = model.apply(params, frames + c * 1e-12, method=DnT.frame_trunk)
    f_t = jax.tree.map(lambda x: x[:-1], feats)
    f_tau = jax.tree.map(lambda x: x[1:], feats)
    stacked = model.apply(params, f_t, f_tau,
                          method=lambda m, a, b: m._track_input(a, b))
    return jnp.sum(stacked.astype(jnp.float32)) * 1e-9 + c * 1e-9


def plus_proposals(c, params, frames):
    feats = model.apply(params, frames + c * 1e-12, method=DnT.frame_trunk)
    f_t = jax.tree.map(lambda x: x[:-1], feats)
    f_tau = jax.tree.map(lambda x: x[1:], feats)
    fm = model.apply(params, f_t, f_tau, method=DnT.fused_psmaps)

    def one(rc, rb):
        return proposal_layer(rc, rb, anchors, im_hw[0], im_hw[1], 1.0,
                              mcfg.rpn, False)

    props = jax.vmap(one)(f_t.rpn_cls, f_t.rpn_bbox)
    return (jnp.sum(fm) * 1e-9 + jnp.sum(props.rois) * 1e-9
            + jnp.sum(jnp.where(props.valid, props.scores, 0.0)) * 1e-9
            + c * 1e-9)


def plus_fused_pool(c, params, frames):
    feats = model.apply(params, frames + c * 1e-12, method=DnT.frame_trunk)
    f_t = jax.tree.map(lambda x: x[:-1], feats)
    f_tau = jax.tree.map(lambda x: x[1:], feats)
    fm = model.apply(params, f_t, f_tau, method=DnT.fused_psmaps)
    props, det, deltas = detect_track_fused(mcfg, f_t, fm, anchors,
                                            im_hw[0], im_hw[1], 1.0)
    return (jnp.sum(det.cls_prob) + jnp.sum(det.bbox_pred) * 1e-3
            + jnp.sum(deltas) * 1e-3) * 1e-9 + c * 1e-9


def full(c, params, frames):
    feats = model.apply(params, frames + c * 1e-12, method=DnT.frame_trunk)
    f_t = jax.tree.map(lambda x: x[:-1], feats)
    f_tau = jax.tree.map(lambda x: x[1:], feats)
    fm = model.apply(params, f_t, f_tau, method=DnT.fused_psmaps)
    props, det, deltas = detect_track_fused(mcfg, f_t, fm, anchors,
                                            im_hw[0], im_hw[1], 1.0)
    b, s, v, tr = decode_detections_batched(
        mcfg, det, im_hw[0], im_hw[1], ecfg.score_thresh, ecfg.nms_thresh,
        ecfg.max_per_class, track_deltas=deltas,
        select_block=ecfg.nms_select_block)
    return jnp.sum(s) + jnp.sum(b) * 1e-9 + jnp.sum(tr) * 1e-9 + c * 1e-9


if args.sweep:
    from dtt.eval.inference import make_video_step
    from dtt.utils.timing import sync_latency
    import time
    for f_n in (args.sweep_frames or (17, 33, 49, 65, 97)):
        fr = jnp.asarray(rng.randn(f_n, h, w, 3).astype(np.float32))
        step = make_video_step(cfg, model, f_n)

        reduce_out = jax.jit(lambda out: (
            jnp.sum(out.scores) + jnp.sum(out.boxes) * 1e-6
            + jnp.sum(out.tracked) * 1e-6))

        if cfg.eval.split_video_step:
            # the split step is TWO dispatches — re-jitting it would inline
            # both back into one program and undo the split; time it as the
            # production pipeline runs it (async dispatches + one forced
            # scalar through a tiny jitted reducer)
            def infer(params, fr):
                return reduce_out(step(params, fr, im_hw, jnp.float32(1.0)))
        else:
            @jax.jit
            def infer(params, fr):
                out = step(params, fr, im_hw, jnp.float32(1.0))
                return (jnp.sum(out.scores) + jnp.sum(out.boxes) * 1e-6
                        + jnp.sum(out.tracked) * 1e-6)

        float(infer(params, fr))
        lat = sync_latency()
        times = []
        for i in range(12):
            v = fr + np.float32(i) * 1e-6
            jax.block_until_ready(v)
            t0 = time.perf_counter()
            float(infer(params, v))
            times.append(time.perf_counter() - t0)
        times.sort()
        dt = max(times[len(times) // 4] - lat, 1e-9)
        if cfg.eval.split_video_step:
            # a two-dispatch step cannot be chained into one fori_loop
            # without undoing the split — forced-fetch is the honest number
            print(f"chunk {f_n:3d} frames [{args.impl:9s}] split: "
                  f"{dt * 1e3:7.1f} ms forced ({(f_n - 1) / dt:6.1f} pairs/s)",
                  flush=True)
            continue

        # chained form of the SAME step: device-only time with the per-call
        # dispatch/fetch overhead structurally removed — the difference vs
        # the forced-call time above IS that overhead
        def chained_step(c, p, fr):
            out = step(p, fr + c * 1e-12, im_hw, jnp.float32(1.0))
            # same full-output reduction as `infer` (tracked/boxes must stay live)
            return (jnp.sum(out.scores) + jnp.sum(out.boxes) * 1e-6
                    + jnp.sum(out.tracked) * 1e-6 + c * 1e-9)

        dev = chained_time(chained_step, iters=8, args=(params, fr))
        print(f"chunk {f_n:3d} frames [{args.impl:9s}]: "
              f"{dt * 1e3:7.1f} ms forced ({(f_n - 1) / dt:6.1f} pairs/s) | "
              f"{dev * 1e3:7.1f} ms chained ({(f_n - 1) / dev:6.1f} pairs/s) | "
              f"dispatch {max(dt - dev, 0) * 1e3:5.1f} ms", flush=True)
else:
    print(f"video-step stage profile: {F} frames 608x1088, "
          f"impl={args.impl}", flush=True)
    t("A backbone only", backbone_only)
    t("B frame_trunk (backbone+rpn+reduce+c3p)", trunk)
    t("B1 + cosine prep only", plus_prep)
    t("B2 + 3-scale correlation", plus_corr)
    t("B3 + track-input concat", plus_track_input)
    t("C + correlation + fused ps-maps conv", plus_fused_maps)
    t("D + proposal NMS", plus_proposals)
    t(f"E + fused PSRoI pool [{args.impl}]", plus_fused_pool)
    t("F FULL (decode + per-class NMS)", full)
