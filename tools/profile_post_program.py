#!/usr/bin/env python
"""Stage profile of the SPLIT step's post program (correlation + fused conv
+ proposals + fused pool + decode) in isolation, on staged trunk features.

After the round-5 split (EvalConfig.split_video_step) the 33-frame step is
trunk (85.6 ms, S1) + post + ~dispatch. This decomposes the post program
the way profile_video33 decomposes the one-program form, with each probe a
single program over staged FrameFeats (chained timing valid):

  P0 fused_psmaps (3-scale corr + split conv)
  P1 + batched proposal layer              [--kpre sweeps pre_nms_top_n_test]
  P2 + fused PSRoI pool [direct]
  P3 + decode + per-class NMS (full post)

Run on the TPU host: python tools/profile_post_program.py [--frames 33]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dtt.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dtt.core.anchors import grid_anchors_for
    from dtt.core.config import Config
    from dtt.models.dnt import (DnT, decode_detections_batched,
                                detect_track_fused, make_model)
    from dtt.models.rpn import proposal_layer
    from dtt.utils.timing import chained_time

    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=33)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--impl", default="direct")
    p.add_argument("--kpre", type=int, default=None,
                   help="override rpn.pre_nms_top_n_test")
    p.add_argument("--only", default=None)
    args = p.parse_args()

    cfg = Config()
    rcfg = cfg.model.rpn
    if args.kpre:
        rcfg = rcfg.replace(pre_nms_top_n_test=args.kpre)
    cfg = cfg.replace(model=cfg.model.replace(
        roi=cfg.model.roi.replace(eval_pool_impl=args.impl), rpn=rcfg))
    mcfg = cfg.model
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    model = make_model(mcfg)
    rng = np.random.RandomState(0)
    F = args.frames
    frames = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), frames[None])
    anchors = jnp.asarray(grid_anchors_for(mcfg.anchors, h // 16, w // 16))
    im_hw = jnp.asarray([h, w], jnp.float32)
    ecfg = cfg.eval

    # stage trunk features for F frames on device (one real trunk run on 2
    # frames, tiled up — values don't matter, shapes/dtypes do)
    f2 = jax.jit(lambda p, fr: model.apply(p, fr, method=DnT.frame_trunk))(
        params, frames)
    reps = -(-F // 2)
    feats = jax.tree.map(
        lambda x: jnp.tile(x, (reps,) + (1,) * (x.ndim - 1))[:F]
        * (1 + jnp.arange(F, dtype=x.dtype).reshape(
            (F,) + (1,) * (x.ndim - 1)) * 1e-3), f2)
    feats = jax.block_until_ready(feats)

    def slices(feats, c):
        f = jax.tree.map(lambda x: x + c.astype(x.dtype) * 1e-12, feats)
        return (jax.tree.map(lambda x: x[:-1], f),
                jax.tree.map(lambda x: x[1:], f))

    def p0(c, params, feats):
        f_t, f_tau = slices(feats, c)
        fm = model.apply(params, f_t, f_tau, method=DnT.fused_psmaps)
        return jnp.sum(fm) * 1e-9 + c * 1e-9

    def p1(c, params, feats):
        f_t, f_tau = slices(feats, c)
        fm = model.apply(params, f_t, f_tau, method=DnT.fused_psmaps)
        props = jax.vmap(lambda rc, rb: proposal_layer(
            rc, rb, anchors, im_hw[0], im_hw[1], 1.0, mcfg.rpn, False))(
            f_t.rpn_cls, f_t.rpn_bbox)
        return (jnp.sum(fm) * 1e-9 + jnp.sum(props.rois) * 1e-9
                + jnp.sum(jnp.where(props.valid, props.scores, 0.0)) * 1e-9
                + c * 1e-9)

    def p2(c, params, feats):
        f_t, f_tau = slices(feats, c)
        fm = model.apply(params, f_t, f_tau, method=DnT.fused_psmaps)
        props, det, deltas = detect_track_fused(mcfg, f_t, fm, anchors,
                                                im_hw[0], im_hw[1], 1.0)
        return (jnp.sum(det.cls_prob) + jnp.sum(det.bbox_pred) * 1e-3
                + jnp.sum(deltas) * 1e-3) * 1e-9 + c * 1e-9

    def p3(c, params, feats):
        f_t, f_tau = slices(feats, c)
        fm = model.apply(params, f_t, f_tau, method=DnT.fused_psmaps)
        props, det, deltas = detect_track_fused(mcfg, f_t, fm, anchors,
                                                im_hw[0], im_hw[1], 1.0)
        b, s, v, tr = decode_detections_batched(
            mcfg, det, im_hw[0], im_hw[1], ecfg.score_thresh, ecfg.nms_thresh,
            ecfg.max_per_class, track_deltas=deltas,
            select_block=ecfg.nms_select_block)
        return jnp.sum(s) + jnp.sum(b) * 1e-9 + jnp.sum(tr) * 1e-9 + c * 1e-9

    kp = mcfg.rpn.pre_nms_top_n_test
    print(f"post-program stage profile: {F} frames, impl={args.impl}, "
          f"k_pre={kp}", flush=True)
    for name, fn in (("P0 corr + fused conv", p0),
                     (f"P1 + proposal NMS (k_pre={kp})", p1),
                     (f"P2 + fused pool [{args.impl}]", p2),
                     ("P3 + decode/per-class NMS (full post)", p3)):
        if args.only and args.only not in name:
            continue
        ms = chained_time(fn, iters=args.iters, args=(params, feats)) * 1e3
        print(f"{name:42s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
