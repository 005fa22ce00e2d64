#!/usr/bin/env python
"""Train-step stage profile (VERDICT round-4 task 4: train SoL + decompose).

Cumulative forward stages of dtt.train.losses.batch_loss (the production
train loss), then fwd+bwd, then the full optimizer step — so each delta
prices one stage, mirroring tools/profile_video33.py for eval:

  F0  normalize + frame_features over 2B frames      (backbone + heads convs)
  F1  + track_psmaps                                  (3-scale corr + track conv)
  F2  + anchor targets + RPN losses (both frames)
  F3  + proposal layer (both frames)                  (train NMS path)
  F4  + label_all_rois / proposal_target
  F5  = full batch_loss forward
  G5  value_and_grad(batch_loss)                      (G5 - F5 = backward)
  S   full train_step                                 (S - G5 = optimizer+donate)

F0..G5 use chained_time (deferral-proof); S chains through the state carry.
Images are pre-normalized float on the host so the c*1e-12 perturbation can
thread the loop-carry through every stage (normalize_device_images passes
floats through; its device cost is ~0 and measured in the eval profile).

Run on the TPU host: python tools/profile_train_step.py [--batch 8]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dtt.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import argparse
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dtt.core.anchors import grid_anchors_for
    from dtt.core.config import Config
    from dtt.data.synthetic import synthetic_batch
    from dtt.models import dnt as dnt_lib
    from dtt.models.dnt import DnT, FrameFeats
    from dtt.models import targets as tgt_lib
    from dtt.models.rpn import proposal_layer
    from dtt.train import losses as loss_lib
    from dtt.train.trainer import create_train_state, make_train_step
    from dtt.utils.timing import chained_time

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--only", default=None)
    p.add_argument("--grad-stages", action="store_true",
                   help="also time grad() of each cumulative stage "
                        "(decomposes the backward)")
    args = p.parse_args()

    cfg = Config()
    mcfg = cfg.model
    h, w = cfg.input.canvas_height, cfg.input.canvas_width
    b = args.batch
    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng, b, h, w, mcfg.num_classes,
                            cfg.input.max_gt_boxes)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      jnp.asarray(batch["images"][:1]))
    params = state.params
    anchors = jnp.asarray(grid_anchors_for(mcfg.anchors, h // 16, w // 16))

    # synthetic_batch(uint8=False) already emits host-mean-subtracted float32
    # canvases; floats pass through normalize_device_images unchanged, so the
    # chained counter can perturb them without changing the loss math
    dev = {k: jnp.asarray(v) for k, v in batch.items()}
    key0 = jax.random.PRNGKey(7)

    spatial_scale = 1.0 / mcfg.anchors.feat_stride

    def stage_fwd(c, params, dev, upto: int):
        """Cumulative forward through batch_loss's structure (losses.py)."""
        images = dev["images"] + c * 1e-12
        flat = images.reshape(-1, *images.shape[2:])
        feats = model.apply(params, flat, method=DnT.frame_features)
        out = sum(jnp.sum(x.astype(jnp.float32)) * s for x, s in (
            (feats.reduced, 1e-9), (feats.cls_maps, 1e-9),
            (feats.bbox_maps, 1e-9), (feats.rpn_cls, 1e-9),
            (feats.rpn_bbox, 1e-9), (feats.corr_feats["c3"], 1e-12),
            (feats.corr_feats["c4"], 1e-12)))
        f_t = jax.tree.map(lambda x: x[0::2], feats)
        f_tau = jax.tree.map(lambda x: x[1::2], feats)
        if upto == 0:
            return out
        track_maps = model.apply(params, f_t, f_tau, method=DnT.track_psmaps)
        out = out + jnp.sum(track_maps.astype(jnp.float32)) * 1e-9
        if upto == 1:
            return out

        keys_b = jax.random.split(key0, b)
        keys4 = jax.vmap(lambda k: jax.random.split(k, 4))(keys_b)
        h_img, w_img = dev["im_size"][:, 0], dev["im_size"][:, 1]
        gt_boxes, gt_labels = dev["gt_boxes"], dev["gt_labels"]
        gt_valid = dev["gt_valid"]
        frames = [f_t, f_tau]
        from dtt.models.dnt import pool_vote_batched
        from dtt.models.rpn import rpn_loss as _rpn_loss
        from dtt.models.rpn import smooth_l1
        from dtt.train.losses import _rfcn_losses

        for f in range(2):
            feats_f: FrameFeats = frames[f]
            at = jax.vmap(
                lambda gb, gv, hh, ww, k: tgt_lib.anchor_target(
                    anchors, gb, gv, hh, ww, k, mcfg.rpn))(
                gt_boxes[:, f], gt_valid[:, f], h_img, w_img, keys4[:, 2 * f])
            l_cls, l_box = jax.vmap(
                lambda rc, rb, a: _rpn_loss(
                    rc, rb, a.labels, a.bbox_targets, a.bbox_weights,
                    sigma=3.0, inside_weight=mcfg.rpn.bbox_inside_weight))(
                feats_f.rpn_cls, feats_f.rpn_bbox, at)
            out = out + jnp.mean(l_cls) * 1e-6 + jnp.mean(l_box) * 1e-6
            if upto == 2:
                continue
            props = jax.vmap(
                lambda rc, rb, hh, ww, sc: proposal_layer(
                    rc, rb, anchors, hh, ww, sc, mcfg.rpn, train=True))(
                feats_f.rpn_cls, feats_f.rpn_bbox, h_img, w_img,
                dev["im_scale"])
            out = out + (jnp.sum(props.rois) * 1e-9
                         + jnp.sum(props.valid) * 1e-9)
            if upto == 3:
                continue
            other = 1 - f
            track_cfg = mcfg.track if f == 0 else None
            tgts = jax.vmap(
                lambda r, v, gb, gl, gv, gbo, gvo: tgt_lib.label_all_rois(
                    r, v, gb, gl, gv, gbo, gvo, mcfg.roi, track_cfg))(
                props.rois, props.valid, gt_boxes[:, f], gt_labels,
                gt_valid[:, f], gt_boxes[:, other], gt_valid[:, other])
            out = out + (jnp.sum(tgts.labels) * 1e-9
                         + jnp.sum(tgts.bbox_targets) * 1e-9
                         + jnp.sum(tgts.rois) * 1e-9)
            if upto == 4:
                continue
            cls_score = pool_vote_batched(mcfg, feats_f.cls_maps, tgts.rois,
                                          spatial_scale)
            bbox_pred = pool_vote_batched(mcfg, feats_f.bbox_maps, tgts.rois,
                                          spatial_scale)
            l_rcls, l_rbox, _ = jax.vmap(
                lambda cs, bp, t: _rfcn_losses(cfg, cs, bp, t))(
                cls_score, bbox_pred, tgts)
            out = out + jnp.mean(l_rcls) * 1e-6 + jnp.mean(l_rbox) * 1e-6
            if f == 0:
                trk = pool_vote_batched(mcfg, track_maps, tgts.rois,
                                        spatial_scale)
                tl = jnp.sum(smooth_l1(trk, tgts.track_targets, sigma=1.0),
                             axis=-1) * tgts.track_weights
                out = out + jnp.sum(tl) * 1e-9
        return out

    def full_loss(c, params, dev):
        images = dev["images"] + c * 1e-12
        total, _ = loss_lib.batch_loss(cfg, model, params, anchors,
                                       dict(dev, images=images), key0)
        return total * 1e-6

    def grad_full(c, params, dev):
        g = jax.grad(lambda p: full_loss(c, p, dev))(params)
        leaves = jax.tree.leaves(g)
        return sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves
                   ) * 1e-12

    def grad_stage(c, params, dev, upto: int):
        """fwd+bwd through the cumulative stage: the G-deltas price each
        stage's BACKWARD (G5-G0 vs F5-F0 separates bwd cost per stage)."""
        g = jax.grad(lambda p: stage_fwd(c, p, dev, upto))(params)
        leaves = jax.tree.leaves(g)
        return sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves
                   ) * 1e-12

    probes = [(f"F{i}", (lambda i: lambda c, p, d: stage_fwd(c, p, d, i))(i))
              for i in range(5)]
    probes += [("F5 full batch_loss fwd", full_loss),
               ("G5 fwd+bwd (grad)", grad_full)]
    names = ["F0 features(2B frames)", "F1 + track maps",
             "F2 + anchor tgts + rpn loss", "F3 + proposal NMS",
             "F4 + label_all_rois", "F5 full batch_loss fwd",
             "G5 fwd+bwd (grad)"]
    if args.grad_stages:
        probes += [
            (f"G{i}", (lambda i: lambda c, p, d: grad_stage(c, p, d, i))(i))
            for i in range(5)]
        names += [f"G{i} fwd+bwd thru F{i}" for i in range(5)]
    print(f"train-step stage profile: batch {b} {h}x{w}", flush=True)
    for (tag, fn), name in zip(probes, names):
        if args.only and args.only not in name:
            continue
        ms = chained_time(fn, iters=args.iters, args=(params, dev)) * 1e3
        print(f"{name:34s} {ms:8.1f} ms  ({b / ms * 1e3:6.1f} pairs/s)",
              flush=True)

    if not args.only or "S " in args.only or args.only == "S":
        step = make_train_step(cfg, model, (h // 16, w // 16))
        st = state
        st, m = step(st, dev, jax.random.PRNGKey(1))
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        n = 10
        for i in range(n):
            st, m = step(st, dev, jax.random.PRNGKey(i))
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / n
        print(f"{'S  full train_step':34s} {dt * 1e3:8.1f} ms  "
              f"({b / dt:6.1f} pairs/s)", flush=True)


if __name__ == "__main__":
    main()
